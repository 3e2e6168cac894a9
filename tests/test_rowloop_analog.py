"""The row-at-a-time reference-architecture analog must compute the
EXACT same (tile, region) rollup as the engine's distributed scaling
job — that equality is what makes the measured architecture speedup
(scripts/rowloop_analog.py, recorded in BASELINE.md) a comparison of
architectures rather than of two different computations. It is also an
independent per-row re-derivation of the tile + PIP + rollup path."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from rowloop_analog import engine_rollup, run_analog


def test_analog_rollup_matches_engine(spark):
    n = 600
    analog = run_analog(n)
    engine = engine_rollup(spark, n)
    assert analog["rollup"] == engine
    # sanity: the rollup is non-trivial (several tiles x regions, both
    # lossy and lossless formats present)
    assert len(engine) > 5
    assert any(v[1] > 0 for v in engine.values())
    assert any(v[0] > v[1] for v in engine.values())
