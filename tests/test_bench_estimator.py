"""Pure-logic tests for bench.py's scaling estimator helpers.

The 4→16 criterion headline is min4/min16/4 over ALL recorded attempts
(`_minleg_retro`), and `_write_bench_md` must re-render ANY history
entry — including ones written under older methodologies — under that
one uniform estimator. These tests pin both, Spark-free, so a future
bench edit cannot silently change the criterion series.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def test_minleg_retro_uses_all_attempts_not_clean_subset():
    # run 43's real shape: the fastest 16-leg (36.84) was flagged dirty
    # while a slower one (58.6) was flagged clean; the estimator must
    # take the min over ALL attempts — contamination is additive, so
    # every observed wall is an upper bound and the min is the tightest.
    h = {
        "pair_attempts_4_16": [
            {"wall4": 140.18, "wall16": 58.6, "clean4": False, "clean16": True},
            {"wall4": 111.76, "wall16": 46.58, "clean4": True, "clean16": False},
            {"wall4": 125.16, "wall16": 36.84, "clean4": False, "clean16": False},
        ]
    }
    assert bench._minleg_retro(h) == round(111.76 / 36.84 / 4.0, 3)


def test_minleg_retro_falls_back_to_leg_walls():
    # pre-attempt-record runs only stored the accepted leg walls
    h = {"leg_walls_sec_4_16": {"local4": [116.75, 107.73, 113.3],
                                "local16": [41.76, 63.28, 31.11]}}
    assert bench._minleg_retro(h) == round(107.73 / 31.11 / 4.0, 3)


def test_minleg_retro_none_when_no_4_16_measurement():
    assert bench._minleg_retro({}) is None
    assert bench._minleg_retro({"leg_walls_sec_4_16": {}}) is None


def _entry(**over):
    e = {
        "value": 0.3,
        "n_images": 1000,
        "queries": {"scaling_job_local8_sec": 10.0,
                    "scaling_job_local32_sec": 8.0},
        "throughput_images_per_sec": {"local8": 1.0, "local32": 1.0},
        "pair_efficiencies": [0.3],
        "median_leg_ratio": 0.3,
        "leg_walls_sec": {"local8": [10.0], "local32": [8.0]},
        "leg_steal_jiffies": {"local8": [0], "local32": [0]},
        "hardware_ceiling_8_to_32": 0.9,
        "bandwidth_ceiling_8_to_32": 0.5,
        "efficiency_vs_hardware_ceiling": 0.6,
        "value_4_to_16": 0.477,  # stale: written by an older estimator
        "min_leg_walls_4_16": {"local4": 111.76, "local16": 58.6},
        "pair_attempts_4_16": [
            {"eff": 0.6, "wall4": 111.76, "wall16": 46.58,
             "steal4": 0, "steal16": 0, "clean4": True, "clean16": False},
            {"eff": 0.85, "wall4": 125.16, "wall16": 36.84,
             "steal4": 0, "steal16": 0, "clean4": False, "clean16": False},
        ],
    }
    e.update(over)
    return e


def test_write_bench_md_rerenders_under_uniform_estimator(tmp_path, monkeypatch):
    # point the writer at a scratch dir so the repo BENCH.md is untouched
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    e = _entry()
    bench._write_bench_md(e, [e, e])
    md = (tmp_path / "BENCH.md").read_text()
    want = round(111.76 / 36.84 / 4.0, 3)  # 0.758, not the stale 0.477
    assert f"= \n{want}**" in md or f"{want}**" in md
    assert "'local16': 36.84" in md  # min walls recomputed from attempts
    # the entry dict passed in must not be mutated
    assert e["value_4_to_16"] == 0.477
    assert e["min_leg_walls_4_16"]["local16"] == 58.6


def test_render_tolerates_skipped_8_32_context(tmp_path, monkeypatch):
    # campaign fast-cycle runs (SPARK_GRAFT_SKIP_8_32_CONTEXT=1) record
    # no 8/32 legs: value/walls are None and the dicts are empty. The
    # renderer and history summary must handle a MIXED history — old
    # full runs plus new context-skipped ones — without crashing, keep
    # the 8/32 stats over only the runs that measured it, and show '—'
    # in the skipped run's 8/32 columns.
    skipped = _entry(
        value=None,
        median_leg_ratio=None,
        queries={"scaling_job_local8_sec": None,
                 "scaling_job_local32_sec": None},
        throughput_images_per_sec={},
        pair_efficiencies=[],
        leg_walls_sec={},
        leg_steal_jiffies={},
    )
    skipped.pop("efficiency_vs_hardware_ceiling")
    full = _entry()
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    bench._write_bench_md(skipped, [full, skipped])
    md = (tmp_path / "BENCH.md").read_text()
    assert "| 2 | — | — | — |" in md  # skipped run's 8/32 columns
    assert "| 1 | 10.0 | 8.0 | 0.3 |" in md  # full run intact
    txt = bench._history_summary([full, skipped])
    assert "the 1 official run that measured it = 0.3" in txt


def test_history_summary_omits_8_32_context_when_never_measured():
    # a history made ONLY of campaign fast-cycle runs (8/32 context
    # skipped) has no 8→32 values at all; the summary must omit the
    # context paragraph rather than render "across the 0 official
    # runs ... = None"
    skipped = [
        _entry(
            value=None,
            median_leg_ratio=None,
            queries={"scaling_job_local8_sec": None,
                     "scaling_job_local32_sec": None},
            throughput_images_per_sec={},
            pair_efficiencies=[],
            leg_walls_sec={},
            leg_steal_jiffies={},
        )
        for _ in range(2)
    ]
    for s in skipped:
        s.pop("efficiency_vs_hardware_ceiling")
        s.pop("hardware_ceiling_8_to_32", None)
        s.pop("bandwidth_ceiling_8_to_32", None)
    txt = bench._history_summary(skipped)
    assert "8→32" not in txt and "None" not in txt
    # the 4→16 headline (the criterion series) must still render
    assert "min-of-walls" in txt


def test_history_summary_recency_uses_uniform_series():
    runs = [
        _entry(pair_attempts_4_16=[{"eff": 1.0, "wall4": 120.0, "wall16": w,
                                    "steal4": 0, "steal16": 0}],
               hardware_ceiling_8_to_32=0.9,
               bandwidth_ceiling_8_to_32=0.5)
        for w in (30.0, 40.0, 50.0)  # retro effs: 1.0, 0.75, 0.6
    ]
    txt = bench._history_summary(runs)
    assert "[1.0, 0.75, 0.6]" in txt
    assert "1/3 ≥ 0.8" in txt


def test_keep_sampling_stops_at_base_when_stable():
    # a clean window: legs within 2% of each other — exactly `base`
    # legs and no more
    walls = []
    while bench._keep_sampling(walls, 3, 6):
        walls.append(1.0)
    assert len(walls) == 3


def test_keep_sampling_extends_while_min_improves():
    # a decaying contamination burst: each leg beats the running min by
    # >2%, so sampling continues to the cap
    seq = iter([10.0, 8.0, 6.0, 4.0, 3.0, 2.0, 1.0])
    walls = []
    while bench._keep_sampling(walls, 3, 6):
        walls.append(next(seq))
    assert len(walls) == 6  # cap binds


def test_keep_sampling_stops_once_min_stabilizes():
    # burst clears on leg 3: that leg improves the min >2% so sampling
    # extends; leg 4 lands within 2% of the new min → stop at 4,
    # inside the cap
    seq = iter([10.0, 9.5, 5.0, 4.95, 1.0])
    walls = []
    while bench._keep_sampling(walls, 3, 6):
        walls.append(next(seq))
    assert len(walls) == 4
    assert min(walls) == 4.95


def test_keep_sampling_improvement_within_2pct_does_not_extend():
    # a new min that is within 2% of the old one is noise, not a trend
    walls = []
    seq = iter([10.0, 10.0, 9.9])  # 9.9 = 1% improvement only
    while bench._keep_sampling(walls, 3, 6):
        walls.append(next(seq))
    assert len(walls) == 3
