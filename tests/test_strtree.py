import numpy as np
from hypothesis import given, settings, strategies as st

from osm_wikipedia_tag_validator_spark.functions.geometry import STRtree


@given(seed=st.integers(0, 5000), n=st.integers(1, 300))
@settings(max_examples=40, deadline=None)
def test_strtree_query_matches_bruteforce(seed, n):
    rng = np.random.default_rng(seed)
    mins = rng.uniform(-100, 100, (n, 2))
    sizes = rng.uniform(0.1, 20, (n, 2))
    boxes = np.column_stack([mins, mins + sizes])[:, [0, 1, 2, 3]]
    tree = STRtree(boxes)
    for _ in range(5):
        x, y = rng.uniform(-110, 110, 2)
        got = set(tree.query_point(x, y).tolist())
        exp = set(
            np.where(
                (boxes[:, 0] <= x) & (boxes[:, 2] >= x) & (boxes[:, 1] <= y) & (boxes[:, 3] >= y)
            )[0].tolist()
        )
        assert got == exp


def test_strtree_query_points_vectorized():
    rng = np.random.default_rng(0)
    mins = rng.uniform(-50, 50, (40, 2))
    boxes = np.column_stack([mins, mins + rng.uniform(1, 10, (40, 2))])
    tree = STRtree(boxes)
    px = rng.uniform(-60, 60, 200)
    py = rng.uniform(-60, 60, 200)
    pi, ii = tree.query_points(px, py)
    pairs = set(zip(pi.tolist(), ii.tolist()))
    for j in range(200):
        exp = np.where(
            (boxes[:, 0] <= px[j]) & (boxes[:, 2] >= px[j])
            & (boxes[:, 1] <= py[j]) & (boxes[:, 3] >= py[j])
        )[0]
        assert {(j, int(e)) for e in exp} == {p for p in pairs if p[0] == j}


def test_strtree_empty():
    tree = STRtree(np.empty((0, 4)))
    assert len(tree.query_point(0, 0)) == 0
    pi, ii = tree.query_points(np.array([0.0]), np.array([0.0]))
    assert len(pi) == 0
