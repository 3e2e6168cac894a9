import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_wikipedia_tag_validator_spark.functions import textfns as TX
from osm_wikipedia_tag_validator_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away into the woods "
        "while the hunter sleeps near the river bank under a tall oak tree"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quick", "fast")),  # near dup of 0
        (3, base.replace("fox", "cat").replace("dog", "bird")),  # near dup
        (4, "completely different text about spark query engines and columnar formats"),
        (5, "another unrelated document mentioning distributed joins and shuffles"),
        (6, base + " with a small suffix appended at the end"),  # near dup
        (7, ""),  # empty edge case
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    kept = DD.exact_dedup(docs).select("doc_id").toPandas()["doc_id"].tolist()
    assert 0 in kept and 1 not in kept
    assert len(kept) == 7
    groups = DD.exact_dup_groups(docs).toPandas()
    assert len(groups) == 1
    assert groups["n_dups"].iloc[0] == 2
    assert groups["keeper_id"].iloc[0] == 0


def test_minhash_estimates_jaccard(docs):
    """MinHash estimated Jaccard ≈ true char-3-gram Jaccard."""
    pdf = docs.toPandas()
    hs = TX.char_ngrams_hashed(pdf["text"].tolist(), n=3)
    sets = [set(h.tolist()) for h in hs]
    true_j = len(sets[0] & sets[2]) / len(sets[0] | sets[2])
    sig0 = TX.minhash_signature(hs[0], 256)
    sig2 = TX.minhash_signature(hs[2], 256)
    est = (sig0 == sig2).mean()
    assert abs(est - true_j) < 0.12


def test_minhash_lsh_finds_near_dups(docs):
    pairs = DD.minhash_lsh_pairs(docs, threshold=0.6, num_perm=64, bands=16).toPandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id1"], pairs["id2"])}
    assert (0, 1) in got  # exact dup certainly found
    assert (0, 2) in got or (1, 2) in got  # near dup found
    # unrelated docs must not pair with the base family
    assert not any((a in (4, 5)) ^ (b in (4, 5)) for a, b in got)


def test_simhash_pairs(docs):
    pairs = DD.simhash_pairs(docs, max_hamming=10).toPandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id1"], pairs["id2"])}
    assert (0, 1) in got
    assert not any((a in (4, 5)) ^ (b in (4, 5)) for a, b in got if (a, b) != (4, 5))


def test_token_jaccard_matches_manual(docs):
    pairs = DD.token_jaccard_pairs(docs, threshold=0.5).toPandas()
    got = {(int(a), int(b)): j for a, b, j in zip(pairs["id1"], pairs["id2"], pairs["jaccard"])}
    assert got[(0, 1)] == 1.0
    t0 = set("the quick brown fox jumps over the lazy dog and runs far away into the woods while the hunter sleeps near the river bank under a tall oak tree".split())
    t2 = set("the fast brown fox jumps over the lazy dog and runs far away into the woods while the hunter sleeps near the river bank under a tall oak tree".split())
    expected = len(t0 & t2) / len(t0 | t2)
    assert abs(got[(0, 2)] - expected) < 1e-6


def test_embedding_neardup_vs_bruteforce(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # a near-duplicate with tiny noise
        rows.append((100 + i, [float(x) for x in v + rng.standard_normal(16).astype(np.float32) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = DD.embedding_neardup_bruteforce(df, threshold=0.98).toPandas()
    lsh = DD.embedding_neardup_pairs(df, threshold=0.98).toPandas()
    exact_pairs = {(int(a), int(b)) for a, b in zip(exact["id1"], exact["id2"])}
    lsh_pairs = {(int(a), int(b)) for a, b in zip(lsh["id1"], lsh["id2"])}
    # every LSH pair is a true pair; recall ≥ 0.9 on planted dups
    assert lsh_pairs <= exact_pairs
    planted = {(i, 100 + i) for i in range(20)} & exact_pairs
    assert len(lsh_pairs & planted) >= 0.9 * len(planted)


def test_winnow_fingerprints_shift_invariant():
    h = TX.char_ngrams_hashed(["abcdefghijklmnopqrstuvwxyz" * 3], n=4)[0]
    fp1 = set(TX.winnow_fingerprints(h, 8).tolist())
    h2 = TX.char_ngrams_hashed(["XYZ " + "abcdefghijklmnopqrstuvwxyz" * 3], n=4)[0]
    fp2 = set(TX.winnow_fingerprints(h2, 8).tolist())
    overlap = len(fp1 & fp2) / len(fp1 | fp2)
    assert overlap > 0.6  # winnowing is robust to prefix shifts


def test_token_jaccard_df_cut(spark):
    # doc 10/11 share rare tokens (near-dups); doc 12/13 overlap ONLY in
    # the hot token "common" which appears in every doc
    rows = [
        (10, "common alpha beta gamma delta"),
        (11, "common alpha beta gamma epsilon"),
        (12, "common zeta"),
        (13, "common eta"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    exact = DD.token_jaccard_pairs(d, threshold=0.3).toPandas()
    cut = DD.token_jaccard_pairs(d, threshold=0.3, max_token_df=3).toPandas()
    exact_pairs = {(int(a), int(b)): j for a, b, j in zip(exact.id1, exact.id2, exact.jaccard)}
    cut_pairs = {(int(a), int(b)): j for a, b, j in zip(cut.id1, cut.id2, cut.jaccard)}
    # "common" has df=4 > 3 → dropped from the inverted index: the
    # hot-token-only pair (12,13) is cut while rare-token pairs survive
    assert (10, 11) in cut_pairs
    assert (12, 13) in exact_pairs and (12, 13) not in cut_pairs
    # verify pass is exact: surviving jaccards match the uncut values
    for k, v in cut_pairs.items():
        assert v == exact_pairs[k]
