"""Pins for the q-gram prefix-filtered edit-distance operator (VERDICT
r14 item 1): losslessness vs brute force (including the sentinel bucket
for short/repetitive strings), hot-gram capping with accounting, and
exact-duplicate collapse in the cluster form."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.fuzzy import (
    FUZZY_SHORT_TOKEN,
    fuzzy_dedup_clusters,
    fuzzy_hot_grams,
    fuzzy_match_pairs,
    fuzzy_prefix_tokens,
)

NAMES = [
    # ordinary words
    "martha", "marsha", "marshal", "martin", "martini",
    "spark", "shark", "stark", "spars",
    # short strings (< q or few grams): the sentinel bucket
    "a", "b", "ab", "ba", "",
    # repetitive: 1 distinct gram at length 6
    "aaaaaa", "aaaaab",
    # far-away noise
    "zzzzzzzzzz", "qwertyuiop",
]


def _levenshtein(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[len(t)]


def _brute(names: list[str], k: int) -> set[tuple[int, int]]:
    return {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _levenshtein(a, b) <= k
    }


@pytest.mark.parametrize("k,q", [(1, 2), (2, 2), (3, 2), (1, 3), (2, 3)])
def test_pairs_lossless_vs_brute_force(spark, k, q):
    df = spark.createDataFrame(list(enumerate(NAMES)), ["nid", "nm"])
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(df, "nid", "nm", k=k, q=q).collect()
    }
    assert got == _brute(NAMES, k), f"k={k} q={q}"


def test_short_strings_ride_the_sentinel(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "aaaaaa")], ["nid", "nm"]
    )
    toks = fuzzy_prefix_tokens(df, "nid", "nm", k=1, q=2)
    with_sentinel = {
        r["fid"] for r in toks.filter(F.col("tok") == FUZZY_SHORT_TOKEN).collect()
    }
    # "a"/"b" have no bigram; "aaaaaa" has 1 <= k*q distinct grams
    assert with_sentinel == {1, 2, 3}
    pairs = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(df, "nid", "nm", k=1).collect()
    }
    assert pairs == {(1, 2)}  # ed("a","b")=1; the long ones are far


def test_gram_cap_skips_with_accounting(spark):
    # 40 names all sharing the rare gram "xy" -> bucket 40 > cap 10
    names = [(i, f"xy{i:04d}") for i in range(40)]
    df = spark.createDataFrame(names, ["nid", "nm"])
    hot = fuzzy_hot_grams(df, "nid", "nm", k=1, q=2, gram_cap=10)
    hot_rows = {(r["tok"], r["n_names"]) for r in hot.collect()}
    assert hot_rows, "cap must trip and be accounted"
    capped = fuzzy_match_pairs(df, "nid", "nm", k=1, q=2, gram_cap=10).count()
    exact = fuzzy_match_pairs(df, "nid", "nm", k=1, q=2).count()
    assert capped <= exact
    # uncapped is still exact on this fixture
    assert exact == len(_brute([n for _, n in names], 1))


def test_clusters_collapse_exact_dups_and_keep_min_id(spark):
    rows = [
        (10, "martha"), (11, "martha"),      # exact dups
        (12, "marsha"),                        # ed 1 from martha
        (20, "spark"), (21, "stark"),         # ed 1
        (30, "zzzzzzzzzz"),                    # singleton
    ]
    df = spark.createDataFrame(rows, ["nid", "nm"])
    out = {
        (r["nid"], r["keeper_doc_id"], r["is_keeper"])
        for r in fuzzy_dedup_clusters(df, "nid", "nm", k=1).collect()
    }
    assert out == {
        (10, 10, True), (11, 10, False), (12, 10, False),
        (20, 20, True), (21, 20, False),
        (30, 30, True),
    }


def test_deletion_path_matches_brute_force_and_gram_path(spark):
    """r15 optimization pin: k <= 1 routes through the exact
    deletion-neighborhood filter (FastSS) instead of the q-gram prefix
    join. Value-identity vs brute force AND vs the k>=2 machinery's own
    answer, on a fixture with the edge shapes the variant expression
    must get right: empty string, single chars, adjacent repeated chars
    (duplicate variants), end-insertions, and multibyte unicode."""
    names = [
        "", "a", "b", "ab", "ba", "aab", "aabb",
        "martha", "marthas", "amartha", "marsha",
        "héllo", "hello", "héllò",
        "Customer#000000001", "Customer#000000002", "Customer#000001001",
        # exact duplicates: the ed-0 self-join leg of the distinct-name
        # collapse, including a triple
        "martha", "martha", "Customer#000000002",
    ]
    df = spark.createDataFrame(list(enumerate(names)), ["nid", "nm"])
    for k in (0, 1):
        got = {
            (r["id_a"], r["id_b"], r["edit_dist"])
            for r in fuzzy_match_pairs(df, "nid", "nm", k=k).collect()
        }
        want = {
            (i, j, _levenshtein(names[i], names[j]))
            for (i, j) in _brute(names, k)
        }
        assert got == want, f"k={k}"
    # the deletion path ignores gram_cap (nothing is ever skipped):
    # a cap that would cripple the gram path must not change k=1 output
    capped = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(df, "nid", "nm", k=1, gram_cap=1).collect()
    }
    assert capped == _brute(names, 1)


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(1, "ab")], ["nid", "nm"])
    with pytest.raises(ValueError, match="k >= 0"):
        fuzzy_prefix_tokens(df, "nid", "nm", k=-1)
    with pytest.raises(ValueError, match="k >= 0"):
        fuzzy_prefix_tokens(df, "nid", "nm", q=0)
