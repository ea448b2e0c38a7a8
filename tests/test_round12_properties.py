"""Round-12 property tests: the ADVICE r11 fixes.

1. ``split_words`` (the shared Python mirror of ``tokens_col``'s Java
   ``\\s+`` split) must agree with the JVM split on the exact characters
   where Python's ``str.split()`` diverges from Java's ``\\s`` class
   (U+0085 NEL, U+2028 LS, U+001C-1F separators, NBSP, ...).
2. ``pca_invariants`` must REJECT malformed vectors (short, null-element,
   out-of-range) instead of silently NULL-padding — the DuckDB twin
   would otherwise compute partial sums where Spark emits NULL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# strings mixing Java-\s whitespace with characters ONLY Python treats
# as whitespace; the latter must stay INSIDE tokens
WS_CASES = [
    "plain words here",
    "  leading and trailing  ",
    "tab\tnewline\ncr\r vt\x0b ff\x0c mix",
    "nel\x85inside",            # U+0085: Python splits, Java does not
    "ls ps inside",   # U+2028/9: Python splits, Java does not
    "fs\x1cgs\x1drs\x1eus\x1f", # U+001C-1F: Python splits, Java does not
    "nbsp\xa0ideo　thin ",  # Unicode spaces: Python splits, Java does not
    "",
    "   ",
    "\x85",
    "a\t\t\n  b",
]


def test_split_words_matches_java_split_exactly(spark):
    from pandas_etl_framework_spark.llmops.text import split_words, tokens_col

    df = spark.createDataFrame([(i, t) for i, t in enumerate(WS_CASES)],
                               "i long, text string")
    jvm = {
        r["i"]: [w for w in r["toks"] if w != ""]
        for r in df.select("i", tokens_col().alias("toks")).collect()
    }
    for i, t in enumerate(WS_CASES):
        assert split_words(t) == jvm[i], repr(t)


def test_split_words_none_and_python_divergence():
    from pandas_etl_framework_spark.llmops.text import split_words

    assert split_words(None) == []
    # the exact divergence the ADVICE named: str.split() breaks on NEL,
    # split_words must NOT (Java \s+ keeps the token whole)
    assert "nel\x85inside".split() == ["nel", "inside"]
    assert split_words("nel\x85inside") == ["nel\x85inside"]


@pytest.mark.parametrize(
    "vec",
    [
        [0.1] * 63,                 # short: would NULL-pad the zip_with
        [0.1] * 63 + [None],        # null element
        [0.1] * 63 + [2.0],         # |x| > 1.0: outside the int64 envelope
    ],
)
def test_pca_invariants_rejects_malformed_vectors(spark, vec):
    from pandas_etl_framework_spark.llmops.projection import pca_invariants

    emb = spark.createDataFrame(
        [(1, [0.1] * 64), (2, vec)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="pca_invariants"):
        pca_invariants(emb).collect()


def test_pca_invariants_accepts_full_width(spark):
    from pandas_etl_framework_spark.llmops.projection import pca_invariants

    emb = spark.createDataFrame(
        [(i, [((i + j) % 7 - 3) / 10.0 for j in range(64)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    rows = pca_invariants(emb).collect()
    per_row = [r for r in rows if r["item_id"] >= 0]
    assert len(per_row) == 40
    assert all(r["norm2_q"] is not None and r["proj_q"] is not None
               for r in per_row)


# --------------------------------------------------------------------------
# r12: distinct-set collapse in the PPJoin family (VERDICT r11 items 4/5)
# --------------------------------------------------------------------------

def _dup_docs(spark):
    """12 docs in 4 exact-duplicate groups of 3 (plus 3 singletons): the
    multiplicity shape the collapse exists for. Texts are long enough to
    shingle (>= 3 words) and cross-group Jaccard is ~0."""
    groups = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet purple pink grey",
        "north south east west up down left right forward backward",
    ]
    rows = [(g * 3 + c, groups[g]) for g in range(4) for c in range(3)]
    rows += [(100 + i, f"single{i} lonely document number {i} here okay")
             for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_collapse_emits_every_duplicate_pair(spark):
    """Exact-duplicate groups must yield ALL within-group pairs with
    jaccard exactly 1.0 through the equal-set branch, and nothing else on
    a cross-group-dissimilar corpus."""
    from pandas_etl_framework_spark.llmops.dedup import (
        jaccard_prefix_pairs,
        token_sets_df,
    )

    out = jaccard_prefix_pairs(token_sets_df(_dup_docs(spark))).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out}
    want = {
        (g * 3 + a, g * 3 + b)
        for g in range(4)
        for a in range(3)
        for b in range(a + 1, 3)
    }
    assert set(got) == want, sorted(got)
    assert all(j == 1.0 for j in got.values())


def test_containment_collapse_emits_both_directions(spark):
    """Equal-set groups must emit BOTH ordered directions with
    containment exactly 1.0 (the original id-level semantics)."""
    from pandas_etl_framework_spark.llmops.dedup import (
        containment_pairs,
        token_sets_df,
    )

    out = containment_pairs(
        token_sets_df(_dup_docs(spark)), min_size=3
    ).collect()
    got = {(r.doc_inner, r.doc_outer) for r in out}
    want = {
        (g * 3 + a, g * 3 + b)
        for g in range(4)
        for a in range(3)
        for b in range(3)
        if a != b
    }
    assert got == want
    assert all(r.containment == 1.0 for r in out)


def test_jaccard_collapse_excludes_empty_sets(spark):
    """Docs too short to shingle (empty token sets) must never pair —
    the id-level join had no candidates for them, and the equal-set
    branch must not invent jaccard=1.0 pairs for identical empties."""
    from pandas_etl_framework_spark.llmops.dedup import (
        jaccard_prefix_pairs,
        token_sets_df,
    )

    docs = spark.createDataFrame(
        [(1, "too short"), (2, "too short"), (3, ""),
         (4, "alpha beta gamma delta epsilon zeta"),
         (5, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = jaccard_prefix_pairs(token_sets_df(docs)).collect()
    assert {(r.doc_a, r.doc_b) for r in out} == {(4, 5)}


def test_jaccard_prefix_cap_accounts_for_every_drop(spark):
    """A capped run's lost pairs must be explainable by the accounting
    twin: uncapped minus capped pairs all share ONLY hot prefix tokens,
    the report lists exactly the over-cap tokens, and cap=None is
    byte-identical to the uncapped run."""
    from pandas_etl_framework_spark.llmops.dedup import (
        jaccard_prefix_hot_tokens,
        jaccard_prefix_pairs,
        token_sets_df,
        _docs,
    )

    ts = token_sets_df(_docs(spark, "/root/testdata/sf0.001"))
    base = {(r.doc_a, r.doc_b) for r in jaccard_prefix_pairs(ts).collect()}
    capped = {
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_pairs(ts, prefix_cap=3).collect()
    }
    hot = jaccard_prefix_hot_tokens(ts, prefix_cap=3).collect()
    assert capped <= base
    assert base != capped, "cap=3 should drop something at sf0.001"
    assert hot and all(r.n_docs > 3 for r in hot)
    # cap high enough to be inert -> exact output
    inert = {
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_pairs(ts, prefix_cap=10**9).collect()
    }
    assert inert == base
