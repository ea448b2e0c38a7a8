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
