"""Round-12 repetition-filter tests: a pure-Python mirror differential
over randomized corpora (the sort+fold run-length stats vs a Counter
formulation) and hand-built repetitive/clean documents hitting each
Gopher threshold."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="ab", min_size=1, max_size=2)
_doc = st.lists(_word, min_size=0, max_size=14).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _mirror(text):
    import re

    # Java split semantics (what tokens_col compiles to): splitting the
    # trimmed EMPTY string yields [''] — n_words is 1 for blank docs in
    # both engines, and the mirror must agree
    toks = re.split(r"[ \t\n\x0b\f\r]+", text.strip())
    out = {"n_words": len(toks)}
    for n in (2, 3, 4, 5, 10):
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        c = Counter(grams)
        pos = len(grams)
        if n in (2, 3, 4):
            cnt = max(c.values()) if c else 0
            out[f"top{n}_count"] = cnt
        else:
            cnt = sum(v for v in c.values() if v > 1)
            out[f"dup{n}_count"] = cnt
        out[f"pos{n}"] = pos
        key = f"top{n}" if n in (2, 3, 4) else f"dup{n}"
        out[f"{key}_frac"] = cnt / pos if pos else 0.0
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_repetition_matches_counter_mirror(spark, corpus, tmp_path_factory):
    from pandas_etl_framework_spark.llmops.text import q_text_repetition

    sf_dir = str(tmp_path_factory.mktemp("rep"))
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r.asDict() for r in q_text_repetition(spark, sf_dir).collect()}
    assert len(got) == len(corpus)
    for i, t in enumerate(corpus):
        exp = _mirror(t)
        for k, v in exp.items():
            assert got[i][k] == v, (i, k, got[i][k], v, t)


def test_repetition_thresholds_fire(spark, tmp_path_factory):
    from pandas_etl_framework_spark.llmops.text import q_text_repetition

    docs = [
        # 0: pathological bigram loop -> top2_frac ~ 1.0, repetitive
        (0, "spam " * 40),
        # 1: a duplicated 10-gram (whole first half repeats) -> dup10 fires
        (1, " ".join(f"w{i}" for i in range(12)) + " "
            + " ".join(f"w{i}" for i in range(12))),
        # 2: all-distinct words -> every fraction 0 or tiny, clean
        (2, " ".join(f"u{i}" for i in range(40))),
        # 3: shorter than every gram window -> all positions 0, clean
        (3, "one"),
    ]
    sf_dir = str(tmp_path_factory.mktemp("rep2"))
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: r for r in q_text_repetition(spark, sf_dir).collect()}
    assert got[0]["repetitive"] and got[0]["top2_frac"] > 0.9
    assert got[1]["repetitive"] and got[1]["dup10_frac"] > 0.1
    assert not got[2]["repetitive"] and got[2]["dup5_count"] == 0
    assert not got[3]["repetitive"] and got[3]["pos2"] == 0
    # position accounting: n-gram positions = n_words - n + 1, floored 0
    assert got[2]["pos10"] == 40 - 10 + 1
