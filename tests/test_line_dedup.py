"""Corpus line-level dedup (llmops/dedup.py line_dedup / line_dup_report):
differential against a pure-Python reference implementing the same
CCNet/Dolma keep-first policy, plus the edge cases the gate fixture cannot
hit (within-doc duplicate occurrences, a doc losing every eligible line,
the min_chars exemption, a non-default max_count)."""

from __future__ import annotations

import pytest

from pandas_etl_framework_spark.llmops.dedup import (
    incremental_line_dedup,
    line_count_store,
    line_dedup,
    line_dup_report,
    merge_line_store,
)

BOILER = "subscribe to our newsletter today"  # 33 chars, eligible
SHORT = "ok"  # < min_chars, exempt however often it repeats

DOCS = [
    # doc 0 owns BOILER (first occurrence) and repeats it internally
    (0, f"alpha beta gamma\n{BOILER}\ndelta epsilon zeta\n{BOILER}"),
    # doc 1 carries the duplicate plus exempt short lines
    (1, f"{SHORT}\n{BOILER}\n{SHORT}"),
    # doc 2 is nothing but copies of eligible duplicated lines
    (2, f"{BOILER}\nalpha beta gamma\ndelta epsilon zeta"),
    # doc 3: unique lines only, untouched
    (3, "eta theta iota\nkappa lambda mu"),
]

# doc 0 owns all three duplicated eligible lines (lowest (doc_id, line_no)
# for each), so doc 2 loses every line and must reassemble to the empty
# string, not NULL.


def py_line_dedup(docs, min_chars=10, max_count=1):
    """Reference: same semantics, plain dicts."""
    occ = {}
    for doc_id, text in sorted(docs):
        for line_no, line in enumerate(text.split("\n")):
            if len(line) >= min_chars:
                occ.setdefault(line, []).append((doc_id, line_no))
    dup_owner = {
        line: min(positions)
        for line, positions in occ.items()
        if len(positions) > max_count
    }
    out = {}
    for doc_id, text in docs:
        kept, dropped = [], 0
        for line_no, line in enumerate(text.split("\n")):
            owner = dup_owner.get(line)
            if owner is None or owner == (doc_id, line_no):
                kept.append(line)
            else:
                dropped += 1
        out[doc_id] = ("\n".join(kept), line_no + 1, dropped)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_line_dedup_matches_reference(spark, docs_df):
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_dropped"])
        for r in line_dedup(docs_df).collect()
    }
    assert got == py_line_dedup(DOCS)


def test_line_dedup_edges(spark, docs_df):
    got = {r["doc_id"]: r for r in line_dedup(docs_df).collect()}
    # within-doc repeat: doc 0 keeps its first BOILER, drops the second
    assert got[0]["text"].count(BOILER) == 1
    assert got[0]["n_dropped"] == 1
    # exempt short lines survive in place even though 'ok' repeats
    assert got[1]["text"] == f"{SHORT}\n{SHORT}"
    # every eligible line of doc 2 is owned elsewhere -> empty string, not null
    assert got[2]["text"] == ""
    assert got[2]["n_dropped"] == 3
    # unique doc untouched
    assert got[3]["text"] == DOCS[3][1]
    assert got[3]["n_dropped"] == 0


def test_line_dedup_max_count_threshold(spark, docs_df):
    # BOILER occurs 4x; with max_count=4 nothing exceeds the threshold,
    # so every doc comes back verbatim
    got = {
        r["doc_id"]: r["text"]
        for r in line_dedup(docs_df, max_count=4).collect()
    }
    assert got == {doc_id: text for doc_id, text in DOCS}


def test_incremental_matches_full_recompute(spark, docs_df):
    # batch {0, 3} vs corpus {1, 2}: ids INTERLEAVE across the split, so
    # for BOILER the store owner (doc 1) must LOSE to the batch's earlier
    # copy at (0, 1) — the least(store, batch) branch — while doc 0's
    # second copy still drops
    batch = docs_df.filter("doc_id in (0, 3)")
    corpus = docs_df.filter("doc_id in (1, 2)")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_dropped"])
        for r in incremental_line_dedup(
            batch, line_count_store(corpus)
        ).collect()
    }
    full = py_line_dedup(DOCS)
    assert got == {k: v for k, v in full.items() if k in (0, 3)}


def test_line_store_merge_associative(spark, docs_df):
    whole = line_count_store(docs_df)
    folded = merge_line_store(
        line_count_store(docs_df.filter("doc_id in (0, 3)")),
        line_count_store(docs_df.filter("doc_id in (1, 2)")),
    )
    assert sorted(map(tuple, whole.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, folded.collect()), key=lambda t: t[0]
    )
    assert whole.columns == folded.columns


def test_incremental_accepts_appended_partial_store(spark, docs_df):
    # streaming ingest appends per-batch partial stats instead of
    # compacting; the probe-time fold must give the same answer
    batch = docs_df.filter("doc_id in (0, 3)")
    appended = line_count_store(
        docs_df.filter("doc_id = 1")
    ).unionByName(line_count_store(docs_df.filter("doc_id = 2")))
    compacted = line_count_store(docs_df.filter("doc_id in (1, 2)"))
    a = incremental_line_dedup(
        batch, appended, store_preaggregated=False
    ).collect()
    b = incremental_line_dedup(batch, compacted).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_line_dup_report_owners(spark, docs_df):
    rep = {r["line"]: r for r in line_dup_report(docs_df).collect()}
    assert set(rep) == {BOILER, "alpha beta gamma", "delta epsilon zeta"}
    b = rep[BOILER]
    assert (b["n_occ"], b["owner_doc_id"], b["owner_line_no"]) == (4, 0, 1)
    a = rep["alpha beta gamma"]
    assert (a["n_occ"], a["owner_doc_id"], a["owner_line_no"]) == (2, 0, 0)
