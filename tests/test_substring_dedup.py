"""Bounded exact substring dedup (round 10, VERDICT r09 item 4) — the
Spark-expressible variant of Lee et al. 2022's ExactSubstr stage: every
duplicated w-token substring is removed from every occurrence except
the globally-first one, with owner protection so the surviving
occurrence stays intact, plus the span-accounting report twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_etl_framework_spark.llmops.dedup import (
    substring_dedup,
    substring_dedup_report,
)

W = 4  # small window so hand corpora stay readable


def _doc(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_cross_doc_keep_first(spark):
    """A 4-token substring shared by two docs survives in the lower
    doc_id and is cut from the higher one; surrounding text is kept."""
    shared = "alpha beta gamma delta"
    docs = _doc(spark, f"start {shared} end", f"pre {shared} post")
    out = _by_id(substring_dedup(docs, window=W))
    assert out[0]["text"] == f"start {shared} end"
    assert out[0]["n_dropped"] == 0
    assert out[1]["text"] == "pre post"
    assert out[1]["n_dropped"] == 4
    rep = _by_id(substring_dedup_report(docs, window=W))
    # doc 1 positions: pre=1, shared=2..5, post=6
    assert (rep[1]["span_start"], rep[1]["span_end"], rep[1]["n_removed"]) \
        == (2, 5, 4)
    assert 0 not in rep


def test_owner_protection_self_overlap(spark):
    """A self-overlapping repeat ('x'*10, w=4): non-owner windows cover
    positions 2-10, but owner coverage (1-4) is protected, so the first
    occurrence survives intact rather than being gutted to one token."""
    docs = _doc(spark, " ".join(["x"] * 10))
    out = _by_id(substring_dedup(docs, window=W))
    assert out[0]["text"] == "x x x x"
    assert out[0]["n_tokens"] == 10 and out[0]["n_dropped"] == 6
    rep = _by_id(substring_dedup_report(docs, window=W))
    assert (rep[0]["span_start"], rep[0]["span_end"]) == (5, 10)


def test_short_and_unique_docs_untouched(spark):
    """Docs shorter than the window have no windows; unique docs have no
    duplicated windows — both pass through byte-identical."""
    docs = _doc(spark, "a b c", "one two three four five six")
    out = _by_id(substring_dedup(docs, window=W))
    assert out[0]["text"] == "a b c" and out[0]["n_dropped"] == 0
    assert out[1]["text"] == "one two three four five six"
    assert out[1]["n_dropped"] == 0
    assert substring_dedup_report(docs, window=W).count() == 0


def test_fully_dropped_doc_survives_as_empty_row(spark):
    """A doc that is entirely one duplicated window keeps its row with
    empty text (the report accounts for the removal) — it must not
    silently vanish from the output."""
    shared = "p q r s"
    docs = _doc(spark, shared, shared)
    out = _by_id(substring_dedup(docs, window=W))
    assert out[0]["text"] == shared
    assert out[1]["text"] == "" and out[1]["n_dropped"] == 4
    assert set(out) == {0, 1}


def test_report_totals_match_dedup_accounting(spark):
    """On real data: sum(n_removed) per doc == n_dropped per doc, kept
    token count == n_tokens - n_dropped, and reassembled text token
    count agrees."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = _by_id(substring_dedup(docs))
    rep = substring_dedup_report(docs).collect()
    removed = {}
    for r in rep:
        removed[r["doc_id"]] = removed.get(r["doc_id"], 0) + r["n_removed"]
        assert r["span_end"] - r["span_start"] + 1 == r["n_removed"]
    assert any(v > 0 for v in removed.values())
    for doc_id, row in out.items():
        assert removed.get(doc_id, 0) == row["n_dropped"]
        n_text_tokens = len(row["text"].split()) if row["text"] else 0
        assert n_text_tokens == row["n_tokens"] - row["n_dropped"]


def _python_substring_dedup(texts, w):
    """Independent pure-Python reference: brute-force window ownership,
    owner-protected coverage subtraction, reassembly. Deliberately NOT
    the islands/anti-join design — a design-level misconception shared
    by the Spark code and its CTE-mirrored DuckDB oracle would pass the
    hash gate; this differential is structured differently on purpose."""
    toks = {i: t.strip().split() for i, t in enumerate(texts)}
    # re-split with the \s+ semantics (split() collapses, same for our
    # fixtures which never have exotic whitespace)
    occ = {}
    for d, ts in toks.items():
        for p in range(len(ts) - w + 1):
            occ.setdefault(tuple(ts[p:p + w]), []).append((d, p))
    dropped = {d: set() for d in toks}
    protected = {d: set() for d in toks}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        owner = min(sites)
        for (d, p) in sites:
            target = protected if (d, p) == owner else dropped
            target[d].update(range(p, p + w))
    out = {}
    for d, ts in toks.items():
        cut = dropped[d] - protected[d]
        kept = [t for i, t in enumerate(ts) if i not in cut]
        out[d] = (" ".join(kept), len(ts), len(cut))
    return out


def test_differential_vs_python_reference(spark):
    """Randomized small-vocab corpora (heavy window collisions by
    construction) must agree exactly with the brute-force reference."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    for trial in range(5):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            for _ in range(8)
        ]
        docs = _doc(spark, *texts)
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["n_dropped"])
            for r in substring_dedup(docs, window=W).collect()
        }
        want = _python_substring_dedup(texts, W)
        # empty text splits to 1 empty token under split(trim, \s+) but
        # 0 under Python .split(); normalize that single edge
        want = {
            d: (t, max(n, 1), drp) for d, (t, n, drp) in want.items()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_incremental_differential_on_random_interleaved_corpora(spark):
    """Randomized small-vocab corpora with corpus/batch membership
    interleaved across doc_ids (odd ids = batch): the store-probe
    incremental path must equal the PYTHON reference's full recompute
    restricted to the batch — owners land on either side of the split
    with no ordering relationship to arrival."""
    import random

    from pandas_etl_framework_spark.llmops.dedup import (
        incremental_substring_dedup,
        substring_window_store,
    )

    rng = random.Random(11)
    vocab = ["a", "b", "c"]
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
            for _ in range(10)
        ]
        docs = _doc(spark, *texts)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["n_dropped"])
            for r in incremental_substring_dedup(
                batch, substring_window_store(corpus, window=W), window=W
            ).collect()
        }
        want = {
            d: (t, max(n, 1), drp)
            for d, (t, n, drp) in _python_substring_dedup(texts, W).items()
            if d % 2 == 1
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_decontaminate_removes_all_eval_overlap(spark):
    """Every eval window is cut from train — no keep-first: even a
    train substring occurring ONCE is removed when the eval set holds
    it; non-overlapping train docs pass through untouched; eval-only
    text never appears in the output."""
    from pandas_etl_framework_spark.llmops.dedup import (
        decontaminate_substrings,
    )

    leaked = "alpha beta gamma delta"
    train = _doc(spark, f"start {leaked} end", "clean text with no overlap x")
    eval_docs = _doc(spark, f"the eval prompt says {leaked} verbatim")
    out = _by_id(decontaminate_substrings(train, eval_docs, window=W))
    assert out[0]["text"] == "start end" and out[0]["n_dropped"] == 4
    assert out[1]["text"] == "clean text with no overlap x"
    assert out[1]["n_dropped"] == 0
    # eval docs themselves are not part of the output
    assert set(out) == {0, 1}


def test_window_store_fold_is_associative(spark):
    """build(corpus) == fold of any batch partitioning: counts add and
    the lexicographic-min owner survives whichever side it came from —
    the property the streaming twin's chop-invariance rests on."""
    from pandas_etl_framework_spark.llmops.dedup import (
        merge_substring_store,
        substring_window_store,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = substring_window_store(docs)
    parts = [
        substring_window_store(docs.filter(F.col("doc_id") % 3 == r))
        for r in range(3)
    ]
    folded = merge_substring_store(
        merge_substring_store(parts[0], parts[1]), parts[2]
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(folded) == rows(full)


def test_incremental_matches_full_recompute_restricted(spark):
    """incremental(batch, store(corpus)) == substring_dedup(all docs)
    restricted to the batch — global keep-first must survive the
    store-probe owner resolution with ids interleaved across sources."""
    from pandas_etl_framework_spark.llmops.dedup import (
        INCR_BATCH_SOURCE,
        incremental_substring_dedup,
        substring_window_store,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.filter(F.col("source") == INCR_BATCH_SOURCE)
    corpus = docs.filter(F.col("source") != INCR_BATCH_SOURCE)
    got = incremental_substring_dedup(batch, substring_window_store(corpus))
    want = substring_dedup(docs).join(
        batch.select("doc_id"), "doc_id", "left_semi"
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(got) == rows(want) and got.count() > 0
