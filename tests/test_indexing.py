"""Indexing / statistical-LM operator tests: TF-IDF ranking on a hand-built
corpus, inverted-index posting bounds, unigram surprisal invariants,
cross-source overlap symmetry."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.llmops.indexing import (
    LN_SCALE,
    POSTINGS_CAP,
    cross_source_overlap,
    inverted_index,
    tfidf_topk,
    unigram_surprisal,
)


@pytest.fixture(scope="module")
def tiny_tf(spark):
    # 3 docs: "rare" appears only in doc 2; "common" in all three.
    rows = [
        (0, "common", 5),
        (1, "common", 3),
        (2, "common", 1),
        (2, "rare", 2),
        (0, "mid", 1),
        (2, "mid", 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, term string, tf long")


def test_tfidf_prefers_rare_terms(spark, tiny_tf):
    out = tfidf_topk(tiny_tf, n_docs=3, k=1).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # doc 2's top keyword must be 'rare' (idf ln(3/1)) despite tf('mid')=4
    # (score mid = 4*ln(3/2)q = 4*405465; rare = 2*1098612)
    assert by_doc[2]["term"] == "rare"
    assert by_doc[2]["score_q"] == 2 * math.floor(math.log(3.0) * LN_SCALE)
    # 'common' has df=3 → idf_q = 0 → score 0; doc 1 only has 'common'
    assert by_doc[1]["score_q"] == 0


def test_tfidf_tiebreak_deterministic(spark):
    tf = spark.createDataFrame(
        [(0, "b", 1), (0, "a", 1)], "doc_id long, term string, tf long"
    )
    out = tfidf_topk(tf, n_docs=1, k=2).orderBy("rk").collect()
    assert [r["term"] for r in out] == ["a", "b"]


def test_inverted_index_bounds_postings(spark):
    rows = [(d, "w", 1) for d in range(POSTINGS_CAP * 3)] + [(0, "x", 7)]
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    out = {r["term"]: r for r in inverted_index(tf).collect()}
    assert out["w"]["df"] == POSTINGS_CAP * 3
    assert out["w"]["total_tf"] == POSTINGS_CAP * 3
    # postings truncated to the cap, smallest doc ids, ascending
    assert out["w"]["postings"] == list(range(POSTINGS_CAP))
    assert out["x"]["postings"] == [0] and out["x"]["total_tf"] == 7


def test_unigram_surprisal_rare_doc_scores_higher(spark, tiny_tf):
    out = {r["doc_id"]: r for r in unigram_surprisal(tiny_tf).collect()}
    # doc 1 is all 'common' (most frequent token) → lowest mean surprisal
    assert out[1]["mean_surprisal_micro"] < out[0]["mean_surprisal_micro"]
    assert out[1]["mean_surprisal_micro"] < out[2]["mean_surprisal_micro"]
    # token counts preserved
    assert out[2]["n_tokens"] == 7
    # exact quantized value for the single-term doc: surp(common) = ln(16/9)
    assert out[1]["surprisal_sum_q"] == 3 * math.floor(
        math.log(16.0 / 9.0) * LN_SCALE
    )


def test_hashed_bow_preserves_mass_and_dim(spark, tiny_tf):
    from pandas_etl_framework_spark.llmops.indexing import BOW_DIM, hashed_bow

    out = hashed_bow(tiny_tf).collect()
    assert all(0 <= r["bucket"] < BOW_DIM for r in out)
    # total feature mass == total token mass
    assert sum(r["cnt"] for r in out) == sum(
        r["tf"] for r in tiny_tf.collect()
    )
    # same term always lands in the same bucket → per-doc bucket counts
    # aggregate the doc's tf exactly
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["cnt"]
    assert per_doc == {0: 6, 1: 3, 2: 7}


def test_transition_matrix_probabilities(spark):
    from pandas_etl_framework_spark.relational_ts import (
        q_events_transition_matrix,
    )

    out = q_events_transition_matrix(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "no transitions found"
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, grp in by_prev.items():
        assert abs(sum(g["p"] for g in grp) - 1.0) < 1e-9, prev


def test_rfm_scores_in_range(spark):
    from pandas_etl_framework_spark.relational_ts import q_events_rfm

    rows = q_events_rfm(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4
        assert r["recency_days"] >= 0


def test_jaccard_prefix_filter_is_lossless(spark):
    """Prefix-filtered similarity join must equal brute force at the same
    threshold (candidate pruning may only drop pairs BELOW threshold)."""
    from pandas_etl_framework_spark.llmops.dedup import (
        JACCARD_T_DEN,
        JACCARD_T_NUM,
        jaccard_prefix_pairs,
        q_dedup_jaccard_pairs,
        token_sets_df,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    smart = {
        (r["doc_a"], r["doc_b"]): r["intersection"]
        for r in jaccard_prefix_pairs(token_sets_df(docs)).collect()
    }
    brute = {
        (r["doc_a"], r["doc_b"]): r["intersection"]
        for r in q_dedup_jaccard_pairs(spark, sf).collect()
        if JACCARD_T_DEN * r["intersection"]
        >= JACCARD_T_NUM * round(r["intersection"] / r["jaccard"])
    }
    assert smart == brute and smart, f"{len(smart)} vs {len(brute)}"


def test_weighted_reservoir_exact_k_and_deterministic(spark):
    from pandas_etl_framework_spark.llmops.curation import (
        weighted_sample_exact_k,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s1 = weighted_sample_exact_k(docs, "n_chars", k=20).collect()
    s2 = weighted_sample_exact_k(docs, "n_chars", k=20).collect()
    assert len(s1) == 20
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    # ranks are 1..k exactly once
    assert sorted(r["rk"] for r in s1) == list(range(1, 21))
    # weighting matters: zero-ish weight rows must lose to heavy rows far
    # more often than uniformly — check the sample's mean weight exceeds
    # the corpus mean (weights vary ~5x across docs)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r["weight"] for r in s1) / len(s1)
    assert sample_mean > corpus_mean * 0.9


def test_chunk_dedup_flags_cross_doc_spans_only(spark):
    from pandas_etl_framework_spark.llmops.indexing import (
        CHUNK_TOKENS,
        chunk_dedup_ratio,
    )

    shared = " ".join(f"s{i}" for i in range(CHUNK_TOKENS))
    uniq_a = " ".join(f"a{i}" for i in range(CHUNK_TOKENS))
    self_rep = " ".join(f"r{i}" for i in range(CHUNK_TOKENS))
    docs = spark.createDataFrame(
        [
            (0, shared + " " + uniq_a),          # 1 of 2 chunks shared
            (1, shared + " " + shared),          # both chunks shared w/ doc 0
            (2, self_rep + " " + self_rep),      # self-repeat only: NOT shared
            (3, "too short"),                    # < chunk → excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup_ratio(docs).collect()}
    assert 3 not in out
    assert out[0]["n_chunks"] == 2 and out[0]["n_shared_chunks"] == 1
    assert out[1]["n_chunks"] == 2 and out[1]["n_shared_chunks"] == 2
    assert out[2]["n_shared_chunks"] == 0 and out[2]["shared_ratio"] == 0.0


def test_cross_source_overlap_counts_pairs(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h tail1", "s1"),
            (1, "a b c d e f g h tail2", "s2"),
            (2, "a b c d e f g h tail3", "s2"),  # same fp, same source: 1 row
            (3, "different prefix entirely x y z", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = cross_source_overlap(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"], r["n_shared_texts"]) == ("s1", "s2", 1)


def test_bigram_surprisal_exact_tiny_corpus(spark):
    """Hand-computed add-one-smoothed bigram surprisal on a 3-doc corpus:
    the repeated bigram scores lower than the one-off, and every quantized
    value matches the Python recomputation exactly."""
    import math

    from pandas_etl_framework_spark.llmops.indexing import (
        LN_SCALE,
        bigram_surprisal,
    )

    texts = {1: "a b a b", 2: "a b c", 3: "c a"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    # corpus model in python
    bigrams = {}
    vocab = set()
    for t in texts.values():
        toks = t.split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    left = {}
    for (a, _), c in bigrams.items():
        left[a] = left.get(a, 0) + c
    v = len(vocab)

    def surp_q(a, b):
        return math.floor(
            math.log((left[a] + v) / (bigrams[(a, b)] + 1)) * LN_SCALE
        )

    expected = {}
    for doc_id, t in texts.items():
        toks = t.split()
        bs = list(zip(toks, toks[1:]))
        expected[doc_id] = (len(bs), sum(surp_q(a, b) for a, b in bs))

    out = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    for doc_id, (n, s) in expected.items():
        assert out[doc_id]["n_bigrams"] == n
        assert out[doc_id]["surprisal_sum_q"] == s
        assert out[doc_id]["mean_surprisal_micro"] == s / n
    # the thrice-seen bigram (a,b) must be less surprising than one-offs
    assert surp_q("a", "b") < surp_q("b", "c")


def test_duplicated_spans_merges_overlapping_windows(spark):
    """Two docs sharing a 10-token run (window=8, stride 1): the three
    duplicated window starts per doc (1..3 of the run) must merge into ONE
    maximal span covering the whole run; unique docs yield no rows."""
    from pandas_etl_framework_spark.llmops.indexing import duplicated_spans

    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"{shared} u1 u2 u3"),
            (2, f"v1 v2 {shared}"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
            for r in duplicated_spans(docs, window=8).collect()}
    # doc 1: run occupies tokens 1-10 -> dup windows start at 1,2,3
    assert rows[1] == (1, 10, 3)
    # doc 2: run occupies tokens 3-12
    assert rows[2] == (3, 12, 3)
    assert 3 not in rows


def test_bm25_rank_and_exact_scores(spark):
    """BM25 on a hand corpus: tf-monotonicity, length normalization, and
    bit-exact agreement with a Python mirror of the quantized formula."""
    import math

    from pandas_etl_framework_spark.llmops.indexing import bm25_topk

    # doc 0: q=3 hits, len 10; doc 1: q=1 hit, len 10 (same length, less tf);
    # doc 2: q=3 hits, len 40 (same tf, longer); doc 3: no query term.
    rows = [
        (0, "q", 3), (0, "pad", 7),
        (1, "q", 1), (1, "pad", 9),
        (2, "q", 3), (2, "pad", 37),
        (3, "pad", 5),
    ]
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    out = {r["doc_id"]: r for r in
           bm25_topk(tf, query_terms=("q",), k=10).collect()}

    assert 3 not in out                       # no query term -> no row
    assert out[0]["score_q"] > out[1]["score_q"]   # more tf wins
    assert out[0]["score_q"] > out[2]["score_q"]   # shorter doc wins
    assert sorted(out[d]["rk"] for d in out) == [1, 2, 3]

    # exact mirror: N=4 docs, T=65 tokens, df(q)=3
    N, T, df = 4, 65, 3
    idf_q = math.floor(math.log((2 * N + 2) / (2 * df + 1)) * 1_000_000)
    def contrib(tfv, dl):
        num = 22 * T * tfv
        den = 10 * T * tfv + 3 * T + 9 * N * dl
        return math.floor(idf_q * (num / den))
    assert out[0]["score_q"] == contrib(3, 10)
    assert out[1]["score_q"] == contrib(1, 10)
    assert out[2]["score_q"] == contrib(3, 40)
    assert out[0]["dl"] == 10 and out[0]["n_terms"] == 1
    # ranking is deterministic: score desc, doc_id asc
    assert out[0]["rk"] == 1


def test_bm25_batch_leg_matches_single_query(spark):
    """Each qid leg of the batch scorer must equal a standalone
    bm25_topk run with that query's terms at the same k — the batch
    plan shares df/dl/totals across queries but must not leak one
    query's terms into another's scores."""
    from pandas_etl_framework_spark.llmops.indexing import (
        BM25_BATCH_QUERIES,
        BM25_BATCH_TOPK,
        _term_freq,
        bm25_topk,
        bm25_topk_batch,
    )

    sf = "/root/testdata/sf0.001"
    tf = _term_freq(spark, sf).localCheckpoint(eager=True)
    batch = bm25_topk_batch(tf).collect()
    for qid, terms in BM25_BATCH_QUERIES.items():
        leg = sorted(
            (r["doc_id"], r["score_q"], r["n_terms"], r["dl"], r["rk"])
            for r in batch
            if r["qid"] == qid
        )
        single = sorted(
            (r["doc_id"], r["score_q"], r["n_terms"], r["dl"], r["rk"])
            for r in bm25_topk(
                tf, query_terms=terms, k=BM25_BATCH_TOPK
            ).collect()
        )
        assert leg == single and leg


def test_bm25_overflow_guard_trips(spark):
    """Past the documented int64 bound (22*T*tf < 2^63) the rational
    rewrite would silently wrap; the guard must raise instead. Totals
    here: T = 2^31 + 10 tokens, max_dl = 2^31 -> 22*T*max_dl ~ 2^67."""
    import pytest

    from pandas_etl_framework_spark.llmops.indexing import bm25_topk

    rows = [(0, "q", 1 << 31), (1, "q", 10)]
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    with pytest.raises(OverflowError, match="2\\^63"):
        bm25_topk(tf, query_terms=("q",), k=10)


def test_bm25_precomputed_totals_identity(spark):
    """bm25_topk / bm25_topk_batch with a pipeline-shared bm25_totals()
    (the 100-TB amortization path: dl checkpointed once, passed to every
    scorer) must equal the per-call recompute row-for-row, with and
    without the checkpoint."""
    from pandas_etl_framework_spark.llmops.indexing import (
        _term_freq,
        bm25_topk,
        bm25_topk_batch,
        bm25_totals,
    )

    sf = "/root/testdata/sf0.001"
    tf = _term_freq(spark, sf).localCheckpoint(eager=True)
    base = sorted(map(tuple, bm25_topk(tf).collect()))
    base_b = sorted(map(tuple, bm25_topk_batch(tf).collect()))
    for ckpt in (True, False):
        totals = bm25_totals(tf, checkpoint=ckpt)
        assert totals.n_docs > 0 and totals.total_tokens > totals.n_docs
        assert sorted(map(tuple, bm25_topk(tf, totals=totals).collect())) == base
        assert (
            sorted(map(tuple, bm25_topk_batch(tf, totals=totals).collect()))
            == base_b
        )


def test_bm25_worst_den_exact_per_doc_joint_max(spark):
    """The overflow bound's denominator maximum is the TRUE per-posting
    max — the per-document joint (max tf, dl), never max_tf and max_dl
    combined across different documents. Mirrored in arbitrary-precision
    Python over a corpus whose max-tf doc and max-dl doc differ, where
    the old cross-document bound would exceed the exact one."""
    from pyspark.sql import functions as F

    from pandas_etl_framework_spark.llmops.indexing import _bm25_worst_den

    # doc 0 holds max_tf (9), doc 1 holds max_dl (7+6=13)
    rows = [(0, "a", 9), (1, "b", 7), (1, "c", 6), (2, "d", 1)]
    tf = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    dl = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("dl"), F.max("tf").alias("__mtf")
    )
    n_docs, total_tokens = 3, 23
    got = _bm25_worst_den(dl, n_docs, total_tokens)
    per_doc = {0: (9, 9), 1: (7, 13), 2: (1, 1)}  # doc -> (mtf, dl)
    exact = max(
        10 * total_tokens * mtf + 3 * total_tokens + 9 * n_docs * d
        for mtf, d in per_doc.values()
    )
    assert got == exact
    old_conservative = 10 * total_tokens * 9 + 3 * total_tokens + 9 * n_docs * 13
    assert exact < old_conservative  # the refinement is strictly tighter here


def test_rrf_fusion_integer_exact_and_sentinels(spark):
    """RRF on hand lists: doc in both lists beats either single-list doc,
    contributions match the integer formula, absent ranks emit the 0
    sentinel, and ordering is deterministic."""
    from pandas_etl_framework_spark.llmops.indexing import (
        RRF_K,
        RRF_SCALE,
        rrf_fuse,
    )

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rk int"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rk int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse(a, b, topk=10).collect()}

    c = lambda rk: RRF_SCALE // (RRF_K + rk)
    assert out[20]["rrf_q"] == c(2) + c(1)        # in both lists
    assert out[10]["rrf_q"] == c(1)               # bm25-only
    assert out[40]["rrf_q"] == c(2)               # quality-only
    assert out[20]["rk"] == 1                     # fusion wins
    assert out[10]["rk_b"] == 0 and out[40]["rk_a"] == 0
    # rank-1 single-system doc beats rank-3 single-system doc
    assert out[10]["rrf_q"] > out[30]["rrf_q"]


def test_bm25_incremental_fold_is_split_invariant(spark):
    """Folding posting partials from ANY history/batch split must equal
    the from-scratch ranking — associativity of the index statistics."""
    from pandas_etl_framework_spark.llmops.indexing import (
        _term_freq,
        _term_freq_of,
        bm25_topk,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    full = bm25_topk(_term_freq(spark, sf)).collect()
    folded = bm25_topk(
        _term_freq_of(docs.filter("doc_id % 2 = 0")).unionByName(
            _term_freq_of(docs.filter("doc_id % 2 = 1"))
        )
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, folded))
