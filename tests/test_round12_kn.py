"""Round-12 Kneser-Ney bigram LM tests: a Fraction-exact pure-Python
mirror differential over randomized tiny corpora, and the
probability-mass sanity invariant (the interpolated KN conditional
sums to exactly 1 over the full continuation vocabulary)."""

from __future__ import annotations

import math
from collections import Counter
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

LN_SCALE = 1_000_000
D = Fraction(3, 4)

_word = st.text(alphabet="abc", min_size=1, max_size=3)
# docs need >= 2 words to produce a bigram; singleton docs legal too
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _kn_python(corpus):
    """Independent KN mirror: per-doc (n_bigrams, surprisal_sum_q)."""
    doc_bigrams = []
    corpus_counts: Counter = Counter()
    for text in corpus:
        toks = text.split()
        bigs = Counter(
            (toks[i], toks[i + 1]) for i in range(len(toks) - 1)
        )
        doc_bigrams.append(bigs)
        corpus_counts.update(bigs)
    cleft: Counter = Counter()
    n1p_left: Counter = Counter()
    n1p_right: Counter = Counter()
    for (w1, w2), c in corpus_counts.items():
        cleft[w1] += c
        n1p_left[w1] += 1
        n1p_right[w2] += 1
    n1p_all = len(corpus_counts)

    def p_kn(w1, w2):
        c = corpus_counts[(w1, w2)]
        return (
            Fraction(max(Fraction(c) - D, 0), cleft[w1])
            + D * n1p_left[w1] / cleft[w1]
            * Fraction(n1p_right[w2], n1p_all)
        )

    out = {}
    for doc_id, bigs in enumerate(doc_bigrams):
        if not bigs:
            continue
        n_b = sum(bigs.values())
        s = 0
        for (w1, w2), tfb in bigs.items():
            p = p_kn(w1, w2)
            surp_q = math.floor(
                math.log(p.denominator / p.numerator) * LN_SCALE
            )
            s += tfb * surp_q
        out[doc_id] = (n_b, s)
    return out, (corpus_counts, cleft, n1p_left, n1p_right, n1p_all)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_kn_surprisal_matches_fraction_mirror(spark, corpus):
    from pandas_etl_framework_spark.llmops.indexing import kn_surprisal

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_surprisal_sum_q"])
        for r in kn_surprisal(docs).collect()
    }
    exp, _stats = _kn_python(corpus)
    assert got == exp


@given(corpus=_corpus)
def test_kn_conditional_sums_to_one_over_vocab(corpus):
    """Interpolated KN is a proper conditional: for every observed left
    context w1, sum over the FULL continuation vocabulary of P_KN(w2|w1)
    is exactly 1 (the discount mass D·N1+(w1·) is redistributed through
    the continuation distribution, which itself sums to 1)."""
    _out, (counts, cleft, n1p_left, n1p_right, n1p_all) = _kn_python(corpus)
    if not counts:
        return
    vocab_r = set(n1p_right)
    for w1 in cleft:
        total = Fraction(0)
        for w2 in vocab_r:
            c = counts.get((w1, w2), 0)
            total += (
                Fraction(max(Fraction(c) - D, 0), cleft[w1])
                + D * n1p_left[w1] / cleft[w1]
                * Fraction(n1p_right[w2], n1p_all)
            )
        assert total == 1


def test_ccnet_buckets_balanced_and_ordered(spark):
    """NTILE terciles are balanced (sizes differ by <= 1) and ordered:
    every head-bucket surprisal <= every tail-bucket surprisal."""
    from pandas_etl_framework_spark.llmops.indexing import (
        q_text_ccnet_buckets,
    )

    rows = q_text_ccnet_buckets(spark, "/root/testdata/sf0.001").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["ppl_bucket"], []).append(
            r["mean_kn_surprisal_micro"]
        )
    assert set(by_bucket) == {1, 2, 3}
    sizes = sorted(len(v) for v in by_bucket.values())
    assert sizes[-1] - sizes[0] <= 1
    assert max(by_bucket[1]) <= min(by_bucket[3])
    assert max(by_bucket[1]) <= min(by_bucket[2]) or len(by_bucket[2]) == 0
