"""Round-11 property tests: the unigram-LM trainer/encoder differential
over randomized tiny corpora (Spark vs the independent Fraction-based
pure-Python mirror — tie-heavy vocabularies, repeated pieces, words
shorter/longer than max_piece_len, empty docs all fall out of the
strategy), and the exact Viterbi total-order invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny alphabet -> dense tie structure in both seed counts and paths
_word = st.text(alphabet="abc", min_size=1, max_size=7)
_doc = st.lists(_word, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_unigram_train_and_encode_match_mirror_on_random_corpora(
    spark, corpus
):
    import hashlib

    from pandas_etl_framework_spark.llmops.text import (
        UNIGRAM_MAX_PIECE_LEN,
        _unigram_viterbi,
        unigram_encode,
        unigram_train,
        unigram_train_python,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = unigram_train(docs)
    want = unigram_train_python(corpus)
    assert got == want

    weights = {p: c + 1 for p, c in want}
    if not weights:
        return  # all-empty corpus: nothing to encode
    total = sum(weights.values())
    enc = {
        r["doc_id"]: (r["n_tokens"], r["tokens_md5"])
        for r in unigram_encode(docs, weights).collect()
    }
    for i, t in enumerate(corpus):
        toks: list = []
        for w in t.split():
            toks.extend(
                _unigram_viterbi(w, weights, total, UNIGRAM_MAX_PIECE_LEN)
            )
        digest = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert enc[i] == (len(toks), digest)
        # segmentation is a partition of the word stream
        assert "".join(toks) == "".join(t.split())


@settings(max_examples=30, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=6),
    counts=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=9),
        min_size=0,
        max_size=8,
    ),
)
def test_unigram_viterbi_optimality_vs_exhaustive(word, counts):
    """The DP's chosen path is the maximum of ALL segmentations under the
    documented total order (likelihood, then fewer pieces, then lex) —
    checked against exhaustive enumeration with Fraction arithmetic."""
    from fractions import Fraction

    from pandas_etl_framework_spark.llmops.text import _unigram_viterbi

    weights = {ch: 1 for ch in set(word)}  # coverage: every char reachable
    weights.update(counts)
    total = sum(weights.values())

    def all_paths(rest):
        if not rest:
            yield ()
            return
        for ln in range(1, min(4, len(rest)) + 1):
            piece = rest[:ln]
            if piece in weights:
                for tail in all_paths(rest[ln:]):
                    yield (piece,) + tail

    def key(path):
        lik = Fraction(1)
        for p in path:
            lik *= Fraction(weights[p], total)
        # max by (lik, -len, reversed-lex) == the documented order
        return (lik, -len(path), tuple(-ord(c) for c in "\x00".join(path)))

    best = max(all_paths(word), key=key)
    assert _unigram_viterbi(word, weights, total, 4) == list(best)
