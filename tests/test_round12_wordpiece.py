"""Round-12 WordPiece tests: the trainer/encoder differential over
randomized tiny corpora (Spark vs the independent pure-Python mirror —
score ties, single-char words, OOV fallback all fall out of the
strategy), the exact cross-multiplied score comparator vs Fractions,
and the MaxMatch greedy invariants."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny alphabet -> dense tie structure in pair scores
_word = st.text(alphabet="abc", min_size=1, max_size=7)
_doc = st.lists(_word, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_wordpiece_train_and_encode_match_mirror_on_random_corpora(
    spark, corpus
):
    import hashlib

    from pandas_etl_framework_spark.llmops.text import (
        _wp_piece_chars,
        split_words,
        wordpiece_encode,
        wordpiece_train,
        wordpiece_train_python,
        wordpiece_vocab,
        wordpiece_word,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got_merges, got_vocab_df = wordpiece_train(docs, n_merges=4)
    exp_merges, exp_segs = wordpiece_train_python(corpus, n_merges=4)
    assert got_merges == exp_merges

    got_vocab = wordpiece_vocab(got_vocab_df)
    exp_vocab = {s for v in exp_segs.values() for s in v}
    assert got_vocab == exp_vocab

    if not got_vocab:  # all-empty corpus: nothing to encode
        return
    max_chars = max(_wp_piece_chars(p) for p in got_vocab)
    got_rows = {
        r["doc_id"]: (r["n_tokens"], r["tokens_md5"])
        for r in wordpiece_encode(docs, got_vocab).collect()
    }
    for i, t in enumerate(corpus):
        toks: list = []
        for w in split_words(t):
            toks.extend(wordpiece_word(w, exp_vocab, max_chars))
        digest = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got_rows[i] == (len(toks), digest)


@given(
    st.lists(
        st.tuples(
            st.integers(1, 50),  # pair count
            st.integers(1, 200),  # left count
            st.integers(1, 200),  # right count
        ),
        min_size=1,
        max_size=12,
    )
)
def test_wp_better_total_order_matches_fractions(rows):
    """The integer cross-multiplied champion comparison must realize
    exactly the (score DESC, (l, r) ASC) order the Fraction formulation
    defines — across all permutation orders of the reduce."""
    from pandas_etl_framework_spark.llmops.text import _wp_better

    cands = [
        (f"l{i}", f"r{i}", c, cl, cr)
        for i, (c, cl, cr) in enumerate(rows)
    ]
    best = cands[0]
    for cand in cands[1:]:
        if _wp_better(cand, best):
            best = cand
    exp = min(
        cands,
        key=lambda t: (-Fraction(t[2], t[3] * t[4]), t[0], t[1]),
    )
    assert best == exp


def test_wordpiece_word_greedy_and_oov_fallback():
    from pandas_etl_framework_spark.llmops.text import wordpiece_word

    vocab = {"ab", "a", "##b", "##cd", "##c", "##d"}
    # longest-match-first: 'abcd' -> ab + ##cd, never a + ##b + ...
    assert wordpiece_word("abcd", vocab, 2) == ["ab", "##cd"]
    # position-0 piece must be the bare form ('##cd' never matches at 0),
    # and 'c' (bare) not in vocab -> per-char OOV fallback at position 0
    assert wordpiece_word("cd", vocab, 2) == ["c", "##d"]
    # fully out-of-alphabet word falls back per character, ## after pos 0
    assert wordpiece_word("xy", vocab, 2) == ["x", "##y"]


def test_wordpiece_merge_strips_continuation_marker(spark):
    """The merged piece drops the right side's ## marker: (h, ##e) -> he,
    (##l, ##o) -> ##lo — checked end-to-end through one training round."""
    from pandas_etl_framework_spark.llmops.text import wordpiece_train

    docs = spark.createDataFrame(
        [(0, "hello hello hello")], "doc_id long, text string"
    )
    merges, _ = wordpiece_train(docs, n_merges=2)
    for piece, left, right, _c, _cl, _cr in merges:
        assert right.startswith("##")
        assert piece == left + right[2:]
        assert not piece.startswith("####")


def test_tokenizer_fertility_invariants(spark):
    """Subword tokenizers never merge across word boundaries, so tokens
    per word >= 1 (fertility_micro >= 1e6) for all three; and totals are
    consistent (chars_per_token * tokens ~ chars within floor error)."""
    from pandas_etl_framework_spark.llmops.text import (
        q_text_tokenizer_fertility,
    )

    rows = {
        r["tokenizer"]: r
        for r in q_text_tokenizer_fertility(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"bpe", "unigram", "wordpiece"}
    for name, r in rows.items():
        assert r["fertility_micro"] >= 1_000_000, name
        assert r["total_tokens"] >= r["total_words"] > 0, name
        assert (
            r["fertility_micro"]
            == r["total_tokens"] * 1_000_000 // r["total_words"]
        ), name
        assert (
            r["chars_per_token_micro"]
            == r["total_chars"] * 1_000_000 // r["total_tokens"]
        ), name
