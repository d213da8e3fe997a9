"""BPE tokenizer (`operators/bpe.py`): the engine's tuple-based trainer
is checked against an INDEPENDENTLY WRITTEN naive trainer (the textbook
string-replace formulation from Sennrich et al.'s pseudo-code) — same
merges, same token counts — plus encode round-trips, determinism, and
the Spark e2e path cross-checked doc by doc."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from no_ocr_spark.operators.bpe import (
    END,
    bpe_encode_df,
    encode_text,
    encode_word,
    pre_tokenize,
    train_bpe,
    train_merges,
)


def naive_train(word_counts: list[tuple[str, int]],
                n_merges: int) -> list[tuple[str, str]]:
    """Independent oracle: words as space-joined symbol STRINGS, merges
    applied with a whitespace-guarded regex substitution."""
    vocab: dict[str, int] = {}
    for w, n in word_counts:
        key = " ".join(list(w) + [END])
        vocab[key] = vocab.get(key, 0) + n
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, n in vocab.items():
            syms = word.split(" ")
            for p in zip(syms, syms[1:]):
                pairs[p] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat = re.compile(r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)")
        vocab = {pat.sub("".join(best), w): n for w, n in vocab.items()}
    return merges


CORPORA = [
    [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
    [("aaaa", 10), ("aaab", 5), ("abab", 3)],
    [("x", 1)],
    [],
    [("mississippi", 4), ("misses", 2), ("sips", 7), ("pip", 1)],
]


def test_trainer_matches_independent_formulation():
    for wc in CORPORA:
        for n in (0, 1, 5, 30):
            assert train_merges(wc, n) == naive_train(wc, n), (wc, n)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.tuples(st.text(alphabet="abcde", min_size=1, max_size=8),
              st.integers(1, 9)),
    min_size=0, max_size=12), st.integers(0, 12))
def test_trainer_matches_independent_formulation_property(wc, n):
    assert train_merges(wc, n) == naive_train(wc, n)


def test_encode_round_trips_symbols():
    merges = train_merges(CORPORA[0], 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lowest", "newer", "wide", "zzz"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END  # lossless segmentation


def test_encode_with_no_merges_is_chars_plus_end():
    assert encode_word("abc", {}) == ["a", "b", "c", END]
    n = len(encode_text("ab cd!", {}))
    # words: ab, cd, !  ->  (2+1) + (2+1) + (1+1)
    assert n == 8


def test_fully_merged_word_is_single_token():
    merges = train_merges([("aaaa", 100)], 10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("aaaa", ranks) == ["aaaa" + END]


def test_pre_tokenize_matches_token_counts_regex():
    assert pre_tokenize("Hello, world 42!") == \
        ["hello", ",", "world", "42", "!"]


def test_spark_e2e_cross_checked(spark):
    """Train on the real sf0.001 documents table through the Spark path,
    then re-derive each doc's token count with the naive encoder over
    collected text — independent path, identical numbers."""
    from no_ocr_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(spark, docs, n_merges=40)
    assert len(merges) == 40
    out = {r.doc_id: (r.n_bpe_tokens, r.n_chars)
           for r in bpe_encode_df(spark, docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    sample = docs.select("doc_id", "text").limit(25).collect()
    for r in sample:
        n_naive = len(encode_text(r.text, ranks))
        assert out[r.doc_id][0] == n_naive, r.doc_id
        assert out[r.doc_id][1] == len(r.text)
    # merges are deterministic across re-runs AND across partitionings —
    # the cluster-size-invariance claim: a different physical layout
    # (different partition count => different count-pass task boundaries)
    # must yield the identical merge list
    assert train_bpe(spark, docs, n_merges=40) == merges
    assert train_bpe(spark, docs.repartition(17), n_merges=40) == merges


def test_training_handles_whitespace_and_null_text(spark):
    """Review findings: training must pre-tokenize EXACTLY like the
    encoder (no newline/tab pseudo-words from a drifted SQL regex), and
    null text must count 0 tokens/0 chars, not tokenize 'None'."""
    import pandas as pd

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["hello\nworld\tfoo", "hello  world", None],
    })
    docs = spark.createDataFrame(pdf, "doc_id bigint, text string")
    merges = train_bpe(spark, docs, n_merges=20)
    # no merge may involve a whitespace symbol — the encoder can never
    # produce one
    for a, b in merges:
        assert not any(ch.isspace() for ch in a + b), (a, b)
    # cross-check against the naive trainer over pre_tokenize'd words
    from collections import Counter

    wc = Counter()
    for t in ("hello\nworld\tfoo", "hello  world"):
        wc.update(pre_tokenize(t))
    assert merges == naive_train(sorted(wc.items()), 20)
    out = {r.doc_id: (r.n_bpe_tokens, r.n_chars)
           for r in bpe_encode_df(spark, docs, merges).collect()}
    assert out[2] == (0, 0)  # null text
    assert out[0][1] == len("hello\nworld\tfoo")
