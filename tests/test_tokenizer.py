"""BPE tokenizer: differential vs a brute-force reference, determinism,
and encode/round-trip properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import tokenizer as tok
from .conftest import SF_DIR


# ---------------------------------------------------------------- reference
def _ref_train(table: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Brute-force BPE: recount EVERY pair from scratch each iteration
    (no incremental bookkeeping — an independent code path from
    train_bpe's indexed updates)."""
    words = {i: (list(w) + [tok.END_OF_WORD], n) for i, (w, n) in enumerate(table)}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        freq: dict[tuple[str, str], int] = {}
        for syms, n in words.values():
            for a, b in zip(syms, syms[1:]):
                freq[(a, b)] = freq.get((a, b), 0) + n
        live = {p: n for p, n in freq.items() if n >= 2}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(best)
        for i, (syms, n) in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, n)
    return merges


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps in the sun",
    "quick brown foxes are quick and brown",
    "low lower lowest newer newest wider widest",
    "low low low low low lower lower newer newer newest",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])


def test_train_matches_bruteforce_reference(spark, corpus_df):
    wc = tok.word_counts(corpus_df, "text")
    table = [(r["word"], r["n"]) for r in wc.collect()]
    got = tok.train_bpe(wc, n_merges=40)["merges"]
    want = _ref_train(sorted(table, key=lambda wn: (-wn[1], wn[0])), 40)
    assert got == want


def test_training_is_partitioning_invariant(spark, corpus_df):
    a = tok.train_bpe(tok.word_counts(corpus_df, "text"), n_merges=25)
    b = tok.train_bpe(
        tok.word_counts(corpus_df.repartition(7), "text"), n_merges=25
    )
    assert a == b


def test_vocab_is_alphabet_plus_merges(corpus_df):
    model = tok.train_bpe(tok.word_counts(corpus_df, "text"), n_merges=10)
    n_alpha = len(model["vocab"]) - len(model["merges"])
    assert n_alpha > 0
    for (a, b), v in zip(model["merges"], model["vocab"][n_alpha:]):
        assert a + b == v


def test_encode_roundtrip_and_merge_consistency(spark, corpus_df):
    model = tok.train_bpe(tok.word_counts(corpus_df, "text"), n_merges=30)
    enc = tok.bpe_encode(corpus_df, model["merges"], "text").collect()
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in enc}
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    vocab = set(model["vocab"])
    for i, text in enumerate(CORPUS):
        toks = by_id[i]
        # lossless: concatenating tokens restores the normalized text
        assert "".join(toks).replace(tok.END_OF_WORD, " ").strip() == text
        # every token is in the learned vocab
        assert set(toks) <= vocab
        # fully merged: no adjacent pair within a word still has a rank
        word, words = [], []
        for t in toks:
            word.append(t)
            if t.endswith(tok.END_OF_WORD):
                words.append(word)
                word = []
        for w in words:
            for a, b in zip(w, w[1:]):
                assert (a, b) not in ranks


def test_encode_handles_null_empty_and_unseen(spark):
    model = tok.train_bpe([("aaab", 5), ("aab", 3)], n_merges=5)
    df = spark.createDataFrame(
        [(0, "aaab aab"), (1, ""), (2, None), (3, "zzz")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["bpe_tokens"]
            for r in tok.bpe_encode(df, model["merges"], "text").collect()}
    assert rows[1] == []
    assert rows[2] is None
    # unseen chars fall back to character symbols
    assert rows[3] == ["z", "z", "z", tok.END_OF_WORD] or "".join(rows[3]) == "zzz" + tok.END_OF_WORD


def test_word_counts_min_count_and_cap(spark, corpus_df):
    wc_all = tok.word_counts(corpus_df, "text")
    wc_min = tok.word_counts(corpus_df, "text", min_count=3)
    assert wc_min.count() < wc_all.count()
    assert wc_min.agg(F.min("n")).first()[0] >= 3
    top2 = tok.word_counts(corpus_df, "text", max_words=2).collect()
    assert len(top2) == 2
    full = sorted(
        ((r["word"], r["n"]) for r in wc_all.collect()),
        key=lambda wn: (-wn[1], wn[0]),
    )
    assert sorted(((r["word"], r["n"]) for r in top2),
                  key=lambda wn: (-wn[1], wn[0])) == full[:2]


def test_token_count_on_documents(spark):
    from cnosdb_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents").limit(200)
    model = tok.train_bpe(
        tok.word_counts(docs, "text", min_count=2, max_words=2000), n_merges=50
    )
    out = tok.bpe_token_count(docs, model["merges"], "text")
    row = out.agg(F.min("n_bpe_tokens"), F.max("n_bpe_tokens")).first()
    assert row[0] >= 0 and row[1] > 0
    # BPE can never use more symbols than chars+1 per word
    chars = docs.select(F.length("text").alias("c"), F.col("doc_id")).collect()
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in out.collect()}
    by_id = {r["doc_id"]: r["c"] for r in chars}
    for did, n in counts.items():
        assert n <= 2 * (by_id[did] + 1)


# ------------------------------------------------------------ persistence
def test_bpe_save_load_roundtrip(tmp_path, spark):
    model = tok.train_bpe([("banana", 9), ("bandana", 4), ("cabana", 2)], n_merges=12)
    p = str(tmp_path / "bpe.json")
    tok.save_bpe(p, model, params={"n_merges": 12})
    loaded = tok.load_bpe(p)
    assert loaded["merges"] == model["merges"]
    assert loaded["vocab"] == model["vocab"]
    assert loaded["params"] == {"n_merges": 12}
    df = spark.createDataFrame([(0, "banana cabana")], ["doc_id", "text"])
    a = tok.bpe_encode(df, model["merges"], "text").first()["bpe_tokens"]
    b = tok.bpe_encode(df, loaded["merges"], "text").first()["bpe_tokens"]
    assert a == b


def test_load_bpe_rejects_foreign_json(tmp_path):
    p = str(tmp_path / "x.json")
    with open(p, "w") as f:
        f.write('{"merges": []}')
    with pytest.raises(ValueError, match="not a cnosdb_spark BPE model"):
        tok.load_bpe(p)


# -------------------------------------------------------------- fuzzing
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_WORD = st.text(
    alphabet=st.sampled_from("abcdéß日"), min_size=1, max_size=8
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    table=st.dictionaries(_WORD, st.integers(min_value=1, max_value=50),
                          min_size=1, max_size=25),
    n_merges=st.integers(min_value=0, max_value=30),
)
def test_fuzz_train_matches_bruteforce(table, n_merges):
    """Incremental pair bookkeeping == recount-everything reference on
    arbitrary (unicode) word tables — any drift in tie-breaks, stale
    index handling or pair accounting shows up here."""
    items = list(table.items())
    got = tok.train_bpe(items, n_merges=n_merges)["merges"]
    want = _ref_train(sorted(items, key=lambda wn: (-wn[1], wn[0])), n_merges)
    assert got == want
    # encoding with the learned merges always reconstructs each word
    ranks = {p: i for i, p in enumerate(got)}
    for w, _ in items:
        toks = tok._encode_word(w, ranks)
        assert "".join(toks) == w + tok.END_OF_WORD
