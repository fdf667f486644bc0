"""Distributed BPE tokenizer training + encoding for training-data
pipelines.

Not part of the reference surface (CnosDB is a TSDB); this is a
document-pipeline operator the engine adds as a first-class citizen,
shaped for the 100 TB case:

- the HEAVY part — counting word frequencies over the corpus — is one
  distributed aggregation (`word_counts`: tokenize → explode → groupBy,
  map-side partial aggregation applies);
- BPE merge learning runs on the *aggregated word-frequency table*, the
  standard architecture (HuggingFace `tokenizers`, SentencePiece and the
  original Sennrich et al. 2016 implementation all train from a
  word→count dict, never from raw text): the distinct-word table of even
  a 100 TB corpus is bounded (and explicitly capped here via
  ``min_count`` / ``max_words``), so it is collected driver-side under a
  documented contract, like the IVF centroid/codebook tables in
  operators/similarity.py;
- encoding the corpus (`bpe_encode`) is a narrow Arrow-batched pandas
  UDF over a broadcast merge-rank dict with a per-batch word cache —
  no shuffle, linear scan, embarrassingly parallel.

Merge selection is fully deterministic: ties on pair frequency break on
the lexicographically smallest pair, so training is reproducible across
runs, partitionings and engines.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

END_OF_WORD = "</w>"


# --------------------------------------------------------------- counting
def word_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
    max_words: int | None = None,
) -> DataFrame:
    """Distributed word-frequency table: whitespace tokenize, explode, one
    keyed aggregation → (word, n). This is the only corpus-scale pass of
    BPE training. ``min_count`` drops the long hapax tail (at 100 TB the
    tail dominates the distinct-word table but contributes no merges worth
    learning); ``max_words`` keeps the most frequent N words
    (count-desc, word-asc deterministic tie-break)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = F.split(F.trim(t), r"\s+")
    out = (
        df.select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    if max_words is not None:
        # deterministic top-N: a single global sort-limit (TakeOrdered —
        # no full shuffle; each partition contributes its local top-N)
        out = out.orderBy(F.col("n").desc(), F.col("word").asc()).limit(max_words)
    return out


# --------------------------------------------------------------- training
def _word_to_symbols(word: str) -> tuple[str, ...]:
    return (*word, END_OF_WORD)


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    merged = pair[0] + pair[1]
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    counts: DataFrame | list[tuple[str, int]],
    n_merges: int = 1000,
) -> dict:
    """Learn BPE merges from a word-frequency table (the output of
    ``word_counts`` or an equivalent [(word, count)] list).

    Classic Sennrich et al. 2016 algorithm: start from characters +
    end-of-word marker, repeatedly merge the most frequent adjacent symbol
    pair (frequency weighted by word count), ``n_merges`` times or until
    no pair occurs twice. Deterministic: frequency ties break on the
    lexicographically smallest pair.

    Best-pair selection uses a lazy max-heap with stale-entry skipping
    (the standard BPE-trainer structure): each merge costs
    O(affected words + log live-pairs) instead of a full O(live pairs)
    scan, so n_merges=32k over a million-word table stays tractable.

    Returns {"merges": [(a, b), ...], "vocab": [token, ...]} where vocab
    is the base alphabet plus one token per merge, in learn order."""
    import heapq

    if isinstance(counts, DataFrame):
        rows = counts.select("word", "n").collect()
        table = [(r["word"], int(r["n"])) for r in rows]
    else:
        table = [(w, int(n)) for w, n in counts]
    # canonical order so incremental dict updates are reproducible
    table.sort(key=lambda wn: (-wn[1], wn[0]))

    words: list[tuple[str, ...]] = [_word_to_symbols(w) for w, _ in table]
    freqs: list[int] = [n for _, n in table]

    # pair → aggregate frequency, and pair → set of word indexes containing
    # it (so a merge only rescans affected words, not the whole table)
    pair_freq: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    # lazy max-heap of (-freq, pair); entries go stale when a merge changes
    # a pair's frequency — the pop loop discards any entry whose recorded
    # freq no longer matches pair_freq. heapq is a min-heap, so (-freq,
    # pair) pops the highest frequency, ties broken on the lexicographically
    # smallest pair — identical ordering to the full-scan argmax.
    heap: list[tuple[int, tuple[str, str]]] = []

    def _add_word(idx: int, sign: int) -> None:
        syms, n = words[idx], freqs[idx]
        for a, b in zip(syms, syms[1:]):
            new = pair_freq.get((a, b), 0) + sign * n
            if new > 0:
                pair_freq[(a, b)] = new
            else:
                pair_freq.pop((a, b), None)
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(idx)
                heapq.heappush(heap, (-new, (a, b)))
            # decreases leave a stale (too-large) heap entry; the pop loop
            # skips it because pair_freq no longer matches

    for i in range(len(words)):
        _add_word(i, +1)
    heap = [(-n, p) for p, n in pair_freq.items()]
    heapq.heapify(heap)

    alphabet = sorted({s for w in words for s in w})
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best: tuple[str, str] | None = None
        while heap:
            negn, p = heap[0]
            cur = pair_freq.get(p, 0)
            if cur != -negn:
                heapq.heappop(heap)
                if cur > 1:
                    heapq.heappush(heap, (-cur, p))  # refresh, re-sift
                continue
            if cur <= 1:  # a pair must occur at least twice to merge
                heapq.heappop(heap)
                continue
            best = p
            break
        if best is None:
            break
        merges.append(best)
        for idx in sorted(pair_words.pop(best, ())):
            _add_word(idx, -1)
            words[idx] = _merge_word(words[idx], best)
            _add_word(idx, +1)
        pair_freq.pop(best, None)

    return {"merges": merges, "vocab": alphabet + [a + b for a, b in merges]}


# --------------------------------------------------------------- encoding
def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(_word_to_symbols(word))
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with the learned merges → array<string>
    column of BPE tokens. Arrow-batched pandas UDF (never row-at-a-time);
    the merge-rank dict rides the closure (broadcast once per executor)
    and a per-batch word→tokens cache collapses the Zipf head, so the
    per-row cost is dominated by *distinct* words in the batch."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, list[str]] = {}
        for batch in texts:
            out = []
            for txt in batch:
                if txt is None:
                    out.append(None)
                    continue
                toks: list[str] = []
                norm = txt.lower() if lowercase else txt
                for w in norm.split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    toks.extend(got)
                out.append(toks)
            yield pd.Series(out)

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document BPE token count (the budgeting input for sequence
    packing / mixture weighting).

    Counts inside the UDF instead of size(bpe_encode(...)): only an
    int64 per document crosses the Python→JVM boundary, not the full
    token array (which for counting is serialized and immediately
    discarded). The per-batch word→len cache collapses the Zipf head
    exactly like ``bpe_encode``'s word→tokens cache; a NULL document
    yields NULL, matching size(NULL array) under this engine's session
    config.

    Deliberately NOT spread_small_input-repartitioned (measured r10): the
    per-batch word→len cache collapses the Zipf head, so splitting a
    small corpus across 32 workers re-encodes the same frequent words in
    every task and costs more than the parallelism buys."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.LongType())
    def _count(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, int] = {}
        for batch in texts:
            out: list[int | None] = []
            for txt in batch:
                if txt is None:
                    out.append(None)
                    continue
                norm = txt.lower() if lowercase else txt
                n = 0
                for w in norm.split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = len(_encode_word(w, ranks))
                    n += got
                out.append(n)
            yield pd.Series(out, dtype="object")

    return df.withColumn(out_col, _count(F.col(text_col)))


# ------------------------------------------------------------ persistence
def save_bpe(path: str, model: dict, params: dict | None = None) -> None:
    """Persist a trained BPE model (merges + vocab + build params) as
    JSON — the tokenizer analogue of similarity.save_ann_index: token
    counts baked into a packed/exported corpus are meaningless without
    the exact merge table that produced them, so the model is written
    next to the data it tokenized. Unicode round-trips exactly
    (ensure_ascii json escapes)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "format": "cnosdb_spark.bpe",
                "version": 1,
                "merges": [list(p) for p in model["merges"]],
                "vocab": model["vocab"],
                "params": params or {},
            },
            f,
        )


def load_bpe(path: str) -> dict:
    """Load a save_bpe model; merges come back as the tuples train_bpe
    produces so bpe_encode(load_bpe(p)["merges"]) is identical to
    encoding with the in-memory model."""
    import json

    with open(path) as f:
        data = json.load(f)
    if data.get("format") != "cnosdb_spark.bpe":
        raise ValueError(f"not a cnosdb_spark BPE model: {path}")
    return {
        "merges": [tuple(p) for p in data["merges"]],
        "vocab": data["vocab"],
        "params": data.get("params", {}),
    }
