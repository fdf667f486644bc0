"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination and deterministic dataset splits.

Not part of the reference surface (CnosDB is a TSDB); these extend the
engine's LLM-pipeline family (dedup.py, text.py, similarity.py). Both are
pure built-in-function plans — no Python UDFs — and deterministic, so
they are DuckDB-differential-testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_ngrams
from .text import normalize, tokens


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs that share any word
    ``n``-gram with a benchmark/eval set (the industry-standard 8-gram
    overlap rule for held-out-set leakage).

    Scale shape: the benchmark n-gram set is small relative to the corpus
    (eval suites are MBs, the corpus is TBs) — it is deduplicated and
    BROADCAST, so the corpus-side probe is a map-side hash join: the
    corpus shingle table is never shuffled, and only matched (doc,
    shingle) rows reach the per-doc count aggregation. Docs shorter than
    ``n`` words shingle to their whole text (word_ngrams semantics), so
    short benchmark prompts still match verbatim copies.

    Output: (id_col, matched_ngrams BIGINT, contaminated BOOLEAN) — one
    row per corpus doc, zero-match docs included.
    """
    bench_text_col = bench_text_col or text_col
    corpus_sh = corpus.select(
        F.col(id_col).alias("_id"), tokens(normalize(F.col(text_col))).alias("_toks")
    ).select("_id", F.explode(word_ngrams(F.col("_toks"), n)).alias("_sh"))
    bench_sh = (
        benchmark.select(tokens(normalize(F.col(bench_text_col))).alias("_toks"))
        .select(F.explode(word_ngrams(F.col("_toks"), n)).alias("_sh"))
        .distinct()
    )
    matched = (
        corpus_sh.join(F.broadcast(bench_sh), "_sh")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("matched_ngrams"))
    )
    return (
        corpus.select(F.col(id_col).alias("_id"))
        .join(matched, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("matched_ngrams"), F.lit(0)).alias("matched_ngrams"),
            (F.coalesce(F.col("matched_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_dataset(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash: bucket = first 8 hex digits of md5(salt || id) as a fraction of
    2^32, assigned to the first split whose cumulative weight exceeds it.

    Pure column expression — no shuffle, no RNG state, stable across
    re-runs and partitionings (the property a 100 TB pipeline needs:
    re-processing a shard cannot move a doc between splits). Weights are
    normalized; iteration order of the dict fixes the cumulative order.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    frac = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = frac < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
