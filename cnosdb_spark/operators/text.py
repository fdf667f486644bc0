"""Text analysis operators for large-scale training-data pipelines.

Not part of the reference surface (CnosDB is a TSDB); these are the
document-pipeline operators this engine adds as first-class citizens.
All are pure built-in-function column expressions (JVM-side, whole-stage
codegen) — no Python UDFs — and all are deterministic so they can be
oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Chosen to be unambiguous tokens.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "und", "die", "das", "nicht", "ist", "ein"],
    "fr": ["le", "la", "les", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "una", "por", "como", "pero"],
}

STOPWORDS_EN = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "was", "with", "as", "at", "by", "be", "this", "are", "from",
]


def normalize(text: Column) -> Column:
    """Canonical whitespace/casing normalization shared by fingerprint +
    dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text. A content hash
    stable under whitespace/case perturbations."""
    return F.md5(normalize(text))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring statistics: length, token count, punctuation /
    digit / uppercase ratios, mean word length, stopword ratio, and a
    composite quality score in [0,1].
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[!-/:-@\[-`{-~]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_stop = F.size(
        F.filter(tokens(F.lower(t)), lambda w: w.isin(*STOPWORDS_EN))
    )
    mean_word_len = F.when(
        n_tokens > 0,
        F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens,
    ).otherwise(F.lit(0.0))

    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(0.0)
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)

    # Composite heuristic: reward stopword presence & sane word lengths,
    # punish punctuation/digit-heavy strings. Clamped to [0,1].
    quality = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(0.4) * F.least(F.lit(1.0), stop_ratio * 4)
            + F.lit(0.3) * F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.0)
            + F.lit(0.3) * (1 - F.least(F.lit(1.0), punct_ratio * 5 + digit_ratio * 2)),
        ),
    )
    return (
        df.withColumn("n_chars_c", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("digit_ratio", digit_ratio.cast("double"))
        .withColumn("upper_ratio", upper_ratio.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn("quality_score", quality.cast("double"))
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: count marker-stopword hits per language over
    the token set; argmax with deterministic tie-break (en > de > fr > es
    by marker count, then language code asc). 'und' when no marker hits."""
    toks = tokens(F.lower(F.col(text_col)))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        cnt = F.size(F.filter(toks, lambda w: w.isin(*markers)))
        scores.append(F.struct(cnt.alias("score"), F.lit(lang).alias("lang")))
    # greatest(struct) orders by score then lang — ties break to the
    # lexicographically larger code; invert lang for asc tie-break.
    best = F.greatest(*[
        F.struct(
            s["score"].alias("score"),
            # negate code ordering: map to reversed string for max()
            F.lit(-i).alias("prio"),
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ])
    return df.withColumn(
        out_col,
        F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"]),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-token-count windows — the
    retrieval/RAG chunker (stride = chunk_tokens - overlap; the final
    window may be short; empty docs yield no chunks).

    Pure column expressions: tokens once per row, chunk offsets from a
    ``sequence`` over starts, windows via ``slice`` + ``array_join`` —
    a narrow map (explode only multiplies rows by ceil(n/stride)), no
    shuffle, no UDF.  Output: (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(normalize(F.col(text_col)))
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(
            F.ceil((F.col("_n") - F.lit(overlap)) / stride).cast("long") - 1,
            F.lit(0).cast("long"),
        )
        * stride,
        F.lit(stride).cast("long"),
    )
    t = (
        df.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            F.col(id_col),
            "_toks",
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return t.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
