"""Corpus-statistics scoring operators for training-data pipelines:
TF-IDF keyword extraction, BM25 relevance, and a self-trained unigram
language-model quality score.

Not part of the reference surface (CnosDB is a TSDB); these extend the
document-pipeline family (operators/text.py) with the corpus-level
signals a curation pipeline ranks and filters on.

All three share one shape: a (doc, term) frequency table built from the
same whitespace tokenization as operators.text (lockstep with the DuckDB
oracle's ``string_split_regex(trim(lower(text)), '\\s+')``), then small
per-term statistics joined back.  At 100 TB the (doc, term) explode is
the dominant cost — one shuffle keyed by (doc, term) with map-side
combine; the per-term table is vocabulary-sized (orders of magnitude
smaller than the corpus) and every scalar (N, avgdl, total tokens) is a
one-row aggregate carried via a broadcast cross join, never a
``.collect()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import normalize, tokens


def doc_terms(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc, term, tf) table: normalized whitespace tokens, one row per
    distinct term per doc with its in-doc frequency.  The groupBy is the
    one unavoidable shuffle; partial aggregation (map-side combine)
    collapses repeats before the exchange."""
    return (
        df.select(F.col(id_col).alias("_doc"), F.explode(tokens(normalize(F.col(text_col)))).alias("term"))
        .groupBy("_doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf_topk_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((1+N)/(1+df)) + 1 — the scikit-learn smoothing, chosen
    because it never divides by zero and is exactly reproducible in ANSI
    SQL).  Ties break on term asc for determinism.

    Output: (doc_id, term, tf, tfidf, rank), rank 1..k.

    Scale: document frequency is a vocabulary-sized aggregate over the
    already-distinct (doc, term) table — no extra ``distinct``.  N rides
    in on a broadcast one-row cross join.  The final top-k is one window
    per doc partition (single hash exchange on doc).
    """
    dt = doc_terms(df, text_col, id_col)
    df_t = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_t = df_t.filter(F.col("df") >= min_df)
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        dt.join(df_t, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((1 + F.col("_n")) / (1 + F.col("df"))) + 1),
        )
    )
    w = Window.partitionBy("_doc").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_doc").alias(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms
    (Robertson/Sparck-Jones idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Output: (doc_id, bm25) for docs matching ≥1 query term.

    Scale: the query-term list is a literal filter pushed into the
    (doc, term) table before any join — only matching rows shuffle.  Doc
    lengths and avgdl are one narrow aggregate; avgdl broadcasts as a
    one-row cross join.  df-per-query-term is at most ``len(query_terms)``
    rows — broadcast.
    """
    dt = doc_terms(df, text_col, id_col).filter(F.col("term").isin(*query_terms))
    lens = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.size(tokens(normalize(F.col(text_col)))).cast("double").alias("dl"),
        )
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    avgdl = lens.select(F.avg("dl").alias("_avgdl"))
    df_t = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        dt.join(F.broadcast(df_t), "term")
        .join(lens, "_doc")
        .join(F.broadcast(n_docs))
        .join(F.broadcast(avgdl))
        .withColumn(
            "_idf",
            F.log(1 + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))),
        )
    )
    return (
        scored.groupBy("_doc")
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .select(F.col("_doc").alias(id_col), "bm25")
    )


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Self-trained unigram language-model fluency score: train add-k
    smoothed unigram probabilities on the corpus itself, then score each
    document by its mean token log10-probability.  Repetitive/boilerplate
    text (tokens drawn from the corpus head) scores high; random or
    garbled text (rare tokens) scores low — the classic cheap perplexity
    proxy when no external LM is available.

    p(w) = (C(w) + add_k) / (T + add_k·V);  lm_logprob = Σ tf·log10 p(w) / Σ tf.

    Output: (doc_id, n_tokens, lm_logprob); empty docs get NULL lm_logprob.

    Scale: the LM "training" is the vocabulary-sized term-count aggregate;
    the scoring join is (doc, term) ⋈ vocab on term — a shuffle hash join
    whose skew (stopwords appear in every doc) stays bounded because the
    build side is one row per term.  T and V broadcast as a one-row
    aggregate.  Two passes over the token table, zero driver collection.
    """
    dt = doc_terms(df, text_col, id_col)
    counts = dt.groupBy("term").agg(F.sum("tf").alias("cw"))
    totals = counts.select(
        F.sum("cw").alias("_t"), F.count(F.lit(1)).alias("_v")
    )
    scored = (
        dt.join(counts, "term")
        .join(F.broadcast(totals))
        .withColumn(
            "_lp",
            F.col("tf")
            * F.log10((F.col("cw") + add_k) / (F.col("_t") + add_k * F.col("_v"))),
        )
    )
    per_doc = scored.groupBy("_doc").agg(
        F.sum("tf").alias("n_tokens"), F.sum("_lp").alias("_lp_sum")
    )
    all_docs = df.select(F.col(id_col).alias("_doc"))
    return (
        all_docs.join(per_doc, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.round(F.col("_lp_sum") / F.col("n_tokens"), 6).alias("lm_logprob"),
        )
    )
