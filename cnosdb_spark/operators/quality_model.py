"""Model-based document-quality filtering (the CCNet / GPT-3 pipeline
pattern: a linear classifier scores every document against a small
high-quality seed corpus, and the score gates what enters training data).

Not in the reference surface — this is the trainable counterpart of the
heuristic ``text.with_text_stats`` quality score, added as a first-class
pipeline operator.  Spark-first: feature extraction is JVM-side column
expressions + ``HashingTF`` over whitespace tokens (no Python UDF),
training is MLlib ``LogisticRegression`` (distributed L-BFGS — one pass
architecture over any corpus size), scoring is a single narrow
``model.transform`` that parallelizes over input splits.

Scale notes:

- ``HashingTF`` is stateless (no vocabulary fit/broadcast), so the same
  featurizer works on 100 TB without a driver-side dictionary.
- The trained model is a single weight vector (numFeatures + stats
  features) — effectively free to broadcast to executors at scoring time.
- Training data is typically tiny vs. the scoring corpus (a seed corpus
  of "good" docs + a sample of the raw pool); score-time cost is the
  feature projection only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import with_text_stats

#: numeric per-document statistics fed to the classifier alongside the
#: hashed token frequencies (all produced by text.with_text_stats)
STAT_FEATURES = [
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
    "stopword_ratio",
    "mean_word_len",
]


def _featurize_df(df: DataFrame, text_col: str) -> DataFrame:
    out = with_text_stats(df, text_col)
    # log-scaled length: raw char counts would dominate the scaled stats
    out = out.withColumn("log_len", F.log1p(F.col("n_chars_c").cast("double")))
    return out.withColumn(
        "_words", F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )


def build_quality_pipeline(
    text_col: str = "text",
    num_features: int = 4096,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """MLlib Pipeline: HashingTF(token frequencies) + standardized text
    statistics -> LogisticRegression.  Returned unfitted — call
    ``.fit(featurized_training_df)`` or use ``train_quality_classifier``.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, StandardScaler, VectorAssembler

    tf = HashingTF(
        inputCol="_words", outputCol="_tf", numFeatures=num_features, binary=True
    )
    stats = VectorAssembler(
        inputCols=STAT_FEATURES + ["log_len"], outputCol="_stats_raw"
    )
    scaler = StandardScaler(
        inputCol="_stats_raw", outputCol="_stats", withMean=False, withStd=True
    )
    feats = VectorAssembler(inputCols=["_tf", "_stats"], outputCol="features")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,  # stats already scaled; TF is binary
    )
    return Pipeline(stages=[tf, stats, scaler, feats, lr])


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    num_features: int = 4096,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the quality classifier: ``positive`` = high-quality seed docs
    (label 1), ``negative`` = raw-pool sample (label 0).  Returns the
    fitted PipelineModel."""
    train = _featurize_df(
        positive.select(F.col(text_col)).withColumn("label", F.lit(1.0)).unionByName(
            negative.select(F.col(text_col)).withColumn("label", F.lit(0.0))
        ),
        text_col,
    )
    # Pipeline.fit makes one full pass per fitted stage (StandardScaler
    # fit, then LogisticRegression instance extraction) — without this
    # persist each pass re-runs the text-stats Arrow kernel and the
    # callers' corruption regexes over the whole training corpus. Scoped
    # strictly to the fit (unpersisted before returning); identical
    # inputs reach every stage, so the fitted weights are unchanged.
    train = train.persist()
    try:
        return build_quality_pipeline(
            text_col, num_features, reg_param, max_iter
        ).fit(train)
    finally:
        train.unpersist()


def score_quality(
    df: DataFrame, model, text_col: str = "text", out_col: str = "quality_prob"
) -> DataFrame:
    """Score every document with P(high quality) from a fitted model.
    Narrow map over input splits (feature projection + dot product); the
    model weights broadcast once."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurize_df(df, text_col))
    keep = df.columns
    return scored.select(
        *keep,
        F.round(vector_to_array("probability")[1], 6).alias(out_col),
    )


def save_quality_model(model, path: str) -> None:
    """Persist a fitted quality PipelineModel (MLlib's native parquet
    layout — executor-readable, no driver pickling).  Train once on the
    curated seed, score every future crawl batch from the saved model:
    retraining per batch would silently drift the quality bar between
    batches of the same corpus."""
    model.write().overwrite().save(path)


def load_quality_model(path: str):
    """Load a ``save_quality_model`` artifact; scoring through a loaded
    model is byte-identical to the in-session one (pinned by test)."""
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)


def filter_by_quality(
    df: DataFrame,
    model,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose model quality probability clears ``threshold``
    — the gating step of the CCNet/GPT-3 pipeline.  The probability
    column rides along for downstream mixing (e.g. quality-bucketed
    ``mixture_sample``)."""
    return score_quality(df, model, text_col).filter(
        F.col("quality_prob") >= threshold
    )
