from . import anomaly, bucketing, curation, dedup, downsample, multimodal, quality_model, rollup, scoring, similarity, skew, temporal, text, tokenizer, zorder  # noqa: F401
