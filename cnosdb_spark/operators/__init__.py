from . import curation, dedup, multimodal, rollup, scoring, similarity, temporal, text  # noqa: F401
