from . import curation, dedup, multimodal, scoring, similarity, temporal, text  # noqa: F401
