from . import curation, dedup, similarity, temporal, text, multimodal  # noqa: F401
