from . import curation, dedup, similarity, text, multimodal  # noqa: F401
