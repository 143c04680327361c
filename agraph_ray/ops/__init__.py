from . import dedup, multimodal, similarity, text  # noqa: F401

__all__ = ["dedup", "multimodal", "similarity", "text"]
