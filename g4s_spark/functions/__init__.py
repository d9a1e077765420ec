from . import dedup, multimodal, pipeline, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal", "pipeline"]
