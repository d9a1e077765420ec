from . import dedup, multimodal, pipeline, sampling, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal", "pipeline", "sampling"]
