from . import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
