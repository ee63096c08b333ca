from . import scalars, text, dedup, similarity, multimodal

__all__ = ["scalars", "text", "dedup", "similarity", "multimodal"]
