"""Large-scale data-pipeline operators (beyond the reference's surface):
text analysis, deduplication, similarity search, multimodal plumbing."""

from . import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
