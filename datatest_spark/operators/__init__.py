from . import checks, dedup, drift, multimodal, rowpred, similarity, stats, text

__all__ = ["checks", "dedup", "drift", "multimodal", "rowpred", "similarity", "stats", "text"]
