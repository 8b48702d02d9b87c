from . import (
    checks,
    dedup,
    drift,
    multimodal,
    packing,
    rowpred,
    similarity,
    stats,
    temporal,
    text,
)

__all__ = [
    "checks",
    "dedup",
    "drift",
    "multimodal",
    "packing",
    "rowpred",
    "similarity",
    "stats",
    "temporal",
    "text",
]
