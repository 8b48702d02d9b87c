from . import (
    checks,
    decontam,
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
    "decontam",
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
