from . import (
    anomaly,
    c4_filter,
    categorical,
    dedup,
    dtype,
    encoding,
    formats,
    missing,
    multimodal,
    range_validity,
    repetition,
    similarity,
)

__all__ = [
    "anomaly",
    "c4_filter",
    "categorical",
    "dedup",
    "dtype",
    "encoding",
    "formats",
    "missing",
    "multimodal",
    "range_validity",
    "repetition",
    "similarity",
]
