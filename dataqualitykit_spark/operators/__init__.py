from . import (
    anomaly,
    categorical,
    dedup,
    dtype,
    encoding,
    formats,
    missing,
    multimodal,
    range_validity,
    similarity,
)

__all__ = [
    "anomaly",
    "categorical",
    "dedup",
    "dtype",
    "encoding",
    "formats",
    "missing",
    "multimodal",
    "range_validity",
    "similarity",
]
