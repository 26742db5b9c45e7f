from . import anomaly, categorical, dedup, dtype, missing, range_validity, similarity

__all__ = [
    "anomaly",
    "categorical",
    "dedup",
    "dtype",
    "missing",
    "range_validity",
    "similarity",
]
