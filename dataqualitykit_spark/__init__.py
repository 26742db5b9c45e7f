"""dataqualitykit_spark — PySpark-native web-text quality-filter engine.

A from-scratch re-imagination of karrabi/DataQualityKit's per-column
check/fix library as a partition-parallel keep/drop + scrub pipeline over
Common-Crawl-style page tables (see SURVEY.md for the full blueprint and
reference citations).
"""

from .config import DEFAULT_CONFIG, PipelineConfig
from .pipeline import dataset_card, quality_metrics, run_pipeline
from .session import get_spark

__all__ = [
    "DEFAULT_CONFIG",
    "PipelineConfig",
    "dataset_card",
    "get_spark",
    "quality_metrics",
    "run_pipeline",
]

__version__ = "0.1.0"
