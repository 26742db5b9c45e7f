from .quality_stream import streaming_quality_filter, streaming_quality_metrics

__all__ = ["streaming_quality_filter", "streaming_quality_metrics"]
