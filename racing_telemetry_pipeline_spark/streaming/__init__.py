from .stream_pipeline import streaming_route, streaming_tool_stats

__all__ = ["streaming_route", "streaming_tool_stats"]
