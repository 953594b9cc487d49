from .grok import TOOL_CALL_PATTERN, EVENT_PATTERN, parse_text

__all__ = ["TOOL_CALL_PATTERN", "EVENT_PATTERN", "parse_text"]
