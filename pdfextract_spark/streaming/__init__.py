from .extract_stream import extract_stream, start_extract_stream
from .html_stream import html_strip_stream, start_html_strip_stream

__all__ = ["extract_stream", "start_extract_stream"]
