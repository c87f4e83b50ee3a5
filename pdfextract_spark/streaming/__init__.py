from .extract_stream import extract_stream, start_extract_stream
from .html_stream import html_strip_stream, start_html_strip_stream
from .hygiene_stream import hygiene_stream, start_hygiene_stream

__all__ = [
    "extract_stream",
    "start_extract_stream",
    "html_strip_stream",
    "start_html_strip_stream",
    "hygiene_stream",
    "start_hygiene_stream",
]
