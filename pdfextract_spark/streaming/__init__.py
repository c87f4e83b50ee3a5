from .extract_stream import extract_stream, start_extract_stream

__all__ = ["extract_stream", "start_extract_stream"]
