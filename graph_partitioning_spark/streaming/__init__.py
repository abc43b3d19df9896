from .arrivals import run_streaming_arrivals  # noqa: F401
