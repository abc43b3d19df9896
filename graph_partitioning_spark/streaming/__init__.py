from .arrivals import run_streaming_arrivals  # noqa: F401
from .sessionize import sessionize_stream  # noqa: F401
from .windows import windowed_event_counts  # noqa: F401
