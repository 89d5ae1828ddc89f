from .encode_stream import encode_token_stream, windowed_event_counts  # noqa: F401
