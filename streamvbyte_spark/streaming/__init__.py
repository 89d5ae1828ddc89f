from .encode_stream import (decode_token_stream, encode_token_stream,  # noqa: F401
                            windowed_event_counts)
from .pack_assign import pack_assign_stream  # noqa: F401
