from .encode import (decode_table, decode_table_prefix,  # noqa: F401
                     encode_table, size_table, verify_roundtrip)
