from .encode import decode_table, encode_table, verify_roundtrip  # noqa: F401
