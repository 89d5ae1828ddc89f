from .encode import (decode_table, decode_table_prefix,  # noqa: F401
                     encode_table, size_table, verify_roundtrip)
from .packing import (decode_packs, pack_tokens_encoded)  # noqa: F401
