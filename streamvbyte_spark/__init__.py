"""streamvbyte-spark: PySpark-native per-column lightweight-compression engine.

Public API surface (the Spark-first equivalent of the reference C API at
/root/reference/include/streamvbyte.h — see README.md coverage map):

    from streamvbyte_spark import (
        get_spark,            # tuned SparkSession factory
        encode_table,         # tokens -> encoded + lineage (mapInArrow)
        decode_table,         # encoded -> tokens (bit-identical)
        verify_roundtrip,     # full-outer-join equality check
        codecs,               # single-array codec registry (NumPy level)
    )

Array-level kernels live in ``streamvbyte_spark.codec`` (core/batched),
training-pipeline queries in ``streamvbyte_spark.queries``.
"""

from .codec import select as _select
from .operators import decode_table, encode_table, verify_roundtrip  # noqa: F401
from .session import get_spark  # noqa: F401

codecs = _select.REGISTRY

__all__ = ["get_spark", "encode_table", "decode_table", "verify_roundtrip", "codecs"]
__version__ = "0.1.0"
