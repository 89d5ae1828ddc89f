"""Arrow-vectorized text-analysis math for the dedup queries.

``dedup_simhash`` needs a 32-bit SimHash per document whose BIGINT value is
identical to the DuckDB oracle's SQL fold.  The SQL formulation on the Spark
side was 32 separate ``aggregate(tokens, ...)`` lambdas — one interpreted
CodegenFallback pass over the full token array PER BIT (the exact anti-pattern
CLAUDE.md forbids in hot paths; ~32x the cost of one vectorized pass).  This
pandas UDF computes the identical integers as one numpy bit-matrix reduction
per Arrow batch, mirroring how ``embedding_udfs`` replaced the
``aggregate(zip_with(...))`` dot products.

Definition (functions/pipeline_sql.q_dedup_simhash, both dialects):
  h(t)    = (SIMHASH_A * t + SIMHASH_B) mod MINHASH_P          (exact BIGINT)
  bit_k   = 1  iff  sum over tokens of (2 * bit_k(h(t)) - 1) > 0
  simhash = sum over k of bit_k << k,   k in [0, SIMHASH_BITS)

All intermediates fit int64: SIMHASH_A * t < 2^63 for int32 tokens, and the
per-bit vote sum is bounded by n_tok.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# pipeline_sql is the single source of truth for the constants (the DuckDB
# oracle renders the same numbers as SQL text)
from .pipeline_sql import MINHASH_P as SIMHASH_P
from .pipeline_sql import SIMHASH_A, SIMHASH_B, SIMHASH_BITS

_BIT_WEIGHTS = (np.int64(1) << np.arange(SIMHASH_BITS, dtype=np.int64))
_BIT_SHIFTS = np.arange(SIMHASH_BITS, dtype=np.int64)


def simhash_batch(lens: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """SimHash per row over flattened tokens (int64[R] out).

    Rows with zero tokens hash to 0 (every bit's vote sum is 0, not > 0) —
    the same value the SQL fold produces for an empty array."""
    R = lens.size
    out = np.zeros(R, dtype=np.int64)
    if flat.size == 0:
        return out
    offsets = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    h = (SIMHASH_A * flat.astype(np.int64) + SIMHASH_B) % SIMHASH_P
    # (V, 32) vote matrix in int8 (+1 / -1), reduced per row in int64
    votes = (((h[:, None] >> _BIT_SHIFTS) & 1) * 2 - 1).astype(np.int8)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    if not nonempty.any():
        return out
    sums = np.add.reduceat(votes, starts[nonempty], axis=0, dtype=np.int64)
    out[nonempty] = (sums > 0) @ _BIT_WEIGHTS
    return out


@pandas_udf(LongType())
def doc_simhash(tokens: pd.Series) -> pd.Series:
    arrs = [np.asarray(t, dtype=np.int64) for t in tokens]
    lens = np.array([a.size for a in arrs], dtype=np.int64)
    flat = np.concatenate(arrs) if arrs else np.zeros(0, np.int64)
    return pd.Series(simhash_batch(lens, flat))


@pandas_udf(LongType())
def doc_fingerprint(tokens: pd.Series) -> pd.Series:
    """Round-trip polynomial fingerprint of a token array, identical to the
    SQL fold queries._FP_BODY (vectorized: codec.batched.fingerprint_rows).
    For tokens produced by a JVM-side stage (JSONL reader, groupBy
    reassembly) where no decode kernel exists to fuse the fold into; decode
    paths use the kernels' fingerprint=True mode instead."""
    from ..codec.batched import fingerprint_rows
    arrs = [np.asarray(t, dtype=np.int64) for t in tokens]
    lens = np.array([a.size for a in arrs], dtype=np.int64)
    flat = np.concatenate(arrs) if arrs else np.zeros(0, np.int64)
    offsets = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return pd.Series(fingerprint_rows(flat, offsets))


def register_text_udfs(spark: SparkSession) -> None:
    """Register the text-analysis UDFs under stable SQL names."""
    spark.udf.register("doc_simhash", doc_simhash)
    spark.udf.register("doc_fingerprint", doc_fingerprint)
