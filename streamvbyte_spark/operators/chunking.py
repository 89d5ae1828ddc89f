"""Chunked encoding of long token sequences with delta `prev` chaining.

A 10^12-token document cannot be one encoded block; it is split into
fixed-size chunks, each an independent svb_delta stream resumable from an
out-of-band ``prev`` seed — exactly the reference's delta contract
(/root/reference/include/streamvbytedelta.h:17-29: decode takes (count,
prev)).  The chunk seam threading is THE window operator of this engine
(SURVEY.md §2.2): ``prev = lag(last_token_of_chunk) over (partition by doc_id
order by chunk_id)``.

Pipeline: chunk (slice + posexplode, no Python) -> window lag for prev ->
mapInArrow delta encode -> ... -> decode -> reassemble (groupBy + sorted
flatten).  At scale the window and the reassembly share the same
hash-partitioning on doc_id, so AQE plans a single shuffle for both.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNKED_ENC_SCHEMA = ("doc_id string, chunk_id int, n_tok int, prev long, "
                      "encoded binary, out_bytes bigint")


def chunk_tokens(df: DataFrame, chunk_size: int = 4096) -> DataFrame:
    """tokens -> (doc_id, chunk_id, chunk, prev). Empty docs yield no chunks."""
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(n_tok / {chunk_size}.0) as int) - 1), "
        f"i -> struct(i as chunk_id, slice(tokens, i * {chunk_size} + 1, {chunk_size}) as chunk))"
    )
    exploded = (df.where(F.col("n_tok") > 0)
                .select("doc_id", F.explode(chunks).alias("c"))
                .select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                        F.col("c.chunk").alias("chunk")))
    w = Window.partitionBy("doc_id").orderBy("chunk_id")
    return exploded.withColumn(
        "prev",
        F.lag(F.element_at("chunk", -1), 1, 0).over(w).cast("long"))


def encode_chunked_delta(chunked: DataFrame) -> DataFrame:
    """Each chunk -> independent svb_delta stream seeded at its prev."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..codec import batched
        from .encode import _binary_array, _list_to_flat
        for batch in batches:
            flat, offsets = _list_to_flat(batch.column(batch.schema.get_field_index("chunk")))
            prev = np.asarray(batch.column(batch.schema.get_field_index("prev")), dtype=np.int64)
            enc, eoff = batched.encode_delta_rows_prev(flat, offsets, prev)
            nr = offsets[1:] - offsets[:-1]
            yield pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("doc_id")),
                 batch.column(batch.schema.get_field_index("chunk_id")),
                 pa.array(nr.astype(np.int32), pa.int32()),
                 pa.array(prev, pa.int64()),
                 _binary_array(enc, eoff),
                 pa.array(eoff[1:] - eoff[:-1], pa.int64())],
                names=["doc_id", "chunk_id", "n_tok", "prev", "encoded", "out_bytes"])

    return chunked.mapInArrow(run, CHUNKED_ENC_SCHEMA)


def decode_chunked_delta(enc_df: DataFrame) -> DataFrame:
    """Decode chunks (each resumable from its stored prev, no cross-chunk
    dependency at decode time — chunks of one doc decode in parallel)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..codec import batched
        for batch in batches:
            col = batch.column(batch.schema.get_field_index("encoded"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bufs = col.buffers()
            off = np.frombuffer(bufs[1], dtype=np.int32)[
                col.offset:col.offset + len(col) + 1].astype(np.int64)
            data = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
            base = off[0]
            n_toks = np.asarray(batch.column(batch.schema.get_field_index("n_tok")), dtype=np.int64)
            prev = np.asarray(batch.column(batch.schema.get_field_index("prev")), dtype=np.int64)
            flat, offsets = batched.decode_delta_rows_prev(
                data[base:off[-1]], off - base, n_toks, prev)
            tok = pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), pa.int32()),
                pa.array(flat.view(np.int32), pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("doc_id")),
                 batch.column(batch.schema.get_field_index("chunk_id")),
                 tok],
                names=["doc_id", "chunk_id", "chunk"])

    return enc_df.mapInArrow(run, "doc_id string, chunk_id int, chunk array<int>")


def reassemble(decoded_chunks: DataFrame) -> DataFrame:
    """Chunks -> whole token arrays (order restored by chunk_id)."""
    return (decoded_chunks.groupBy("doc_id")
            .agg(F.flatten(F.array_sort(F.collect_list(
                F.struct("chunk_id", "chunk"))).getField("chunk")).alias("tokens"))
            .select("doc_id", "tokens", F.size("tokens").alias("n_tok")))


def decode_reassemble_fused(enc_df: DataFrame) -> DataFrame:
    """Decode + reassemble in ONE grouped stage (applyInPandas).

    The separate decode->reassemble pipeline must re-shuffle DECODED tokens
    (4 B/token) for the groupBy, because mapInArrow drops the partitioning
    guarantee.  Fusing moves the decode to AFTER the shuffle, so the wire
    carries the ENCODED bytes (~1.5 B/token at the auto codec's measured
    ratio) — ~2.6x less shuffle traffic, the difference that matters at
    10^12 tokens.  Chunks of one doc arrive as one group; each decodes from
    its stored prev (reference delta contract,
    /root/reference/include/streamvbytedelta.h:17-29) and concatenates in
    chunk_id order."""
    import pandas as pd

    def fuse(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        from ..codec import batched
        pdf = pdf.sort_values("chunk_id")
        bufs = pdf["encoded"].tolist()
        eoff = np.zeros(len(bufs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in bufs], out=eoff[1:])
        enc = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        flat, _ = batched.decode_delta_rows_prev(
            enc, eoff, pdf["n_tok"].to_numpy(np.int64),
            pdf["prev"].to_numpy(np.int64))
        return pd.DataFrame({"doc_id": [key[0]],
                             "tokens": [flat.view(np.int32)],
                             "n_tok": [np.int32(flat.size)]})

    return (enc_df.groupBy("doc_id")
            .applyInPandas(fuse, "doc_id string, tokens array<int>, n_tok int"))
