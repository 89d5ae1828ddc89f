"""Distributed encode/decode over the token table via mapInArrow.

The lifecycle (SURVEY.md §3.4): DataFrame -> optional explicit repartition
(range on doc_id, or salted for skewed sources) -> ``mapInArrow`` running the
whole-batch kernels of ``codec.batched`` -> encoded table with lineage
columns.  The JVM<->Python boundary is crossed exactly once per Arrow batch;
inside a batch there is no per-row Python (input_hint requirement).

Encoded schema:
  doc_id string, source string, n_tok int, codec string, encoded binary,
  in_bytes bigint, out_bytes bigint, checksum bigint, tok_min bigint,
  tok_max bigint

``checksum`` = per-row sum of token values (mod 2^63, vectorized) — cheap
lineage for resume verification; ``in_bytes`` = 4 * n_tok (raw uint32 bytes,
matching the reference perf harness's compressed-vs-raw framing,
/root/reference/tests/perf.c:87-89).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import batched

ENCODED_SCHEMA = (
    "doc_id string, source string, n_tok int, codec string, encoded binary, "
    "in_bytes bigint, out_bytes bigint, checksum bigint, "
    "tok_min bigint, tok_max bigint"
)
DECODED_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"
DECODED_FP_SCHEMA = "doc_id string, n_tok int, source string, fingerprint bigint"


def _list_to_flat(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (values, offsets) from an Arrow list array, slice-safe.

    Null token arrays are rejected explicitly: a null row has no defined
    byte-identical round-trip (the reference API has no null notion either —
    callers must filter or coalesce first)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("tokens column contains NULL arrays; "
                         "filter or coalesce to empty arrays before encoding")
    off = np.asarray(col.offsets, dtype=np.int64)
    vals = np.asarray(col.values, dtype=np.int32)
    base = off[0]
    return vals[base:off[-1]].view(np.uint32), off - base


def _flat_binary(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (flat uint8 values, int64 offsets) of an Arrow binary
    array, slice-safe: rebases the slice's offset window so offsets[0] == 0.
    THE canonical extraction — decode_table, decode_table_prefix, the
    chunked decoders, the validate query, and multimodal payload readers all
    share it (an Arrow-layout fix must land in exactly one place)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        col.offset:col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
    base = off[0]
    return data[base:off[-1]], off - base


def _text_to_flat(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Text column -> (utf8 bytes, offsets) for the fused tokenizer, with
    the same loud NULL rejection as _list_to_flat: the SQL tokenizer turns
    NULL text into NULL tokens (no defined round trip), while a silent
    null-as-empty here would emit token [0] and diverge from the oracle."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("text column contains NULLs; filter or coalesce "
                         "to '' before the fused tokenizer")
    return _flat_binary(col.cast(pa.binary()))


def _i32_offsets(offsets: np.ndarray) -> np.ndarray:
    """int64 -> int32 Arrow offsets with an overflow guard: an Arrow batch
    whose flat payload exceeds 2^31-1 bytes/elements would otherwise WRAP
    silently and corrupt the column (maxRecordsPerBatch bounds rows, not
    bytes — very long rows can still blow the 2 GiB offset budget)."""
    offsets = np.asarray(offsets)
    if offsets.size and int(offsets[-1]) > np.iinfo(np.int32).max:
        raise ValueError(
            f"Arrow batch payload {int(offsets[-1])} exceeds int32 offsets "
            "(2^31-1); lower spark.sql.execution.arrow.maxRecordsPerBatch")
    return np.ascontiguousarray(offsets, dtype=np.int32)


def _binary_array(data: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Zero-copy Arrow binary array from flat bytes + int64 offsets
    (py_buffer wraps the NumPy buffers directly — no serialization copy)."""
    off32 = _i32_offsets(offsets)
    return pa.Array.from_buffers(
        pa.binary(), len(off32) - 1,
        [None, pa.py_buffer(off32), pa.py_buffer(np.ascontiguousarray(data))],
    )


def encode_table(df: DataFrame, codec: str = "auto",
                 candidates: tuple[str, ...] = batched.VECTOR_COST_CODECS,
                 range_partitions: int | None = None,
                 salt_partitions: int | None = None,
                 flat_transform=None, text_input: bool = False) -> DataFrame:
    """Encode tokens -> (codec, encoded, lineage).

    range_partitions: repartitionByRange on doc_id so encoded block boundaries
    align with doc_id ranges (scan/prune-friendly at the Iceberg layer).
    salt_partitions: hash-salted repartition that breaks up skewed sources —
    AQE fixes join skew but not UDF-stage skew, so this is explicit.
    flat_transform: optional elementwise uint32[V] -> uint32[V] numpy
    function applied to the flat token vector INSIDE the encode kernel — a
    cheap map-side projection fused into the encode stage instead of a
    separate column pass (a Spark ``transform()`` HOF over long arrays is a
    CodegenFallback node interpreted per element, and a pandas-UDF stage
    pays an extra Arrow crossing of the 4 B/token column).  Lineage
    (checksum, zone maps) and the round trip describe the TRANSFORMED
    values.
    text_input: df carries (doc_id, text, source) instead of a tokens
    column (sources.documents_scan); the vectorized tokenizer
    (functions.text_udfs.tokenize_rows, value-identical to the SQL
    tokenizer) runs fused in this kernel, so only the text bytes cross the
    Arrow boundary and the token column never exists on the wire.
    """
    if range_partitions:
        df = df.repartitionByRange(range_partitions, "doc_id")
    elif salt_partitions:
        # salt = pmod(hash(doc_id), S); range-partition on the salt so each
        # of the S buckets maps to exactly one task (hash-repartitioning the
        # salt again would re-collide buckets, balls-in-bins)
        df = (df.withColumn("_salt", F.pmod(F.hash("doc_id"), F.lit(salt_partitions)))
              .repartitionByRange(salt_partitions, "_salt")
              .drop("_salt"))

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if text_input:
                from ..functions.text_udfs import tokenize_rows
                data, toff = _text_to_flat(
                    batch.column(batch.schema.get_field_index("text")))
                tflat, offsets = tokenize_rows(data, toff)
                flat = tflat.view(np.uint32)
            else:
                flat, offsets = _list_to_flat(batch.column(batch.schema.get_field_index("tokens")))
            if flat_transform is not None:
                flat = flat_transform(flat)
            out, ooff, cids = batched.encode_rows(flat, offsets, codec=codec,
                                                  candidates=candidates)
            nr = offsets[1:] - offsets[:-1]
            csum = batched._seg_sum(flat.astype(np.int64), offsets)
            # zone map: per-row token min/max let a reader prune encoded
            # blocks by token range WITHOUT decoding.  Empty rows are NULL,
            # not 0/0 — a 0/0 sentinel is indistinguishable from an
            # all-zeros document, so a [0, hi] range predicate would
            # wrongly match empty docs
            tmin = batched._seg_reduce(np.minimum, flat, offsets).astype(np.int64)
            tmax = batched._seg_reduce(np.maximum, flat, offsets).astype(np.int64)
            empty = nr == 0
            names = pa.array([batched.CODEC_NAMES[c] for c in cids], pa.string())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    batch.column(batch.schema.get_field_index("source")),
                    pa.array(nr.astype(np.int32), pa.int32()),
                    names,
                    _binary_array(out, ooff),
                    pa.array(4 * nr, pa.int64()),
                    pa.array(ooff[1:] - ooff[:-1], pa.int64()),
                    pa.array(csum, pa.int64()),
                    pa.array(tmin, pa.int64(), mask=empty),
                    pa.array(tmax, pa.int64(), mask=empty),
                ],
                names=["doc_id", "source", "n_tok", "codec", "encoded",
                       "in_bytes", "out_bytes", "checksum",
                       "tok_min", "tok_max"],
            )

    return df.mapInArrow(run, ENCODED_SCHEMA)


def size_table(df: DataFrame, codec: str = "auto",
               candidates: tuple[str, ...] = batched.VECTOR_COST_CODECS,
               flat_transform=None, text_input: bool = False,
               carry: tuple[str, ...] = ()) -> DataFrame:
    """Exact per-row encoded size WITHOUT materializing the encoded bytes —
    the table form of the reference's size-without-encode API
    (``streamvbyte_compressedbytes``, /root/reference/include/streamvbyte.h:
    41-52 and src/streamvbyte_encode.c:74,91-108): a pure cost computation
    over the token values.  ``cost(v) == len(encode(v))`` holds exactly for
    every codec (tests/test_batched.py parity + the ``auto_size`` least()
    oracle), so this returns the same ``size_bytes`` an encode pass would,
    at a fraction of the work — no output allocation, no scatters, no
    encoded column in the plan.  ``codec='auto'`` returns the selector's
    min over ``candidates``.  flat_transform/text_input as in
    encode_table.  ``carry`` names extra input columns passed through
    unchanged — lets a composite query compute sizes in the SAME corpus
    scan that carries its other per-doc columns instead of scanning twice
    and joining (curation_pipeline uses this)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if text_input:
                from ..functions.text_udfs import tokenize_rows
                data, toff = _text_to_flat(
                    batch.column(batch.schema.get_field_index("text")))
                tflat, offsets = tokenize_rows(data, toff)
                flat = tflat.view(np.uint32)
            else:
                flat, offsets = _list_to_flat(
                    batch.column(batch.schema.get_field_index("tokens")))
            if flat_transform is not None:
                flat = flat_transform(flat)
            if codec == "auto_sorted":
                sizes = batched.auto_sorted_sizes(flat, offsets, candidates)
            else:
                costs = batched.row_costs(
                    flat, offsets, candidates if codec == "auto" else (codec,),
                    prune=codec == "auto")
                sizes = costs.min(axis=1) if codec == "auto" else costs[:, 0]
            yield pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("doc_id")),
                 pa.array(sizes.astype(np.int64), pa.int64())]
                + [batch.column(batch.schema.get_field_index(c))
                   for c in carry],
                names=["doc_id", "size_bytes", *carry])

    carry_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry)
    return df.mapInArrow(run, "doc_id string, size_bytes bigint"
                         + carry_schema)


def decode_table(enc_df: DataFrame, verify_checksum: bool = True,
                 fingerprint: bool = False) -> DataFrame:
    """Encoded table -> token table; bit-identical to the pre-encode input.

    fingerprint=True emits (doc_id, n_tok, source, fingerprint) instead of
    the token arrays — the round-trip queries' driver-gate shape.  The
    polynomial fold (codec.batched.fingerprint_rows) runs on the decoded
    flat vector INSIDE this kernel, so the 4 B/token column never crosses
    back to the JVM and no interpreted ``aggregate()`` pass remains."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols = {n: batch.schema.get_field_index(n) for n in
                    ("doc_id", "source", "n_tok", "codec", "encoded", "checksum")}
            enc, eoff = _flat_binary(batch.column(cols["encoded"]))
            n_toks = np.asarray(batch.column(cols["n_tok"]), dtype=np.int64)
            names = batch.column(cols["codec"]).to_pylist()
            cids = np.array([batched.CODEC_ID[n] for n in names], dtype=np.int32)
            flat, offsets = batched.decode_rows(enc, eoff, n_toks, cids)
            if verify_checksum:
                want = np.asarray(batch.column(cols["checksum"]), dtype=np.int64)
                got = batched._seg_sum(flat.astype(np.int64), offsets)
                bad = np.flatnonzero(want != got)
                if bad.size:
                    doc = batch.column(cols["doc_id"])[int(bad[0])]
                    raise ValueError(f"checksum mismatch decoding doc_id={doc}")
            if fingerprint:
                fp = batched.fingerprint_rows(flat.view(np.int32), offsets)
                yield pa.RecordBatch.from_arrays(
                    [batch.column(cols["doc_id"]),
                     pa.array(n_toks.astype(np.int32), pa.int32()),
                     batch.column(cols["source"]),
                     pa.array(fp, pa.int64())],
                    names=["doc_id", "n_tok", "source", "fingerprint"],
                )
                continue
            tok = pa.ListArray.from_arrays(
                pa.array(_i32_offsets(offsets), pa.int32()),
                pa.array(flat.view(np.int32), pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(cols["doc_id"]),
                    tok,
                    pa.array(n_toks.astype(np.int32), pa.int32()),
                    batch.column(cols["source"]),
                ],
                names=["doc_id", "tokens", "n_tok", "source"],
            )

    return enc_df.mapInArrow(
        run, DECODED_FP_SCHEMA if fingerprint else DECODED_SCHEMA)


def decode_table_prefix(enc_df: DataFrame, max_len: int,
                        fingerprint: bool = False) -> DataFrame:
    """Decode only the first min(max_len, n_tok) tokens of each document —
    the truncate-to-max-seq-len operator of a training pipeline, pushed into
    the codec: svb-family rows decode O(prefix) work/output via the control
    bytes (codec.batched.decode_prefix_rows), never materializing the tail.
    Output n_tok is the TRUNCATED length.  fingerprint=True emits the
    in-kernel polynomial fold of the PREFIX instead of the token arrays
    (see decode_table)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols = {n: batch.schema.get_field_index(n) for n in
                    ("doc_id", "source", "n_tok", "codec", "encoded")}
            enc, eoff = _flat_binary(batch.column(cols["encoded"]))
            n_toks = np.asarray(batch.column(cols["n_tok"]), dtype=np.int64)
            names = batch.column(cols["codec"]).to_pylist()
            cids = np.array([batched.CODEC_ID[n] for n in names], dtype=np.int32)
            flat, offsets = batched.decode_prefix_rows(
                enc, eoff, n_toks, cids, max_len)
            nr = (offsets[1:] - offsets[:-1]).astype(np.int32)
            if fingerprint:
                fp = batched.fingerprint_rows(flat.view(np.int32), offsets)
                yield pa.RecordBatch.from_arrays(
                    [batch.column(cols["doc_id"]), pa.array(nr, pa.int32()),
                     batch.column(cols["source"]), pa.array(fp, pa.int64())],
                    names=["doc_id", "n_tok", "source", "fingerprint"],
                )
                continue
            tok = pa.ListArray.from_arrays(
                pa.array(_i32_offsets(offsets), pa.int32()),
                pa.array(flat.view(np.int32), pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(cols["doc_id"]), tok,
                 pa.array(nr, pa.int32()), batch.column(cols["source"])],
                names=["doc_id", "tokens", "n_tok", "source"],
            )

    return enc_df.mapInArrow(
        run, DECODED_FP_SCHEMA if fingerprint else DECODED_SCHEMA)


def verify_roundtrip(original: DataFrame, decoded: DataFrame) -> int:
    """Count rows whose decoded token array differs from the original
    (must be 0). Broadcast-free sort-merge join on doc_id."""
    o = original.select("doc_id", F.col("tokens").alias("tokens_orig"))
    d = decoded.select("doc_id", F.col("tokens").alias("tokens_dec"))
    joined = o.join(d, "doc_id", "full_outer")
    return joined.where(
        ~(F.col("tokens_orig") == F.col("tokens_dec")) |
        F.col("tokens_orig").isNull() | F.col("tokens_dec").isNull()
    ).count()
