"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInArrow`` stages.  The
actual media decoders (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is STUBBED: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless the optional dependency imports, and the
tested path uses a deterministic fake feature (byte histogram statistics)
so the Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id string, media_type string, payload binary, "
                "meta struct<n_bytes: int, fmt: string>")
FEATURE_SCHEMA = "doc_id string, n_bytes bigint, byte_sum bigint, feature array<float>"


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text column
    (stands in for image bytes); metadata struct carries size + format."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.length("text").cast("int").alias("n_bytes"),
            F.lit("fake").alias("fmt"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real image decode — stubbed: PIL is not available in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; install pillow on the cluster image"
        ) from e
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def decode_audio(payload: bytes):
    """Real audio decode — stubbed: soundfile/torchaudio not in container."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decode requires soundfile; install it on the cluster image"
        ) from e
    raise NotImplementedError("wire soundfile.read(io.BytesIO(payload)) here")


def resize_image(payload: bytes, w: int, h: int):
    """Real image resize — stubbed behind the same optional dependency."""
    decode_image(payload)


def _flat_bytes(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a pa binary array as (flat uint8 buffer, offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        col.offset:col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
    base = off[0]
    return data[base:off[-1]], off - base


FRAME_SCHEMA = ("doc_id string, frame_id int, frame_len int, "
                "frame_sum bigint, frame binary")


def sample_frames(media: DataFrame, frame_bytes: int = 64,
                  every: int = 2) -> DataFrame:
    """Frame sampling over binary payloads (the video-frame-sample shape).

    Deterministic fake framing: the payload is cut into consecutive
    ``frame_bytes`` slices (partial tail kept) and every ``every``-th frame
    is emitted — standing in for ffmpeg keyframe extraction, which isn't in
    this container.  The plumbing is the real thing a video pipeline needs:
    a 1:N explode of binary rows done entirely inside one Arrow batch with
    vectorized gathers (no per-row Python), output offsets rebuilt exactly.
    """

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            doc = batch.column(batch.schema.get_field_index("doc_id"))
            flat, offsets = _flat_bytes(
                batch.column(batch.schema.get_field_index("payload")))
            nr = offsets[1:] - offsets[:-1]
            nframes = (nr + frame_bytes - 1) // frame_bytes
            counts = (nframes + every - 1) // every
            total = int(counts.sum())
            row_ids = np.repeat(np.arange(nr.size, dtype=np.int64), counts)
            base = np.concatenate([[0], np.cumsum(counts)])
            fid = (np.arange(total, dtype=np.int64) - base[row_ids]) * every
            start = offsets[:-1][row_ids] + fid * frame_bytes
            flen = np.minimum(frame_bytes, nr[row_ids] - fid * frame_bytes)
            # segmented byte sums via one prefix sum over the whole batch
            c = np.concatenate([[0], np.cumsum(flat, dtype=np.int64)])
            fsum = c[start + flen] - c[start]
            # gather frame bytes: out position -> source position
            out_off = np.concatenate(
                [[0], np.cumsum(flen)]).astype(np.int64)
            idx = (np.repeat(start - out_off[:-1], flen)
                   + np.arange(out_off[-1], dtype=np.int64))
            frame_arr = pa.BinaryArray.from_buffers(
                pa.binary(), total,
                [None, pa.py_buffer(out_off.astype(np.int32)),
                 pa.py_buffer(flat[idx])])
            yield pa.RecordBatch.from_arrays(
                [doc.take(pa.array(row_ids)),
                 pa.array(fid.astype(np.int32), pa.int32()),
                 pa.array(flen.astype(np.int32), pa.int32()),
                 pa.array(fsum, pa.int64()),
                 frame_arr],
                names=["doc_id", "frame_id", "frame_len",
                       "frame_sum", "frame"])

    return media.mapInArrow(run, FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The deterministic fake feature (16-bin byte histogram, L1-normalized)
    exercises the exact batch shape a real image featurizer would use:
    flat byte buffer + offsets in, fixed-length float vectors out."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            col = batch.column(batch.schema.get_field_index("payload"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bufs = col.buffers()
            off = np.frombuffer(bufs[1], dtype=np.int32)[
                col.offset:col.offset + len(col) + 1].astype(np.int64)
            data = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
            base = off[0]
            flat, offsets = data[base:off[-1]], off - base
            nr = offsets[1:] - offsets[:-1]
            # per-row byte sum (segmented)
            c = np.concatenate([[0], np.cumsum(flat, dtype=np.int64)])
            byte_sum = c[offsets[1:]] - c[offsets[:-1]]
            # 16-bin histogram per row, vectorized: bincount over row*16+bin
            row_ids = np.repeat(np.arange(nr.size, dtype=np.int64), nr)
            bins = (flat >> 4).astype(np.int64)
            hist = np.bincount(row_ids * 16 + bins, minlength=nr.size * 16)
            hist = hist.reshape(nr.size, 16).astype(np.float32)
            denom = np.maximum(nr, 1).astype(np.float32)[:, None]
            feat = hist / denom
            feat_off = np.arange(nr.size + 1, dtype=np.int32) * 16
            feat_arr = pa.ListArray.from_arrays(
                pa.array(feat_off, pa.int32()),
                pa.array(feat.reshape(-1), pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("doc_id")),
                 pa.array(nr, pa.int64()),
                 pa.array(byte_sum, pa.int64()),
                 feat_arr],
                names=["doc_id", "n_bytes", "byte_sum", "feature"])

    return media.mapInArrow(run, FEATURE_SCHEMA)
