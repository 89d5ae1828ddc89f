"""Custom stateful streaming operator: continuous pack-span assignment.

The batch pack writers (functions/pipeline_sql.q_sequence_pack,
operators/packing.pack_tokens_encoded) place each document at its running
token offset within its source via a two-level distributed prefix sum.  A
LIVE ingestion pipeline needs the same placement as documents ARRIVE:
``applyInPandasWithState`` keeps ``(last_doc_id, cum)`` per source in the
streaming state store, so every arriving document is assigned the exact
token span [st, st + n_tok) — and therefore its pack ids
floor(st/CAP)..floor(en/CAP) — that the batch writer would give it, hours
of micro-batches apart.

Ordering contract (mirrors stateful_delta's chunk contiguity): documents of
a source must arrive in NON-DECREASING doc_id order across micro-batches —
the order a doc_id-sorted corpus replay produces.  Because order is
enforced, a doc_id == last_doc_id is provably a redelivery of an
already-placed document (at-least-once sources) and is skipped —
exact-once placement, not data loss; a doc_id < last_doc_id is reordering
and RAISES.  Batch-exactness is tested by replaying a corpus through
micro-batches and comparing every span to the batch prefix sum.

The group body is whole-batch vectorized (one argsort + cumsum per source
per micro-batch); no per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.pipeline_sql import PACK_CAP

OUT_SCHEMA = ("doc_id string, source string, n_tok int, st long, "
              "pack_first long, pack_last long")
STATE_SCHEMA = "last_doc_id string, cum long"
_OUT_COLS = ["doc_id", "source", "n_tok", "st", "pack_first", "pack_last"]


def _assign_source(key: Tuple[str], pdf_iter: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    source = key[0]
    last_doc, cum = state.get if state.exists else ("", 0)
    frames = [pdf for pdf in pdf_iter if len(pdf)]
    if not frames:
        state.update((last_doc, cum))
        yield pd.DataFrame(columns=_OUT_COLS)
        return
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    ids = pdf["doc_id"].to_numpy(object)
    order = np.argsort(ids, kind="stable")
    pdf = pdf.iloc[order]
    ids = ids[order]
    # first-occurrence-wins within the batch, then drop state-level
    # redeliveries; anything BELOW the high-water mark that is not an exact
    # redelivery is reordering (the placement it needs is already spoken
    # for) — fail loudly rather than corrupt every later offset
    first = np.concatenate(([True], ids[1:] != ids[:-1]))
    if last_doc:
        below = ids < last_doc
        if np.any(below):
            raise ValueError(
                f"pack_assign: doc_id {ids[below][0]!r} of source "
                f"{source!r} arrived after high-water mark {last_doc!r} — "
                "sources must deliver docs in doc_id order")
        first &= ids != last_doc  # == is a redelivery: skip exactly-once
    kept = pdf.iloc[first]
    if not len(kept):
        state.update((last_doc, cum))
        yield pd.DataFrame(columns=_OUT_COLS)
        return
    n_tok = kept["n_tok"].to_numpy(np.int64)
    st = cum + np.concatenate(([0], np.cumsum(n_tok[:-1])))
    en = st + n_tok - 1
    state.update((str(kept["doc_id"].iloc[-1]), int(cum + n_tok.sum())))
    # empty docs advance the high-water mark but occupy no span — the batch
    # pack queries filter n_tok > 0 the same way
    nz = n_tok > 0
    yield pd.DataFrame({
        "doc_id": kept["doc_id"].to_numpy(object)[nz],
        "source": source,
        "n_tok": n_tok[nz].astype(np.int32),
        "st": st[nz],
        "pack_first": st[nz] // PACK_CAP,
        "pack_last": en[nz] // PACK_CAP,
    })


def pack_assign_stream(docs: DataFrame) -> DataFrame:
    """docs stream (doc_id, source, n_tok) -> exact pack-span placement
    per document, state = one (last_doc_id, cum) row per source."""
    return (docs.groupBy("source").applyInPandasWithState(
        _assign_source, OUT_SCHEMA, STATE_SCHEMA,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout))
