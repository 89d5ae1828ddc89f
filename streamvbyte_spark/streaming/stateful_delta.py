"""Custom stateful streaming operator: continuous delta-chain encoding.

A live ingestion stream delivers token chunks per document across many
micro-batches.  svb_delta needs each chunk's ``prev`` seed = last token of the
previous chunk (/root/reference/include/streamvbytedelta.h:17-29) — state that
must survive between micro-batches.  ``applyInPandasWithState`` keeps
``(last_chunk_id, prev)`` per doc_id in the streaming state store, so chunk
k of a document can arrive an hour after chunk k-1 and still encode into the
same resumable delta chain.

This is the engine's custom stateful operator (template category
"streaming: state"): the reference has no streaming at all, so the semantics
are additive — but the byte format produced is exactly the batch chunked
encoder's (operators.chunking), verified by test round-trip.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("doc_id string, chunk_id int, n_tok int, prev long, "
              "encoded binary, out_bytes bigint")
STATE_SCHEMA = "last_chunk_id int, prev long"


def _encode_doc_chunks(key: Tuple[str], pdf_iter: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    from ..codec import core

    doc_id = key[0]
    last_chunk_id, prev = state.get if state.exists else (-1, 0)
    rows = []
    for pdf in pdf_iter:
        for _, r in pdf.sort_values("chunk_id").iterrows():
            cid = int(r["chunk_id"])
            if cid <= last_chunk_id:
                continue  # duplicate delivery: chain already contains it
            chunk = np.asarray(r["chunk"], dtype=np.int64).astype(np.uint32)
            buf = core.delta_encode(chunk, prev=prev)
            rows.append((doc_id, cid, chunk.size, prev, buf, len(buf)))
            if chunk.size:
                prev = int(chunk[-1])
            last_chunk_id = cid
    state.update((last_chunk_id, prev))
    yield pd.DataFrame(rows, columns=["doc_id", "chunk_id", "n_tok", "prev",
                                      "encoded", "out_bytes"])


def stateful_delta_encode(chunk_stream: DataFrame) -> DataFrame:
    """Streaming (doc_id, chunk_id, chunk) -> encoded delta chunks with
    cross-micro-batch prev chaining."""
    return (chunk_stream.groupBy("doc_id")
            .applyInPandasWithState(_encode_doc_chunks, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
