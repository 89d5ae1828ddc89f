"""Custom stateful streaming operator: incremental inverted-index maintenance.

The batch build (operators/index.build_index_chunked) groups the corpus by
``(term, did div span)`` and Elias-Fano-encodes each bounded chunk.  A LIVE
ingestion pipeline needs the same index as documents ARRIVE:
``applyInPandasWithState`` keyed by ``(term, chunk_id)`` keeps each chunk's
CURRENT ENCODED BYTES as the state value — every micro-batch decodes the
touched chunks, set-merges the new doc ids, re-encodes, and emits the
updated chunk row.  The state store IS the index; a consumer upserting the
emitted rows by ``(term, chunk_id)`` maintains the exact table the batch
build would produce over the union of all arrived documents.

Correctness properties (all pinned by the replay test):

* **No ordering contract.**  Chunk content is a SET of doc ids; merge is a
  set union, so any arrival order across micro-batches converges to the
  same chunk bytes — unlike pack_assign's prefix-sum state, which needs
  non-decreasing delivery.
* **Redelivery-safe.**  An at-least-once source replaying documents merges
  already-present ids: a no-op.  Updates are emitted only when a chunk
  actually GREW, so n_tok strictly increases along one chunk's emission
  history (the latest generation of a chunk is its max-n_tok row).
* **Bounded state.**  A chunk holds <= span ids (did div span partitions
  doc-id space), so decode+union+encode per touched chunk is O(span)
  whatever the corpus size; a hot stopword term spreads across
  n_docs/span state keys exactly like the batch build's reducers.  The
  state store shards by key hash across executors — the streaming twin of
  the batch build's skew story.

Wire parity: chunk bytes are ef_encode_rows output (the PUBLIC cross-module
EF contract shared with operators/chunking) — a batch reader decodes
streamed chunks with the same ef_decode_rows call, and the replay test
asserts the drained stream's chunks byte-equal the batch build's.  All
three index wires stream: set (EF dids), TF (EF dids + svb tfs), and
positional (r9: + svb doc-major positions — the phrase-serving wire),
each draining byte-equal to its batch build and folding into a stored
table via operators/index.merge_index_updates' matching branch.

Reference hook: sorted-postings delta/EF is the codec family's canonical
application (/root/reference/README.md:54-59,253); this operator is the
engine's own streaming extension (the reference is a batch codec library).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.index import INDEX_CHUNK_SPAN

OUT_SCHEMA = "term string, chunk_id int, n_tok int, encoded binary"
STATE_SCHEMA = "n_tok int, encoded binary"
_OUT_COLS = ["term", "chunk_id", "n_tok", "encoded"]


def _merge_chunk(key: Tuple[str, int], pdf_iter: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    from ..codec import batched
    term, chunk_id = key
    dids = [pdf["did"].to_numpy(np.int64) for pdf in pdf_iter if len(pdf)]
    if not dids:
        if state.exists:
            state.update(state.get)
        yield pd.DataFrame(columns=_OUT_COLS)
        return
    new = np.unique(np.concatenate(dids) if len(dids) > 1 else dids[0])
    if state.exists:
        n_old, enc_old = state.get
        old = batched.ef_decode_rows(
            np.frombuffer(enc_old, dtype=np.uint8),
            np.array([0, len(enc_old)], dtype=np.int64),
            np.array([n_old], dtype=np.int64))[0].astype(np.int64)
        merged = np.union1d(old, new)
        if merged.size == old.size:
            # pure redelivery: nothing grew, emit nothing
            state.update((n_old, enc_old))
            yield pd.DataFrame(columns=_OUT_COLS)
            return
    else:
        merged = new
    enc, _eoff = batched.ef_encode_rows(
        merged.astype(np.uint32),
        np.array([0, merged.size], dtype=np.int64))
    buf = enc.tobytes()
    state.update((int(merged.size), buf))
    yield pd.DataFrame({"term": [term],
                        "chunk_id": np.array([chunk_id], dtype=np.int32),
                        "n_tok": np.array([merged.size], dtype=np.int32),
                        "encoded": [buf]})


TF_OUT_SCHEMA = ("term string, chunk_id int, n_doc int, "
                 "enc_dids binary, enc_tfs binary")
TF_STATE_SCHEMA = "n_doc int, enc_dids binary, enc_tfs binary"
_TF_OUT_COLS = ["term", "chunk_id", "n_doc", "enc_dids", "enc_tfs"]


def _merge_chunk_tf(key: Tuple[str, int], pdf_iter: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    from ..codec import batched
    term, chunk_id = key
    raw = [(pdf["did"].to_numpy(np.int64), pdf["pos"].to_numpy(np.int64))
           for pdf in pdf_iter if len(pdf)]
    if not raw:
        if state.exists:
            state.update(state.get)
        yield pd.DataFrame(columns=_TF_OUT_COLS)
        return
    dids_raw = np.concatenate([r[0] for r in raw])
    pos_raw = np.concatenate([r[1] for r in raw])
    # dedupe (did, pos) PAIRS before counting: a document redelivered
    # within this same micro-batch contributes exact-duplicate pairs
    # (immutable docs -> identical positions), so the pair dedup recovers
    # the true tf where a raw occurrence count would double it
    occ = np.unique((dids_raw << np.int64(32)) | pos_raw)
    new_dids, new_tfs = np.unique(occ >> np.int64(32), return_counts=True)
    if state.exists:
        n_old, ed, et = state.get
        one = np.array([n_old], dtype=np.int64)
        old_dids = batched.ef_decode_rows(
            np.frombuffer(ed, dtype=np.uint8),
            np.array([0, len(ed)], dtype=np.int64), one)[0].astype(np.int64)
        old_tfs = batched.decode_rows(
            np.frombuffer(et, dtype=np.uint8),
            np.array([0, len(et)], dtype=np.int64), one,
            np.array([batched.CODEC_ID["svb"]], np.int32))[0]
        # a doc's tf for a term is COMPLETE within the micro-batch that
        # delivered the doc (explode keeps a row's words together), so a
        # did already present is a redelivery: keep the stored count —
        # adding would double it.  Only FRESH dids insert.
        fresh = ~np.isin(new_dids, old_dids)
        if not fresh.any():
            state.update((n_old, ed, et))
            yield pd.DataFrame(columns=_TF_OUT_COLS)
            return
        md = np.union1d(old_dids, new_dids[fresh])
        tf = np.zeros(md.size, dtype=np.uint32)
        tf[np.searchsorted(md, old_dids)] = old_tfs
        tf[np.searchsorted(md, new_dids[fresh])] = new_tfs[fresh]
    else:
        md, tf = new_dids, new_tfs.astype(np.uint32)
    off = np.array([0, md.size], dtype=np.int64)
    enc_d = batched.ef_encode_rows(md.astype(np.uint32), off)[0].tobytes()
    enc_t = batched.encode_rows(tf, off, "svb")[0].tobytes()
    state.update((int(md.size), enc_d, enc_t))
    yield pd.DataFrame({"term": [term],
                        "chunk_id": np.array([chunk_id], dtype=np.int32),
                        "n_doc": np.array([md.size], dtype=np.int32),
                        "enc_dids": [enc_d], "enc_tfs": [enc_t]})


POS_OUT_SCHEMA = ("term string, chunk_id int, n_doc int, n_pos int, "
                  "enc_dids binary, enc_tfs binary, enc_pos binary")
POS_STATE_SCHEMA = ("n_doc int, n_pos int, enc_dids binary, "
                    "enc_tfs binary, enc_pos binary")
_POS_OUT_COLS = ["term", "chunk_id", "n_doc", "n_pos", "enc_dids",
                 "enc_tfs", "enc_pos"]


def _merge_chunk_pos(key: Tuple[str, int], pdf_iter: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    """Positional twin of _merge_chunk_tf: state carries all three wires
    of the positional chunk (EF dids + svb tfs + svb doc-major positions,
    operators/index.build_index_pos_chunked parity).  Same redelivery
    contract — docs are immutable and a doc's occurrences are complete
    within its delivery batch, so a did already in the chunk is a
    redelivery (its stored positions stay) and only FRESH dids insert,
    doc-major via one packed (did << 32 | pos) sort."""
    from ..codec import batched
    term, chunk_id = key
    raw = [(pdf["did"].to_numpy(np.int64), pdf["pos"].to_numpy(np.int64))
           for pdf in pdf_iter if len(pdf)]
    if not raw:
        if state.exists:
            state.update(state.get)
        yield pd.DataFrame(columns=_POS_OUT_COLS)
        return
    dids_raw = np.concatenate([r[0] for r in raw])
    pos_raw = np.concatenate([r[1] for r in raw])
    # within-batch (did, pos) pair dedup, already sorted doc-major
    occ = np.unique((dids_raw << np.int64(32)) | pos_raw)
    new_dids = occ >> np.int64(32)
    nd = np.unique(new_dids)
    if state.exists:
        n_old, np_old, ed, et, ep = state.get
        one = np.array([n_old], dtype=np.int64)
        old_dids = batched.ef_decode_rows(
            np.frombuffer(ed, dtype=np.uint8),
            np.array([0, len(ed)], dtype=np.int64), one)[0].astype(np.int64)
        svb1 = np.array([batched.CODEC_ID["svb"]], np.int32)
        old_tfs = batched.decode_rows(
            np.frombuffer(et, dtype=np.uint8),
            np.array([0, len(et)], dtype=np.int64), one, svb1)[0]
        old_pos = batched.decode_rows(
            np.frombuffer(ep, dtype=np.uint8),
            np.array([0, len(ep)], dtype=np.int64),
            np.array([np_old], dtype=np.int64), svb1)[0].astype(np.int64)
        fresh = ~np.isin(nd, old_dids)
        if not fresh.any():
            state.update((n_old, np_old, ed, et, ep))
            yield pd.DataFrame(columns=_POS_OUT_COLS)
            return
        old_occ = ((np.repeat(old_dids, old_tfs.astype(np.int64))
                    << np.int64(32)) | old_pos)
        keep = np.isin(new_dids, nd[fresh])
        # disjoint did sets: concatenate + sort restores doc-major order
        occ = np.sort(np.concatenate([old_occ, occ[keep]]))
    md, tf = np.unique(occ >> np.int64(32), return_counts=True)
    poss = (occ & np.int64(0xFFFFFFFF)).astype(np.uint32)
    doff = np.array([0, md.size], dtype=np.int64)
    poff = np.array([0, poss.size], dtype=np.int64)
    enc_d = batched.ef_encode_rows(md.astype(np.uint32), doff)[0].tobytes()
    enc_t = batched.encode_rows(tf.astype(np.uint32), doff,
                                "svb")[0].tobytes()
    enc_p = batched.encode_rows(poss, poff, "svb")[0].tobytes()
    state.update((int(md.size), int(poss.size), enc_d, enc_t, enc_p))
    yield pd.DataFrame({"term": [term],
                        "chunk_id": np.array([chunk_id], dtype=np.int32),
                        "n_doc": np.array([md.size], dtype=np.int32),
                        "n_pos": np.array([poss.size], dtype=np.int32),
                        "enc_dids": [enc_d], "enc_tfs": [enc_t],
                        "enc_pos": [enc_p]})


def _pairs(docs: DataFrame, span: int) -> DataFrame:
    """The batch build's explode (operators/index.term_doc_pairs: tokenizer
    parity, the same loud non-negative-int32 id guard); duplicates kept —
    the set merge uniques them."""
    from ..operators.index import term_doc_pairs
    return term_doc_pairs(docs).withColumn(
        "chunk_id", F.expr(f"did div {span}").cast("int"))


def _pairs_pos(docs: DataFrame, span: int) -> DataFrame:
    """The TF form's explode: the batch family's positional pairs
    (operators/index.term_doc_pos_pairs — shared tokenizer, id guard, and
    raw-split positions).  The position is what makes the TF merge
    idempotent WITHIN a micro-batch: a document delivered twice in one
    trigger contributes exact-duplicate (did, pos) pairs, so deduping
    pairs recovers the true counts — counting raw occurrences would double
    them (review r8).  The set form's stream stays position-free (its
    merge is a set union; no reason to widen its stateful shuffle by
    4 B/occurrence)."""
    from ..operators.index import term_doc_pos_pairs
    return term_doc_pos_pairs(docs).withColumn(
        "chunk_id", F.expr(f"did div {span}").cast("int"))


def index_update_stream(docs: DataFrame,
                        span: int = INDEX_CHUNK_SPAN) -> DataFrame:
    """documents stream (doc_id, text, ...) -> upsert rows (term, chunk_id,
    n_tok, encoded) for every chunk a micro-batch grew; state = one encoded
    EF chunk per (term, chunk_id)."""
    return (_pairs(docs, span).groupBy("term", "chunk_id")
            .applyInPandasWithState(_merge_chunk, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def index_update_stream_tf(docs: DataFrame,
                           span: int = INDEX_CHUNK_SPAN) -> DataFrame:
    """TF twin: state and upserts carry BOTH wires of the TF index (EF did
    stream + svb tf stream, operators/index.build_index_tf_chunked parity).
    Contract beyond the set form: doc ids are unique and documents
    immutable — tf addition is not idempotent, so redeliveries are
    neutralized at BOTH granularities: across micro-batches a did already
    in the chunk keeps its stored count, and within one micro-batch the
    (did, pos) pair dedup collapses a twice-delivered document to its true
    counts before they are ever added (review r8)."""
    return (_pairs_pos(docs, span).groupBy("term", "chunk_id")
            .applyInPandasWithState(_merge_chunk_tf, TF_OUT_SCHEMA,
                                    TF_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def index_update_stream_pos(docs: DataFrame,
                            span: int = INDEX_CHUNK_SPAN) -> DataFrame:
    """Positional twin: maintains the full phrase-serving wire (EF dids +
    svb tfs + svb doc-major positions) incrementally — the streaming
    source of the generations merge_index_updates' pos branch folds into
    a stored positional table.  Same redelivery/immutability contract as
    the TF form; drained generations byte-equal the batch
    build_index_pos_chunked over the union corpus (replay-tested)."""
    return (_pairs_pos(docs, span).groupBy("term", "chunk_id")
            .applyInPandasWithState(_merge_chunk_pos, POS_OUT_SCHEMA,
                                    POS_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))
