"""Corpus-wide vocabulary remapping: frequency-ranked token ids.

Token ids assigned by a tokenizer are arbitrary; byte-oriented codecs pay
for their magnitude.  Remapping ids by corpus frequency (most frequent
token -> 0) makes the common ids 1-byte values, directly shrinking svb/
svb0124/dict outputs — the classic id-reassignment trick for columnar
token storage.

Two stages, both scale-shaped:

* ``build_vocab`` — one explode + count + rank: the heavy shuffle is the
  token-count aggregation (partial map-side combine), the rank window runs
  over the (small) distinct-token set.
* ``remap_tokens`` — the vocab is a (sorted token ids, new ids) pair of
  int arrays broadcast to every task; the lookup is one vectorized
  ``np.searchsorted`` per Arrow batch.  Vocabularies are tokenizer-sized
  (tens of thousands of entries), far under broadcast limits even at
  10^12 documents.

The remap is exactly invertible given the vocab table, and the driver
oracle reproduces the identical rank assignment relationally
(queries.py: vocab_remap_metrics).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_vocab(tok_df: DataFrame) -> DataFrame:
    """(token, new_id) with new_id = 0-based rank by (count desc, token)."""
    counts = (tok_df.select(F.explode("tokens").alias("token"))
              .groupBy("token").agg(F.count("*").alias("cnt")))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return counts.select(
        "token", (F.row_number().over(w) - 1).cast("int").alias("new_id"))


MAX_BROADCAST_VOCAB = 1 << 22  # ~4M entries = ~50 MB broadcast; tokenizer
# vocabularies are 32k-256k, so this bound is generous — anything past it is
# an open/hashed id space that must NOT be collected to the driver


def remap_tokens(tok_df: DataFrame, vocab_df: DataFrame,
                 max_vocab: int = MAX_BROADCAST_VOCAB) -> DataFrame:
    """Rewrite every token array through the vocab (all tokens must be in
    the vocab — it was built from this corpus).

    The vocab is collected to the driver and broadcast — correct for
    tokenizer-sized vocabularies.  The collect is CAPPED at max_vocab + 1
    rows (limit() bounds driver memory even when the guard trips): an
    over-limit vocabulary fails loudly with a pointer to
    ``remap_tokens_join``, the shuffle-join path that never materializes the
    vocab on the driver."""
    rows = vocab_df.select("token", "new_id").limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}: an open/hashed token "
            "id space cannot be broadcast-remapped; use remap_tokens_join "
            "(explode + shuffle join) instead")
    toks = np.array([r.token for r in rows], dtype=np.int64)
    ids = np.array([r.new_id for r in rows], dtype=np.int32)
    order = np.argsort(toks)
    sorted_toks, sorted_ids = toks[order], ids[order]
    spark = tok_df.sparkSession
    b_toks = spark.sparkContext.broadcast(sorted_toks)
    b_ids = spark.sparkContext.broadcast(sorted_ids)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .encode import _i32_offsets, _list_to_flat
        vt, vi = b_toks.value, b_ids.value
        for batch in batches:
            flat, offsets = _list_to_flat(
                batch.column(batch.schema.get_field_index("tokens")))
            pos = np.searchsorted(vt, flat.astype(np.int64))
            if pos.size and (pos >= vt.size).any():
                raise ValueError("token outside the vocabulary")
            hit = vt[pos] == flat.astype(np.int64)
            if pos.size and not hit.all():
                raise ValueError("token outside the vocabulary")
            new_flat = vi[pos]
            tok = pa.ListArray.from_arrays(
                pa.array(_i32_offsets(offsets), pa.int32()),
                pa.array(new_flat, pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("doc_id")),
                 tok,
                 batch.column(batch.schema.get_field_index("n_tok")),
                 batch.column(batch.schema.get_field_index("source"))],
                names=["doc_id", "tokens", "n_tok", "source"])

    return tok_df.mapInArrow(
        run, "doc_id string, tokens array<int>, n_tok int, source string")


def remap_tokens_join(tok_df: DataFrame, vocab_df: DataFrame) -> DataFrame:
    """Shuffle-join remap for vocabularies too large to broadcast (open or
    hashed id spaces): posexplode tokens -> LEFT-join the vocab on token ->
    rebuild arrays ordered by position.  Two shuffles (join on token, re-agg
    on doc_id) instead of the broadcast path's zero — the correct trade when
    the vocab itself is data-scale.  A token with no vocab row keeps its
    position but a NULL new_id; the per-doc n_missing count turns any such
    doc into an in-query raise_error instead of a silent mis-remap."""
    exploded = tok_df.select(
        "doc_id", "n_tok", "source",
        F.posexplode_outer("tokens").alias("pos", "token"))
    joined = exploded.join(vocab_df.select("token", "new_id"), "token", "left")
    # collect_list skips nulls, so empty docs (pos null from the outer
    # explode) rebuild as []; a real token with no vocab row keeps its pos
    # but a null new_id and is counted by n_missing
    rebuilt = (joined.groupBy("doc_id", "n_tok", "source")
               .agg(F.array_sort(F.collect_list(
                        F.when(F.col("pos").isNotNull(),
                               F.struct("pos", "new_id"))))
                    .getField("new_id").alias("tokens"),
                    F.sum(F.when(F.col("pos").isNotNull()
                                 & F.col("new_id").isNull(), 1).otherwise(0))
                    .alias("n_missing")))
    return rebuilt.select(
        "doc_id",
        F.when(F.col("n_missing") == 0, F.col("tokens"))
        .otherwise(F.raise_error(F.concat(
            F.lit("remap_tokens_join: token(s) outside the vocabulary in doc "),
            F.col("doc_id")))).alias("tokens"),
        "n_tok", "source")
