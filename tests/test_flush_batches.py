"""The fused decoder's flush must split RecordBatches at document boundaries
so no batch's flat token payload exceeds Arrow's int32 offsets — and must
fail loudly (naming the consumer-path alternative) only when one DOCUMENT
exceeds the limit (r3 verdict item 6)."""

from __future__ import annotations

import numpy as np
import pytest

from streamvbyte_spark.operators.chunking import _flush_doc_batches


def _mk(doc_lens):
    ids = np.array([f"d{i}" for i in range(len(doc_lens))], dtype=object)
    off = np.concatenate([[0], np.cumsum(doc_lens)]).astype(np.int64)
    flat = np.arange(off[-1], dtype=np.uint32)
    return ids, flat, off


def test_flush_splits_at_doc_boundaries():
    ids, flat, off = _mk([5, 7, 3, 10, 1])
    batches = list(_flush_doc_batches(ids, flat, off, limit=12))
    # every batch under the limit; together they cover all docs in order
    got_ids, got_toks = [], []
    for b in batches:
        tok = b.column(1)
        assert len(tok.values) <= 12
        got_ids += b.column(0).to_pylist()
        got_toks += [np.asarray(t) for t in tok.to_pylist()]
        np.testing.assert_array_equal(np.asarray(b.column(2)),
                                      [len(t) for t in tok.to_pylist()])
    assert got_ids == [f"d{i}" for i in range(5)]
    for i, t in enumerate(got_toks):
        np.testing.assert_array_equal(t, np.arange(off[i], off[i + 1]))
    assert len(batches) >= 3  # the limit genuinely forced splits


def test_flush_single_batch_when_under_limit():
    ids, flat, off = _mk([4, 4])
    batches = list(_flush_doc_batches(ids, flat, off))
    assert len(batches) == 1 and batches[0].num_rows == 2


def test_flush_oversized_document_raises_with_alternative():
    ids, flat, off = _mk([3, 20, 2])
    with pytest.raises(ValueError, match="decode_chunked_delta"):
        list(_flush_doc_batches(ids, flat, off, limit=10))
    # docs BEFORE the oversized one still flush
    it = _flush_doc_batches(ids, flat, off, limit=10)
    first = next(it)
    assert first.column(0).to_pylist() == ["d0"]
    with pytest.raises(ValueError):
        next(it)


def test_flush_empty_docs_between_large_ones():
    ids, flat, off = _mk([6, 0, 0, 6])
    batches = list(_flush_doc_batches(ids, flat, off, limit=6))
    got_ids = [i for b in batches for i in b.column(0).to_pylist()]
    assert got_ids == ["d0", "d1", "d2", "d3"]
    lens = [n for b in batches for n in np.asarray(b.column(2)).tolist()]
    assert lens == [6, 0, 0, 6]
