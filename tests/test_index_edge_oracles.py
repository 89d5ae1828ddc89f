"""Adversarial driver-contract probes for the INDEX query family (the
test_edge_oracles.py pattern — real queries() vs oracle_sql() over
synthetic edge corpora — but with corpora dense enough for the
deterministic probe rule, which the shared edge corpus cannot satisfy:
no term there reaches df >= 5).

Edges covered: chunk-boundary doc ids (span 128), doubled spaces (empty
tokens occupy position slots), empty / whitespace-only documents,
multibyte terms, an all-even corpus (the merge's updates side is empty),
an all-odd corpus (the stored side is empty), a corpus with fewer than k
frequent terms (the probe must fail LOUDLY, not serve a wrong pair), and
a corpus whose pairwise intersections are all non-empty while the 3-way
intersection is empty."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry
from streamvbyte_spark.session import get_spark

INDEX_QUERIES = ["index_intersect", "index_union", "index_phrase_match",
                 "index_topk_and", "index_and_multi",
                 "index_merge_updates", "index_merge_updates_pos",
                 "index_build_chunked"]


def _dense_corpus():
    """>= 3 terms with df >= 5, ids crossing the span-128 chunk boundary,
    plus the textual edges."""
    rows = []
    for i in range(140):
        words = ["aa"]
        if i % 2 == 0:
            words.append("bb")
        if i % 3 == 0:
            words.append("cc")
        if i % 50 == 0:
            words.append("zzé")          # multibyte, low df
        rows.append((i, " ".join(words)))
    rows += [(140, ""), (141, "   "),     # empty / whitespace-only docs
             (142, "aa  bb   cc"),        # doubled spaces: empty positions
             (200, "aa bb cc")]           # second chunk (200 div 128 = 1)
    return rows


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="index-edge-oracles", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _probe(spark, name, docs_rows, expect_err=None):
    tmp = tempfile.mkdtemp(prefix="svb_idx_edge_")
    try:
        pq.write_table(pa.table({
            "doc_id": [str(d) for d, _ in docs_rows],
            "text": [t for _, t in docs_rows],
            "source": ["s"] * len(docs_rows)}), f"{tmp}/documents.parquet")
        con = duckdb.connect()
        con.execute("create view documents as select * from "
                    f"'{tmp}/documents.parquet'")
        try:
            sdf = entry.queries()[name](spark, tmp)
            got = sorted(map(tuple, sdf.collect()), key=repr)
        except Exception as ex:  # noqa: BLE001 - asserting the error text
            assert expect_err and expect_err in str(ex), (name, ex)
            return
        assert expect_err is None, f"{name}: expected {expect_err!r}"
        want = sorted(map(tuple,
                          con.sql(entry.oracle_sql()[name]).fetchall()),
                      key=repr)
        assert got == want, (name, got[:3], want[:3])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_index_family_on_dense_edge_corpus(spark):
    docs = _dense_corpus()
    for name in INDEX_QUERIES:
        _probe(spark, name, docs)


def test_merge_equivalences_with_one_empty_side(spark):
    # all-even ids: every chunk is untouched, updates is EMPTY
    even = [(2 * i, f"t{i % 7} aa bb") for i in range(60)]
    # all-odd ids: stored is EMPTY, every chunk arrives as an update
    odd = [(2 * i + 1, f"t{i % 7} aa bb") for i in range(60)]
    for docs in (even, odd):
        _probe(spark, "index_merge_updates", docs)
        _probe(spark, "index_merge_updates_pos", docs)


def test_kway_probe_fails_loudly_when_terms_scarce(spark):
    docs = [(i, "aa") for i in range(10)] + [(10, "bb"), (11, "cc")]
    _probe(spark, "index_and_multi", docs,
           expect_err="needs 3 probe terms")


def test_kway_empty_intersection_with_nonempty_pairs(spark):
    docs = ([(i, "aa bb") for i in range(10)]
            + [(10 + i, "bb cc") for i in range(10)]
            + [(20 + i, "aa cc") for i in range(10)])
    _probe(spark, "index_and_multi", docs)
