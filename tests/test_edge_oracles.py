"""Adversarial driver-contract probe: run real queries() vs oracle_sql()
over a synthetic sf dir of EDGE documents the driver's sf0.01 corpus never
contains — empty strings, single words, multibyte UTF-8/emoji, repeated
whitespace (empty words), exact duplicates, shingle-boundary lengths.
Catches cross-engine divergences (tokenizer ascii(), split semantics,
empty-array codec paths) at the same surface the driver grades."""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry
from streamvbyte_spark.session import get_spark

TEXTS = [
    "",                       # empty text -> one empty word -> token 0 (ascii('') = 0 both engines)
    "a",                      # single 1-char word
    "a b",                    # two words: no 3-gram shingle
    "a b c",                  # exactly one shingle
    "a  b",                   # repeated space -> empty middle word
    " lead",                  # leading space
    "trail ",                 # trailing space
    "héllo wörld ünïcode tęst",     # latin multibyte
    "日本語 の テスト 文書 です",      # CJK words
    "emoji 🙂 in 🚀 text 🌍 here",   # surrogate-pair codepoints
    "dup dup dup dup dup dup",       # heavy repetition (rle/dict paths)
    "the and of the and of the and", # stopwords only (quality/lang paths)
    "x " * 40 + "x",                 # long uniform doc
    "wordA wordB wordC wordD wordE wordF wordG wordH wordI wordJ",
    "w " * 600 + "w",                # 601 tokens: spans 3 sequence_pack packs
]
# exact duplicates across doc_ids (dedup paths) + a near-dup (shared shingles)
DOCS = [(f"d{i:02d}", t, "edge") for i, t in enumerate(TEXTS)]
DOCS += [("d90", TEXTS[13], "edge"),             # exact dup of d13
         ("d91", TEXTS[13] + " wordK", "edge"),  # near-dup (9 shared shingles)
         ("d92", "solo doc in another source he said", "other")]

# events: half-cent/negative rounding, an EXACT 30-min gap (not a session
# break; the break is strictly >), a gap one microsecond past it (break),
# duplicate timestamps for one user, a DST-transition-night wall clock
import datetime as _dt

_EV_BASE = _dt.datetime(2024, 3, 10, 1, 30, 0)
EVENTS = [
    ("e0", "u1", 0, "click", 0.005),
    ("e1", "u1", 1_800_000_000, "click", -0.005),
    ("e2", "u1", 3_600_000_001, "error", 0.015),
    ("e3", "u2", 0, "click", 2.675),
    ("e4", "u2", 0, "error", -2.675),
    ("e5", "u2", 0, "click", 1e9 + 0.125),
    ("e6", "u3", 59_999_999, "view", 0.0),
    ("e7", "u3", 119_999_999, "click", 0.345),
]
EVENT_QUERIES = ["event_sessions", "events_hourly", "top_users_by_value",
                 "users_intersect"]

# lineitem -> posting lists: single-element lists, duplicate orderkeys
# (delta 0 at the seam), values at the int32 ceiling, a long 40-element
# list spanning several chunk_size-8 chunks and the max_len-20 cut
LINEITEM = (
    [(1, 7)]                                      # single-element posting
    + [(2, 5), (2, 5), (2, 5)]                    # all-duplicates posting
    + [(3, 2**31 - 1), (3, 2**31 - 2), (3, 1)]    # int32-ceiling values
    + [(4, 10 * j + 3) for j in range(40)]        # 40 elements, 5 chunks
    + [(5, j + 1) for j in range(8)]              # exactly one chunk
    + [(6, 2), (6, 2), (6, 9), (6, 9), (6, 9)]    # duplicate runs
)
POSTING_QUERIES = ["delta_roundtrip_postings", "delta_size_postings",
                   "ef_roundtrip_postings", "ef_size_postings",
                   "chunked_roundtrip_postings", "chunked_fused_roundtrip",
                   "chunked_truncate_decode",
                   # r7: EF chunks over the same boundary lists (int32
                   # ceiling, zero deltas at duplicate seams, single
                   # elements), and the sortedness-gated selector where
                   # every row is eligible
                   "chunked_ef_roundtrip", "auto_sorted_roundtrip",
                   "auto_sorted_size_postings"]

QUERIES = [
    "svb_roundtrip", "svb0124_roundtrip", "auto_roundtrip", "fsst_roundtrip",
    "auto_full_roundtrip", "svb_size", "svb0124_size", "auto_size",
    "auto_full_size", "bitpack_size", "for_size", "dict_size", "rle_size",
    "validate_stream", "validate_stream_truncated", "max_compressed_bound",
    "zone_map_prune", "truncate_decode", "token_count", "quality_score",
    "lang_id", "fingerprint", "dedup_exact", "dedup_simhash",
    "dedup_minhash_pairs", "dedup_ngram_jaccard", "dedup_simhash_pairs",
    "top_terms", "token_quantiles", "sequence_pack", "pack_sequences",
    "pack_sequences_encoded", "decontaminate",
    "jsonl_roundtrip", "orc_roundtrip", "csv_roundtrip", "curation_pipeline",
    "metrics_by_source", "metrics_by_codec", "multimodal_features",
    "image_decode_stats", "audio_decode_stats", "curate_metrics",
    # r6 additions: signature-verified pairs, compressed PNG decode, both
    # vocab remap paths (broadcast + shuffle-join), components + composite
    "dedup_minhash_verified", "png_decode_stats",
    "vocab_remap_metrics", "vocab_remap_join_metrics",
    "dedup_components", "curate_neardup_metrics", "multimodal_frames",
    "pack_store_roundtrip", "dedup_components_verified",
    "curated_pack_sequences", "curated_pack_encoded",
    # r7: the sortedness gate over MOSTLY-unsorted token rows (constant
    # and single-word docs are sorted — the mask must flip per row), and
    # baseline JPEG decode over multibyte/emoji/empty byte streams (docs
    # under 2 bytes are filtered on BOTH sides)
    "auto_sorted_size", "jpeg_decode_stats", "adpcm_decode_stats",
]


EMB_QUERIES = ["ann_topk", "ann_cosine_topk", "ann_lsh", "ann_ivf", "ann_recall",
               "ann_recall_ivf", "embedding_neardup",
               "zigzag_roundtrip_embeddings", "zzdelta_roundtrip_embeddings"]


def _edge_embeddings():
    import numpy as np
    rng = np.random.default_rng(5)
    vecs = [np.zeros(64, np.float32),            # zero vector (padding row)
            np.zeros(64, np.float32),            # second zero: the pair
            # co-buckets trivially and must NOT divide by zero (cos := 0)
            np.ones(64, np.float32) * 0.5,
            np.ones(64, np.float32) * 0.5,       # identical pair (cos = 1)
            rng.normal(0, .3, 64).astype(np.float32),
            -np.ones(64, np.float32)]            # all-negative components
    vecs += [rng.normal(0, .3, 64).astype(np.float32) for _ in range(20)]
    return vecs


@pytest.fixture(scope="module")
def edge_env():
    tmp = tempfile.mkdtemp(prefix="svb_edge_")
    pq.write_table(pa.table({
        "doc_id": [d[0] for d in DOCS],
        "text": [d[1] for d in DOCS],
        "source": [d[2] for d in DOCS],
        "lang": ["xx"] * len(DOCS),
    }), f"{tmp}/documents.parquet")
    vecs = _edge_embeddings()
    pq.write_table(pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": [v.tolist() for v in vecs],
    }), f"{tmp}/embeddings.parquet")
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in LINEITEM], pa.int64()),
        "l_orderkey": pa.array([r[1] for r in LINEITEM], pa.int64()),
    }), f"{tmp}/lineitem.parquet")
    pq.write_table(pa.table({
        "event_id": [e[0] for e in EVENTS],
        "user_id": [e[1] for e in EVENTS],
        "ts": pa.array([_EV_BASE + _dt.timedelta(microseconds=e[2])
                        for e in EVENTS], pa.timestamp("us")),
        "event_type": [e[3] for e in EVENTS],
        "value": [e[4] for e in EVENTS],
    }), f"{tmp}/events.parquet")
    spark = get_spark(app="edge-oracles", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{tmp}/documents.parquet'")
    con.execute(
        f"create view embeddings as select * from '{tmp}/embeddings.parquet'")
    con.execute(
        f"create view events as select * from '{tmp}/events.parquet'")
    con.execute(
        f"create view lineitem as select * from '{tmp}/lineitem.parquet'")
    yield spark, con, tmp
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            assert not isinstance(v, (list, tuple)), \
                f"array-typed result column {cols[i]!r} (driver cannot hash)"
            vals.append(round(v, 6) if isinstance(v, float) else v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def test_edge_documents_match_oracles(edge_env):
    _run(edge_env, QUERIES)


def test_edge_embeddings_match_oracles(edge_env):
    """Zero-norm, identical, and all-negative vectors through the similarity
    queries: the zero pair co-buckets and must emit cos_sim 0, not a
    DIVIDE_BY_ZERO (regression: pipeline_sql._neardup_final's guard)."""
    _run(edge_env, EMB_QUERIES)


def test_edge_events_match_oracles(edge_env):
    """Session-gap boundary (exactly 30 min is NOT a break; +1us is),
    duplicate timestamps, half-cent/negative value rounding, DST-night wall
    clock — all value-exact in both engines."""
    _run(edge_env, EVENT_QUERIES)


def test_edge_postings_match_oracles(edge_env):
    """Delta/chunked paths over boundary posting lists: single elements,
    all-duplicate lists (zero deltas), values at the int32 ceiling, and
    lists whose length lands exactly on / across chunk boundaries."""
    _run(edge_env, POSTING_QUERIES)


def _run(edge_env, names):
    spark, con, tmp = edge_env
    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, tmp)
            got = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
            rel = con.sql(os_[name])
            want = _normalize(rel.fetchall(), rel.columns)
            if got != want:
                diff = [(g, w) for g, w in zip(got, want) if g != w][:2]
                failures.append((name, len(got), len(want), diff))
        except Exception as e:  # noqa: BLE001 - collect every query's verdict
            failures.append((name, "error", type(e).__name__, str(e)[:200]))
    assert not failures, failures


def test_digit_length_straddling_dup_ids_match_oracles(spark_only_env):
    """Exact-dup twins whose NUMERIC ids straddle a digit-length boundary
    (99/100) and live in DIFFERENT sources: numeric order picks 99 as the
    md5-window winner, string order picks "100" — the engine contract is
    doc_id:string, so both engines must order the VARCHAR.  r10: the
    sf0.1 sweep caught curate_neardup_metrics' oracle binding the BASE
    numeric column in its dedup window (DuckDB windows do not see
    select-list aliases), flipping one doc between dropped_exact and
    dropped_neardup; the module's shared corpus could never catch it
    because its doc ids are non-numeric strings.  Every md5-window query
    runs here over the adversarial ids."""
    spark, con, tmp = spark_only_env
    for name in ("curate_neardup_metrics", "dedup_exact", "curate_metrics",
                 "curation_pipeline", "curated_pack_sequences"):
        _run_one_corpus(spark, con, tmp, name)


@pytest.fixture(scope="module")
def spark_only_env():
    tmp = tempfile.mkdtemp(prefix="svb_edge_ids_")
    docs = (
        # twins straddling the 2->3 digit boundary, in different sources
        [(99, "dup dup text here we go again and again", "srcA"),
         (100, "dup dup text here we go again and again", "srcB")]
        # a second straddling pair at 3->4 digits, same source
        + [(999, "other duplicated body with enough words to pass gates "
                 "one two three four five six", "srcA"),
           (1000, "other duplicated body with enough words to pass gates "
                  "one two three four five six", "srcA")]
        # filler uniques so percentile/pack queries have volume
        + [(i, f"unique body {i} " + "w " * 12 + "tail", "srcA")
           for i in range(1, 40)]
    )
    # doc_id stays INT64 like the real testdata — the bug class this
    # corpus pins only exists when the base column is numeric and one
    # engine's window/order text silently binds it instead of the
    # varchar alias
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": [d[1] for d in docs],
        "source": [d[2] for d in docs],
    }), f"{tmp}/documents.parquet")
    spark = get_spark(app="edge-ids", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{tmp}/documents.parquet'")
    yield spark, con, tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _run_one_corpus(spark, con, tmp, name):
    qs, os_ = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, tmp)
    got = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    rel = con.sql(os_[name])
    want = _normalize(rel.fetchall(), rel.columns)
    assert got == want, (name, got[:4], want[:4])
