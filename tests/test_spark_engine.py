"""Spark-layer integration tests: encode/decode operators, chunked delta with
prev chaining, checkpoint-resume lineage, multimodal plumbing, disk round-trip
(the writeseq analog, /root/reference/tests/writeseq.c)."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamvbyte_spark.codec import core
from streamvbyte_spark.operators import decode_table, encode_table, verify_roundtrip
from streamvbyte_spark.operators.chunking import (
    chunk_tokens, decode_chunked_delta, encode_chunked_delta, reassemble)
from streamvbyte_spark.operators.lineage import (
    encode_with_checkpoint, lineage_metrics, read_encoded)
from streamvbyte_spark.operators.multimodal import extract_features, synth_media_table
from streamvbyte_spark.session import get_spark
from streamvbyte_spark.sources import synthetic_tokens, tokens_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def tok(spark):
    return tokens_from_documents(spark, SF).cache()


def test_roundtrip_all_codecs(spark, tok):
    for codec in ["svb", "svb0124", "svb_delta", "bitpack", "for", "dict", "rle", "auto"]:
        dec = decode_table(encode_table(tok, codec=codec))
        assert verify_roundtrip(tok, dec) == 0, codec


def test_size_never_exceeds_reference(spark, tok):
    """north rule: compressed size <= reference streamvbyte_encode output."""
    enc = encode_table(tok, codec="auto")
    rows = enc.select("doc_id", "out_bytes").collect()
    toks = {r.doc_id: r.tokens for r in tok.collect()}
    for r in rows:
        ref = core.compressed_size(np.array(toks[r.doc_id], dtype=np.int64))
        assert r.out_bytes <= ref


def test_chunked_delta_prev_chaining(spark):
    syn = synthetic_tokens(spark, 50, avg_len=300, seed=7, partitions=2)
    # sorted arrays exercise the delta path hardest
    sorted_tok = syn.select(
        "doc_id", F.array_sort("tokens").alias("tokens"),
        "n_tok", "source").cache()
    chunked = chunk_tokens(sorted_tok, chunk_size=64)
    enc = encode_chunked_delta(chunked)
    dec = decode_chunked_delta(enc)
    back = reassemble(dec)
    orig = sorted_tok.select("doc_id", F.col("tokens").alias("t0"))
    got = back.select("doc_id", F.col("tokens").alias("t1"))
    bad = orig.join(got, "doc_id", "full_outer").where(
        ~(F.col("t0") == F.col("t1")) | F.col("t0").isNull() | F.col("t1").isNull())
    assert bad.count() == 0
    # chunk seams: prev of chunk k must equal the last token of chunk k-1
    a = dec.select("doc_id", "chunk_id", F.element_at("chunk", -1).cast("long").alias("last_tok"))
    b = enc.select("doc_id", (F.col("chunk_id") - 1).alias("chunk_id"), "prev")
    bad_seams = a.join(b, ["doc_id", "chunk_id"]).where(
        F.col("prev") != F.col("last_tok")).count()
    assert bad_seams == 0


def test_checkpoint_resume(spark, tok):
    path = tempfile.mkdtemp(prefix="svb_ckpt_")
    try:
        r1 = encode_with_checkpoint(tok, path, n_buckets=8, fail_after_buckets=3)
        assert r1["encoded_buckets"] == 3
        r2 = encode_with_checkpoint(tok, path, n_buckets=8)
        assert r2["encoded_buckets"] == 5
        r3 = encode_with_checkpoint(tok, path, n_buckets=8)
        assert r3.get("skipped")  # nothing left to do
        enc = read_encoded(spark, path)
        assert enc.count() == tok.count()
        assert verify_roundtrip(tok, decode_table(enc.drop("bucket"))) == 0
        lin = lineage_metrics(spark, path)
        assert lin.select("bucket").distinct().count() == 8
        # lineage checksums match the data
        agg = enc.groupBy("bucket").agg(F.sum("checksum").alias("cs"))
        j = lin.join(agg, "bucket").where(F.col("cs") != F.col("checksum_sum"))
        assert j.count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_disk_roundtrip_writeseq(spark, tok):
    """Encoded streams survive a parquet write/read cycle byte-identically
    (the tests/writeseq.c analog)."""
    path = tempfile.mkdtemp(prefix="svb_disk_")
    try:
        enc = encode_table(tok, codec="auto")
        enc.write.mode("overwrite").parquet(path + "/enc")
        back = spark.read.parquet(path + "/enc")
        assert verify_roundtrip(tok, decode_table(back)) == 0
        # byte identity of the binary column itself
        a = {r.doc_id: bytes(r.encoded) for r in enc.collect()}
        b = {r.doc_id: bytes(r.encoded) for r in back.collect()}
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = synth_media_table(docs)
    feats = extract_features(media).collect()
    assert len(feats) == docs.count()
    texts = {str(r.doc_id): r.text for r in docs.collect()}
    for r in feats[:20]:
        raw = texts[r.doc_id].encode()
        assert r.n_bytes == len(raw)
        assert r.byte_sum == sum(raw)
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-3


def test_multimodal_frame_sampling(spark):
    """sample_frames == pure-Python slicing reference (every 2nd 64-byte
    frame, partial tail kept), including empty payloads producing no rows."""
    from streamvbyte_spark.operators.multimodal import sample_frames
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    media = synth_media_table(docs)
    got = {}
    for r in sample_frames(media, frame_bytes=64, every=2).collect():
        got.setdefault(r.doc_id, []).append(
            (r.frame_id, r.frame_len, r.frame_sum, bytes(r.frame)))
    texts = {str(r.doc_id): r.text.encode() for r in docs.collect()}
    for doc_id, raw in texts.items():
        exp = []
        for fid in range(0, (len(raw) + 63) // 64, 2):
            chunk = raw[fid * 64:(fid + 1) * 64]
            exp.append((fid, len(chunk), sum(chunk), chunk))
        assert sorted(got.get(doc_id, [])) == exp, doc_id


def test_decode_stub_gated(spark):
    from streamvbyte_spark.operators.multimodal import (decode_audio,
                                                        decode_image)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_salted_and_range_partitioning(spark, tok):
    enc_r = encode_table(tok, codec="svb", range_partitions=4)
    enc_s = encode_table(tok, codec="svb", salt_partitions=4)
    assert enc_r.count() == enc_s.count() == tok.count()
    assert verify_roundtrip(tok, decode_table(enc_r)) == 0


def test_salting_evens_skewed_source(spark):
    """80% of docs share source='web'; without salting a source-partitioned
    stage puts them on one task. Salted repartition must spread them."""
    syn = synthetic_tokens(spark, 2000, avg_len=32, seed=11, partitions=4)
    salted = encode_table(syn, codec="svb", salt_partitions=8)
    sizes = [r.n for r in
             salted.groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.count("*").alias("n")).collect()]
    assert len(sizes) >= 6  # range sampler may merge adjacent salt values
    assert max(sizes) < 2 * (sum(sizes) / len(sizes))  # no partition >2x mean


def test_public_api_facade(spark):
    import streamvbyte_spark as svb
    assert set(svb.codecs) >= {"svb", "svb0124", "svb_delta", "bitpack",
                               "for", "dict", "rle", "fsst"}
    tok = tokens_from_documents(spark, SF)
    assert svb.verify_roundtrip(tok, svb.decode_table(svb.encode_table(tok))) == 0


def test_sql_udf_registry(spark, tok):
    """SURVEY §2.2 UDF surface: codec API callable from SQL expressions."""
    from streamvbyte_spark.functions.udfs import register_udfs
    register_udfs(spark)
    tok.createOrReplaceTempView("tok_udf")
    rows = spark.sql("""
        select doc_id,
               svb_decode(svb_encode(tokens), n_tok) as back,
               tokens,
               svb_size(tokens) as sz,
               svb_auto_size(tokens) as asz,
               length(svb_encode(tokens)) as real_sz,
               svb_validate(svb_encode(tokens), n_tok) as ok
        from tok_udf
    """).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.back == r.tokens
        assert r.sz == r.real_sz
        assert r.asz <= r.sz
        assert r.ok
    # per-codec variants round-trip too
    r2 = spark.sql("select tokens, rle_decode(rle_encode(tokens), n_tok) as b "
                   "from tok_udf limit 50").collect()
    assert all(r.b == r.tokens for r in r2)


def test_sql_udfs_match_batched_kernels_and_reject_nulls(spark):
    """The registered SQL UDFs route input extraction through the shared
    one-pass Arrow conversion (text_udfs.series_to_flat / _flat_binary).
    Parity: UDF outputs must equal the batched kernels byte-for-byte on the
    same frame; and a NULL ELEMENT inside an array must fail LOUDLY — the
    replaced per-row np.asarray path silently converted the flat to float64
    NaN and corrupted downstream folds (r6 verdict item 6)."""
    from streamvbyte_spark.codec import batched
    from streamvbyte_spark.functions.udfs import register_udfs
    register_udfs(spark)
    rows = [("a", [1, 70000, 3]), ("b", []), ("c", [5]),
            ("d", list(range(300, 260, -1)))]
    df = spark.createDataFrame([(d, t, len(t)) for d, t in rows],
                               "doc_id string, tokens array<int>, n_tok int")
    df.createOrReplaceTempView("udf_parity")
    got = {r.doc_id: (bytes(r.e), r.sz, list(r.zz))
           for r in spark.sql(
               "select doc_id, svb_encode(tokens) as e, svb_size(tokens) "
               "as sz, zigzag_decode(zigzag_encode(tokens), n_tok) as zz "
               "from udf_parity").collect()}
    for d, t in rows:
        flat = np.asarray(t, dtype=np.uint32)
        offs = np.array([0, len(t)], dtype=np.int64)
        out, ooff, _ = batched.encode_rows(flat, offs, codec="svb")
        assert got[d][0] == out.tobytes(), d
        assert got[d][1] == int(ooff[-1]), d
        assert got[d][2] == t, d
    nulls = spark.createDataFrame([("n", [1, None, 3], 3)],
                                  "doc_id string, tokens array<int>, n_tok int")
    nulls.createOrReplaceTempView("udf_nulls")
    with pytest.raises(Exception, match="NULL"):
        spark.sql("select svb_size(tokens) from udf_nulls").collect()
    with pytest.raises(Exception, match="NULL"):
        spark.sql("select zigzag_encode(tokens) from udf_nulls").collect()


def test_full_curation_pipeline(spark):
    """End-to-end: dedup -> quality gate -> tokenize -> auto encode -> lineage
    write; rerun is a no-op (resume sees all buckets committed)."""
    from streamvbyte_spark.pipeline import curate_and_encode, curate_documents
    from streamvbyte_spark.operators.lineage import read_encoded
    path = tempfile.mkdtemp(prefix="svb_pipe_")
    try:
        r = curate_and_encode(spark, SF, path, n_buckets=8)
        assert r["encoded_buckets"] == 8
        assert 0 < r["ratio"] < 1
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        tok = curate_documents(docs)
        assert r["docs"] == tok.count() <= docs.count()
        # encoded output decodes bit-identically to the curated token table
        enc = read_encoded(spark, path)
        assert verify_roundtrip(tok, decode_table(enc.drop("bucket"))) == 0
        # resume: nothing left
        assert curate_and_encode(spark, SF, path, n_buckets=8).get("skipped")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_chunked_fused_matches_unfused(spark, tok):
    """decode_reassemble_fused (applyInPandas, shuffles encoded bytes) must
    agree with the chunk->decode->reassemble pipeline and the original."""
    from streamvbyte_spark.operators.chunking import (
        chunk_tokens, decode_chunked_delta, decode_reassemble_fused,
        encode_chunked_delta, reassemble)
    enc = encode_chunked_delta(chunk_tokens(tok, chunk_size=16))
    a = {r.doc_id: list(r.tokens) for r in
         reassemble(decode_chunked_delta(enc)).collect()}
    b = {r.doc_id: list(r.tokens) for r in
         decode_reassemble_fused(enc).collect()}
    orig = {r.doc_id: list(r.tokens) for r in tok.where("n_tok > 0").collect()}
    assert a == b == orig


def test_chunked_fused_run_straddles_arrow_batches(spark, tok):
    """A document's chunk run must survive being split across Arrow batch
    boundaries inside the fused decode's partition iterator (the carried
    tail-run path): force 3-row batches so every multi-chunk doc straddles."""
    from streamvbyte_spark.operators.chunking import (
        chunk_tokens, decode_reassemble_fused, encode_chunked_delta)
    enc = encode_chunked_delta(chunk_tokens(tok, chunk_size=4))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = {r.doc_id: list(r.tokens) for r in
               decode_reassemble_fused(enc).collect()}
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    orig = {r.doc_id: list(r.tokens) for r in tok.where("n_tok > 0").collect()}
    assert got == orig


def test_chunked_fused_seam_placement(spark):
    """Adversarial Arrow-batch cut placement for the fused decode's carry
    logic (operators/chunking.py): (a) every batch boundary landing EXACTLY
    between two docs (2-chunk docs, 2-row batches -> the carried run always
    closes at a batch seam, exercising the flush-on-id-mismatch branch), and
    (b) one doc spanning >= 4 consecutive batches (9 chunks, 2-row batches ->
    the pending-segment list accumulates across several batches before one
    final concatenation)."""
    from streamvbyte_spark.operators.chunking import (
        chunk_tokens, decode_reassemble_fused, encode_chunked_delta)
    rng = np.random.default_rng(17)
    rows = []
    for j in range(12):          # (a) 2-chunk docs: 8 tokens, chunk_size 4
        rows.append((f"a{j:02d}", np.cumsum(rng.integers(0, 50, 8)).tolist()))
    for j in range(3):           # (b) 9-chunk docs: 36 tokens
        rows.append((f"b{j:02d}", np.cumsum(rng.integers(0, 50, 36)).tolist()))
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int")
    enc = encode_chunked_delta(chunk_tokens(df, chunk_size=4))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        got = {r.doc_id: list(r.tokens) for r in
               decode_reassemble_fused(enc).collect()}
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == dict(rows)


def test_chunked_truncate_decode_boundaries(spark):
    """Truncating the chunked layout must equal row[:max_len] at every cut
    placement: mid-chunk, exactly ON a chunk boundary (the boundary chunk is
    filtered, not prefix-decoded), beyond the doc, and max_len 1 — including
    with 2-row Arrow batches so carried runs mix with truncation."""
    from streamvbyte_spark.operators.chunking import (
        chunk_tokens, decode_reassemble_fused, encode_chunked_delta)
    rng = np.random.default_rng(23)
    rows = [(f"d{j:02d}", np.cumsum(rng.integers(0, 50, n)).tolist())
            for j, n in enumerate([1, 3, 4, 8, 9, 16, 17, 23, 40])]
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int")
    enc = encode_chunked_delta(chunk_tokens(df, chunk_size=4))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        for max_len in (1, 3, 4, 5, 8, 16, 100):
            got = {r.doc_id: (list(r.tokens), r.n_tok) for r in
                   decode_reassemble_fused(enc, max_len=max_len).collect()}
            want = {d: (t[:max_len], min(len(t), max_len)) for d, t in rows}
            assert got == want, max_len
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    with pytest.raises(ValueError, match="max_len"):
        decode_reassemble_fused(enc, max_len=0)


def test_chunked_ef_roundtrip_and_truncate(spark):
    """codec='ef' through the chunked pipeline: sorted rows chunk into
    sorted chunks encoded as ABSOLUTE Elias-Fano values (no prev seed) and
    must reassemble exactly — including under truncation at every cut
    placement (the straddling chunk decodes whole and prefix-slices,
    batched.subset_prefix) and with 2-row Arrow batches so carried runs
    mix in.
    An unsorted row must fail loudly at encode, and an unknown chunk codec
    at plan time."""
    from streamvbyte_spark.operators.chunking import (
        chunk_tokens, decode_reassemble_fused, encode_chunked_delta)
    rng = np.random.default_rng(29)
    rows = [(f"d{j:02d}", np.cumsum(rng.integers(0, 50, n)).tolist())
            for j, n in enumerate([1, 3, 4, 8, 9, 16, 17, 23, 40])]
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int")
    enc = encode_chunked_delta(chunk_tokens(df, chunk_size=4), codec="ef")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        got = {r.doc_id: list(r.tokens) for r in
               decode_reassemble_fused(enc, codec="ef").collect()}
        assert got == dict(rows)
        for max_len in (1, 3, 4, 5, 8, 16, 100):
            got = {r.doc_id: (list(r.tokens), r.n_tok) for r in
                   decode_reassemble_fused(enc, max_len=max_len,
                                           codec="ef").collect()}
            want = {d: (t[:max_len], min(len(t), max_len)) for d, t in rows}
            assert got == want, max_len
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    bad = spark.createDataFrame([("u0", [5, 3, 9], 3)],
                                "doc_id string, tokens array<int>, n_tok int")
    with pytest.raises(Exception, match="non-decreasing"):
        encode_chunked_delta(chunk_tokens(bad, chunk_size=4),
                             codec="ef").collect()
    with pytest.raises(ValueError, match="chunk codec"):
        encode_chunked_delta(chunk_tokens(df, chunk_size=4), codec="nope")


def test_auto_sorted_selector_kernel():
    """auto_sorted: cost==len(encode) per row, exact round-trip with mixed
    ef/standard codec ids, EF never assigned to an unsorted row, and the
    selected size always <= the plain auto size (EF only ever improves)."""
    from streamvbyte_spark.codec import batched
    rng = np.random.default_rng(31)
    rows = []
    for i in range(300):
        n = int(rng.integers(0, 60))
        v = rng.integers(0, 2**18, n).astype(np.uint32)
        if i % 2 == 0:
            v = np.sort(v)
        rows.append(v)
    flat = np.concatenate(rows)
    offs = np.concatenate(
        [[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    out, ooff, cids = batched.encode_rows(flat, offs, codec="auto_sorted")
    dec, _ = batched.decode_rows(out, ooff, offs[1:] - offs[:-1], cids)
    assert np.array_equal(dec, flat)
    sizes = batched.auto_sorted_sizes(flat, offs)
    assert np.array_equal(sizes, ooff[1:] - ooff[:-1])
    auto = batched.row_costs(flat, offs,
                             batched.VECTOR_COST_CODECS).min(axis=1)
    assert (sizes <= auto).all()
    is_ef = cids == batched.CODEC_ID["ef"]
    assert is_ef.any()
    assert not (is_ef & ~batched.row_sorted_mask(flat, offs)).any()


def test_checkpoint_resume_idempotent_across_commit_gap(spark, tok):
    """Crash between the data write and the lineage commit must not
    duplicate rows on rerun: dynamic partition overwrite REPLACES the
    uncommitted bucket partitions instead of appending to them."""
    import os
    path = tempfile.mkdtemp(prefix="svb_ckpt_gap_")
    try:
        encode_with_checkpoint(tok, path, n_buckets=8)
        n = read_encoded(spark, path).count()
        assert n == tok.count()
        # simulate the gap crash: data committed, lineage rows lost
        shutil.rmtree(os.path.join(path, "_lineage"))
        r = encode_with_checkpoint(tok, path, n_buckets=8)
        assert r["encoded_buckets"] == 8  # rerun believed nothing committed
        enc = read_encoded(spark, path)
        assert enc.count() == n  # no duplicates
        assert verify_roundtrip(tok, decode_table(enc.drop("bucket"))) == 0
        lin = lineage_metrics(spark, path)
        agg = enc.groupBy("bucket").agg(F.sum("checksum").alias("cs"))
        assert lin.join(agg, "bucket").where(
            F.col("cs") != F.col("checksum_sum")).count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_sql_zigzag_udfs(spark):
    """Zigzag stream variants callable from SQL (reference zigzag API,
    include/streamvbyte_zigzag.h): signed arrays round-trip through both
    svb_zigzag and svb_zz_delta streams."""
    from streamvbyte_spark.functions.udfs import register_udfs
    register_udfs(spark)
    rows = [("a", [0, -1, 1, -2, 2147483647, -2147483648]),
            ("b", []),
            ("c", [-5, -4, -3, 0, 100000, -100000])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    df.createOrReplaceTempView("zz_udf")
    got = spark.sql("""
        select doc_id, tokens,
               zigzag_decode(zigzag_encode(tokens), size(tokens)) as zz,
               zzdelta_decode(zzdelta_encode(tokens), size(tokens)) as zzd
        from zz_udf
    """).collect()
    for r in got:
        assert r.zz == r.tokens, r.doc_id
        assert r.zzd == r.tokens, r.doc_id


def test_decode_image_table_real_ppm(spark):
    """Real image decode through the Spark operator: PPM payloads built from
    known pixels decode (and resize) to exact shapes and channel means."""
    import numpy as np
    from streamvbyte_spark.operators.multimodal import decode_image_table
    from tests.test_multimodal_decode import make_ppm

    rng = np.random.default_rng(9)
    imgs = {f"m{i}": rng.integers(0, 256, (8 + i, 6, 3), dtype=np.uint8)
            for i in range(5)}
    rows = [(k, "image/ppm", bytearray(make_ppm(v))) for k, v in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id string, media_type string, payload binary")
    got = {r.doc_id: r for r in decode_image_table(df).collect()}
    for k, v in imgs.items():
        r = got[k]
        assert (r.height, r.width) == v.shape[:2]
        np.testing.assert_allclose(
            [r.mean_r, r.mean_g, r.mean_b],
            v.reshape(-1, 3).mean(axis=0), rtol=1e-12)
    # resized path
    got2 = decode_image_table(df, out_w=4, out_h=4).collect()
    assert all(r.height == 4 and r.width == 4 for r in got2)


def test_connected_components_known_graph(spark):
    """Label propagation must find exact components on a graph with a long
    chain (stresses multi-round convergence), a triangle, and an isolated
    edge."""
    from streamvbyte_spark.operators.components import connected_components
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),  # chain
             ("x", "y"), ("y", "z"), ("x", "z"),              # triangle
             ("p", "q")]                                      # edge
    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    got = {r.doc_id: r.component_id
           for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a",
                   "x": "x", "y": "x", "z": "x",
                   "p": "p", "q": "p"}


def test_million_token_doc_chunked_fused(spark):
    """A single 1M-token document survives chunk -> delta encode -> fused
    mapInArrow decode (exercises the int32-offset guard path headroom, the
    prev chain across 245 chunk seams, and the carried-run logic at real
    chunk counts)."""
    import numpy as np
    from streamvbyte_spark.operators.chunking import (
        chunk_tokens, decode_reassemble_fused, encode_chunked_delta)
    n = 1_000_000
    rng = np.random.default_rng(17)
    toks = np.cumsum(rng.integers(0, 9, n, dtype=np.int64)).astype(np.int64)
    df = spark.createDataFrame(
        [("big", toks.astype(int).tolist(), n, "stress")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    enc = encode_chunked_delta(chunk_tokens(df, chunk_size=4096))
    out = decode_reassemble_fused(enc).collect()
    assert len(out) == 1 and out[0].n_tok == n
    np.testing.assert_array_equal(np.array(out[0].tokens, dtype=np.int64), toks)


def test_jsonl_source_roundtrip(spark, tok):
    """JSONL staging format: write the canonical token table as JSON-Lines,
    read it back through tokens_from_jsonl, encode both — byte-identical."""
    from streamvbyte_spark.sources import tokens_from_jsonl, write_tokens_jsonl
    path = tempfile.mkdtemp(prefix="svb_jsonl_")
    try:
        write_tokens_jsonl(tok, path + "/j")
        back = tokens_from_jsonl(spark, path + "/j")
        assert back.count() == tok.count()
        assert verify_roundtrip(tok, back) == 0  # token arrays identical
        a = {r.doc_id: bytes(r.encoded)
             for r in encode_table(tok, codec="auto").collect()}
        b = {r.doc_id: bytes(r.encoded)
             for r in encode_table(back, codec="auto").collect()}
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compact_encoded_preserves_bytes(spark, tok):
    """Compaction must shrink the file count and leave every encoded payload
    byte-identical (and the lineage checksums still matching)."""
    import os
    from streamvbyte_spark.operators.lineage import (
        compact_encoded, encode_with_checkpoint, read_encoded)
    path = tempfile.mkdtemp(prefix="svb_compact_")
    try:
        # many writer tasks -> one file per (task, bucket): the small-file
        # problem every append/resume cycle compounds
        encode_with_checkpoint(tok.repartition(6), path, n_buckets=4)
        before = {r.doc_id: bytes(r.encoded)
                  for r in read_encoded(spark, path).collect()}
        stats = compact_encoded(spark, path, files_per_bucket=1)
        assert stats["files_after"] < stats["files_before"]
        assert stats["files_after"] <= 4
        after = {r.doc_id: bytes(r.encoded)
                 for r in read_encoded(spark, path).collect()}
        assert after == before
        assert verify_roundtrip(tok, decode_table(
            read_encoded(spark, path).drop("bucket"))) == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_encoded_scan_pushes_doc_filter(spark, tok):
    """A doc_id predicate on the encoded table must reach the parquet scan
    (PushedFilters) BEFORE any decode stage — decode work is proportional to
    rows scanned, so pushdown is the decode-side scan-pruning lever."""
    path = tempfile.mkdtemp(prefix="svb_push_")
    try:
        encode_table(tok, codec="auto").write.mode("overwrite").parquet(path + "/enc")
        enc = spark.read.parquet(path + "/enc").where(F.col("doc_id") >= "doc0000000100")
        dec = decode_table(enc)
        from streamvbyte_spark.plans import plan_string
        plan = plan_string(dec, "formatted")
        assert "PushedFilters" in plan and "GreaterThanOrEqual(doc_id" in plan, plan
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_vocab_remap_invertible_and_smaller(spark, tok):
    """Frequency-rank remap: bijective over the corpus vocab (invertible
    given the vocab table), rank 0 = most frequent token, and the auto-codec
    output must shrink on the zipf-ish corpus."""
    from streamvbyte_spark.operators.vocab import build_vocab, remap_tokens
    vocab = build_vocab(tok)
    v = {r.token: r.new_id for r in vocab.collect()}
    assert sorted(v.values()) == list(range(len(v)))  # bijection onto 0..K-1
    remapped = remap_tokens(tok, vocab)
    back = {r.doc_id: [  # invert through the vocab
        inv[t] for t in r.tokens] for r in remapped.collect()
        for inv in [{nid: tk for tk, nid in v.items()}]}
    orig = {r.doc_id: list(r.tokens) for r in tok.collect()}
    assert back == orig
    before = encode_table(tok, codec="auto").agg(F.sum("out_bytes")).collect()[0][0]
    after = encode_table(remapped, codec="auto").agg(F.sum("out_bytes")).collect()[0][0]
    assert after < before


def test_vocab_remap_guard_and_join_fallback(spark, tok):
    """An over-limit vocabulary must fail loudly instead of silently
    collecting an open id space to the driver; the shuffle-join fallback
    must produce the identical remap without any driver-side vocab."""
    from streamvbyte_spark.operators.vocab import (build_vocab, remap_tokens,
                                                   remap_tokens_join)
    vocab = build_vocab(tok)
    with pytest.raises(ValueError, match="max_vocab"):
        remap_tokens(tok, vocab, max_vocab=5)  # corpus vocab >> 5
    a = {r.doc_id: list(r.tokens) for r in remap_tokens(tok, vocab).collect()}
    b = {r.doc_id: list(r.tokens)
         for r in remap_tokens_join(tok, vocab).collect()}
    assert a == b
    # a token missing from the vocab must raise, not silently mis-remap
    df = spark.createDataFrame(
        [("d0", [1, 2, 999], 3, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    small = spark.createDataFrame([(1, 0), (2, 1)], "token int, new_id int")
    with pytest.raises(Exception, match="outside the vocabulary"):
        remap_tokens_join(df, small).collect()


def test_connected_components_rejects_bad_max_iters(spark):
    from streamvbyte_spark.operators.components import connected_components
    pairs = spark.createDataFrame([("a", "b")], "doc_a string, doc_b string")
    with pytest.raises(ValueError, match="max_iters"):
        connected_components(pairs, max_iters=0)


def test_jsonl_missing_tokens_fails_loudly(spark):
    from streamvbyte_spark.sources import tokens_from_jsonl
    import os
    path = tempfile.mkdtemp(prefix="svb_jsonl_bad_")
    try:
        with open(os.path.join(path, "a.json"), "w") as f:
            f.write('{"doc_id": "ok", "tokens": [1, 2], "source": "s"}\n')
            f.write('{"doc_id": "bad", "source": "s"}\n')  # tokens missing
        with pytest.raises(Exception) as ei:
            tokens_from_jsonl(spark, path).collect()
        assert "missing tokens" in str(ei.value)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_csv_non_integer_token_fails_loudly(spark):
    """FAILFAST can't see inside the space-joined token column (it's read as
    a string); the reader's own guard must reject a non-numeric token id
    instead of letting the non-ANSI cast silently NULL it."""
    from streamvbyte_spark.sources import tokens_from_csv
    import os
    path = tempfile.mkdtemp(prefix="svb_csv_bad_")
    try:
        with open(os.path.join(path, "a.csv"), "w") as f:
            f.write("doc_id,toks,source\n")
            f.write("ok,1 2 3,s\n")
            f.write("bad,1 x 3,s\n")  # 'x' is not an int token id
        with pytest.raises(Exception) as ei:
            tokens_from_csv(spark, path).collect()
        assert "non-integer token" in str(ei.value)
        # the good-only file still reads
        with open(os.path.join(path, "a.csv"), "w") as f:
            f.write("doc_id,toks,source\n")
            f.write("ok,1 2 3,s\n")
        rows = tokens_from_csv(spark, path).collect()
        assert rows[0].tokens == [1, 2, 3] and rows[0].n_tok == 3
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compact_files_per_bucket_splits(spark, tok):
    """files_per_bucket > 1 must actually split each bucket's rows into
    multiple files (the salt path; repartition on bucket alone cannot)."""
    from streamvbyte_spark.operators.lineage import (
        compact_encoded, encode_with_checkpoint, read_encoded)
    path = tempfile.mkdtemp(prefix="svb_compact2_")
    try:
        encode_with_checkpoint(tok, path, n_buckets=2)
        before = {r.doc_id: bytes(r.encoded)
                  for r in read_encoded(spark, path).collect()}
        stats = compact_encoded(spark, path, files_per_bucket=3)
        assert stats["files_after"] > 2  # more than one file per bucket
        after = {r.doc_id: bytes(r.encoded)
                 for r in read_encoded(spark, path).collect()}
        assert after == before
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_zone_map_null_for_empty_docs(spark):
    """Empty token arrays must produce NULL zone-map bounds, not 0/0 (a 0/0
    sentinel is indistinguishable from an all-zeros doc)."""
    df = spark.createDataFrame(
        [("e", [], 0, "s"), ("z", [0, 0], 2, "s"), ("v", [5, 9], 2, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    rows = {r.doc_id: r for r in encode_table(df, codec="auto").collect()}
    assert rows["e"].tok_min is None and rows["e"].tok_max is None
    assert rows["z"].tok_min == 0 and rows["z"].tok_max == 0
    assert rows["v"].tok_min == 5 and rows["v"].tok_max == 9


def test_vectorized_tokenizer_matches_sql_expression(spark):
    """tokenize_rows (the numpy UTF-8 kernel fused into encode_table
    text_input=True) must be value-identical to the dialect-paired SQL
    tokenizer expression (tokens_from_documents) on real testdata AND on
    adversarial texts (empty, repeated spaces, multibyte, astral-plane
    emoji, 8+-char words hitting the 2^24 arm)."""
    import pyarrow as pa
    from streamvbyte_spark.functions.sqlpair import spark_tokens_expr
    from streamvbyte_spark.functions.text_udfs import tokenize_rows
    from streamvbyte_spark.operators.encode import _flat_binary

    def kernel_tokens(texts):
        data, off = _flat_binary(pa.array(texts, pa.string()).cast(pa.binary()))
        flat, toff = tokenize_rows(data, off)
        return [flat[toff[i]:toff[i + 1]].tolist() for i in range(len(texts))]

    rows = (tokens_from_documents(spark, SF)
            .select("doc_id", "tokens", "n_tok").collect())
    texts_by_id = {r.doc_id: r.text for r in spark.read.parquet(
        f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text").collect()}
    got = kernel_tokens([texts_by_id[r.doc_id] for r in rows])
    for r, ktok in zip(rows, got):
        assert r.tokens == ktok and r.n_tok == len(ktok), r.doc_id

    texts = ["", "a", "a b", "a  b", " lead", "trail ", " ", "  ",
             "héllo wörld ünïcode tęst", "日本語 の テスト 文書 です",
             "emoji 🙂 in 🚀 text 🌍 here",
             "longword12345 another-long-word", "dup dup dup"]
    sql = [r.t for r in spark.createDataFrame(
        [(t,) for t in texts], "text string").select(
        F.expr(spark_tokens_expr("text")).alias("t")).collect()]
    assert kernel_tokens(texts) == sql
    # int32 overflow (astral char at a >=5-char word 3rd position): BOTH
    # forms must refuse, like the engines' ANSI cast
    with pytest.raises(Exception, match="(?i)overflow"):
        kernel_tokens(["🙂🙂🙂🙂🙂🙂🙂🙂"])
    with pytest.raises(Exception, match="(?i)overflow"):
        spark.createDataFrame([("🙂🙂🙂🙂🙂🙂🙂🙂",)], "text string").select(
            F.expr(spark_tokens_expr("text")).alias("t")).collect()


def test_text_input_encode_matches_tokens_encode(spark):
    """encode_table(text_input=True) over the raw documents scan must emit
    byte-identical encoded rows to encode_table over the SQL token table."""
    from streamvbyte_spark.sources import documents_scan
    a = encode_table(documents_scan(spark, SF), codec="auto",
                     text_input=True).collect()
    b = encode_table(tokens_from_documents(spark, SF), codec="auto").collect()
    ka = sorted((r.doc_id, r.codec, bytes(r.encoded), r.n_tok, r.checksum,
                 r.tok_min, r.tok_max) for r in a)
    kb = sorted((r.doc_id, r.codec, bytes(r.encoded), r.n_tok, r.checksum,
                 r.tok_min, r.tok_max) for r in b)
    assert ka == kb


def test_size_table_matches_encode_out_bytes(spark):
    """size_table (cost-only, the reference compressedbytes shape) must
    equal the encode pass's out_bytes for every row and codec path."""
    from streamvbyte_spark.operators import size_table
    from streamvbyte_spark.sources import documents_scan, posting_lists
    for codec in ("auto", "svb", "svb0124", "rle"):
        got = {r.doc_id: r.size_bytes for r in size_table(
            documents_scan(spark, SF), codec=codec, text_input=True).collect()}
        want = {r.doc_id: r.out_bytes for r in encode_table(
            tokens_from_documents(spark, SF), codec=codec).collect()}
        assert got == want, codec
    got = {r.doc_id: r.size_bytes for r in size_table(
        posting_lists(spark, SF), codec="svb_delta").collect()}
    want = {r.doc_id: r.out_bytes for r in encode_table(
        posting_lists(spark, SF), codec="svb_delta").collect()}
    assert got == want


def test_fused_text_paths_reject_null_text(spark):
    """NULL text must raise loudly on every fused-tokenizer path (the SQL
    forms yield NULL tokens; silently tokenizing null-as-'' would emit
    token [0] and diverge from the oracles)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from streamvbyte_spark.functions.text_udfs import doc_fingerprint_text
    from streamvbyte_spark.operators import size_table
    tmp = tempfile.mkdtemp(prefix="svb_nulltext_")
    try:
        pq.write_table(pa.table({
            "doc_id": ["a", "b"], "text": ["ok doc", None],
            "source": ["s", "s"]}), f"{tmp}/documents.parquet")
        docs = spark.read.parquet(f"{tmp}/documents.parquet")
        with pytest.raises(Exception, match="NULL"):
            encode_table(docs, codec="auto", text_input=True).collect()
        with pytest.raises(Exception, match="NULL"):
            size_table(docs, codec="auto", text_input=True).collect()
        with pytest.raises(Exception, match="NULL"):
            docs.select(doc_fingerprint_text("text")).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------- inverted index

_IDX_ROWS = [
    (0, "a b a c", "s"),      # duplicate word within one doc -> one posting
    (1, "", "s"),             # empty text -> no terms
    (127, "a  b", "s"),       # double space -> empty token dropped
    (128, "b c", "s"),        # exact chunk-span boundary (span = 128)
    (129, "a", "s"),
    (300, "c a", "s"),
    (4096, "a", "s"),         # far, sparse chunk
]


def _idx_docs(spark):
    return spark.createDataFrame(
        _IDX_ROWS, "doc_id long, text string, source string")


def test_index_chunked_matches_logical(spark):
    """The skew-proof chunked build (groupBy (term, did div span), EF per
    chunk) must reassemble to EXACTLY the logical full-list index, across
    chunk-span boundaries, duplicate in-doc terms, and empty texts."""
    from streamvbyte_spark.operators.chunking import decode_chunked_delta
    from streamvbyte_spark.operators.index import (build_index_chunked,
                                                   term_postings)
    docs = _idx_docs(spark)
    enc = build_index_chunked(docs)
    got: dict[str, list] = {}
    for r in decode_chunked_delta(enc, codec="ef").collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, list(r.chunk)))
    rebuilt = {t: [d for _, ch in sorted(v) for d in ch]
               for t, v in got.items()}
    want = {r.doc_id: list(r.tokens) for r in term_postings(docs).collect()}
    assert rebuilt == want
    assert want["a"] == [0, 127, 129, 300, 4096]
    # the span really split a term across chunks
    assert max(len(v) for v in got.values()) >= 3
    # tok_start is each chunk's offset in the term's full list
    starts = {(r.doc_id, r.chunk_id): r.tok_start for r in enc.collect()}
    for term, chunks in got.items():
        off = 0
        for cid, ch in sorted(chunks):
            assert starts[(term, cid)] == off, (term, cid)
            off += len(ch)


def test_index_intersect_terms(spark):
    """Serving from the encoded wire: AND of two terms = the exact set
    intersection, fingerprinted over ascending ids; absent/disjoint terms
    yield the (0, 0) row, not an empty result."""
    from streamvbyte_spark.operators.index import (build_index_chunked,
                                                   intersect_terms)
    enc = build_index_chunked(_idx_docs(spark)).localCheckpoint()
    row = intersect_terms(enc, "a", "c").collect()[0]
    # a -> {0,127,129,300,4096}; c -> {0,128,300}; common {0,300}
    p, fp = 10**9 + 7, 0
    for t in [0, 300]:
        fp = (fp * 31 + t) % p
    assert (row.term_a, row.term_b, row.n_common) == ("a", "c", 2)
    assert row.fingerprint == fp
    empty = intersect_terms(enc, "b", "zzz").collect()[0]
    assert (empty.n_common, empty.fingerprint) == (0, 0)


def test_index_tf_chunked_and_topk(spark):
    """The TF build's in-kernel run-length (sorted duplicated dids ->
    (distinct did, tf)) must reproduce exact per-(term, doc) counts, and
    the AND top-k must score tf_a + tf_b with deterministic
    (score desc, did asc) order."""
    from collections import Counter
    from streamvbyte_spark.operators.index import (build_index_tf_chunked,
                                                   decode_index_tf,
                                                   topk_and_terms)
    docs = _idx_docs(spark)
    enc = build_index_tf_chunked(docs).localCheckpoint()
    got = {(r.term, r.did): r.tf for r in decode_index_tf(enc).collect()}
    want = Counter()
    for did, text, _ in _IDX_ROWS:
        for w in text.split(" "):
            if w:
                want[(w, did)] += 1
    assert got == dict(want)
    # a AND c: doc 0 has a twice + c once (score 3), doc 300 once each (2)
    rows = topk_and_terms(enc, "a", "c", k=10).collect()
    assert [(r.did, r.tf_a, r.tf_b, r.score) for r in rows] == \
        [(0, 2, 1, 3), (300, 1, 1, 2)]
    # k cuts the list, order preserved
    assert [r.did for r in topk_and_terms(enc, "a", "c", k=1).collect()] == [0]


def _topk_reference(enc, a, b, k):
    """Driver-side reference for the co-grouped top-k (the retired r9
    decode-everything plan, re-derived from the decoded posting rows):
    exact per-(term, doc) tfs, score = tf_a + tf_b, (score desc, did asc)
    order, cut at k."""
    from streamvbyte_spark.operators.index import decode_index_tf
    posts = [(r.term, r.did, r.tf) for r in decode_index_tf(enc).collect()]
    ta = {did: tf for t, did, tf in posts if t == a}
    tb = {did: tf for t, did, tf in posts if t == b}
    rows = [(did, ta[did], tb[did], ta[did] + tb[did])
            for did in set(ta) & set(tb)]
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:k]


def test_index_topk_cogrouped_parity(spark):
    """The co-grouped top-k (chunk_id equi-join + in-lane score +
    per-batch local top-k; THE topk_and_terms implementation since r10 —
    the decode-everything body is retired) must return EXACTLY what a
    driver-side reference computes from the decoded posting rows — rows,
    order, and ties — on the fixture corpus and on a denser multi-chunk
    corpus with tf > 1 and score ties; and its plan must be the
    co-grouped shape (one kernel, no posting explode, a chunk_id join)."""
    import random
    from streamvbyte_spark.operators.index import (build_index_tf_chunked,
                                                   topk_and_terms)
    from streamvbyte_spark.plans.explain import plan_string

    enc = build_index_tf_chunked(_idx_docs(spark)).localCheckpoint()
    for a, b, k in [("a", "c", 10), ("a", "c", 1), ("b", "zzz", 5),
                    ("c", "c", 10)]:
        want = _topk_reference(enc, a, b, k)
        got = [(r.did, r.tf_a, r.tf_b, r.score) for r in
               topk_and_terms(enc, a, b, k=k).collect()]
        assert got == want, (a, b, k)

    # denser corpus: 300 docs over 3+ chunks (span 128), tf in [1, 4],
    # many equal scores so the did-asc tie-break is actually exercised
    rng = random.Random(7)
    rows = []
    for did in range(0, 3000, 10):
        words = []
        for w in ("x", "y", "z"):
            words += [w] * rng.randint(0, 4)
        rows.append((did, " ".join(words), "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                 "source string")
    enc2 = build_index_tf_chunked(docs).localCheckpoint()
    for k in (1, 10, 10_000):
        want = _topk_reference(enc2, "x", "y", k)
        got = [(r.did, r.tf_a, r.tf_b, r.score) for r in
               topk_and_terms(enc2, "x", "y", k=k).collect()]
        assert got == want, k
    plan = plan_string(topk_and_terms(enc2, "x", "y"), "simple")
    assert plan.count("MapInArrow") == 1, plan
    assert "Generate" not in plan, plan
    assert "Join" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_index_intersect_multi_kway(spark):
    """K-way AND serving (r10): the k-way chunk_id join + in-lane
    intersect fold must reproduce the exact set intersection for k = 1,
    2, 3 — including k = 2 parity with the gate-scalar intersect_terms,
    a term absent from the index (empty result row), and a k = 3 probe
    whose pairwise intersections are non-empty but whose 3-way
    intersection is smaller; the distributed rows form must carry the
    same ids it folds."""
    from streamvbyte_spark.operators.index import (build_index_chunked,
                                                   intersect_terms,
                                                   intersect_terms_multi,
                                                   intersect_terms_rows)
    # a -> {0,127,129,300,4096}; c -> {0,128,300}; d -> {300,4096}
    rows = [
        (0, "a c", "s"), (127, "a", "s"), (128, "c", "s"),
        (129, "a", "s"), (300, "a c d", "s"), (4096, "a d", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                 "source string")
    enc = build_index_chunked(docs).localCheckpoint()

    def fold(ids):
        p, fp = 10**9 + 7, 0
        for t in ids:
            fp = (fp * 31 + t) % p
        return fp

    # k=3: a&c = {0,300}, a&d = {300,4096}, c&d = {300}; 3-way = {300}
    row = intersect_terms_multi(enc, ["a", "c", "d"]).collect()[0]
    assert (row.term_a, row.term_b, row.term_c) == ("a", "c", "d")
    assert (row.n_common, row.fingerprint) == (1, fold([300]))
    got_rows = sorted(r.did for r in
                      intersect_terms_rows(enc, ["a", "c", "d"]).collect())
    assert got_rows == [300]
    # k=2 parity with the gate-scalar wrapper
    two = intersect_terms_multi(enc, ["a", "c"]).collect()[0]
    ref = intersect_terms(enc, "a", "c").collect()[0]
    assert (two.term_a, two.term_b, two.n_common, two.fingerprint) == \
        (ref.term_a, ref.term_b, ref.n_common, ref.fingerprint)
    # k=1 degenerates to the term's own postings
    one = intersect_terms_multi(enc, ["c"]).collect()[0]
    assert (one.term_a, one.n_common, one.fingerprint) == \
        ("c", 3, fold([0, 128, 300]))
    # an absent term empties any k-way AND
    none = intersect_terms_multi(enc, ["a", "c", "zzz"]).collect()[0]
    assert (none.n_common, none.fingerprint) == (0, 0)
    import pytest
    with pytest.raises(ValueError):
        intersect_terms_rows(enc, [])
    # wire-agnostic serving (r10): the TF wire's EF did stream answers the
    # same set queries — no second set-wire build needed
    from streamvbyte_spark.operators.index import (build_index_tf_chunked,
                                                   union_terms)
    enc_tf = build_index_tf_chunked(docs).localCheckpoint()
    assert sorted(r.did for r in
                  intersect_terms_rows(enc_tf, ["a", "c", "d"]).collect()) \
        == [300]
    set_row = union_terms(enc, "a", "c").collect()[0]
    tf_row = union_terms(enc_tf, "a", "c").collect()[0]
    assert tuple(set_row) == tuple(tf_row)
    with pytest.raises(ValueError):
        intersect_terms_rows(docs, ["a"])   # not an index chunk table


def test_index_store_and_serve_pushes_probe_predicate(spark):
    """The real serving path: the TF index STORED as parquet, top-k served
    from storage.  The probe filter must reach the parquet scan as a
    pushed filter (at 100 TB this is what makes a query read ~df/span
    chunk rows instead of the whole index), and the served result must
    match the in-memory build."""
    import re
    from streamvbyte_spark.operators.index import (build_index_tf_chunked,
                                                   topk_and_terms)
    from streamvbyte_spark.plans.explain import plan_string
    tmp = tempfile.mkdtemp(prefix="svb_idxstore_")
    try:
        docs = _idx_docs(spark)
        build_index_tf_chunked(docs).write.mode("overwrite") \
            .parquet(f"{tmp}/index")
        stored = spark.read.parquet(f"{tmp}/index")
        served = topk_and_terms(stored, "a", "c", k=10)
        plan = plan_string(served, "simple")
        # co-grouped serving scans the stored index once per probed term,
        # each with its term's equality predicate pushed to parquet
        scans = re.findall(r"FileScan parquet.*", plan)
        assert scans, plan
        for scan in scans:
            assert "PushedFilters" in scan and "EqualTo(doc_id" in scan, scan
        want = [(r.did, r.tf_a, r.tf_b, r.score) for r in
                topk_and_terms(build_index_tf_chunked(docs).localCheckpoint(),
                               "a", "c", k=10).collect()]
        got = [(r.did, r.tf_a, r.tf_b, r.score) for r in served.collect()]
        assert got == want == [(0, 2, 1, 3), (300, 1, 1, 2)]
        # k-way AND from the stored SET wire: all k probe predicates must
        # reach their scans pushed too (r10), and the result must match
        # the in-memory build
        from streamvbyte_spark.operators.index import (build_index_chunked,
                                                       intersect_terms_rows)
        build_index_chunked(docs).write.mode("overwrite") \
            .parquet(f"{tmp}/set")
        stored_set = spark.read.parquet(f"{tmp}/set")
        kway = intersect_terms_rows(stored_set, ["a", "b", "c"])
        kplan = plan_string(kway, "simple")
        kscans = re.findall(r"FileScan parquet.*", kplan)
        assert len(kscans) >= 1, kplan
        for scan in kscans:
            assert "PushedFilters" in scan and "EqualTo(doc_id" in scan, scan
        # a -> {0,127,129,300,4096}; b -> {0,127,128}; c -> {0,128,300}
        assert sorted(r.did for r in kway.collect()) == [0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_index_positional_phrase(spark):
    """The positional wire must reproduce exact (term, did, pos)
    occurrences — positions are offsets in the RAW split, so a doubled
    space breaks adjacency — and the phrase join must find exactly the
    docs where term_b directly follows term_a."""
    from streamvbyte_spark.operators.index import (build_index_pos_chunked,
                                                   decode_index_pos,
                                                   phrase_match_terms)
    rows = [
        (0, "x y", "s"),          # adjacent
        (1, "x z y", "s"),        # not adjacent
        (2, "y x", "s"),          # wrong order
        (3, "x  y", "s"),         # doubled space -> positions 0 and 2
        (4, "w x y x y", "s"),    # two matches in one doc -> one hit
        (200, "x y", "s"),        # second chunk at span 128
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    enc = build_index_pos_chunked(docs).localCheckpoint()
    got = {(r.term, r.did, r.pos) for r in decode_index_pos(enc).collect()}
    want = set()
    for did, text, _ in rows:
        for p, w in enumerate(text.split(" ")):
            if w:
                want.add((w, did, p))
    assert got == want
    hit = phrase_match_terms(enc, "x", "y").collect()[0]
    p, fp = 10**9 + 7, 0
    for t in [0, 4, 200]:
        fp = (fp * 31 + t) % p
    assert (hit.term_a, hit.term_b, hit.n_docs, hit.fingerprint) == \
        ("x", "y", 3, fp)
    none = phrase_match_terms(enc, "y", "w").collect()[0]
    assert (none.n_docs, none.fingerprint) == (0, 0)


def test_index_union_terms(spark):
    """OR serving from the set wire (co-grouped r9: full-outer chunk_id
    join + in-lane union), same gate-scalar row shape as the AND form —
    including the null-side edges the full-outer join introduces (a term
    absent from a chunk or from the whole index coalesces to an n=0 /
    empty-bytes lane)."""
    from streamvbyte_spark.operators.index import (build_index_chunked,
                                                   union_terms)
    enc = build_index_chunked(_idx_docs(spark)).localCheckpoint()

    def fold(ids):
        p, fp = 10**9 + 7, 0
        for t in ids:
            fp = (fp * 31 + t) % p
        return fp

    row = union_terms(enc, "a", "c").collect()[0]
    # a -> {0,127,129,300,4096}; c -> {0,128,300}; union has 6 docs
    assert (row.term_a, row.term_b, row.n_docs) == ("a", "c", 6)
    assert row.fingerprint == fold([0, 127, 128, 129, 300, 4096])
    # one side absent from the index entirely: every join row is null
    # on that side; the union must be exactly the present term
    ghost = union_terms(enc, "a", "nosuchterm").collect()[0]
    assert (ghost.n_docs, ghost.fingerprint) == \
        (5, fold([0, 127, 129, 300, 4096]))
    # degenerate same-term OR: in-lane union of identical lists
    same = union_terms(enc, "c", "c").collect()[0]
    assert (same.n_docs, same.fingerprint) == (3, fold([0, 128, 300]))
    # both sides absent: empty union, zero fingerprint
    none = union_terms(enc, "ghost1", "ghost2").collect()[0]
    assert (none.n_docs, none.fingerprint) == (0, 0)
