"""Baseline JPEG codec (operators/jpeg.py): the decoder is pinned against
an IN-TEST reference IDCT (explicit basis-matrix math recomputed here, not
the decoder's own), the lossless constant-block fixture shape the gate
query relies on, subsampled color, restart intervals, and loud rejection
of non-baseline streams.  The gate query's value check is the DuckDB
byte-math oracle (jpeg_decode_stats); these tests cover the paths the
DC-only gate payloads cannot reach (AC runs, ZRL, 4:2:0 MCUs, RSTn)."""

from __future__ import annotations

import numpy as np
import pytest

from streamvbyte_spark.operators.jpeg import (ZIGZAG, decode_jpeg,
                                              encode_baseline_jpeg,
                                              encode_gray_blocks_jpeg)


def _ref_idct_plane(blocks, q, hb, wb):
    """Independent IDCT: explicit DCT-II basis built HERE from the T.81
    formula (not the module's matrix), same round/clamp policy."""
    x = np.arange(8)
    m = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    out = np.empty((hb * 8, wb * 8))
    for i in range(hb):
        for j in range(wb):
            F = np.zeros(64)
            F[ZIGZAG] = blocks[i, j] * q
            f = m.T @ F.reshape(8, 8) @ m
            out[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = \
                np.clip(np.round(f) + 128, 0, 255)
    return out.astype(np.uint8)


def test_constant_blocks_lossless():
    """The gate fixture shape: all-ones quant + constant blocks is
    LOSSLESS (DC = 8*(c-128) exact, zero AC) — every pixel bit-exact,
    including byte values that force DC categories up to 11 and the
    0xFF byte-stuffing path."""
    vals = np.array([0, 255, 128, 1, 254, 127, 129, 200, 55, 13])
    img = decode_jpeg(encode_gray_blocks_jpeg(vals, width_blocks=2))
    assert img.shape == (40, 16, 3)
    want = np.repeat(np.repeat(vals.reshape(5, 2), 8, 0), 8, 1)
    for ch in range(3):  # grayscale replicated like PIL convert('RGB')
        assert np.array_equal(img[:, :, ch], want)


def test_random_ac_blocks_match_reference_idct():
    """Random sparse AC coefficients exercise Huffman AC run/size symbols,
    ZRL (16-zero runs), EOB placement, and a non-trivial quant table; the
    decoder must equal the in-test reference IDCT exactly."""
    rng = np.random.default_rng(11)
    q = rng.integers(1, 20, 64)
    hb, wb = 4, 5
    blocks = np.zeros((hb, wb, 64), np.int64)
    for i in range(hb):
        for j in range(wb):
            nz = int(rng.integers(0, 12))
            idx = rng.choice(64, nz, replace=False)
            blocks[i, j, idx] = rng.integers(-255, 256, nz)
    # force a ZRL: one block with only coefficient 63 set
    blocks[0, 0] = 0
    blocks[0, 0, 63] = 77
    jp = encode_baseline_jpeg(
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        h=hb * 8, w=wb * 8, quant={0: q})
    got = decode_jpeg(jp)[:, :, 0]
    assert np.array_equal(got, _ref_idct_plane(blocks, q, hb, wb))


def test_420_color_and_cropping():
    """2x2-subsampled chroma (4:2:0): MCU interleave, per-component block
    grids, pixel-replication upsample, JFIF YCbCr->RGB — constant planes
    make the expected RGB analytically exact.  Odd dimensions crop the
    padded MCU grid."""
    y_v, cb_v, cr_v = 120, 90, 200
    Y = np.zeros((2, 4, 64), np.int64)
    Y[:, :, 0] = 8 * (y_v - 128)
    Cb = np.zeros((1, 2, 64), np.int64)
    Cb[:, :, 0] = 8 * (cb_v - 128)
    Cr = np.zeros((1, 2, 64), np.int64)
    Cr[:, :, 0] = 8 * (cr_v - 128)
    comps = [{"id": 1, "h": 2, "v": 2, "tq": 0, "blocks": Y},
             {"id": 2, "h": 1, "v": 1, "tq": 1, "blocks": Cb},
             {"id": 3, "h": 1, "v": 1, "tq": 1, "blocks": Cr}]
    q = np.ones(64, np.int64)
    for h, w in ((16, 32), (13, 27)):  # full MCUs and cropped
        img = decode_jpeg(encode_baseline_jpeg(comps, h=h, w=w,
                                               quant={0: q, 1: q}))
        assert img.shape == (h, w, 3)
        r = int(np.clip(round(y_v + 1.402 * (cr_v - 128)), 0, 255))
        g = int(np.clip(round(y_v - 0.344136 * (cb_v - 128)
                              - 0.714136 * (cr_v - 128)), 0, 255))
        b = int(np.clip(round(y_v + 1.772 * (cb_v - 128)), 0, 255))
        assert (img == np.array([r, g, b])).all()


def test_restart_intervals():
    """DRI/RSTn: DC predictors reset at every restart marker and the
    entropy stream re-aligns to a byte boundary; values must not change."""
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 256, 14)
    plain = decode_jpeg(encode_gray_blocks_jpeg(vals, width_blocks=2))
    hb = vals.size // 2
    blocks = np.zeros((hb, 2, 64), np.int64)
    blocks[:, :, 0] = 8 * (vals[:hb * 2].reshape(hb, 2) - 128)
    jp = encode_baseline_jpeg(
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        h=hb * 8, w=16, quant={0: np.ones(64, np.int64)},
        restart_interval=3)
    assert b"\xff\xd0" in jp or b"\xff\xd1" in jp
    assert np.array_equal(decode_jpeg(jp), plain)


def test_non_baseline_rejected_loudly():
    """Progressive (SOF2) must raise NotImplementedError so decode_image
    can fall through to PIL; garbage must not pass as JPEG."""
    jp = bytearray(encode_gray_blocks_jpeg(np.array([10, 20]), 2))
    sof = jp.find(b"\xff\xc0")
    jp[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(jp))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg():
    """decode_image routes FFD8 payloads to the native decoder (no PIL in
    this container — the gate path)."""
    from streamvbyte_spark.operators.multimodal import decode_image
    vals = np.array([33, 77, 200, 5])
    img = decode_image(np.frombuffer(
        encode_gray_blocks_jpeg(vals, 2), np.uint8))
    want = np.repeat(np.repeat(vals.reshape(2, 2), 8, 0), 8, 1)
    assert np.array_equal(img[:, :, 0], want)


def test_pil_crosscheck_if_available():
    """When PIL is installed, it must agree bit-exactly on the lossless
    constant-block grayscale fixture (skipped in containers without it)."""
    PIL = pytest.importorskip("PIL.Image")
    import io
    vals = np.arange(0, 256, 17)
    jp = encode_gray_blocks_jpeg(vals, width_blocks=3)
    ours = decode_jpeg(jp)
    theirs = np.asarray(PIL.open(io.BytesIO(jp)).convert("RGB"))
    assert np.array_equal(ours, theirs)


def test_jpeg_batch_matches_single():
    """decode_jpeg_batch (across-image lockstep entropy machine, one lane
    per restart segment, one Huffman symbol per lane per iteration) must
    be byte-identical to decode_jpeg on every payload: grayscale random
    AC (runs, ZRL, EOB), 4:2:0 color with cropping, restart intervals,
    DC categories up to 11, mixed sizes in one batch."""
    rng = np.random.default_rng(21)
    payloads = []
    for hb, wb in [(2, 3), (4, 5), (1, 1)]:
        q = rng.integers(1, 20, 64)
        blocks = np.zeros((hb, wb, 64), np.int64)
        for i in range(hb):
            for j in range(wb):
                nz = int(rng.integers(0, 12))
                idx = rng.choice(64, nz, replace=False)
                blocks[i, j, idx] = rng.integers(-255, 256, nz)
        payloads.append(encode_baseline_jpeg(
            [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
            h=hb * 8, w=wb * 8, quant={0: q}))
    Y = np.zeros((2, 4, 64), np.int64)
    Y[:, :, 0] = rng.integers(-900, 900, (2, 4))
    Cb = np.zeros((1, 2, 64), np.int64)
    Cb[:, :, 0] = rng.integers(-900, 900, (1, 2))
    Cr = np.zeros((1, 2, 64), np.int64)
    Cr[:, :, 0] = rng.integers(-900, 900, (1, 2))
    ones = np.ones(64, np.int64)
    payloads.append(encode_baseline_jpeg(
        [{"id": 1, "h": 2, "v": 2, "tq": 0, "blocks": Y},
         {"id": 2, "h": 1, "v": 1, "tq": 1, "blocks": Cb},
         {"id": 3, "h": 1, "v": 1, "tq": 1, "blocks": Cr}],
        h=13, w=27, quant={0: ones, 1: ones}))
    vals = rng.integers(0, 256, 14)
    blocks = np.zeros((7, 2, 64), np.int64)
    blocks[:, :, 0] = 8 * (vals.reshape(7, 2) - 128)
    payloads.append(encode_baseline_jpeg(
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        h=56, w=16, quant={0: ones}, restart_interval=3))
    payloads.append(encode_gray_blocks_jpeg(np.array([0, 255, 128, 13]), 2))
    from streamvbyte_spark.operators.jpeg import decode_jpeg_batch
    batch = decode_jpeg_batch(payloads)
    for i, (p, got) in enumerate(zip(payloads, batch)):
        np.testing.assert_array_equal(got, decode_jpeg(p), err_msg=str(i))
    # and through the Arrow-batch image driver, mixed with a PPM
    from streamvbyte_spark.operators.multimodal import (_decode_image_batch,
                                                        decode_image)
    ppm = b"P6\n2 2\n255\n" + bytes(range(12))
    mixed = [payloads[1], ppm, payloads[3], payloads[5]]
    flat = np.frombuffer(b"".join(mixed), np.uint8)
    offsets = np.cumsum([0] + [len(m) for m in mixed])
    for m, got in zip(mixed, _decode_image_batch(flat, offsets)):
        np.testing.assert_array_equal(got, decode_image(m))


def test_jpeg_batch_corrupt_payload_falls_back_per_image():
    """One corrupt entropy stream in a batch must not fail the whole Arrow
    batch (r8 advice item 2): the lockstep machine raises on a lane that
    overruns its segment, where the single-image _BitReader zero-fills a
    truncated stream — decode_jpeg_batch must fall back per payload and
    stay byte-identical to decode_jpeg on EVERY payload, garbage row
    included."""
    rng = np.random.default_rng(33)
    good_a = encode_gray_blocks_jpeg(np.array([10, 200, 45, 99]), 2)
    good_b = encode_gray_blocks_jpeg(rng.integers(0, 256, 8), 2)
    # long random-AC payload, entropy chopped to ~30%: plenty of units
    # remain, so the zero pad cannot complete the lane (overrun -> raise)
    blocks = np.zeros((8, 8, 64), np.int64)
    for i in range(8):
        for j in range(8):
            idx = rng.choice(64, 10, replace=False)
            blocks[i, j, idx] = rng.integers(-255, 256, 10)
    jp = encode_baseline_jpeg(
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        h=64, w=64, quant={0: np.ones(64, np.int64)})
    sos = jp.find(b"\xff\xda")
    ent0 = sos + 4 + int.from_bytes(jp[sos + 2:sos + 4], "big") - 2
    cut = ent0 + (len(jp) - 2 - ent0) * 3 // 10
    while jp[cut - 1] == 0xFF or jp[cut] == 0xFF:
        cut -= 1                       # never split a stuffing pair
    corrupt = jp[:cut] + b"\xff\xd9"
    from streamvbyte_spark.operators.jpeg import (_entropy_decode_batch,
                                                  _parse_jpeg, _scan_layout,
                                                  decode_jpeg_batch)
    payloads = [good_a, corrupt, good_b]
    parsed = [_parse_jpeg(p) for p in payloads]
    jobs = [(data, pos, scan, huff, ri, _scan_layout(frame, scan))
            for (data, frame, scan, qt, huff, ri, pos) in parsed]
    # the corruption must actually trip the batch machine, or this test
    # would pass without ever exercising the fallback
    with pytest.raises(ValueError):
        _entropy_decode_batch(jobs)
    got = decode_jpeg_batch(payloads)
    assert len(got) == 3
    for p, g in zip(payloads, got):
        np.testing.assert_array_equal(g, decode_jpeg(p))


def test_peek_lut_cache_is_bounded():
    """The 2^16 peek-LUT cache is LRU-bounded (r8 advice item 3): a corpus
    of JPEGs with many distinct optimized Huffman tables must not grow
    executor memory for process lifetime, and re-use must still hit."""
    from streamvbyte_spark.operators.jpeg import (_PEEK_LUT_CAP, _PEEK_LUTS,
                                                  _HuffTable, _peek_lut)
    tables = []
    for k in range(_PEEK_LUT_CAP + 8):
        # distinct 2-symbol tables: one 2-bit and one 3-bit code, symbol
        # values varying with k so every canonical assignment is unique
        bits = [0, 1, 1] + [0] * 13
        tables.append(_HuffTable(bits, bytes([k % 251, (k * 7 + 1) % 251])))
    syms = [_peek_lut(t)[0] for t in tables]
    assert len(_PEEK_LUTS) <= _PEEK_LUT_CAP
    # most-recent table hits (same array object back)
    assert _peek_lut(tables[-1])[0] is syms[-1]
    # evicted tables rebuild with identical CONTENT
    rebuilt = _peek_lut(tables[0])[0]
    np.testing.assert_array_equal(rebuilt, syms[0])
