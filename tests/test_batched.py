"""Batched multi-row kernels must be byte-identical to the single-array core
codec, row by row, for every codec and every auto-selection outcome."""

from __future__ import annotations

import numpy as np
import pytest

from streamvbyte_spark.codec import batched, core, select

RNG = np.random.default_rng(99)


def make_rows(lengths, gen):
    arrays = [gen(n) for n in lengths]
    flat = np.concatenate(arrays) if arrays else np.zeros(0, np.uint32)
    offsets = np.concatenate([[0], np.cumsum([a.size for a in arrays])]).astype(np.int64)
    return arrays, flat.astype(np.uint32), offsets


EDGE_LENGTHS = [0, 1, 2, 3, 4, 5, 7, 8, 31, 32, 33, 127, 128, 0, 256]


def gen_mixed(n):
    kind = RNG.integers(0, 5)
    if kind == 0:
        return RNG.integers(0, 2 ** 32, size=n, dtype=np.uint64).astype(np.uint32)
    if kind == 1:
        return np.where(RNG.random(n) < 0.8, 0, RNG.integers(0, 300, n)).astype(np.uint32)
    if kind == 2:
        return np.sort(RNG.integers(0, 2 ** 28, size=n)).astype(np.uint32)
    if kind == 3:
        return np.repeat(RNG.integers(0, 9, max(n // 5 + 1, 1)), 5)[:n].astype(np.uint32)
    return (RNG.zipf(1.2, size=n) % 50257).astype(np.uint32)


@pytest.mark.parametrize("codec", ["svb", "svb0124", "svb_delta", "bitpack",
                                   "for", "dict", "rle", "fsst"])
def test_fixed_codec_matches_core_per_row(codec):
    arrays, flat, offsets = make_rows(EDGE_LENGTHS, gen_mixed)
    out, ooff, cids = batched.encode_rows(flat, offsets, codec=codec)
    ref = select.REGISTRY[codec]
    for i, a in enumerate(arrays):
        got = out[ooff[i]:ooff[i + 1]].tobytes()
        assert got == ref.encode(a), f"row {i} len {a.size}"
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    vflat, voff = batched.decode_rows(out, ooff, n_toks, cids)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(vflat[voff[i]:voff[i + 1]], a)


def test_auto_selection_matches_single_array_selector():
    arrays, flat, offsets = make_rows(EDGE_LENGTHS * 3, gen_mixed)
    out, ooff, cids = batched.encode_rows(flat, offsets, codec="auto")
    for i, a in enumerate(arrays):
        got_size = int(ooff[i + 1] - ooff[i])
        _, want_size = select.choose(a, candidates=batched.VECTOR_COST_CODECS)
        assert got_size == want_size, f"row {i}: {got_size} != {want_size}"
        assert got_size <= core.compressed_size(a) or a.size == 0
        name = batched.CODEC_NAMES[cids[i]]
        assert out[ooff[i]:ooff[i + 1]].tobytes() == select.REGISTRY[name].encode(a)
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    vflat, voff = batched.decode_rows(out, ooff, n_toks, cids)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(vflat[voff[i]:voff[i + 1]], a)


def test_row_costs_exact():
    arrays, flat, offsets = make_rows(EDGE_LENGTHS, gen_mixed)
    costs = batched.row_costs(flat, offsets, batched.VECTOR_COST_CODECS)
    for i, a in enumerate(arrays):
        for j, name in enumerate(batched.VECTOR_COST_CODECS):
            want = len(select.REGISTRY[name].encode(a))
            assert costs[i, j] == want, f"row {i} codec {name}: {costs[i, j]} != {want}"


def test_fsst_cost_vectorized_exact():
    """_fsst_costs must equal companions.fsst_cost (== len(fsst_encode)) per
    row, including the 255-symbol cap and the (count desc, pair desc) tie
    order that decides WHICH pairs enter a full table."""
    from streamvbyte_spark.codec import companions
    arrays, flat, offsets = make_rows(EDGE_LENGTHS * 2, gen_mixed)
    # a row with > 255 distinct pairs all eligible (cap binds) and a
    # pair-repetition-heavy row (all hits)
    extra = [np.repeat(np.arange(400, dtype=np.uint32) * 65537 + 7, 3),
             np.tile(np.arange(8, dtype=np.uint32) * 16909320, 50)]
    arrays = arrays + extra
    flat = np.concatenate([flat] + extra).astype(np.uint32)
    offsets = np.concatenate(
        [[0], np.cumsum([a.size for a in arrays])]).astype(np.int64)
    got = batched._fsst_costs(flat, offsets)
    for i, a in enumerate(arrays):
        want = companions.fsst_cost(a)
        assert got[i] == want == len(companions.fsst_encode(a)), i


def test_fsst_whole_batch_byte_parity_cap_and_ties():
    """_fsst_encode_rows must reproduce companions.fsst_encode byte-for-byte
    on the adversarial shapes: a row whose 255-symbol cap binds among
    EQUAL-count pairs (the tie order decides WHICH pairs enter the table),
    an all-hits row, an all-escapes row, and empty rows."""
    from streamvbyte_spark.codec import companions
    extra = [
        # 400 distinct pairs, every count == 3: cap + tie order bind
        np.repeat(np.arange(400, dtype=np.uint32) * 65537 + 7, 3),
        # heavy repetition: every pair a table hit
        np.tile(np.arange(8, dtype=np.uint32) * 16909320, 50),
        # all pairs unique: zero-symbol table, all escapes
        np.arange(100, dtype=np.uint32) * 131075 + 11,
        np.zeros(0, np.uint32),
        np.array([7], np.uint32),
    ]
    arrays, flat, offsets = make_rows(EDGE_LENGTHS, gen_mixed)
    arrays = arrays + extra
    flat = np.concatenate([flat] + extra).astype(np.uint32)
    offsets = np.concatenate(
        [[0], np.cumsum([a.size for a in arrays])]).astype(np.int64)
    out, ooff = batched._fsst_encode_rows(flat, offsets)
    for i, a in enumerate(arrays):
        got = out[ooff[i]:ooff[i + 1]].tobytes()
        want = companions.fsst_encode(a)
        assert got == want, f"row {i} len {a.size}"
        assert len(got) == companions.fsst_cost(a)  # cost == len(encode)
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    vflat, voff = batched._fsst_decode_rows(out, ooff, n_toks)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(vflat[voff[i]:voff[i + 1]], a)


def test_auto_full_includes_fsst():
    """The 8-candidate selector must pick fsst when it wins, keep the exact
    single-array argmin, stay <= the svb reference size, and round-trip
    bit-identically through the per-row fsst encode/decode fallback."""
    def fsst_mix(n):
        t = RNG.integers(0, 10 ** 6, n, dtype=np.int64)
        return ((16384 + (t % 32) * 256) * 65536
                + ((t // 97) % 32) * 33 + 1).astype(np.uint32)

    lengths = [0, 5, 40, 120, 300, 700, 64, 250]
    arrays, flat, offsets = make_rows(lengths, fsst_mix)
    out, ooff, cids = batched.encode_rows(
        flat, offsets, codec="auto", candidates=batched.VECTOR_COST_CODECS_FULL)
    picked = {batched.CODEC_NAMES[c] for c in cids}
    assert "fsst" in picked, picked  # the mapping must actually exercise fsst
    for i, a in enumerate(arrays):
        got_size = int(ooff[i + 1] - ooff[i])
        _, want_size = select.choose(a, candidates=batched.VECTOR_COST_CODECS_FULL)
        assert got_size == want_size, f"row {i}"
        assert got_size <= core.compressed_size(a) or a.size == 0
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    vflat, voff = batched.decode_rows(out, ooff, n_toks, cids)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(vflat[voff[i]:voff[i + 1]], a)


@pytest.mark.parametrize("codec", ["svb", "svb0124", "svb_delta", "bitpack",
                                   "for", "dict", "rle", "fsst"])
def test_prefix_decode_matches_slice(codec):
    """decode_prefix_rows must equal row[:min(k, n)] for every codec — the
    svb family via the true O(prefix) control-byte path, the rest via
    decode-and-truncate — across k spanning 0, mid-row, quad boundaries,
    and beyond-row."""
    arrays, flat, offsets = make_rows(EDGE_LENGTHS, gen_mixed)
    out, ooff, cids = batched.encode_rows(
        flat, offsets, codec=codec,
        candidates=batched.VECTOR_COST_CODECS_FULL)
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    for k in (0, 1, 3, 4, 5, 32, 10 ** 6):
        vals, voff = batched.decode_prefix_rows(out, ooff, n_toks, cids, k)
        for i, a in enumerate(arrays):
            np.testing.assert_array_equal(
                vals[voff[i]:voff[i + 1]], a[:min(k, a.size)], f"{codec} k={k}")


def test_prefix_decode_mixed_codec_batch():
    """auto-encoded batches dispatch prefix decode per codec group."""
    arrays, flat, offsets = make_rows(EDGE_LENGTHS * 3, gen_mixed)
    out, ooff, cids = batched.encode_rows(
        flat, offsets, codec="auto", candidates=batched.VECTOR_COST_CODECS_FULL)
    assert len({int(c) for c in cids}) > 1  # genuinely mixed
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    vals, voff = batched.decode_prefix_rows(out, ooff, n_toks, cids, 17)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(vals[voff[i]:voff[i + 1]], a[:17])


def test_all_empty_batch():
    flat = np.zeros(0, np.uint32)
    offsets = np.zeros(4, np.int64)
    out, ooff, cids = batched.encode_rows(flat, offsets, codec="auto")
    assert out.size == 0 and list(ooff) == [0, 0, 0, 0]
    vflat, voff = batched.decode_rows(out, ooff, np.zeros(3, np.int64), cids)
    assert vflat.size == 0


def test_big_batch_roundtrip():
    lengths = RNG.integers(0, 512, size=2000)
    arrays, flat, offsets = make_rows(lengths, gen_mixed)
    out, ooff, cids = batched.encode_rows(flat, offsets, codec="auto")
    vflat, voff = batched.decode_rows(out, ooff,
                                      np.array([a.size for a in arrays], np.int64), cids)
    np.testing.assert_array_equal(vflat, flat)
    np.testing.assert_array_equal(voff, offsets)


def test_aqrit_exhaustive_full_domain_batched():
    """All 2^16 arrangements of 16 bytes in {0,1} as 4-value rows
    (tests/unit.c:187-252) — the batched kernel makes the FULL exhaustive
    domain cheap: one 65536-row call per scheme."""
    i = np.arange(1 << 16, dtype=np.uint32)
    bits = ((i[:, None] >> np.arange(16)) & 1).astype(np.uint8)
    flat = np.ascontiguousarray(bits).view(np.uint32).reshape(-1)
    offsets = np.arange(0, flat.size + 4, 4, dtype=np.int64)
    n_toks = np.full(1 << 16, 4, dtype=np.int64)
    for codec in ["svb", "svb0124"]:
        out, ooff, cids = batched.encode_rows(flat, offsets, codec=codec)
        vflat, voff = batched.decode_rows(out, ooff, n_toks, cids)
        np.testing.assert_array_equal(vflat, flat)
        ok = batched.validate_rows(out, ooff, n_toks, scheme0124=(codec == "svb0124"))
        assert ok.all()


def test_encode_bytes_deterministic_under_scratch_pollution():
    """Encode output buffers are np.empty (no memset): every byte must be
    written by the data/ctrl scatters.  Uninitialized-memory leakage would
    make bytes depend on what a previous call left in the reused scratch
    pools — so encode A, pollute with differently-shaped B, encode A again
    and require byte identity."""
    rng = np.random.default_rng(11)
    lens_a = rng.integers(1, 50, 300)
    off_a = np.concatenate([[0], np.cumsum(lens_a)]).astype(np.int64)
    flat_a = (rng.integers(0, 1 << 31, off_a[-1], dtype=np.int64)
              >> rng.integers(0, 31, off_a[-1], dtype=np.int64)).astype(np.uint32)
    # zero-heavy rows maximize 0124 len-0 surplus writes
    flat_a[rng.random(flat_a.size) < 0.4] = 0
    lens_b = rng.integers(200, 900, 500)
    off_b = np.concatenate([[0], np.cumsum(lens_b)]).astype(np.int64)
    flat_b = rng.integers(0, 1 << 16, off_b[-1], dtype=np.uint64).astype(np.uint32)
    for codec in ["svb", "svb0124", "auto"]:
        a1 = batched.encode_rows(flat_a, off_a, codec)[0].tobytes()
        batched.encode_rows(flat_b, off_b, "auto")
        batched.encode_rows(flat_b, off_b, "svb_delta")
        a2 = batched.encode_rows(flat_a, off_a, codec)[0].tobytes()
        assert a1 == a2, codec


def test_trailing_empty_rows_extremum_last():
    """Regression: a batch ending in empty rows must not let _seg_reduce's
    reduceat segment steal the preceding row's LAST element (its extremum).
    flat=[3,2,1,7], offsets=[0,4,4] decoded to [3,2,1,3] before the fix."""
    flat = np.array([3, 2, 1, 7], dtype=np.uint32)
    offsets = np.array([0, 4, 4], dtype=np.int64)
    np.testing.assert_array_equal(
        batched._seg_reduce(np.maximum, flat, offsets), [7, 0])
    np.testing.assert_array_equal(
        batched._seg_reduce(np.minimum, flat, offsets), [1, 0])
    for codec in ("bitpack", "for", "dict", "rle", "auto"):
        out, ooff, cids = batched.encode_rows(flat, offsets, codec=codec)
        vflat, voff = batched.decode_rows(out, ooff, np.array([4, 0]), cids)
        np.testing.assert_array_equal(vflat[voff[0]:voff[1]], flat, err_msg=codec)
        assert voff[1] == voff[2] == 4
    # row_costs must stay exact with trailing empties (auto-selector input)
    costs = batched.row_costs(flat, offsets, batched.VECTOR_COST_CODECS)
    for j, name in enumerate(batched.VECTOR_COST_CODECS):
        assert costs[0, j] == len(select.REGISTRY[name].encode(flat))
        assert costs[1, j] == len(select.REGISTRY[name].encode(np.zeros(0, np.uint32)))


def test_multiple_trailing_and_interior_empty_rows():
    arrays, flat, offsets = make_rows([5, 0, 3, 0, 0], gen_mixed)
    # force an extremum in last position of the final nonempty row
    flat = flat.copy()
    flat[-1] = np.uint32(2 ** 31 + 7)
    arrays = [flat[offsets[i]:offsets[i + 1]] for i in range(5)]
    out, ooff, cids = batched.encode_rows(flat, offsets, codec="auto")
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    vflat, voff = batched.decode_rows(out, ooff, n_toks, cids)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(vflat[voff[i]:voff[i + 1]], a)
        _, want_size = select.choose(a, candidates=batched.VECTOR_COST_CODECS)
        assert int(ooff[i + 1] - ooff[i]) == want_size


def test_max_compressed_bytes_rows_matches_core():
    n = np.array([0, 1, 4, 5, 100, 29159], dtype=np.int64)
    got = batched.max_compressed_bytes_rows(n)
    for i, k in enumerate(n):
        assert got[i] == core.max_compressed_size(int(k))
    # bound actually holds for worst-case values
    v = np.full(100, 0xFFFFFFFF, dtype=np.uint32)
    assert len(core.encode(v)) <= batched.max_compressed_bytes_rows([100])[0]


def test_truncate_rows_invalidates_all_nonempty():
    arrays, flat, offsets = make_rows([0, 1, 4, 7, 0, 33], gen_mixed)
    out, ooff, _ = batched.encode_rows(flat, offsets, codec="svb")
    n_toks = np.array([a.size for a in arrays], dtype=np.int64)
    assert batched.validate_rows(out, ooff, n_toks).all()
    t_out, t_ooff = batched.truncate_rows(out, ooff)
    ok = batched.validate_rows(t_out, t_ooff, n_toks)
    np.testing.assert_array_equal(ok, n_toks == 0)


def _fp_fold(vals):
    """The SQL fold (queries._FP_BODY) the kernel must match exactly."""
    p = 1_000_000_007
    acc = 0
    for t in vals:
        acc = ((acc * 31 + int(t)) % p + p) % p
    return acc


def test_fingerprint_rows_matches_sql_fold():
    rng = np.random.default_rng(7)
    rows = [rng.integers(-2 ** 31, 2 ** 31, size=n).astype(np.int32)
            for n in [0, 1, 2, 5, 63, 64, 65, 1000, 0, 37, 4097]]
    flat = np.concatenate(rows)
    off = np.concatenate([[0], np.cumsum([r.size for r in rows])]).astype(np.int64)
    got = batched.fingerprint_rows(flat, off)
    want = np.array([_fp_fold(r) for r in rows], dtype=np.int64)
    np.testing.assert_array_equal(got, want)
    # in-range invariant (the SQL fold normalizes to [0, p))
    assert (got >= 0).all() and (got < 1_000_000_007).all()


def test_fingerprint_rows_unsigned_view_equals_signed():
    """decode kernels pass flat.view(int32): a token with the sign bit set
    must fingerprint as its SIGNED int32 value, exactly like the SQL fold
    over the int token column."""
    v = np.array([0xFFFFFFFF, 0x80000000, 1, 2 ** 31 - 1], dtype=np.uint32)
    off = np.array([0, 4], dtype=np.int64)
    got = batched.fingerprint_rows(v.view(np.int32), off)
    assert got[0] == _fp_fold([-1, -2 ** 31, 1, 2 ** 31 - 1])


def test_fingerprint_rows_empty_and_growth():
    # empty batch, empty rows, then a row longer than any before (power
    # table growth path)
    assert batched.fingerprint_rows(
        np.zeros(0, np.int32), np.array([0, 0, 0], np.int64)).tolist() == [0, 0]
    long = np.arange(200_000, dtype=np.int32)
    got = batched.fingerprint_rows(long, np.array([0, long.size], np.int64))
    assert got[0] == _fp_fold(long)


def test_row_costs_prune_matches_exact_selection():
    """prune=True may relax the dict COLUMN to a proven lower bound, but
    the matrix minimum and the first-minimum argmin (= selector winner,
    incl. candidate-priority ties) must be IDENTICAL to the exact matrix —
    on dict winners, rle winners, near-ties, low-byte collisions (the
    bound's weakest case: distinct values sharing one low byte), empties,
    and the fsst-extended candidate set."""
    rng = np.random.default_rng(5)
    arrays = []
    for i in range(600):
        kind = i % 6
        n = int(rng.integers(0, 50)) if kind == 5 else int(rng.integers(1, 400))
        if kind == 0:    # dict-friendly: 3 distinct values across uint32
            vals = rng.choice(np.array([7, 2**30 + 1, 2**31 + 5], np.uint32), n)
        elif kind == 1:  # rle-friendly runs
            vals = np.repeat(rng.integers(0, 1000, max(n // 20, 1))
                             .astype(np.uint32), 20)[:n]
        elif kind == 2:  # low-byte collisions: distinct values, one low byte
            vals = (rng.integers(0, 50, n).astype(np.uint32)
                    << np.uint32(8)) + np.uint32(7)
        elif kind == 3:
            vals = rng.integers(0, 255, n).astype(np.uint32)
        elif kind == 4:
            vals = np.sort(rng.integers(0, 2**31, n).astype(np.uint32))
        else:
            vals = rng.integers(0, 2**16, n).astype(np.uint32)
        arrays.append(vals)
    arrays.append(np.zeros(0, np.uint32))
    flat = np.concatenate(arrays).astype(np.uint32)
    off = np.concatenate(
        [[0], np.cumsum([a.size for a in arrays])]).astype(np.int64)
    saw_dict_winner = False
    for cand in (batched.VECTOR_COST_CODECS, batched.VECTOR_COST_CODECS_FULL):
        exact = batched.row_costs(flat, off, cand)
        pruned = batched.row_costs(flat, off, cand, prune=True)
        np.testing.assert_array_equal(exact.min(axis=1), pruned.min(axis=1))
        np.testing.assert_array_equal(np.argmin(exact, axis=1),
                                      np.argmin(pruned, axis=1))
        j = cand.index("dict")
        # the relaxed column is a true LOWER bound (never above exact)
        assert (pruned[:, j] <= exact[:, j]).all()
        saw_dict_winner |= bool((np.argmin(exact, axis=1) == j).any())
    assert saw_dict_winner  # the mix must actually exercise dict wins
