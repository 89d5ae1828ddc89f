"""Companion lightweight codecs: bit-pack, frame-of-reference, dict, RLE, FSST.

None of these exist in the reference (lemire/streamvbyte is StreamVByte only);
they are required by the north rule and follow standard public designs:
FastLanes-style fixed-width little-endian bit-packing (VLDB 2023), Lemire's
public FrameOfReference / dictionary semantics (referenced from the reference
README's "See also", /root/reference/README.md:251-265), classic RLE, and an
FSST-inspired symbol-table byte codec (Boncz/Neumann/Leis, VLDB 2020) adapted
to fixed-stride byte pairs so that both encode and decode stay whole-array
NumPy programs.

Shared contract (same as codec.core): ``encode(uint32[n]) -> bytes``,
``decode(bytes, n) -> uint32[n]``, ``cost(uint32[n]) -> int`` returning the
*exact* encoded size in O(n) without encoding — the per-codec cost function is
the template of ``streamvbyte_compressedbytes``
(/root/reference/src/streamvbyte_encode.c:91-101) generalized per codec, and it
feeds the auto-selector in ``select.py``.

Element count n is out-of-band (a column), exactly like the reference keeps
``count`` outside the stream (README.md:200-205).  Codec-specific parameters
(bit width, frame base, dictionary, symbol table) are stored in a small header
*inside* the binary and are charged to the codec's cost, so the selector
compares true end-to-end sizes.
"""

from __future__ import annotations

import numpy as np

from . import core


def _bits_needed(max_val: int) -> int:
    """Bits to represent max_val (0 -> 0 bits)."""
    return int(max_val).bit_length()


# ---------------------------------------------------------------- bit packing

def _pack_bits(v: np.ndarray, width: int) -> bytes:
    """Fixed-width little-endian bit packing (FastLanes-style layout)."""
    if width == 0 or v.size == 0:
        return b""
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint32)) & np.uint32(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unpack_bits(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint32)
    bits = np.unpackbits(buf, count=n * width, bitorder="little").reshape(n, width)
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits.astype(np.uint64) @ weights).astype(np.uint32)


def bitpack_encode(values) -> bytes:
    """Header: 1 byte width; data: n*width bits, LSB-first per value."""
    v = core._as_u32(values)
    if v.size == 0:
        return b""
    w = _bits_needed(int(v.max()))
    return bytes([w]) + _pack_bits(v, w)


def bitpack_decode(buf, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    return _unpack_bits(raw[1:], n, int(raw[0]))


def bitpack_cost(values) -> int:
    v = core._as_u32(values)
    if v.size == 0:
        return 0
    w = _bits_needed(int(v.max()))
    return 1 + (v.size * w + 7) // 8


# --------------------------------------------------------- frame of reference

def for_encode(values) -> bytes:
    """Frame-of-reference: header 1B width + 4B little-endian base (min),
    then bit-packed (v - base)."""
    v = core._as_u32(values)
    if v.size == 0:
        return b""
    base = v.min()
    d = v - base  # uint32, no wrap (v >= base)
    w = _bits_needed(int(d.max()))
    return bytes([w]) + base.astype("<u4").tobytes() + _pack_bits(d, w)


def for_decode(buf, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    w = int(raw[0])
    base = raw[1:5].view("<u4")[0]
    return _unpack_bits(raw[5:], n, w) + base


def for_cost(values) -> int:
    v = core._as_u32(values)
    if v.size == 0:
        return 0
    w = _bits_needed(int(v.max() - v.min()))
    return 5 + (v.size * w + 7) // 8


# ---------------------------------------------------------------- dictionary

def dict_encode(values) -> bytes:
    """Dictionary: header 4B k, k*4B sorted unique values, then bit-packed
    codes (width = bits(k-1)). Codes via searchsorted on the sorted dict."""
    v = core._as_u32(values)
    if v.size == 0:
        return b""
    uniq, codes = np.unique(v, return_inverse=True)
    k = uniq.size
    w = _bits_needed(k - 1)
    head = np.uint32(k).astype("<u4").tobytes() + uniq.astype("<u4").tobytes()
    return head + _pack_bits(codes.astype(np.uint32), w)


def dict_decode(buf, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    k = int(raw[:4].view("<u4")[0])
    uniq = raw[4:4 + 4 * k].view("<u4")
    w = _bits_needed(k - 1)
    codes = _unpack_bits(raw[4 + 4 * k:], n, w)
    return uniq[codes].astype(np.uint32)


def dict_cost(values) -> int:
    v = core._as_u32(values)
    if v.size == 0:
        return 0
    k = np.unique(v).size
    w = _bits_needed(k - 1)
    return 4 + 4 * k + (v.size * w + 7) // 8


# ------------------------------------------------------------------------ RLE

def _runs(v: np.ndarray):
    bounds = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [v.size]])
    return v[starts], (ends - starts).astype(np.uint32)


def rle_encode(values) -> bytes:
    """Run-length: header 4B nruns + 4B svb(values) length, then
    svb-1234-encoded run values and svb-1234-encoded run lengths.
    Composes the core codec for both sub-streams."""
    v = core._as_u32(values)
    if v.size == 0:
        return b""
    rv, rl = _runs(v)
    ev, el = core.encode(rv), core.encode(rl)
    return (np.uint32(rv.size).astype("<u4").tobytes()
            + np.uint32(len(ev)).astype("<u4").tobytes() + ev + el)


def rle_decode(buf, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    raw = memoryview(bytes(buf))
    nruns = int(np.frombuffer(raw[:4], "<u4")[0])
    lev = int(np.frombuffer(raw[4:8], "<u4")[0])
    rv = core.decode(raw[8:8 + lev], nruns)
    rl = core.decode(raw[8 + lev:], nruns)
    return np.repeat(rv, rl.astype(np.int64))


def rle_cost(values) -> int:
    v = core._as_u32(values)
    if v.size == 0:
        return 0
    rv, rl = _runs(v)
    return 8 + core.compressed_size(rv) + core.compressed_size(rl)


# ----------------------------------------------------------- Elias-Fano (ef)
# Quasi-succinct monotone-list codec (Elias 1974; Vigna, "Quasi-succinct
# indices", WSDM 2013 — public design): values split at L =
# max(floor(log2(u div n)), 0) low bits; low halves are fixed-width packed,
# high halves unary-coded as a bit vector with a 1 at position
# (v_i >> L) + i.  Purpose-built for SORTED postings: ~2 + L bits/value vs
# svb_delta's >= 1 byte/value floor.  NOT in the auto candidate set — it is
# only defined on non-decreasing input (encode/cost fail loudly otherwise),
# while the auto selector must accept any row.


def _ef_low_bits(u: int, n: int) -> int:
    """L = floor(log2(u div n)) clamped at 0 (integer-division form so the
    DuckDB oracle formula reproduces it exactly)."""
    q = u // n
    return q.bit_length() - 1 if q >= 1 else 0


def _ef_check_sorted(v: np.ndarray) -> None:
    if v.size > 1 and np.any(v[1:] < v[:-1]):
        raise ValueError("ef codec requires non-decreasing input "
                         "(sorted postings); use svb/svb_delta for "
                         "unsorted values")


def ef_encode(values) -> bytes:
    v = core._as_u32(values)
    n = v.size
    if n == 0:
        return b""
    _ef_check_sorted(v)
    u = int(v[-1])
    L = _ef_low_bits(u, n)
    low = _pack_bits(v & np.uint32((1 << L) - 1), L)
    high = (v >> np.uint32(L)).astype(np.int64)
    pos = high + np.arange(n, dtype=np.int64)
    bits = np.zeros(n + int(high[-1]), dtype=np.uint8)
    bits[pos] = 1
    upper = np.packbits(bits, bitorder="little").tobytes()
    return bytes([L]) + low + upper


def ef_decode(buf, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    b = np.frombuffer(buf, dtype=np.uint8)
    L = int(b[0])
    low_bytes = (n * L + 7) // 8
    low = _unpack_bits(b[1:1 + low_bytes], n, L).astype(np.uint64)
    bits = np.unpackbits(b[1 + low_bytes:], bitorder="little")
    ones = np.flatnonzero(bits)[:n].astype(np.int64)
    high = (ones - np.arange(n, dtype=np.int64)).astype(np.uint64)
    return ((high << np.uint64(L)) | low).astype(np.uint32)


def ef_cost(values) -> int:
    v = core._as_u32(values)
    n = v.size
    if n == 0:
        return 0
    _ef_check_sorted(v)
    u = int(v[-1])
    L = _ef_low_bits(u, n)
    return 1 + (n * L + 7) // 8 + (n + (u >> L) + 7) // 8


# ----------------------------------------------------------------------- FSST
# FSST-inspired symbol-table codec over the little-endian byte serialization
# of the array, at fixed 2-byte stride (keeps both directions vectorized).
# Layout: 1B k | k*2B symbol table | ceil(m/8)B escape bitmap (1 = literal)
#         | one code byte per non-escaped pair | 2 literal bytes per escaped
# where m = 2n is the number of byte pairs in the 4n-byte payload.

_FSST_MAX_SYMBOLS = 255


def _fsst_pairs(v: np.ndarray) -> np.ndarray:
    payload = v.view(np.uint8)  # 4n little-endian bytes
    return payload.reshape(-1, 2).astype(np.uint16) @ np.array([1, 256], dtype=np.uint16)


def _fsst_table(pair_ids: np.ndarray) -> np.ndarray:
    uniq, counts = np.unique(pair_ids, return_counts=True)
    # symbols must save space: 2 bytes -> 1 byte only helps if freq*1 > 2
    # (table cost).  Rank by (count desc, pair value desc) — lexsort is
    # STABLE, so the tie order is deterministic; an unstable argsort(counts)
    # would make WHICH equal-count pairs enter a full (255-cap) table depend
    # on sort internals, breaking byte-parity with the whole-batch kernel
    # (batched._fsst_encode_rows) that must reproduce this table exactly.
    order = np.lexsort((uniq, counts))[::-1]
    take = uniq[order[:_FSST_MAX_SYMBOLS]]
    take = take[counts[order[:_FSST_MAX_SYMBOLS]] >= 3]
    return np.sort(take)


def fsst_encode(values) -> bytes:
    v = core._as_u32(values)
    if v.size == 0:
        return b""
    pair_ids = _fsst_pairs(v)
    table = _fsst_table(pair_ids)
    pos = np.searchsorted(table, pair_ids)
    np.clip(pos, 0, max(table.size - 1, 0), out=pos)
    hit = table.size > 0
    in_table = (table[pos] == pair_ids) if hit else np.zeros(pair_ids.size, bool)
    bitmap = np.packbits((~in_table).astype(np.uint8), bitorder="little")
    codes = pos[in_table].astype(np.uint8)
    literals = pair_ids[~in_table].astype("<u2").view(np.uint8)
    head = bytes([table.size]) + table.astype("<u2").tobytes()
    return head + bitmap.tobytes() + codes.tobytes() + literals.tobytes()


def fsst_decode(buf, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    k = int(raw[0])
    table = raw[1:1 + 2 * k].view("<u2")
    m = 2 * n
    bm_len = (m + 7) // 8
    off = 1 + 2 * k
    is_lit = np.unpackbits(raw[off:off + bm_len], count=m, bitorder="little").astype(bool)
    off += bm_len
    n_codes = int((~is_lit).sum())
    codes = raw[off:off + n_codes]
    literals = raw[off + n_codes:].view("<u2")
    pairs = np.empty(m, dtype="<u2")
    pairs[~is_lit] = table[codes]
    pairs[is_lit] = literals
    return np.ascontiguousarray(pairs).view("<u4").astype(np.uint32)


def fsst_cost(values) -> int:
    v = core._as_u32(values)
    if v.size == 0:
        return 0
    pair_ids = _fsst_pairs(v)
    table = _fsst_table(pair_ids)
    if table.size:
        pos = np.searchsorted(table, pair_ids)
        np.clip(pos, 0, table.size - 1, out=pos)
        n_hit = int((table[pos] == pair_ids).sum())
    else:
        n_hit = 0
    m = pair_ids.size
    return 1 + 2 * table.size + (m + 7) // 8 + n_hit + 2 * (m - n_hit)
