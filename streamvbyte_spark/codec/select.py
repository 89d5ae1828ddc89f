"""Codec registry + per-chunk cost-model auto-selector.

The selector is the distributed analog of the reference's runtime dispatch
(/root/reference/src/streamvbyte_encode.c:114-118 picks a kernel per CPU
feature): ours picks a *codec* per token chunk by exact encoded size, using
each codec's O(n) ``cost`` function (the generalization of
``streamvbyte_compressedbytes``, src/streamvbyte_encode.c:91-101).

Ties break by fixed priority (decode-speed order).  The chosen name is
recorded in the ``codec`` lineage column so decode can dispatch without
in-band headers for the svb family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from . import companions, core


@dataclass(frozen=True)
class Codec:
    name: str
    encode: Callable[[np.ndarray], bytes]
    decode: Callable[[bytes, int], np.ndarray]
    cost: Callable[[np.ndarray], int]


REGISTRY: dict[str, Codec] = {
    c.name: c
    for c in [
        Codec("svb", core.encode, core.decode, core.compressed_size),
        Codec("svb0124", core.encode_0124, core.decode_0124, core.compressed_size_0124),
        Codec("svb_delta",
              lambda v: core.delta_encode(v, 0),
              lambda b, n: core.delta_decode(b, n, 0),
              lambda v: core.delta_compressed_size(v, 0)),
        Codec("bitpack", companions.bitpack_encode, companions.bitpack_decode, companions.bitpack_cost),
        Codec("for", companions.for_encode, companions.for_decode, companions.for_cost),
        Codec("dict", companions.dict_encode, companions.dict_decode, companions.dict_cost),
        Codec("rle", companions.rle_encode, companions.rle_decode, companions.rle_cost),
        Codec("fsst", companions.fsst_encode, companions.fsst_decode, companions.fsst_cost),
        # sorted-postings specialist; NOT an auto candidate (only defined
        # on non-decreasing input — encode/cost fail loudly otherwise)
        Codec("ef", companions.ef_encode, companions.ef_decode, companions.ef_cost),
    ]
}

# signed-stream codecs (int32 in/out) are dispatched explicitly, not by the
# unsigned auto-selector
SIGNED_REGISTRY: dict[str, Codec] = {
    c.name: c
    for c in [
        Codec("svb_zigzag", core.encode_zigzag_stream, core.decode_zigzag_stream, None),
        Codec("svb_zz_delta",
              lambda v: core.encode_zzdelta_stream(v, 0),
              lambda b, n: core.decode_zzdelta_stream(b, n, 0),
              None),
    ]
}

# tie-break / evaluation priority: fastest decode first among equals
DEFAULT_CANDIDATES = ("svb", "svb0124", "svb_delta", "bitpack", "for", "dict", "rle", "fsst")


def choose(values, candidates: tuple[str, ...] = DEFAULT_CANDIDATES) -> tuple[str, int]:
    """Return (codec_name, exact_size) minimizing encoded bytes.

    The winner's cost is guaranteed == len(encode(values)) for every codec
    (tested), so 'size <= reference streamvbyte' holds whenever 'svb' is a
    candidate.
    """
    v = core._as_u32(values)
    if v.size == 0:
        return "svb", 0
    best_name, best_cost = None, None
    for name in candidates:
        c = REGISTRY[name].cost(v)
        if best_cost is None or c < best_cost:
            best_name, best_cost = name, c
    return best_name, int(best_cost)


def encode_auto(values, candidates: tuple[str, ...] = DEFAULT_CANDIDATES) -> tuple[str, bytes]:
    name, _ = choose(values, candidates)
    return name, REGISTRY[name].encode(core._as_u32(values))


def decode_any(name: str, buf, n: int) -> np.ndarray:
    return REGISTRY[name].decode(buf, n)
