"""The Arrow-vectorized embedding math must produce the exact integers the
dialect-paired SQL lambdas produce (functions/pipeline_sql.py) — quantization,
dot products, and hyperplane sign buckets are all compared against direct
per-element reimplementations of the SQL formulas, plus a DuckDB cross-check
of the floor(double*10000) quantization on adversarial floats."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from streamvbyte_spark.functions import embedding_udfs as E
from streamvbyte_spark.functions import pipeline_sql as P

RNG = np.random.default_rng(7)


def _vecs(n):
    return [RNG.standard_normal(E.EMB_DIM).astype(np.float32) for _ in range(n)]


def _q_ref(v):
    """The SQL formula, element by element: floor(cast(x as double) * 10000)."""
    return [int(math.floor(float(x) * 10000)) for x in v]


def test_quantize_matches_sql_floor_semantics():
    vecs = _vecs(50)
    # adversarial values: negatives, exact representables, huge/small
    vecs.append(np.array([-0.00005, 0.00005, -1.0, 1.0, 0.12345, -0.9999995,
                          2.5e-5, -2.5e-5] * 8, dtype=np.float32))
    q = E._quantize(pd.Series(vecs))
    for i, v in enumerate(vecs):
        assert q[i].tolist() == _q_ref(v), f"row {i}"


def test_quantize_matches_duckdb():
    vecs = _vecs(20)
    con = duckdb.connect()
    for v in vecs:
        got = E._quantize(pd.Series([v]))[0].tolist()
        want = con.execute(
            "select list_transform($1::float[], x -> "
            "cast(floor(cast(x as double) * 10000) as int))",
            [[float(x) for x in v]]).fetchone()[0]
        assert got == want


def test_planes_match_sql_formula():
    pl = E._planes(0, P.NEARDUP_BANDS * P.NEARDUP_PLANES_PER_BAND)
    for m in range(pl.shape[0]):
        a, b = 13 + 6 * m, 5 + 11 * m
        for j in range(E.EMB_DIM):
            i = j + 1  # SQL index is 1-based; formula uses (i + 1)
            assert pl[m, j] == ((a * (i + 1) + b) % 7) - 3


def test_bucket_udf_matches_scalar_formula():
    vecs = _vecs(100)
    q = E._quantize(pd.Series(vecs))
    pl = E._planes(0, P.NEARDUP_BANDS * P.NEARDUP_PLANES_PER_BAND)
    s = q @ pl.T
    bits = s >= 0
    ppb = P.NEARDUP_PLANES_PER_BAND
    for r in range(len(vecs)):
        for band in range(P.NEARDUP_BANDS):
            want = sum((1 << k) for k in range(ppb) if bits[r, band * ppb + k])
            got = (bits[r].reshape(P.NEARDUP_BANDS, ppb) @
                   (1 << np.arange(ppb)))[band]
            assert got == want


def test_dot_matches_scalar():
    vecs = _vecs(30)
    qa, qb = E._quantize(pd.Series(vecs[:15])), E._quantize(pd.Series(vecs[15:]))
    dots = np.einsum("ij,ij->i", qa, qb)
    for r in range(15):
        assert dots[r] == sum(int(x) * int(y) for x, y in zip(qa[r], qb[r]))
