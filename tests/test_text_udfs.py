"""The Arrow-vectorized simhash must produce the exact BIGINT the dialect-
paired SQL fold produces (functions/pipeline_sql.q_dedup_simhash's DuckDB
branch) — checked against a per-element reimplementation of the formula and
against DuckDB running the actual oracle fold on the same token lists."""

from __future__ import annotations

import duckdb
import numpy as np

from streamvbyte_spark.functions import pipeline_sql as P
from streamvbyte_spark.functions import text_udfs as T

RNG = np.random.default_rng(17)


def _simhash_ref(tokens):
    """The SQL formula, bit by bit."""
    out = 0
    for k in range(P.SIMHASH_BITS):
        s = 0
        for t in tokens:
            h = (P.SIMHASH_A * int(t) + P.SIMHASH_B) % P.MINHASH_P
            s += 2 * ((h >> k) & 1) - 1
        if s > 0:
            out += 1 << k
    return out


def _rows(lengths):
    arrs = [RNG.integers(0, 2**31 - 1, n, dtype=np.int64) for n in lengths]
    lens = np.array([a.size for a in arrs], dtype=np.int64)
    flat = np.concatenate(arrs) if arrs else np.zeros(0, np.int64)
    return arrs, lens, flat


def test_simhash_batch_matches_scalar_formula():
    arrs, lens, flat = _rows([0, 1, 2, 5, 33, 100, 0, 7])
    got = T.simhash_batch(lens, flat)
    for i, a in enumerate(arrs):
        assert got[i] == _simhash_ref(a), f"row {i}"


def test_simhash_batch_matches_duckdb_fold():
    """Run the ACTUAL oracle SQL fragment (DuckDB dialect of q_dedup_simhash's
    bit fold) over the same token lists."""
    d = P.Dialect("duckdb")
    h = f"(cast({P.SIMHASH_A} as bigint) * t + {P.SIMHASH_B}) % {P.MINHASH_P}"
    bit_terms = []
    for k in range(P.SIMHASH_BITS):
        bit = f"({d.idiv(f'({h})', str(1 << k))} % 2)"
        lam_sum = d.fold0("tokens", f"acc + 2 * ({bit}) - 1")
        bit_terms.append(
            f"(case when {lam_sum} > 0 then cast({1 << k} as bigint) else 0 end)")
    expr = " + ".join(bit_terms)
    arrs, lens, flat = _rows([0, 3, 17, 64, 200])
    got = T.simhash_batch(lens, flat)
    con = duckdb.connect()
    for i, a in enumerate(arrs):
        want = con.execute(
            f"select ({expr}) from (select $1::int[] as tokens)",
            [[int(x) for x in a]]).fetchone()[0]
        assert got[i] == want, f"row {i}"


def test_simhash_empty_and_all_empty():
    got = T.simhash_batch(np.array([0, 0], np.int64), np.zeros(0, np.int64))
    assert got.tolist() == [0, 0]


def test_spark_simhash_sql_has_no_hof():
    """The Spark-side SQL must carry ZERO aggregate() lambdas — tokenizer
    AND simhash are ONE fused pandas-UDF call (r3 verdict item 1; r4 fused
    the tokenizer in too, so no transform() lambda remains either)."""
    sql = P.spark_sql("dedup_simhash")
    assert "aggregate(" not in sql and "doc_simhash_text(" in sql, sql
    assert "transform(" not in sql, sql
    # the oracle keeps the exact fold (that's what makes the gate a proof)
    assert "aggregate(" not in P.duckdb_sql("dedup_simhash")
    assert "list_reduce" in P.duckdb_sql("dedup_simhash")
