"""Every oracle's result schema must stay driver-hashable: DuckDB widens
sum(BIGINT) to HUGEINT, which the driver's pandas canonicalizer converts to
float64 — equal values then hash differently from Spark's int64 and the gate
fails even though the query is 'right'.  This pins the rule for all oracles
without starting Spark (regression: sequence_pack/nation_revenue r3)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


def test_no_oracle_emits_wide_ints(con):
    bad = []
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        bad += [(name, c, str(t)) for c, t in zip(rel.columns, rel.types)
                if str(t) in FORBIDDEN]
    assert not bad, bad
