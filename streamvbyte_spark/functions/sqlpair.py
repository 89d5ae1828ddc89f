"""Dialect-paired SQL expressions: identical semantics in Spark SQL and DuckDB.

The driver's correctness gate runs each Spark query side-by-side with a DuckDB
oracle over the same parquet.  The testdata ``documents`` table has no token
column, so both sides derive one with the SAME deterministic, pure-SQL word ->
int32 mapping (ascii/substr/length arithmetic — functions whose semantics
match across the two engines).  The mapping is designed to produce a realistic
mix of 1-, 2-, 3- and 4-byte values so the codecs' control-byte paths are all
exercised (the same goal as the reference perf harness's
``rand() >> (rand() & 31)`` mix, /root/reference/tests/perf.c:52-53).

Also provides the reference compressed-size formulas as DuckDB SQL
(``src/streamvbyte_encode.c:74,85,91-108``) so size queries have exact
oracles.
"""

from __future__ import annotations

# word -> int32 token id; all arithmetic in BIGINT then cast to INT.
# max value: 122*16777216 + 122*65536 + 122*256 + 122 < 2^31 - 1.
TOKENIZE_LAMBDA = (
    "cast("
    "cast(ascii(substr({w},1,1)) as bigint)"
    " + cast(ascii(substr({w},2,1)) as bigint) * 256"
    " + case when length({w}) >= 5 then cast(ascii(substr({w},3,1)) as bigint) * 65536 else 0 end"
    " + case when length({w}) >= 8 then cast(ascii(substr({w},4,1)) as bigint) * 16777216 else 0 end"
    " as int)"
)


def spark_tokens_expr(text_col: str = "text") -> str:
    """Spark SQL: array<int> of deterministic token ids from a text column."""
    return f"transform(split({text_col}, ' '), w -> {TOKENIZE_LAMBDA.format(w='w')})"


def duckdb_tokens_expr(text_col: str = "text") -> str:
    """DuckDB SQL with identical semantics to spark_tokens_expr."""
    return f"list_transform(string_split({text_col}, ' '), w -> {TOKENIZE_LAMBDA.format(w='w')})"


def duckdb_size_svb(tokens_expr: str, n_expr: str) -> str:
    """Exact streamvbyte 1234 size: ceil(n/4) + sum per-value byte lengths
    (reference formula src/streamvbyte_encode.c:74,91-101)."""
    return (
        f"case when {n_expr} = 0 then 0 else "
        f"cast(({n_expr} + 3) // 4 as bigint) + "
        f"cast(list_sum(list_transform({tokens_expr}, t -> "
        f"1 + (t > 255)::int + (t > 65535)::int + (t > 16777215)::int)) as bigint) end"
    )


def duckdb_size_svb0124(tokens_expr: str, n_expr: str) -> str:
    """Exact 0124 size (src/streamvbyte_encode.c:85,103-108)."""
    return (
        f"case when {n_expr} = 0 then 0 else "
        f"cast(({n_expr} + 3) // 4 as bigint) + "
        f"cast(list_sum(list_transform({tokens_expr}, t -> "
        f"(t > 0)::int + (t > 255)::int + 2 * (t > 65535)::int)) as bigint) end"
    )


def duckdb_size_svb_delta(tokens_expr: str, n_expr: str) -> str:
    """Exact svb_delta (prev=0) size: 1234 formula over per-row forward
    differences.  Valid for non-decreasing token lists (sorted postings) —
    wrap-around is not expressible portably in SQL, so oracles only use this
    on sorted inputs (the reference likewise documents delta for sorted data,
    README.md:54)."""
    t = tokens_expr
    return (
        f"case when {n_expr} = 0 then 0 else "
        f"cast(({n_expr} + 3) // 4 as bigint) + "
        f"cast(list_sum(list_transform(range(1, {n_expr} + 1), i -> "
        f"1 + (({t}[i] - coalesce({t}[i-1], 0)) > 255)::int"
        f" + (({t}[i] - coalesce({t}[i-1], 0)) > 65535)::int"
        f" + (({t}[i] - coalesce({t}[i-1], 0)) > 16777215)::int)) as bigint) end"
    )
