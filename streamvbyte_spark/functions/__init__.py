from .sqlpair import (  # noqa: F401
    TOKENIZE_LAMBDA,
    duckdb_size_svb,
    duckdb_size_svb0124,
    duckdb_size_svb_delta,
    duckdb_tokens_expr,
    spark_tokens_expr,
)
