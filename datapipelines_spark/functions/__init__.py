from datapipelines_spark.functions.hashing import (
    portable_hash64,
    deterministic_sample_pred,
    DUCKDB_HASH64,
)

__all__ = ["portable_hash64", "deterministic_sample_pred", "DUCKDB_HASH64"]
