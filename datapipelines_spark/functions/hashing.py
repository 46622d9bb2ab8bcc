"""Portable, retry-stable hashing primitives.

Spark's ``xxhash64``/``hash`` are fast but engine-specific; for operators
whose output must be reproducible across engines (oracle-testable sampling,
minhash, simhash, LSH signatures) we derive integers from ``md5`` — available
with identical semantics in Spark, DuckDB, and Python. The first 8 hex chars
give an unsigned 32-bit value, which fits a signed 64-bit everywhere.

This is also the engine's answer to SURVEY §7.6 risk 2 (deterministic
randomness across task retries): randomness is always a pure function of row
*data*, never of row position or RNG state, so a recomputed partition yields
identical samples/signatures.

Spark side:  ``conv(substring(md5(s), 1, 8), 16, 10) :: bigint``
DuckDB side: ``CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)``
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: DuckDB SQL template: portable 32-bit hash of expression {expr}.
DUCKDB_HASH64 = "CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def portable_hash64(col: Column | str) -> Column:
    """Unsigned-32-bit integer hash of a (string-castable) column, as bigint.

    JVM-side only (md5 + conv are codegen'd Catalyst expressions) — no Python
    in the hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


def portable_hash_seeded(col: Column | str, seed: int | str) -> Column:
    """Hash with a seed mixed in (``md5(seed || '-' || value)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash64(F.concat(F.lit(f"{seed}-"), c.cast("string")))


def deterministic_sample_pred(col: Column | str, fraction: float, seed: int | str = 42) -> Column:
    """Keep-predicate selecting ~``fraction`` of rows, keyed on data.

    Unlike ``df.sample`` (position-dependent, changes under retries and
    repartitioning), this is stable under any physical plan — the property
    the reference needs for its seeded shuffles/mixing (SURVEY §2.3 D6).
    """
    return portable_hash_seeded(col, seed) % 1_000_000 < int(fraction * 1_000_000)
