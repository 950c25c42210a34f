"""Cross-engine deterministic hashing primitives.

The dedup / fingerprint / LSH operators need hash functions that (a)
run JVM-side in Spark and (b) can be reproduced *bit-for-bit* by the
DuckDB correctness oracle.  Neither engine's native 64-bit hash matches
the other (Spark xxhash64 vs DuckDB murmur-ish ``hash()``), so we build
on MD5 — identical everywhere — and parse the first 15 hex digits
(60 bits, always positive in an int64):

* Spark  : ``CAST(CONV(SUBSTR(MD5(x), 1, 15), 16, 10) AS BIGINT)``
* DuckDB : ``CAST('0x' || SUBSTR(MD5(x), 1, 15) AS BIGINT)``

Seeded families derive as ``H(seed || ':' || x)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus used by small modular-arithmetic hashes (fits comfortably in
#: int64 intermediate products on both engines).
POLY_MOD = 1_000_000_007
POLY_MULT = 131


def md5_long(col: Column) -> Column:
    """60-bit positive hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_seeded(col: Column, seed: int) -> Column:
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


def md5_long_sql(expr: str) -> str:
    """Spark SQL text of :func:`md5_long` (for use inside lambdas)."""
    return f"CAST(CONV(SUBSTR(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"


def duck_md5_long_sql(expr: str) -> str:
    """DuckDB SQL computing the identical value."""
    return f"CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT)"


def duck_md5_long_seeded_sql(expr: str, seed: int) -> str:
    return duck_md5_long_sql(f"CONCAT('{seed}:', {expr})")


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"CONCAT('{seed}:', {expr})")
