"""Shared deterministic hashing, identical in Spark and DuckDB.

The 60-bit base hash is the first 15 hex digits of md5, which both engines
compute identically: Spark `conv(substring(md5(x),1,15),16,10)::long`,
DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`. Derived permutation hashes
stay inside signed-64 range: operands are reduced mod P31 (2^31-1) first,
so a*h+b < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

P31 = 2_147_483_647  # Mersenne prime 2^31 - 1

# fixed MinHash permutation parameters (Knuth multiplicative seeds)
N_PERM = 16
PERM_A = [(i * 2_654_435_761 + 1) % P31 for i in range(1, N_PERM + 1)]
PERM_B = [(i * 40_503 + 17) % P31 for i in range(1, N_PERM + 1)]


def h60(col: Column) -> Column:
    """60-bit md5-prefix hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h31(col: Column) -> Column:
    """Base hash reduced mod P31."""
    return h60(col) % F.lit(P31)


def sql_h60(expr: str) -> str:
    """DuckDB: identical 60-bit md5-prefix hash."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_h31(expr: str) -> str:
    return f"({sql_h60(expr)} % {P31})"
