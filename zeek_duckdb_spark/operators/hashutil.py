"""Engine-portable deterministic hash family.

Every sketch operator (MinHash, SimHash, hyperplane LSH) needs hashes
that (a) run JVM-side under whole-stage codegen in Spark and (b) can be
restated verbatim in ANSI-ish SQL so DuckDB can serve as a correctness
oracle.  ``xxhash64`` fails (b) — DuckDB doesn't ship it — so the family
here is derived from ``md5`` (present and bit-identical in both
engines) plus affine permutations modulo the Mersenne prime 2^31-1,
the same construction Spark MLlib's MinHashLSH uses.

Spark side: ``conv(substring(md5(x), 1, k), 16, 10)`` cast to long.
DuckDB side: ``CAST(concat('0x', substring(md5(x), 1, k)) AS BIGINT)``.
k=15 hex chars -> 60-bit non-negative int64 (general hashing);
k=7 -> 28-bit base value safely below 2^31-1 for modular arithmetic
(a*h+b with a,b < 2^31 stays under 2^62 -> no BIGINT overflow in
either engine, no ANSI-mode failure).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["P31", "md5_long", "md5_long_sql", "affine_coeffs"]

# Mersenne prime 2^31-1 — modulus of the affine permutation family
P31 = (1 << 31) - 1


def md5_long(col: Column, chars: int = 15) -> Column:
    """Non-negative int64 from the first ``chars`` hex digits of md5
    (chars <= 15 so the value fits a signed 64-bit int)."""
    return F.conv(F.substring(F.md5(col), 1, chars), 16, 10).cast("long")


def md5_long_sql(expr: str, chars: int = 15) -> str:
    """The DuckDB restatement of :func:`md5_long` for oracle SQL."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, {chars})) AS BIGINT)"


def affine_coeffs(n: int, seed: int) -> list[tuple[int, int]]:
    """``n`` deterministic (a, b) pairs with 1 <= a < P31, 0 <= b < P31
    for the permutation family h_i(x) = (a_i * x + b_i) mod P31."""
    rnd = random.Random(seed)
    return [(rnd.randrange(1, P31), rnd.randrange(0, P31)) for _ in range(n)]
