"""Engine-portable deterministic hashing.

All pipeline operators hash through md5 (bit-identical in Spark, DuckDB
and Python), taking a 7-hex-digit prefix => 28-bit non-negative int that
fits products with 31-bit multipliers inside int64 (no overflow in
either engine). Spark/SQL fragment builders are kept side by side so
the DuckDB oracles are generated from the same constants.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# modulus for universal hashing: a*h + b mod P with a,b < P, h < 2^28
# keeps every intermediate below 2^59 — safe in int64 in both engines.
P = 1_000_000_007
HASH_BITS = 28


def h28(col: Column) -> Column:
    """28-bit md5-prefix hash of a string column (Spark side).

    Every pipeline operator hashes through here at plan-build time, so
    this seam doubles as the pipeline family's ANSI session guard
    (r10 verdict item 1)."""
    from ..session import require_ansi_off

    require_ansi_off("pipeline operators (h28)")
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def h28_sql(expr: str) -> str:
    """Same hash as ``h28`` as a DuckDB SQL fragment."""
    return f"(('0x' || substr(md5({expr}), 1, 7))::BIGINT)"


def qid(name: str) -> str:
    """Backtick-quote an identifier for interpolation into SQL-string
    fragments / ``F.col`` paths (embedded backticks escaped by
    doubling). An id column named with a reserved word or special
    characters that resolves fine via ``F.col(name)`` would otherwise
    fail to parse — or parse as an unintended expression — once
    interpolated into ``selectExpr``/``F.expr`` text (r12 ADVICE;
    matches ``pq_encode``'s treatment)."""
    return "`" + name.replace("`", "``") + "`"


def h52(col: Column) -> Column:
    """52-bit md5-prefix hash (13 hex digits). Still exactly
    representable in a double, so normalized hashes stay bit-identical
    across Spark/DuckDB/pandas — used where 28 bits would bias a
    billion-scale estimator (KMV: collisions undercount ~n/2^bits and
    the estimate saturates near the domain; 2^52 pushes both past any
    realistic cardinality)."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")


def h52_sql(expr: str) -> str:
    """Same hash as ``h52`` as a DuckDB SQL fragment."""
    return f"(('0x' || substr(md5({expr}), 1, 13))::BIGINT)"


def h32(col: Column) -> Column:
    """32-bit md5-prefix hash (for SimHash bit sampling)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def minhash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family."""
    rng = random.Random(seed)
    return [(rng.randrange(1, P), rng.randrange(0, P)) for _ in range(num_hashes)]


def linear_weights(n_buckets: int, seed: int = 17) -> list[float]:
    """Deterministic weight vector in [-1, 1] for the hashed linear
    scorer — inlined as literals in both engines (like ``hyperplanes``)
    so scoring is bit-identical."""
    rng = random.Random(seed)
    return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(n_buckets)]


def hyperplanes(n_planes: int, dim: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, inlined as literals in
    both engines so the bucket assignment is bit-identical."""
    rng = random.Random(seed)
    return [[round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
            for _ in range(n_planes)]


def kmv_hash_expr(col: Column, salt: str = "kmv") -> Column:
    """Normalized KMV hash in (0, 1): the shared Spark expression for
    BOTH the batch sketch and the streaming fold — the hash family is
    part of the replay contract, and computing it Spark-side everywhere
    means the streaming path can never diverge on value stringification
    (Python ``str(True)`` = 'True' vs Spark's 'true'; '1e+20' vs
    '1.0E20')."""
    return ((h52(F.concat(F.lit(salt + ":"), col.cast("string")))
             .cast("double") + F.lit(0.5)) / F.lit(float(2 ** 52)))
