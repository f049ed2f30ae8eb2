"""Portable deterministic hashing — identical values in Spark SQL and DuckDB.

Spark's murmur `hash()` and DuckDB's `hash()` disagree, so cross-engine-checkable
sketches (MinHash, SimHash, LSH) are built on md5 hex prefixes converted to
integers — bit-identical in both engines:

    Spark : cast(conv(substring(md5(x), 1, 7), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(x), 1, 7))::BIGINT

A 7-hex-digit prefix is < 2^28, so affine re-hashes (a*h + b) mod P with
a,b < 2^31 stay well inside signed-64 range — no overflow on either engine.
"""

from __future__ import annotations

import numpy as np

# Mersenne prime 2^31 - 1
MERSENNE_P = 2_147_483_647

# MinHash family: K affine hash functions, coefficients fixed by seed so both
# dialects embed the same literals. K=8 signatures, 4 bands x 2 rows (classic
# banding: collision prob at jaccard s is 1-(1-s^2)^4).
MINHASH_K = 8
MINHASH_BANDS = 4
_rng = np.random.RandomState(42)
MINHASH_A = [int(x) for x in _rng.randint(1, MERSENNE_P, size=MINHASH_K)]
MINHASH_B = [int(x) for x in _rng.randint(0, MERSENNE_P, size=MINHASH_K)]

# Random-hyperplane LSH for embeddings: n_planes x dim literal matrix, seeded.
LSH_PLANES = 8
EMBED_DIM = 64
_rng2 = np.random.RandomState(7)
HYPERPLANES = [
    [round(float(v), 6) for v in _rng2.randn(EMBED_DIM)] for _ in range(LSH_PLANES)
]

SIMHASH_BITS = 24


def h7(expr: str, dialect: str) -> str:
    """28-bit portable hash of a string expression."""
    if dialect == "spark":
        return f"cast(conv(substring(md5({expr}), 1, 7), 16, 10) as bigint)"
    return f"('0x' || substr(md5({expr}), 1, 7))::BIGINT"


def minhash_expr(k: int, h_expr: str) -> str:
    """k-th affine re-hash of a precomputed h7 value (dialect-neutral)."""
    return f"(({MINHASH_A[k]} * {h_expr} + {MINHASH_B[k]}) % {MERSENNE_P})"
