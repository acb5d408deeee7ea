"""Vectorized SRP (sign-random-projection) kernel — pure numpy, no Spark.

Replaces the interpreted higher-order-function fold soup that computed each
bucket bit as an ``F.aggregate`` over a ``zip_with`` with a 64-literal sign
array (12 planes x 64 dims of boxed, non-codegen expression eval per row —
measured at 39% of the whole bench suite). Here the WHOLE plane family is
one batched numpy recurrence per Arrow batch.

Bit-exactness contract (the DuckDB oracles fold sequentially): the JVM/SQL
projection is ``acc = fl(acc + x_d * s_d)`` for d = 0..dims-1 with
``s_d in {-1.0, +1.0}`` (multiply exact, one float64 rounding per add).
``srp_bits_batch`` reproduces that exact operation sequence — an outer loop
over dims with a vectorized (rows x planes) fused step — so every projection
is bit-identical to the sequential fold, including sign decisions at
``proj >= 0`` for projections within one ulp of zero. A plain matmul would
use pairwise/SIMD summation and could flip such signs.

Plane p's component for dimension d is deterministic in {-1, +1}: sign = +1
iff the first hex nibble of md5('p:d') is even — identical derivation to
``operators.similarity.srp_bucket`` and the DuckDB oracle generator.
"""
from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

__all__ = ["srp_sign_matrix", "srp_bits_batch"]


@lru_cache(maxsize=64)
def srp_sign_matrix(planes: int, dims: int, plane_offset: int = 0) -> np.ndarray:
    """(dims, planes) float64 matrix of ±1 signs, md5-derived."""
    s = np.empty((dims, planes), dtype=np.float64)
    for j, p in enumerate(range(plane_offset, plane_offset + planes)):
        for d in range(dims):
            nib = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0]
            s[d, j] = 1.0 if int(nib, 16) % 2 == 0 else -1.0
    return s


def srp_bits_batch(
    emb: np.ndarray, planes: int, dims: int, plane_offset: int = 0
) -> list[str]:
    """Bucket-id strings ('0'/'1' per plane) for a (n, dims) float64 batch.

    The accumulation loops over dims OUTERMOST so each (row, plane) cell sees
    exactly the sequential ``acc + x_d * s_d`` rounding sequence of the JVM /
    DuckDB folds (see module docstring) while staying vectorized across
    (rows x planes) per step — 64 fused steps total, not 64*n*planes
    interpreted ops.
    """
    n = emb.shape[0]
    if n == 0:
        return []
    if emb.shape[1] != dims:
        raise ValueError(f"expected {dims}-dim embeddings, got {emb.shape[1]}")
    signs = srp_sign_matrix(planes, dims, plane_offset)
    acc = np.zeros((n, planes), dtype=np.float64)
    for d in range(dims):
        acc += emb[:, d : d + 1] * signs[d]
    bits = np.where(acc >= 0, "1", "0")
    return ["".join(row) for row in bits]
