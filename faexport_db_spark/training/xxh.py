"""Vectorized, bit-exact reproductions of Spark's ``xxhash64``
primitives (NumPy, wraparound uint64 arithmetic).

Spark's ``XxHash64`` expression folds its children left to right:
``hash = seed(42); for child: hash = hash<type>(child, hash)`` where
integral 8-byte types go through ``hashLong`` and 4-byte types through
``hashInt`` (``sql/catalyst`` XXH64). These helpers reproduce those
two paths exactly — verified element-for-element against the JVM
expression in ``tests/test_training.py`` — so Arrow kernels can
re-derive hash families (e.g. the per-permutation MinHash lanes)
without changing a single output value.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r64 = np.uint64(r)
    return (x << r64) | (x >> (np.uint64(64) - r64))


def _fmix(h: np.ndarray) -> np.ndarray:
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxh64_long(value: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashLong(value, seed) — 8-byte integral operand step.
    ``value``/``seed`` broadcast; inputs must be uint64 views."""
    with np.errstate(over="ignore"):
        h = seed + _P5 + np.uint64(8)
        k1 = _rotl(value * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def xxh64_int(value: np.ndarray | int, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashInt(value, seed) — 4-byte integral operand step
    (Spark routes IntegerType literals here, e.g. MinHash lane ids)."""
    with np.errstate(over="ignore"):
        v = np.uint64(value) if np.isscalar(value) else value
        h = seed + _P5 + np.uint64(4)
        h = h ^ ((v & np.uint64(0xFFFFFFFF)) * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)
