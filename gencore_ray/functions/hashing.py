"""Stable, vectorised 64-bit hashing.

Everything downstream (MinHash perms, band keys, SimHash, cluster ids)
rides on these primitives, so they must be byte-stable across
processes and machines — Python's builtin ``hash`` is salted per
process and is never used.  The reference gets determinism from fixed
codecs (4-bit base packing, /root/reference/src/bamutil.cpp:148-183);
we get it from blake2b plus splitmix64-style mixing.

All array math is uint64 with intentional wraparound; numpy emits
RuntimeWarnings-free wrapping for unsigned dtypes.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    """Vectorised splitmix64 finaliser — a strong uint64 -> uint64 mixer."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=U64) + _SM_GAMMA) & _MASK
        z = ((z ^ (z >> np.uint64(30))) * _SM_M1) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * _SM_M2) & _MASK
        return z ^ (z >> np.uint64(31))


def hash_bytes_u64(data: bytes, seed: int = 0) -> int:
    """Stable 64-bit hash of a byte string (blake2b, 8-byte digest)."""
    h = hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash_str_u64(s: str, seed: int = 0) -> int:
    return hash_bytes_u64(s.encode("utf-8", "surrogatepass"), seed)


def hash_str_array_u64(strings, seed: int = 0) -> np.ndarray:
    """Hash a sequence of strings to uint64.

    Python-level loop, but only ever called on *unique* tokens of a
    batch (see text.py) so the cost is amortised across repeats.
    """
    salt = seed.to_bytes(8, "little")
    b2b = hashlib.blake2b
    out = np.empty(len(strings), dtype=U64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            b2b(s.encode("utf-8", "surrogatepass"), digest_size=8, salt=salt).digest(),
            "little",
        )
    return out


def combine_u64(a: np.ndarray, b: np.ndarray | np.uint64) -> np.ndarray:
    """Order-sensitive combiner for two uint64 streams."""
    a = np.asarray(a, dtype=U64)
    with np.errstate(over="ignore"):
        mixed = (a * np.uint64(0x100000001B3) + np.asarray(b, dtype=U64)) & _MASK
    return splitmix64(mixed)


def minhash_perms(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) for permutations h -> a*h + b over Z_2^64.

    Odd multipliers make ``a*h + b`` a bijection on uint64, so taking
    mins under it is a valid MinHash permutation family.
    """
    rng = np.random.RandomState(seed)
    # two 32-bit draws per 64-bit value (RandomState caps at 2**32)
    def draw(n: int) -> np.ndarray:
        hi = rng.randint(0, 2**32, size=n, dtype=np.uint64)
        lo = rng.randint(0, 2**32, size=n, dtype=np.uint64)
        return (hi << np.uint64(32)) | lo

    a = draw(num_perm) | np.uint64(1)  # force odd
    b = draw(num_perm)
    return a, b


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (SimHash Hamming distance)."""
    v = np.atleast_1d(np.asarray(x, dtype=U64))
    bits = np.unpackbits(v.view(np.uint8)).reshape(v.shape + (64,))
    return bits.sum(axis=-1).astype(np.int64)


def pow_array(base: np.uint64, n: int) -> np.ndarray:
    """[base^(n-1), ..., base^1, base^0] over Z_2^64, warning-free."""
    out = np.empty(n, dtype=U64)
    out[n - 1] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(n - 2, -1, -1):
            out[i] = (out[i + 1] * base) & _MASK
    return out
