"""Unit vectors for the hashing primitives (reference-style tiny tables,
mirroring /root/reference/src/unittest.cpp:10-16)."""

import numpy as np

from gencore_ray.functions.hashing import (
    hash_bytes_u64,
    hash_str_array_u64,
    minhash_perms,
    popcount64,
    pow_array,
    splitmix64,
)


def test_splitmix64_deterministic_and_dispersive():
    x = np.arange(1000, dtype=np.uint64)
    a, b = splitmix64(x), splitmix64(x)
    assert (a == b).all()
    assert len(np.unique(a)) == 1000
    assert (a != x).all()


def test_hash_bytes_stable():
    assert hash_bytes_u64(b"hello") == hash_bytes_u64(b"hello")
    assert hash_bytes_u64(b"hello") != hash_bytes_u64(b"hellp")
    assert hash_bytes_u64(b"hello", seed=1) != hash_bytes_u64(b"hello", seed=2)


def test_hash_str_array_matches_scalar():
    arr = hash_str_array_u64(["a", "b", "a"])
    assert arr[0] == arr[2] != arr[1]


def test_minhash_perms_are_odd_and_seeded():
    a1, b1 = minhash_perms(64, 42)
    a2, b2 = minhash_perms(64, 42)
    a3, _ = minhash_perms(64, 43)
    assert (a1 == a2).all() and (b1 == b2).all()
    assert (a1 % 2 == 1).all()
    assert not (a1 == a3).all()


def test_popcount64():
    assert popcount64(np.uint64(0))[0] == 0
    assert popcount64(np.uint64(0xFFFFFFFFFFFFFFFF))[0] == 64
    assert popcount64(np.array([3, 7, 255], dtype=np.uint64)).tolist() == [2, 3, 8]


def test_pow_array():
    p = pow_array(np.uint64(3), 4)
    assert p.tolist() == [27, 9, 3, 1]
