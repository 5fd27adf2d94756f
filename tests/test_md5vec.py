"""Vectorized MD5 kernel (functions/md5vec.py) vs hashlib ground truth."""

import hashlib
import random
import string

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray.functions.md5vec import (
    md5_hex,
    md5_hex_np,
)


def _expected(strings):
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings]


EDGES = [
    "",
    "a",
    "abc",
    "x" * 55,   # largest single-block message
    "y" * 56,   # smallest two-block (hashlib fallback)
    "z" * 57,
    "w" * 200,
    "héllo wörld ü" * 3,  # multi-byte utf-8: lengths are BYTE lengths
    "conv-000123:17",
]


def test_edge_lengths_np():
    got = md5_hex_np(np.array(EDGES, dtype=object))
    assert list(got) == _expected(EDGES)


def test_edge_lengths_arrow():
    assert md5_hex(pa.array(EDGES)).to_pylist() == _expected(EDGES)


def test_random_strings_mixed_lengths():
    rng = random.Random(7)
    cases = [
        "".join(rng.choices(string.printable, k=rng.randint(0, 120)))
        for _ in range(400)
    ]
    assert md5_hex(pa.array(cases)).to_pylist() == _expected(cases)
    assert list(md5_hex_np(np.array(cases, dtype=object))) == _expected(cases)


def test_sliced_and_chunked_arrays():
    cases = [f"key-{i}" for i in range(300)]
    arr = pa.array(cases)
    assert md5_hex(arr.slice(17, 100)).to_pylist() == _expected(cases[17:117])
    chunked = pa.chunked_array([cases[:100], cases[100:]])
    assert md5_hex(chunked).to_pylist() == _expected(cases)


def test_empty_and_large_string_types():
    assert md5_hex(pa.array([], pa.string())).to_pylist() == []
    cases = ["alpha", "beta"]
    assert (
        md5_hex(pa.array(cases, pa.large_string())).to_pylist()
        == _expected(cases)
    )


def test_bytes_input_np():
    got = md5_hex_np(np.array([b"raw-bytes", b""], dtype=object))
    assert list(got) == [
        hashlib.md5(b"raw-bytes").hexdigest(),
        hashlib.md5(b"").hexdigest(),
    ]


def test_null_rejected():
    with pytest.raises(ValueError):
        md5_hex(pa.array(["a", None]))


def test_chunk_boundary_sizes():
    # force the 32k-row chunk loop to run more than once
    n = (1 << 15) + 17
    cases = [f"k{i}" for i in range(n)]
    got = md5_hex(pa.array(cases)).to_pylist()
    assert got[0] == hashlib.md5(b"k0").hexdigest()
    assert got[-1] == hashlib.md5(f"k{n-1}".encode()).hexdigest()
    assert got[1 << 15] == hashlib.md5(f"k{1 << 15}".encode()).hexdigest()


def test_popcount64():
    from opentelemetry_collector_components_ray.stages.dedup import (
        _popcount64,
    )

    rng = np.random.RandomState(3)
    v = rng.randint(0, 2**63, size=1000).astype(np.uint64)
    v[0], v[1], v[2] = 0, np.uint64(2**64 - 1), np.uint64(1)
    got = _popcount64(v)
    exp = np.array([bin(int(x)).count("1") for x in v], dtype=np.int64)
    assert (got == exp).all()
    assert _popcount64(np.empty(0, dtype=np.uint64)).shape == (0,)
