"""SHA-256 kernel (functions/sha256vec.py) vs hashlib ground truth."""

import hashlib
import random
import string

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_components_ray.functions.sha256vec import (
    sha256_hex,
    sha256_hex_np,
)


def _expected(strings):
    return [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in strings]


EDGES = [
    "",
    "a",
    "abc",
    "x" * 55,
    "y" * 56,
    "z" * 64,
    "w" * 200,
    "héllo wörld ü" * 3,  # multi-byte utf-8: lengths are BYTE lengths
    "conv-000123:17",
]


def test_edge_lengths_np():
    got = sha256_hex_np(np.array(EDGES, dtype=object))
    assert list(got) == _expected(EDGES)


def test_edge_lengths_arrow():
    assert sha256_hex(pa.array(EDGES)).to_pylist() == _expected(EDGES)


def test_random_strings_mixed_lengths():
    rng = random.Random(11)
    cases = [
        "".join(rng.choices(string.printable, k=rng.randint(0, 120)))
        for _ in range(400)
    ]
    assert sha256_hex(pa.array(cases)).to_pylist() == _expected(cases)
    assert (
        list(sha256_hex_np(np.array(cases, dtype=object)))
        == _expected(cases)
    )


def test_sliced_chunked_large_and_binary():
    cases = [f"key-{i}" for i in range(300)]
    arr = pa.array(cases)
    assert (
        sha256_hex(arr.slice(17, 100)).to_pylist()
        == _expected(cases[17:117])
    )
    chunked = pa.chunked_array([cases[:100], cases[100:]])
    assert sha256_hex(chunked).to_pylist() == _expected(cases)
    assert (
        sha256_hex(pa.array(cases, pa.large_string())).to_pylist()
        == _expected(cases)
    )
    raw = [b"raw-bytes", b"", b"\x00\xff" * 40]
    assert sha256_hex(pa.array(raw, pa.binary())).to_pylist() == [
        hashlib.sha256(b).hexdigest() for b in raw
    ]
    assert sha256_hex(pa.array([], pa.string())).to_pylist() == []


def test_bytes_input_np_and_null_rejected():
    got = sha256_hex_np(np.array([b"raw-bytes", b""], dtype=object))
    assert list(got) == [
        hashlib.sha256(b"raw-bytes").hexdigest(),
        hashlib.sha256(b"").hexdigest(),
    ]
    with pytest.raises(ValueError):
        sha256_hex(pa.array(["a", None]))
