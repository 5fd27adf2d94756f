"""Numpy-vectorized MD5 (RFC 1321) for short keys.

The engine derives several identity columns from ``md5(key)`` because
the DuckDB oracle can recompute the same value (``md5()`` is ANSI-ish
and stable), but ``hashlib.md5`` is one Python call per row — the one
row-at-a-time loop the round-1 review flagged on the flagship hot path
(stages/enrich.py error_id).  Identity keys are unique per row, so
``np.unique`` amortization cannot help; the fix is to vectorize the
digest itself.

Keys shorter than 56 bytes fit a single 512-bit MD5 block, so the whole
batch is one (n, 16) uint32 message matrix and the 64 compression
rounds run as numpy uint32 ops across all rows at once (wraparound is
native unsigned behaviour).  Rows ≥ 56 bytes (multi-block: long texts)
fall back to ``hashlib`` — fingerprints amortize those via
``np.unique`` upstream.

Little-endian layout notes: MD5 is defined little-endian, and the
uint8→uint32/uint64 ``view`` tricks below additionally assume a
little-endian host (x86-64/aarch64).  A big-endian host would need
byteswaps; asserted at import.
"""

from __future__ import annotations

import hashlib
import math
import sys

import numpy as np
import pyarrow as pa

assert sys.byteorder == "little", "md5vec assumes a little-endian host"

_S = np.array(
    [7, 12, 17, 22] * 4
    + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = np.array(
    [int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_MAX_SINGLE_BLOCK = 55  # bytes; 56..63 need a second padding block


def _compress_block_core(m: np.ndarray) -> np.ndarray:
    """One MD5 compression over (n, 16) uint32 message blocks (already
    padded).  Returns (n, 16) uint8 digests.

    In-place numpy ops with two reused scratch buffers — a naive
    expression-per-round version allocates ~6 temporaries × 64 rounds
    and loses to hashlib on allocation traffic alone.
    """
    n = m.shape[0]
    a = np.full(n, 0x67452301, dtype=np.uint32)
    b = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d = np.full(n, 0x10325476, dtype=np.uint32)
    a0, b0, c0, d0 = a.copy(), b.copy(), c.copy(), d.copy()
    f = np.empty(n, dtype=np.uint32)
    t = np.empty(n, dtype=np.uint32)
    for i in range(64):
        if i < 16:
            # f = (b & c) | (~b & d)
            np.bitwise_and(b, c, out=f)
            np.bitwise_not(b, out=t)
            np.bitwise_and(t, d, out=t)
            np.bitwise_or(f, t, out=f)
            g = i
        elif i < 32:
            np.bitwise_and(d, b, out=f)
            np.bitwise_not(d, out=t)
            np.bitwise_and(t, c, out=t)
            np.bitwise_or(f, t, out=f)
            g = (5 * i + 1) % 16
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_xor(f, d, out=f)
            g = (3 * i + 5) % 16
        else:
            np.bitwise_not(d, out=f)
            np.bitwise_or(b, f, out=f)
            np.bitwise_xor(c, f, out=f)
            g = (7 * i) % 16
        f += a
        f += _K[i]
        f += m[:, g]
        s = np.uint32(_S[i])
        # new_b = b + rotl(f, s), written into a's (now-free) buffer
        free = a
        np.left_shift(f, s, out=free)
        f >>= np.uint32(32) - s
        free |= f
        free += b
        a, b, c, d = d, free, b, c
    a += a0
    b += b0
    c += c0
    d += d0
    dig = np.empty((len(a), 16), dtype=np.uint8)
    for j, w in enumerate((a, b, c, d)):
        for byte in range(4):
            dig[:, 4 * j + byte] = ((w >> np.uint32(8 * byte)) & np.uint32(0xFF)).astype(np.uint8)
    return dig


def _digest_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """MD5-hex for n byte strings given as a flat uint8 array plus
    (n+1,) offsets.  Returns an (n, 32) uint8 ASCII-hex matrix.
    Vectorized single-block path; hashlib fallback for rows ≥ 56
    bytes."""
    n = len(offsets) - 1
    out = np.empty((n, 32), dtype=np.uint8)
    if n == 0:
        return out
    lengths = np.diff(offsets)
    short = lengths <= _MAX_SINGLE_BLOCK
    all_short = bool(short.all())
    s_len = lengths if all_short else lengths[short]
    s_start = offsets[:-1] if all_short else offsets[:-1][short]

    if len(s_len):
        ns = len(s_len)
        # Over-copy a fixed 64-byte window starting at each row's offset
        # (axis-0 fancy index of an overlapping strided view = one
        # 64-byte memcpy per row — ~12× faster than per-element
        # repeat/arange index construction), then mask the tail.  The
        # whole build→compress→hex pipeline runs in 32k-row chunks so
        # every intermediate stays cache-resident (~3× over one flat
        # pass at 10^6 rows); measured ~2.5× hashlib on 1M 16-byte keys.
        flat_pad = np.concatenate([flat, np.zeros(64, np.uint8)])
        windows = np.lib.stride_tricks.as_strided(
            flat_pad, shape=(len(flat_pad) - 63, 64), strides=(1, 1)
        )
        hexed = np.empty((ns, 32), dtype=np.uint8)
        col = np.arange(64, dtype=np.int64)[None, :]
        chunk = 1 << 15
        row_ar = np.arange(min(chunk, ns))
        for i in range(0, ns, chunk):
            sl = slice(i, min(i + chunk, ns))
            L, S = s_len[sl], s_start[sl]
            k = len(L)
            buf = windows[S]  # (k, 64), fresh C-contiguous
            buf *= col < L[:, None]
            buf[row_ar[:k], L] = 0x80
            # bit length, little-endian, into bytes 56..63
            words = buf.reshape(-1).view(np.uint64).reshape(k, 8)
            words[:, 7] = L.astype(np.uint64) * np.uint64(8)
            m = buf.reshape(-1).view(np.uint32).reshape(k, 16)
            dig = _compress_block_core(m)
            o = hexed[sl]
            o[:, 0::2] = _HEX[dig >> 4]
            o[:, 1::2] = _HEX[dig & 0x0F]
        if all_short:
            out[:] = hexed
        else:
            out[short] = hexed

    if not all_short:
        idx = np.nonzero(~short)[0]
        md5 = hashlib.md5
        tb = flat.tobytes()
        for i in idx:
            out[i] = np.frombuffer(
                md5(tb[offsets[i] : offsets[i + 1]]).hexdigest().encode(),
                dtype=np.uint8,
            )
    return out


def md5_hex_np(values: np.ndarray) -> np.ndarray:
    """MD5-hex for an object array of ``str``/``bytes`` →  '<U32'."""
    enc = [
        v if isinstance(v, bytes) else str(v).encode("utf-8")
        for v in values
    ]
    lengths = np.fromiter((len(b) for b in enc), dtype=np.int64,
                          count=len(enc))
    offsets = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = (
        np.frombuffer(b"".join(enc), dtype=np.uint8)
        if offsets[-1]
        else np.empty(0, dtype=np.uint8)
    )
    hexed = _digest_flat(flat, offsets)
    return np.frombuffer(hexed.tobytes(), dtype="S32").astype("U32")


def md5_hex(arr) -> pa.Array:
    """MD5-hex for an Arrow string/binary array — zero-copy in from the
    Arrow buffers, zero-copy out (the hex byte matrix becomes the
    StringArray data buffer directly; no Python string objects)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("md5_hex expects non-null input")
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        off_dtype = np.int32
    elif pa.types.is_large_string(arr.type) or pa.types.is_large_binary(
        arr.type
    ):
        off_dtype = np.int64
    else:
        raise TypeError(f"md5_hex expects string/binary, got {arr.type}")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    flat = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    hexed = _digest_flat(flat, offsets)
    n = len(arr)
    out_offsets = (np.arange(n + 1, dtype=np.int32) * 32)
    return pa.Array.from_buffers(
        pa.utf8(),
        n,
        [None, pa.py_buffer(out_offsets.tobytes()),
         pa.py_buffer(hexed.tobytes())],
    )
