"""Multimodal (binary-payload) processing stages.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages sized for
large rows (small ``batch_size``; Ray splits blocks by byte size, so
wide binary rows stream through the object store without ballooning a
worker's heap).

The container has no image/audio codecs, so the DECODE KERNEL is
stubbed: ``FakeImageDecoder`` is a deterministic stand-in (parses our
synthetic header, "decodes" to a small deterministic tensor).  The
Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested; swapping in a real decoder is replacing
one method (see ``DecodeImages.decode``), the actor/stage shape does
not change.

Synthetic payload format (produced by :func:`synth_image_table`):
``b"IMG1" + width:uint16 + height:uint16 + seed:uint32 + payload``.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MAGIC = b"IMG1"
HEADER = struct.Struct("<4sHHI")  # magic, width, height, seed

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("payload", pa.binary()),      # opaque encoded bytes
        ("mime", pa.string()),         # typed metadata
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic 'image' rows (no external data)."""
    rng = np.random.RandomState(seed)
    ids, payloads, w_, h_ = [], [], [], []
    for i in range(n):
        w = int(rng.randint(8, 64))
        h = int(rng.randint(8, 64))
        body = rng.bytes(w * h)
        payloads.append(HEADER.pack(MAGIC, w, h, i) + body)
        ids.append(i)
        w_.append(w)
        h_.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-synthetic"] * n, pa.string()),
            "width": pa.array(w_, pa.int32()),
            "height": pa.array(h_, pa.int32()),
        }
    )


class FakeImageDecoder:
    """Deterministic stand-in for a real codec (PIL/libjpeg absent in
    this environment).  decode(payload) -> (H, W) uint8 array."""

    def decode(self, payload: bytes) -> np.ndarray:
        magic, w, h, _seed = HEADER.unpack(payload[: HEADER.size])
        if magic != MAGIC:
            raise ValueError("bad magic")
        body = np.frombuffer(
            payload, dtype=np.uint8, offset=HEADER.size, count=w * h
        )
        return body.reshape(h, w)


class DecodeImages:
    """Actor-pool stage: decode → per-image features.

    ``__init__`` loads the decoder once per actor (where a real model /
    codec init would go).  Emits compact features and drops the payload
    so downstream stages stop carrying the heavy bytes.
    """

    def __init__(self, target: Tuple[int, int] = (8, 8)):
        self.decoder = FakeImageDecoder()
        self.target = target

    def _resize(self, img: np.ndarray) -> np.ndarray:
        """Nearest-neighbour resize (numpy-only)."""
        th, tw = self.target
        h, w = img.shape
        yi = (np.arange(th) * h // th).clip(0, h - 1)
        xi = (np.arange(tw) * w // tw).clip(0, w - 1)
        return img[np.ix_(yi, xi)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means, stds, thumbs = [], [], [], []
        for payload in batch["payload"]:
            img = self.decoder.decode(payload.as_py())
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            thumbs.append(
                self._resize(img).astype(np.float32).ravel().tolist()
            )
        return pa.table(
            {
                "image_id": batch["image_id"],
                "width": batch["width"],
                "height": batch["height"],
                "pixel_mean": pa.array(np.round(means, 6)),
                "pixel_std": pa.array(np.round(stds, 6)),
                "thumb": pa.array(thumbs, pa.list_(pa.float32())),
            }
        )


def decode_stage(
    ds: rd.Dataset,
    target: Tuple[int, int] = (8, 8),
    batch_size: int = 64,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Binary rows are wide → small batch_size so batch × concurrency
    stays inside a worker heap; the object store spills the rest."""
    return ds.map_batches(
        DecodeImages,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample(
    ds: rd.Dataset, every_k: int = 4, id_col: str = "image_id"
) -> rd.Dataset:
    """'Video' frame sampling analogue: keep every k-th row by id —
    deterministic, vectorized filter."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t[id_col], every_k - 1), 0)
        )
        if (every_k & (every_k - 1)) == 0
        else t.filter(
            pc.equal(
                pc.subtract(
                    t[id_col],
                    pc.multiply(pc.divide(t[id_col], every_k), every_k),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
