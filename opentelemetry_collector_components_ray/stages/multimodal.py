"""Multimodal (binary-payload) processing stages.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages sized for
large rows (small ``batch_size``; Ray splits blocks by byte size, so
wide binary rows stream through the object store without ballooning a
worker's heap).

Round 3: the image and audio decode kernels are REAL — pure-numpy
codecs for 24-bit uncompressed BMP (BITMAPFILEHEADER +
BITMAPINFOHEADER, bottom-up/top-down rows, 4-byte row padding,
BGR order) and PCM16 mono RIFF/WAVE (proper chunk walk, word
alignment).  The deterministic fixtures (:func:`synth_image_table`,
:func:`synth_audio_table`) emit real ``image/bmp`` / ``audio/wav``
bytes, so the actor-pool decode path is end-to-end real; no external
libraries.  The legacy ``IMG1``/``AUD1`` synthetic-header formats stay
decodable for old fixtures.  Video decode is REAL too (round 3):
a pure-numpy YUV4MPEG2 (Y4M) parser — header tokens, FRAME markers,
mono/420/444 plane sizes, seekable every-k sampling — with the legacy
``VID1`` stub kept for old fixtures; compressed containers (mp4/webm)
genuinely need external codecs and stay out of scope.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .ann import round_half_away

MAGIC = b"IMG1"
HEADER = struct.Struct("<4sHHI")  # magic, width, height, seed (legacy)


# ---------------------------------------------------------------------------
# Real BMP codec (pure numpy/struct): 24-bit uncompressed BI_RGB.
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → BMP bytes (24-bit, bottom-up, BGR,
    4-byte-padded rows)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) uint8 RGB.  Handles bottom-up and
    top-down (negative height) images, arbitrary data offsets, and
    4-byte row padding; rejects compressed / non-24-bit files."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h_signed = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down, h = h_signed < 0, abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    arr = np.frombuffer(
        b, np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    px = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return px if top_down else px[::-1]

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("payload", pa.binary()),      # opaque encoded bytes
        ("mime", pa.string()),         # typed metadata
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_image_table_formula(n: int) -> pa.Table:
    """Image rows whose REAL BMP payloads hold closed-form pixel
    values — pixel(i, r, c, ch) = (7i + 31r + 13c + 97·ch) mod 256,
    w = 8 + 37i mod 56, h = 8 + 53i mod 56.  Pure integer arithmetic,
    so a SQL oracle can recompute every decoded feature exactly
    (:func:`multimodal_features_sql`) — the encode → decode → feature
    path (row padding, BGR flip, bottom-up order) is value-gated
    end-to-end."""
    ids, payloads, w_, h_ = [], [], [], []
    for i in range(n):
        w = 8 + (i * 37) % 56
        h = 8 + (i * 53) % 56
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = ((7 * i + 31 * r + 13 * c + 97 * ch) % 256).astype(np.uint8)
        payloads.append(encode_bmp(img))
        ids.append(i)
        w_.append(w)
        h_.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/bmp"] * n, pa.string()),
            "width": pa.array(w_, pa.int32()),
            "height": pa.array(h_, pa.int32()),
        }
    )


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic image rows — REAL 24-bit BMP payloads (encoded by
    :func:`encode_bmp` from seeded pixel noise; no external data)."""
    rng = np.random.RandomState(seed)
    ids, payloads, w_, h_ = [], [], [], []
    for i in range(n):
        w = int(rng.randint(8, 64))
        h = int(rng.randint(8, 64))
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        payloads.append(encode_bmp(img))
        ids.append(i)
        w_.append(w)
        h_.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/bmp"] * n, pa.string()),
            "width": pa.array(w_, pa.int32()),
            "height": pa.array(h_, pa.int32()),
        }
    )


class FakeImageDecoder:
    """Decoder for the LEGACY synthetic-header format (kept so old
    fixtures keep decoding).  decode(payload) -> (H, W) uint8 array."""

    def decode(self, payload: bytes) -> np.ndarray:
        magic, w, h, _seed = HEADER.unpack(payload[: HEADER.size])
        if magic != MAGIC:
            raise ValueError("bad magic")
        body = np.frombuffer(
            payload, dtype=np.uint8, offset=HEADER.size, count=w * h
        )
        return body.reshape(h, w)


class ImageDecoder:
    """Real decode kernel: sniffs BMP (``BM``) vs the legacy synthetic
    header; returns a grayscale (H, W) float array (RGB → ITU-R 601
    luma for BMP)."""

    def __init__(self):
        self._legacy = FakeImageDecoder()

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:2] == b"BM":
            rgb = decode_bmp(payload).astype(np.float64)
            return (
                0.299 * rgb[:, :, 0]
                + 0.587 * rgb[:, :, 1]
                + 0.114 * rgb[:, :, 2]
            )
        return self._legacy.decode(payload).astype(np.float64)


class DecodeImages:
    """Actor-pool stage: decode → per-image features.

    ``__init__`` loads the decoder once per actor (where a real model /
    codec init would go).  Emits compact features and drops the payload
    so downstream stages stop carrying the heavy bytes.
    """

    def __init__(self, target: Tuple[int, int] = (8, 8)):
        self.decoder = ImageDecoder()
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
                # ties away from zero = DuckDB round(): oracle-comparable
                "pixel_mean": pa.array(round_half_away(np.array(means))),
                "pixel_std": pa.array(round_half_away(np.array(stds))),
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


AUDIO_MAGIC = b"AUD1"
AUDIO_HEADER = struct.Struct("<4sIHH")  # legacy synthetic header


# ---------------------------------------------------------------------------
# Real WAV codec (pure numpy/struct): PCM16 mono RIFF/WAVE.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 samples, sample_rate).  Proper chunk
    walk with word alignment; rejects non-PCM16-mono."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or n_ch != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, ch={n_ch}, "
                    f"bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(data, "<i2"), int(rate)

AUDIO_SCHEMA = pa.schema(
    [
        ("audio_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
    ]
)


def synth_audio_table_formula(n: int) -> pa.Table:
    """Audio rows whose REAL WAV payloads hold a closed-form integer
    waveform — x(i, k) = ((k·(i+3)·1000003 + 12345) mod 24001) − 12000,
    n_samp = 400 + 991i mod 3600, rate = 8000 + 8000·(i mod 2).  SQL
    recomputes duration/RMS/zero-crossing exactly
    (:func:`multimodal_features_sql`), value-gating the RIFF chunk
    walk + PCM16 decode."""
    ids, payloads, rates, lens = [], [], [], []
    for i in range(n):
        n_samp = 400 + (i * 991) % 3600
        rate = 8000 + 8000 * (i % 2)
        k = np.arange(n_samp, dtype=np.int64)
        samples = (
            (k * (i + 3) * 1000003 + 12345) % 24001 - 12000
        ).astype(np.int16)
        payloads.append(encode_wav(samples, rate))
        ids.append(i)
        rates.append(rate)
        lens.append(n_samp)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * n, pa.string()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(lens, pa.int32()),
        }
    )


def synth_audio_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic audio rows — REAL PCM16 mono WAV payloads
    (encoded by :func:`encode_wav` from seeded sine sweeps)."""
    rng = np.random.RandomState(seed)
    ids, payloads, rates, lens = [], [], [], []
    for i in range(n):
        n_samp = int(rng.randint(400, 4000))
        rate = int(rng.choice([8000, 16000]))
        samples = (
            np.sin(np.arange(n_samp) * (0.01 + (i % 7) * 0.005)) * 12000
        ).astype(np.int16)
        payloads.append(encode_wav(samples, rate))
        ids.append(i)
        rates.append(rate)
        lens.append(n_samp)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * n, pa.string()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(lens, pa.int32()),
        }
    )


class FakeAudioDecoder:
    """Decoder for the LEGACY synthetic-header audio format."""

    def decode(self, payload: bytes) -> np.ndarray:
        magic, n_samp, rate_c, _seed = AUDIO_HEADER.unpack(
            payload[: AUDIO_HEADER.size]
        )
        if magic != AUDIO_MAGIC:
            raise ValueError("bad magic")
        return np.frombuffer(
            payload, dtype=np.int16, offset=AUDIO_HEADER.size, count=n_samp
        )


class AudioDecoder:
    """Real decode kernel: sniffs RIFF/WAVE vs the legacy header;
    returns (int16 samples, rate_or_None)."""

    def __init__(self):
        self._legacy = FakeAudioDecoder()

    def decode(self, payload: bytes):
        if payload[:4] == b"RIFF":
            return decode_wav(payload)
        return self._legacy.decode(payload), None


class DecodeAudio:
    """Actor-pool stage: decode → per-clip features (duration, RMS
    energy, zero-crossing rate, fixed-length energy envelope) — the
    audio analogue of DecodeImages.  The decoded WAV sample rate is
    authoritative; the metadata column is the fallback for legacy
    payloads."""

    def __init__(self, envelope_bins: int = 16):
        self.decoder = AudioDecoder()
        self.bins = envelope_bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zcr, env = [], [], [], []
        rates = batch["sample_rate"].to_numpy(zero_copy_only=False)
        for payload, meta_rate in zip(batch["payload"], rates):
            x, wav_rate = self.decoder.decode(payload.as_py())
            rate = wav_rate if wav_rate is not None else meta_rate
            x = x.astype(np.float64)
            dur.append(len(x) / float(rate))
            rms.append(float(np.sqrt(np.mean(x * x))))
            zc = np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
            zcr.append(float(zc))
            # fixed-length envelope via reduceat over equal chunks
            edges = (np.arange(self.bins) * len(x) // self.bins).astype(
                np.int64
            )
            e = np.add.reduceat(np.abs(x), edges) / np.maximum(
                np.diff(np.append(edges, len(x))), 1
            )
            env.append(np.round(e, 3).astype(np.float32).tolist())
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                # ties away from zero = DuckDB round(): oracle-comparable
                "duration_s": pa.array(
                    round_half_away(np.array(dur)), pa.float64()
                ),
                "rms": pa.array(round_half_away(np.array(rms)), pa.float64()),
                "zero_crossing_rate": pa.array(
                    round_half_away(np.array(zcr)), pa.float64()
                ),
                "envelope": pa.array(env, pa.list_(pa.float32())),
            }
        )


def audio_decode_stage(
    ds: rd.Dataset,
    envelope_bins: int = 16,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> rd.Dataset:
    return ds.map_batches(
        DecodeAudio,
        fn_constructor_kwargs={"envelope_bins": envelope_bins},
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


# ---------------------------------------------------------------------------
# Video: multi-frame binary payloads + in-payload frame sampling.
# ``frame_sample`` above thins ROWS; a video is one row whose payload
# holds many frames, so sampling must explode the payload — a
# payload-expanding map (1 row in, n_frames/every_k rows out) on an
# actor pool (the codec-state shape), with byte-sized batching.
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"VID1"
VIDEO_HEADER = struct.Struct("<4sHHHI")  # magic, n_frames, w, h, seed


def synth_video_table_formula(n: int) -> pa.Table:
    """Video rows with closed-form frame bytes —
    byte(i, f, p) = (131i + 17f + 7p) mod 256 at pixel index p,
    nf = 4 + 7i mod 13, w = 8 + 11i mod 24, h = 8 + 17i mod 24 —
    so the sampled-frame features are SQL-recomputable
    (:func:`multimodal_features_sql`)."""
    ids, payloads, nf_, w_, h_ = [], [], [], [], []
    for i in range(n):
        nf = 4 + (i * 7) % 13
        w = 8 + (i * 11) % 24
        h = 8 + (i * 17) % 24
        f = np.arange(nf, dtype=np.int64)[:, None]
        p = np.arange(w * h, dtype=np.int64)[None, :]
        body = ((131 * i + 17 * f + 7 * p) % 256).astype(np.uint8)
        payloads.append(
            VIDEO_HEADER.pack(VIDEO_MAGIC, nf, w, h, i) + body.tobytes()
        )
        ids.append(i)
        nf_.append(nf)
        w_.append(w)
        h_.append(h)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-synthetic"] * n, pa.string()),
            "n_frames": pa.array(nf_, pa.int32()),
            "width": pa.array(w_, pa.int32()),
            "height": pa.array(h_, pa.int32()),
        }
    )


def synth_video_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic 'video' rows: VID1 header + n_frames
    concatenated w×h uint8 frames."""
    rng = np.random.RandomState(seed)
    ids, payloads, nf_, w_, h_ = [], [], [], [], []
    for i in range(n):
        nf = int(rng.randint(4, 17))
        w = int(rng.randint(8, 32))
        h = int(rng.randint(8, 32))
        body = rng.bytes(nf * w * h)
        payloads.append(VIDEO_HEADER.pack(VIDEO_MAGIC, nf, w, h, i) + body)
        ids.append(i)
        nf_.append(nf)
        w_.append(w)
        h_.append(h)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-synthetic"] * n, pa.string()),
            "n_frames": pa.array(nf_, pa.int32()),
            "width": pa.array(w_, pa.int32()),
            "height": pa.array(h_, pa.int32()),
        }
    )


class FakeVideoDecoder:
    """Deterministic codec stand-in: yields (frame_idx, (h, w) uint8)
    for every ``every_k``-th frame WITHOUT materializing the other
    frames (a real decoder would seek keyframes the same way)."""

    def frames(self, payload: bytes, every_k: int):
        magic, nf, w, h, _seed = VIDEO_HEADER.unpack(
            payload[: VIDEO_HEADER.size]
        )
        if magic != VIDEO_MAGIC:
            raise ValueError("bad magic")
        fsz = w * h
        for fi in range(0, nf, every_k):
            off = VIDEO_HEADER.size + fi * fsz
            yield fi, np.frombuffer(
                payload, dtype=np.uint8, offset=off, count=fsz
            ).reshape(h, w)


# ---------------------------------------------------------------------------
# Real Y4M codec (pure numpy/bytes): YUV4MPEG2, the uncompressed video
# interchange format (mjpegtools/ffmpeg `yuv4mpegpipe`).  Stream =
# one `YUV4MPEG2 W<w> H<h> F<n>:<d> [C<cs>]\n` header, then per frame a
# `FRAME[ params]\n` marker followed by raw planar data.  Supported
# colorspaces: Cmono (Y only), C420* (Y + quarter-res U,V), C444.
# No external libraries; frame positions are computable when FRAME
# markers are bare (the common case), so every-k sampling seeks
# directly instead of walking skipped frames.
# ---------------------------------------------------------------------------

Y4M_MAGIC = b"YUV4MPEG2"


def _y4m_frame_size(w: int, h: int, cs: bytes) -> int:
    ysz = w * h
    if cs.startswith(b"mono"):
        return ysz
    if cs.startswith(b"444"):
        return 3 * ysz
    if cs.startswith(b"420"):  # 420, 420jpeg, 420mpeg2, 420paldv
        return ysz + 2 * ((w // 2) * (h // 2))
    raise ValueError(f"unsupported Y4M colorspace {cs!r}")


def encode_y4m(frames: np.ndarray, colorspace: bytes = b"mono") -> bytes:
    """(n_frames, H, W) uint8 luma → Y4M bytes.  ``mono`` writes the
    luma plane as-is; ``420jpeg`` adds flat 128 chroma planes."""
    nf, h, w = frames.shape
    assert frames.dtype == np.uint8
    parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C%s\n" % (w, h, colorspace)]
    chroma = (
        np.full((h // 2) * (w // 2) * 2, 128, np.uint8).tobytes()
        if colorspace.startswith(b"420")
        else b""
    )
    for f in range(nf):
        parts.append(b"FRAME\n")
        parts.append(frames[f].tobytes())
        if chroma:
            parts.append(chroma)
    return b"".join(parts)


class Y4MDecoder:
    """Real YUV4MPEG2 decoder: yields ``(frame_idx, (h, w) uint8 luma)``
    for every ``every_k``-th frame.  Bare ``FRAME\\n`` markers (what
    every known muxer emits for constant-parameter streams) make the
    frame offsets closed-form, so sampling seeks; frames with
    parameters fall back to a marker walk."""

    def frames(self, payload: bytes, every_k: int):
        nl = payload.index(b"\n")
        toks = payload[:nl].split(b" ")
        if toks[0] != Y4M_MAGIC:
            raise ValueError("not a Y4M stream")
        w = h = None
        cs = b"420jpeg"  # Y4M default when C is absent
        for tok in toks[1:]:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"C":
                cs = tok[1:]
        if not w or not h:
            raise ValueError("Y4M header missing W/H")
        ysz, fsz = w * h, _y4m_frame_size(w, h, cs)
        pos = nl + 1
        stride = len(b"FRAME\n") + fsz
        bare = (len(payload) - pos) % stride == 0 and all(
            payload[pos + i * stride : pos + i * stride + 6] == b"FRAME\n"
            for i in range(max(1, (len(payload) - pos) // stride))
        )
        if bare:  # seekable fast path
            nf = (len(payload) - pos) // stride
            for fi in range(0, nf, every_k):
                off = pos + fi * stride + 6
                yield fi, np.frombuffer(
                    payload, np.uint8, ysz, off
                ).reshape(h, w)
            return
        fi = 0  # parameterized FRAME markers: walk
        while pos < len(payload):
            if payload[pos : pos + 5] != b"FRAME":
                raise ValueError(f"bad FRAME marker at {pos}")
            data = payload.index(b"\n", pos) + 1
            if fi % every_k == 0:
                yield fi, np.frombuffer(
                    payload, np.uint8, ysz, data
                ).reshape(h, w)
            pos = data + fsz
            fi += 1


def synth_video_table_y4m_formula(n: int) -> pa.Table:
    """REAL Y4M (Cmono) video rows with the SAME closed-form luma
    bytes as :func:`synth_video_table_formula` —
    byte(i, f, p) = (131i + 17f + 7p) mod 256 — so the existing
    SQL oracle (:func:`multimodal_features_sql`) verifies the real
    container decode unchanged."""
    ids, payloads, nf_, w_, h_ = [], [], [], [], []
    for i in range(n):
        nf = 4 + (i * 7) % 13
        w = 8 + (i * 11) % 24
        h = 8 + (i * 17) % 24
        f = np.arange(nf, dtype=np.int64)[:, None]
        p = np.arange(w * h, dtype=np.int64)[None, :]
        luma = ((131 * i + 17 * f + 7 * p) % 256).astype(np.uint8)
        payloads.append(encode_y4m(luma.reshape(nf, h, w), b"mono"))
        ids.append(i)
        nf_.append(nf)
        w_.append(w)
        h_.append(h)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-yuv4mpeg"] * n, pa.string()),
            "n_frames": pa.array(nf_, pa.int32()),
            "width": pa.array(w_, pa.int32()),
            "height": pa.array(h_, pa.int32()),
        }
    )


class SampleVideoFrames:
    """Actor: one video row in → one row per sampled frame out
    (video_id, frame_idx, mean/std features).  Codec held per actor."""

    def __init__(self, every_k: int = 4):
        self.every_k = every_k
        self.codecs = {
            VIDEO_MAGIC: FakeVideoDecoder(),
            Y4M_MAGIC: Y4MDecoder(),
        }

    def _codec(self, payload: bytes):
        for magic, codec in self.codecs.items():
            if payload[: len(magic)] == magic:
                return codec
        raise ValueError("unknown video container magic")

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, fidx, means, stds = [], [], [], []
        ids = batch["video_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        for vid, payload in zip(ids, payloads):
            for fi, frame in self._codec(payload).frames(
                payload, self.every_k
            ):
                vids.append(int(vid))
                fidx.append(fi)
                f = frame.astype(np.float64)
                means.append(float(f.mean()))
                stds.append(float(f.std()))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                # ties away from zero = DuckDB round(): oracle-comparable
                "frame_mean": pa.array(
                    round_half_away(np.array(means)), pa.float64()
                ),
                "frame_std": pa.array(
                    round_half_away(np.array(stds)), pa.float64()
                ),
            }
        )


def multimodal_features_sql(every_k: int = 4) -> str:
    """DuckDB twin of the melted multimodal-features query over the
    FORMULA fixtures (``synth_*_table_formula``): recomputes every
    decoded feature from the closed-form payload contents — without
    decoding any bytes — so a BMP row-padding / BGR-order / WAV
    chunk-walk / frame-offset bug in the real codecs shows up as a
    value mismatch, not just a row-count change.

    Float parity: per-pixel/sample arithmetic is forced DOUBLE to
    mirror the engine's float64 kernels; integer-valued sums (RMS,
    means of ints) are exact in float64 so both sides compute
    identical doubles; final round(…, 6) matches the engine's
    ties-away-from-zero rounding.  Sizes derive from the documents
    view exactly like the query (n_img = max(64, count/10),
    n_vid = max(32, n_img/2))."""
    return f"""
WITH nn AS (
  SELECT GREATEST(64, (count(*) // 10))::BIGINT AS n_img,
         GREATEST(32, GREATEST(64, (count(*) // 10)) // 2)::BIGINT AS n_vid
  FROM documents
),
iid AS (SELECT unnest(range(0, (SELECT n_img FROM nn))) AS i),
idim AS (
  SELECT i, 8 + (i*37) % 56 AS w, 8 + (i*53) % 56 AS h FROM iid
),
rr AS (SELECT unnest(range(0, 64)) AS r),
cc AS (SELECT unnest(range(0, 64)) AS c),
px AS (
  SELECT i,
         0.299::DOUBLE * ((7*i + 31*r + 13*c) % 256)
         + 0.587::DOUBLE * ((7*i + 31*r + 13*c + 97) % 256)
         + 0.114::DOUBLE * ((7*i + 31*r + 13*c + 194) % 256) AS luma
  FROM idim, rr, cc
  WHERE r < h AND c < w
),
imean AS (SELECT i, avg(luma) AS m FROM px GROUP BY i),
istat AS (
  SELECT px.i,
         any_value(imean.m) AS mean_raw,
         sqrt(avg((luma - imean.m) * (luma - imean.m))) AS std_raw
  FROM px JOIN imean ON px.i = imean.i
  GROUP BY px.i
),
aid AS (SELECT unnest(range(0, (SELECT n_img FROM nn))) AS i),
adim AS (
  SELECT i, 400 + (i*991) % 3600 AS n_samp,
         8000 + 8000*(i % 2) AS rate
  FROM aid
),
kk AS (SELECT unnest(range(0, 4000)) AS k),
samp AS (
  SELECT i, k, ((k*(i+3)*1000003 + 12345) % 24001) - 12000 AS x
  FROM adim, kk WHERE k < n_samp
),
zc AS (
  SELECT i, k,
         CASE WHEN (x < 0) !=
                   lag(x < 0) OVER (PARTITION BY i ORDER BY k)
              THEN 1 ELSE 0 END AS chg
  FROM samp
),
arms AS (
  SELECT i, sqrt(avg((x*x)::DOUBLE)) AS rms_raw FROM samp GROUP BY i
),
azcr AS (
  SELECT i, avg(chg::DOUBLE) AS zcr_raw FROM zc WHERE k >= 1 GROUP BY i
),
astat AS (
  SELECT a.i, a.n_samp / a.rate::DOUBLE AS dur_raw, r.rms_raw, z.zcr_raw
  FROM adim a JOIN arms r ON a.i = r.i JOIN azcr z ON a.i = z.i
),
vid0 AS (SELECT unnest(range(0, (SELECT n_vid FROM nn))) AS i),
vdim AS (
  SELECT i, 4 + (i*7) % 13 AS nf, 8 + (i*11) % 24 AS w,
         8 + (i*17) % 24 AS h
  FROM vid0
),
ff AS (SELECT unnest(range(0, 16)) AS f),
pp AS (SELECT unnest(range(0, 961)) AS p),
vpx AS (
  SELECT i, f, ((131*i + 17*f + 7*p) % 256)::DOUBLE AS v
  FROM vdim, ff, pp
  WHERE f < nf AND f % {every_k} = 0 AND p < w*h
),
vmean AS (SELECT i, f, avg(v) AS m FROM vpx GROUP BY i, f),
vstat AS (
  SELECT vpx.i, vpx.f,
         any_value(vmean.m) AS mean_raw,
         sqrt(avg((v - vmean.m) * (v - vmean.m))) AS std_raw
  FROM vpx JOIN vmean ON vpx.i = vmean.i AND vpx.f = vmean.f
  GROUP BY vpx.i, vpx.f
)
SELECT 'image' AS modality, i AS obj_id, 'pixel_mean' AS feature,
       round(mean_raw, 6) AS value FROM istat
UNION ALL SELECT 'image', i, 'pixel_std', round(std_raw, 6) FROM istat
UNION ALL SELECT 'audio', i, 'duration_s', round(dur_raw, 6) FROM astat
UNION ALL SELECT 'audio', i, 'rms', round(rms_raw, 6) FROM astat
UNION ALL SELECT 'audio', i, 'zero_crossing_rate', round(zcr_raw, 6)
  FROM astat
UNION ALL SELECT 'video', i, 'frame_mean', round(mean_raw, 6) FROM vstat
UNION ALL SELECT 'video', i, 'frame_std', round(std_raw, 6) FROM vstat
"""


def video_frame_stage(
    ds: rd.Dataset,
    every_k: int = 4,
    batch_size: int = 16,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Frame-sampled features from video payloads.  Small batch_size:
    rows are megabyte-scale; batch bytes × concurrency must fit worker
    heaps (the multimodal sizing rule in the module docstring)."""
    return ds.map_batches(
        SampleVideoFrames,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
