"""Multimodal binary-column stages: schema, decode plumbing, sampling."""

import numpy as np
import pytest

from opentelemetry_collector_components_ray.stages.multimodal import (
    IMAGE_SCHEMA,
    DecodeImages,
    FakeImageDecoder,
    decode_stage,
    frame_sample,
    synth_image_table,
)


def test_synth_schema_and_determinism():
    a = synth_image_table(16)
    b = synth_image_table(16)
    assert a.schema.equals(IMAGE_SCHEMA)
    assert a.equals(b)


def test_decoder_roundtrip():
    from opentelemetry_collector_components_ray.stages.multimodal import (
        ImageDecoder,
        decode_bmp,
    )

    t = synth_image_table(4)
    payload = t["payload"][0].as_py()
    assert payload[:2] == b"BM"  # real BMP bytes
    rgb = decode_bmp(payload)
    assert rgb.shape == (
        t["height"][0].as_py(), t["width"][0].as_py(), 3
    )
    assert rgb.dtype == np.uint8
    gray = ImageDecoder().decode(payload)
    assert gray.shape == rgb.shape[:2]


def test_decoder_rejects_bad_magic():
    with pytest.raises(ValueError):
        FakeImageDecoder().decode(b"NOPE" + b"\x00" * 16)


def test_decode_stage_features(ray_session):
    import ray.data as rd

    t = synth_image_table(50)
    out = decode_stage(rd.from_arrow(t), target=(4, 4)).to_pandas()
    assert len(out) == 50
    assert "payload" not in out.columns  # heavy bytes dropped post-decode
    assert (out.pixel_mean > 0).all()
    assert all(len(v) == 16 for v in out.thumb)  # 4x4 thumbnails
    # features deterministic across runs / layouts
    out2 = (
        decode_stage(rd.from_arrow(t).repartition(5), target=(4, 4),
                     batch_size=7)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    out = out.sort_values("image_id").reset_index(drop=True)
    assert out.pixel_mean.tolist() == out2.pixel_mean.tolist()


def test_audio_synth_and_decode(ray_session):
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.multimodal import (
        AUDIO_SCHEMA,
        FakeAudioDecoder,
        audio_decode_stage,
        synth_audio_table,
    )

    t = synth_audio_table(40)
    assert t.schema.equals(AUDIO_SCHEMA)
    assert t.equals(synth_audio_table(40))  # deterministic

    from opentelemetry_collector_components_ray.stages.multimodal import (
        AudioDecoder,
    )

    payload = t["payload"][0].as_py()
    assert payload[:4] == b"RIFF"  # real WAV bytes
    x, rate = AudioDecoder().decode(payload)
    assert len(x) == t["n_samples"][0].as_py()
    assert rate == t["sample_rate"][0].as_py()

    out = audio_decode_stage(rd.from_arrow(t), envelope_bins=8).to_pandas()
    assert len(out) == 40
    assert (out.rms > 0).all()
    assert ((out.zero_crossing_rate >= 0) & (out.zero_crossing_rate <= 1)).all()
    assert all(len(e) == 8 for e in out.envelope)
    # duration consistent with header metadata
    m = t.to_pandas()
    expect = (m.n_samples / m.sample_rate).round(6)
    got = out.sort_values("audio_id").duration_s.reset_index(drop=True)
    assert np.allclose(got, expect, atol=1e-6)


def test_frame_sample(ray_session):
    import ray.data as rd

    t = synth_image_table(32)
    out = frame_sample(rd.from_arrow(t), every_k=4).to_pandas()
    assert sorted(out.image_id) == list(range(0, 32, 4))
    out3 = frame_sample(rd.from_arrow(t), every_k=3).to_pandas()
    assert sorted(out3.image_id) == list(range(0, 32, 3))


def test_video_frame_sampling(ray_session):
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.multimodal import (
        SampleVideoFrames,
        synth_video_table,
        video_frame_stage,
    )

    t = synth_video_table(20)
    import numpy as np
    import pandas as pd

    out = video_frame_stage(rd.from_arrow(t), every_k=4).to_pandas()
    # every video contributes ceil(n_frames/4) rows

    nf = dict(zip(t["video_id"].to_pylist(), t["n_frames"].to_pylist()))
    per_vid = out.groupby("video_id").size()
    for vid, n in nf.items():
        assert per_vid[vid] == -(-n // 4)
    assert (out.frame_idx % 4 == 0).all()
    # deterministic: same features on rerun
    out2 = video_frame_stage(rd.from_arrow(t), every_k=4).to_pandas()
    a = out.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    b = out2.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bmp_codec_roundtrip_and_padding():
    import struct

    from opentelemetry_collector_components_ray.stages.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)  # padded rows
    b = encode_bmp(img)
    assert np.array_equal(decode_bmp(b), img)
    # top-down variant (negative height) decodes flipped
    b2 = bytearray(b)
    struct.pack_into("<i", b2, 22, -13)
    assert np.array_equal(decode_bmp(bytes(b2)), img[::-1])
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b[2:])


def test_wav_codec_chunk_walk():
    import struct

    from opentelemetry_collector_components_ray.stages.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = (np.sin(np.arange(1001) * 0.02) * 9000).astype(np.int16)
    w = encode_wav(s, 8000)
    x, rate = decode_wav(w)
    assert rate == 8000 and np.array_equal(x, s)
    # junk LIST chunk (odd size, word-aligned) before data still decodes
    w2 = w[:12] + b"LIST" + struct.pack("<I", 5) + b"abcde\x00" + w[12:]
    x2, _ = decode_wav(w2)
    assert np.array_equal(x2, s)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00JUNK")


def test_formula_fixtures_decode_to_formula_values():
    """The closed-form fixtures must decode back to their generating
    formulas — the engine-side premise of the m_multimodal_features
    value gate (the SQL oracle recomputes the same formulas)."""
    from opentelemetry_collector_components_ray.stages.multimodal import (
        FakeVideoDecoder,
        decode_bmp,
        decode_wav,
        synth_audio_table_formula,
        synth_image_table_formula,
        synth_video_table_formula,
    )

    imgs = synth_image_table_formula(5)
    for i in range(5):
        rgb = decode_bmp(imgs["payload"][i].as_py())
        h, w = rgb.shape[:2]
        assert (w, h) == (8 + (i * 37) % 56, 8 + (i * 53) % 56)
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        ch = np.arange(3)[None, None, :]
        want = (7 * i + 31 * r + 13 * c + 97 * ch) % 256
        assert np.array_equal(rgb, want)

    auds = synth_audio_table_formula(5)
    for i in range(5):
        x, rate = decode_wav(auds["payload"][i].as_py())
        n = 400 + (i * 991) % 3600
        assert rate == 8000 + 8000 * (i % 2) and len(x) == n
        k = np.arange(n, dtype=np.int64)
        want = (k * (i + 3) * 1000003 + 12345) % 24001 - 12000
        assert np.array_equal(x.astype(np.int64), want)

    vids = synth_video_table_formula(5)
    codec = FakeVideoDecoder()
    for i in range(5):
        nf = 4 + (i * 7) % 13
        w, h = 8 + (i * 11) % 24, 8 + (i * 17) % 24
        frames = dict(codec.frames(vids["payload"][i].as_py(), 4))
        assert sorted(frames) == list(range(0, nf, 4))
        for f, frame in frames.items():
            p = np.arange(w * h, dtype=np.int64)
            want = ((131 * i + 17 * f + 7 * p) % 256).reshape(h, w)
            assert np.array_equal(frame.astype(np.int64), want)


def test_y4m_roundtrip_mono():
    import numpy as np

    from opentelemetry_collector_components_ray.stages.multimodal import (
        Y4MDecoder,
        encode_y4m,
    )

    frames = np.arange(3 * 4 * 6, dtype=np.uint8).reshape(3, 4, 6)
    payload = encode_y4m(frames, b"mono")
    got = list(Y4MDecoder().frames(payload, every_k=1))
    assert [fi for fi, _ in got] == [0, 1, 2]
    for fi, luma in got:
        assert (luma == frames[fi]).all()


def test_y4m_roundtrip_420_luma_and_sampling():
    import numpy as np

    from opentelemetry_collector_components_ray.stages.multimodal import (
        Y4MDecoder,
        encode_y4m,
    )

    frames = (np.arange(5 * 8 * 8, dtype=np.int64) % 251).astype(
        np.uint8
    ).reshape(5, 8, 8)
    payload = encode_y4m(frames, b"420jpeg")
    got = list(Y4MDecoder().frames(payload, every_k=2))
    assert [fi for fi, _ in got] == [0, 2, 4]
    for fi, luma in got:
        assert (luma == frames[fi]).all()


def test_y4m_parameterized_frame_markers_walk():
    import numpy as np

    from opentelemetry_collector_components_ray.stages.multimodal import (
        Y4MDecoder,
    )

    # hand-build a stream whose second FRAME carries a parameter —
    # forces the marker-walk path
    f0 = bytes(range(16))
    f1 = bytes(reversed(range(16)))
    payload = (
        b"YUV4MPEG2 W4 H4 F25:1 Cmono\n"
        + b"FRAME\n" + f0
        + b"FRAME Ixyz\n" + f1
    )
    got = list(Y4MDecoder().frames(payload, every_k=1))
    assert len(got) == 2
    assert got[0][1].tobytes() == f0
    assert got[1][1].tobytes() == f1


def test_video_stage_dispatches_both_containers(ray_session):
    import ray.data as rd

    from opentelemetry_collector_components_ray.stages.multimodal import (
        synth_video_table_formula,
        synth_video_table_y4m_formula,
        video_frame_stage,
    )

    old = video_frame_stage(
        rd.from_arrow(synth_video_table_formula(6)), every_k=4
    ).to_pandas()
    new = video_frame_stage(
        rd.from_arrow(synth_video_table_y4m_formula(6)), every_k=4
    ).to_pandas()
    # same formula bytes in both containers → identical features
    key = ["video_id", "frame_idx"]
    old = old.sort_values(key).reset_index(drop=True)
    new = new.sort_values(key).reset_index(drop=True)
    assert old.equals(new)


def test_y4m_roundtrip_property():
    """Property: encode→decode is identity for the luma plane across
    sizes/colorspaces, and every-k sampling picks exactly the k-step
    frame subset."""
    import numpy as np

    from opentelemetry_collector_components_ray.stages.multimodal import (
        Y4MDecoder,
        encode_y4m,
    )

    rng = np.random.RandomState(11)
    for trial in range(12):
        nf = int(rng.randint(1, 9))
        h = int(rng.randint(2, 17)) * 2  # 420 needs even dims
        w = int(rng.randint(2, 17)) * 2
        cs = [b"mono", b"420jpeg", b"444"][trial % 3]
        frames = rng.randint(0, 256, (nf, h, w)).astype(np.uint8)
        if cs == b"444":
            # encode_y4m writes mono/420 only; build 444 by hand
            payload = b"YUV4MPEG2 W%d H%d F25:1 C444\n" % (w, h)
            for f in range(nf):
                payload += (
                    b"FRAME\n" + frames[f].tobytes()
                    + bytes(2 * h * w)  # flat U,V planes
                )
        else:
            payload = encode_y4m(frames, cs)
        every_k = int(rng.randint(1, 4))
        got = list(Y4MDecoder().frames(payload, every_k))
        assert [fi for fi, _ in got] == list(range(0, nf, every_k))
        for fi, luma in got:
            assert (luma == frames[fi]).all(), (trial, fi)
