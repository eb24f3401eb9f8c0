"""Real-codec coverage for the remaining modalities (VERDICT r04 missing #4):

- PNG (stdlib zlib + numpy, all five scanline filters) joins PPM/BMP as a
  third built-in image format — the decode/feature/resize path runs on real
  pixels for the most common lossless format with no image library.
- WAV (RIFF 16-bit PCM) gives the AUDIO modality a real end-to-end path:
  decode → mean/RMS/peak/ZCR features → linear resample → re-encode.
- Y4M (YUV4MPEG2 4:2:0) gives the VIDEO modality a real end-to-end path:
  probe → every-Nth frame sampling → per-frame RGB decode, one Arrow crossing
  per payload regardless of frame count.

Reference parity: the reference carries binary attachments as opaque columns
(Binary resources ride through unparsed); these tests pin the engine's
opaque-payload contract to REAL decoding wherever a pure-numpy codec exists.
"""

import numpy as np
import pytest


def test_png_codec_real_pixels(spark):
    """PNG payloads decode/resize on REAL pixels via the stdlib-zlib codec:
    roundtrip through every filter type, gray/RGBA color types, honest
    rejection outside the envelope, and the Arrow-batched Spark path."""
    import struct
    import zlib

    from etl_german_fhir_core_spark.multimodal import (
        decode_png,
        encode_png,
        extract_features,
        resize_images,
    )
    from etl_german_fhir_core_spark.multimodal.binary import PNG_MAGIC, _resize_nearest

    rng = np.random.default_rng(7)
    # every filter type must roundtrip bit-exact (odd width exercises lane math)
    arr = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    payloads = [encode_png(arr, filter_type=ft) for ft in range(5)]
    for ft, p in enumerate(payloads):
        assert np.array_equal(decode_png(p), arr), f"filter {ft}"
    assert len({p for p in payloads}) == 5  # genuinely different encodings

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # grayscale (color type 0) replicates to 3 channels; RGBA (6) drops alpha
    g = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    scan = np.hstack([np.zeros((4, 1), np.uint8), g]).tobytes()
    pg = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    dg = decode_png(pg)
    assert dg.shape == (4, 5, 3)
    for c in range(3):
        np.testing.assert_array_equal(dg[:, :, c], g)

    ra = rng.integers(0, 256, size=(4, 5, 4), dtype=np.uint8)
    rows = ra.reshape(4, 20).astype(np.int32)
    prev = np.vstack([np.zeros((1, 20), np.int32), rows[:-1]])
    scan = np.hstack(
        [np.full((4, 1), 2, np.uint8), ((rows - prev) & 0xFF).astype(np.uint8)]
    ).tobytes()
    pa = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(pa), ra[:, :, :3])

    # outside the envelope -> ValueError, never a silent mis-decode
    bad = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 41))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bad)
    with pytest.raises(ValueError, match="color type"):
        decode_png(
            PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 3, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 24))
            + chunk(b"IEND", b"")
        )

    # end to end through Spark: real features + resize re-encoded AS PNG
    solid = np.zeros((6, 8, 3), dtype=np.uint8)
    solid[..., 0], solid[..., 1], solid[..., 2] = 50, 150, 250
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(solid, filter_type=4)))], "doc_id long, payload binary"
    )
    feat = extract_features(df).collect()[0]
    assert (feat["width"], feat["height"]) == (8, 6)
    np.testing.assert_allclose(
        feat["feature"][:3], [50 / 255, 150 / 255, 250 / 255], atol=1e-6
    )
    out = resize_images(df, 4, 2).collect()[0]
    resized_payload = bytes(out["payload"])
    assert resized_payload.startswith(PNG_MAGIC)  # source format preserved
    assert np.array_equal(
        decode_png(resized_payload), _resize_nearest(solid, 4, 2)
    )


def test_wav_codec_real_samples(spark):
    """The AUDIO modality runs on REAL samples: RIFF chunk-walk decode,
    exact features for an analytically-known signal, linear resample whose
    output is a valid WAV of the target rate, stub fallback for codec-less
    formats."""
    import struct

    from etl_german_fhir_core_spark.multimodal import (
        decode_wav,
        encode_wav,
        extract_audio_features,
        resample_audio,
    )

    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, size=(1000, 2), dtype=np.int16)
    arr, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and np.array_equal(arr, s)

    # unknown chunks between fmt and data are skipped per the RIFF spec
    w = encode_wav(s, 16000)
    fmt_end = 12 + 8 + 16
    extra = w[:fmt_end] + b"LIST" + struct.pack("<I", 5) + b"INFOx\x00" + w[fmt_end:]
    extra = extra[:4] + struct.pack("<I", len(extra) - 8) + extra[8:]
    arr2, _ = decode_wav(extra)
    assert np.array_equal(arr2, s)

    # compressed / non-16-bit rejected
    bad_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 0)  # mp3-in-wav
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(bad_fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="16-bit PCM"):
        decode_wav(bad)

    # Spark path: constant-amplitude signal has exact analytic features
    a = 12000
    const = np.full((800, 1), a, dtype=np.int16)
    mixed = [
        (1, bytearray(encode_wav(const, 8000))),
        (2, bytearray(b"ID3\x03fake-mp3")),  # no codec -> deterministic stub
    ]
    df = spark.createDataFrame(mixed, "doc_id long, payload binary")
    feats = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    real = feats[1]
    assert (real["sample_rate"], real["n_samples"], real["n_channels"]) == (8000, 800, 1)
    mean, rms, peak, zcr = real["feature"]
    assert abs(mean - a / 32768.0) < 1e-6
    assert abs(rms - a / 32768.0) < 1e-6
    assert abs(peak - a / 32768.0) < 1e-6
    assert zcr == 0.0
    stub = feats[2]
    assert stub["sample_rate"] > 0 and len(stub["feature"]) == 4
    # stub determinism (replay-identical)
    again = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert again[2]["feature"] == stub["feature"]

    # resample halves the sample count (±1) and emits a VALID wav at the rate;
    # a constant signal is invariant under linear interpolation
    out = {r["doc_id"]: r for r in resample_audio(df, 4000).collect()}
    rs, rrate = decode_wav(bytes(out[1]["payload"]))
    assert rrate == 4000 and out[1]["sample_rate"] == 4000
    assert abs(rs.shape[0] - 400) <= 1 and out[1]["n_samples"] == rs.shape[0]
    assert np.all(rs == a)
    # codec-less payload passes through unchanged with NULL n_samples
    assert bytes(out[2]["payload"]) == bytes(mixed[1][1])
    assert out[2]["n_samples"] is None


def test_y4m_video_frame_sampling(spark):
    """The VIDEO modality runs on REAL pixels: Y4M probe by size arithmetic,
    every-Nth frame sampling through one Arrow crossing per payload, exact
    recovery for gray frames (full-range BT.601 is lossless on R=G=B), small
    bounded error for smooth color (4:2:0 chroma subsampling)."""
    from etl_german_fhir_core_spark.multimodal import (
        decode_y4m_frames,
        encode_y4m,
        probe_y4m,
        sample_video_frames,
    )

    grays = [np.full((8, 16, 3), (37 * k + 5) % 256, np.uint8) for k in range(7)]
    payload = encode_y4m(grays, fps=(30, 1))
    assert probe_y4m(payload) == (16, 8, 7, (30, 1))
    for idx, rgb in decode_y4m_frames(payload):
        assert np.array_equal(rgb, grays[idx])

    # smooth gradient: chroma subsample loss stays small and bounded
    yy, xx = np.mgrid[0:8, 0:16]
    grad = [
        np.stack([(xx * 8 + k) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], axis=-1)
        .astype(np.uint8)
        for k in range(3)
    ]
    got = dict(decode_y4m_frames(encode_y4m(grad), [0, 2]))
    assert set(got) == {0, 2}
    assert np.abs(got[0].astype(int) - grad[0].astype(int)).mean() < 6

    # truncated payload rejected, not silently short-counted
    with pytest.raises(ValueError, match="truncated"):
        probe_y4m(payload[:-10])

    # Spark path: two videos of different frame counts, every_n=3
    vids = [
        (1, bytearray(payload)),
        (2, bytearray(encode_y4m(grays[:4]))),
    ]
    df = spark.createDataFrame(vids, "doc_id long, payload binary")
    rows = sample_video_frames(df, every_n=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 3, 6]
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 3]
    for r in rows:
        assert (r["width"], r["height"]) == (16, 8)
        v = (37 * r["frame_idx"] + 5) % 256
        np.testing.assert_allclose(r["feature"], [v / 255] * 3, atol=1e-6)
    assert by_doc[1][0]["n_frames"] == 7 and by_doc[2][0]["n_frames"] == 4
