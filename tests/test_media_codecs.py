"""Bit-exact tests for the pure-numpy media codecs and the real decode
paths of the multimodal pipeline (no PIL/ffmpeg in this container — the
point is that BMP/PPM/WAV/Y4M decode genuinely without them)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from panoptes_spark.pipeline import media_codecs as mc
from panoptes_spark.pipeline import multimodal


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            ((xx + yy) % 256).astype(np.uint8),
        ],
        axis=2,
    )


# --------------------------------------------------------------------- BMP


def test_bmp_roundtrip_exact():
    for h, w in [(1, 1), (3, 5), (8, 16), (7, 7)]:  # incl. odd row pads
        arr = _grad(h, w)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(arr)), arr)


def test_bmp_layout_is_spec_conformant():
    arr = _grad(2, 2)
    data = mc.encode_bmp(arr)
    assert data[:2] == b"BM"
    # pixel offset 54, 24bpp, BI_RGB
    assert int.from_bytes(data[10:14], "little") == 54
    assert int.from_bytes(data[28:30], "little") == 24
    assert int.from_bytes(data[30:34], "little") == 0
    # bottom-up: first stored pixel is the BOTTOM-left, in BGR order
    assert data[54:57] == bytes([arr[1, 0, 2], arr[1, 0, 1], arr[1, 0, 0]])


def test_bmp_top_down_negative_height():
    arr = _grad(3, 4)
    data = bytearray(mc.encode_bmp(arr[::-1]))  # store rows pre-flipped
    data[22:26] = (-3 & 0xFFFFFFFF).to_bytes(4, "little")  # mark top-down
    assert np.array_equal(mc.decode_bmp(bytes(data)), arr[::-1][::-1])


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        mc.decode_bmp(b"BM" + b"\x00" * 100)  # bpp 0
    with pytest.raises(ValueError):
        mc.decode_bmp(b"nope")


# --------------------------------------------------------------------- PPM


def test_ppm_roundtrip_and_comment_header():
    arr = _grad(4, 6)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(arr)), arr)
    # netpbm allows comments/odd whitespace inside the header
    raster = arr.tobytes()
    weird = b"P6 # c\n# full comment line\n 6\t4 # trailing\n255\n" + raster
    assert np.array_equal(mc.decode_ppm(weird), arr)


def test_ppm_truncated_raster_rejected():
    arr = _grad(4, 6)
    with pytest.raises(ValueError):
        mc.decode_ppm(mc.encode_ppm(arr)[:-5])


# --------------------------------------------------------------------- WAV


def test_wav_roundtrip_mono_16bit():
    t = np.arange(800) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    dec, rate = mc.decode_wav(mc.encode_wav_pcm16(x, 8000))
    assert rate == 8000
    assert len(dec) == 800
    assert float(np.max(np.abs(dec - x))) < 1.5 / 32768


def test_wav_stereo_downmix_and_extra_chunks():
    left = np.full(100, 0.25)
    right = np.full(100, -0.25)
    payload = mc.encode_wav_pcm16(np.stack([left, right], axis=1), 16000)
    # splice an unknown chunk between fmt and data — walker must skip it
    import struct

    fmt_end = 12 + 8 + 16
    junk = struct.pack("<4sI", b"LIST", 6) + b"junk!" + b"\x00"  # word-align
    spliced = payload[:fmt_end] + junk + payload[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    dec, rate = mc.decode_wav(spliced)
    assert rate == 16000 and len(dec) == 100
    assert float(np.max(np.abs(dec))) < 1e-3  # L/R cancel in the downmix


def test_wav_8bit_path():
    import struct

    samples = bytes([128, 255, 0, 128])
    fmt = struct.pack("<4sI4s4sIHHIIHH", b"RIFF", 36 + 4, b"WAVE",
                      b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    payload = fmt + struct.pack("<4sI", b"data", 4) + samples
    dec, rate = mc.decode_wav(payload)
    assert rate == 8000
    assert np.allclose(dec, [0.0, 127 / 128, -1.0, 0.0])


# --------------------------------------------------------------------- Y4M


def test_y4m_roundtrip_c444():
    frames = np.arange(2 * 4 * 6 * 3, dtype=np.uint8).reshape(2, 4, 6, 3)
    payload = mc.encode_y4m(frames, fps=5)
    info = mc.y4m_info(payload)
    assert (info["width"], info["height"]) == (6, 4)
    assert info["n_frames"] == 2 and info["fps"] == 5.0
    assert info["duration_ms"] == 400
    for k in range(2):
        assert np.array_equal(mc.decode_y4m_frame(payload, k), frames[k])
    with pytest.raises(IndexError):
        mc.decode_y4m_frame(payload, 2)


def test_y4m_c420_chroma_upsample():
    w, h = 4, 4
    y = np.arange(w * h, dtype=np.uint8)
    u = np.array([10, 20, 30, 40], dtype=np.uint8)  # 2x2 chroma
    v = np.array([50, 60, 70, 80], dtype=np.uint8)
    payload = (
        b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n"
        + b"FRAME\n"
        + y.tobytes()
        + u.tobytes()
        + v.tobytes()
    )
    frame = mc.decode_y4m_frame(payload, 0)
    assert frame.shape == (4, 4, 3)
    assert frame[0, 0, 1] == 10 and frame[0, 1, 1] == 10  # 2x2 repeat
    assert frame[2, 2, 1] == 40 and frame[3, 3, 2] == 80


# ---------------------------------------------------------------- resize


def test_resize_area_exact_block_mean():
    arr = _grad(8, 16)
    out = mc.resize_area(arr, 8, 4)
    assert out.shape == (4, 8, 3)
    block = arr[:2, :2].astype(float).mean(axis=(0, 1))
    assert np.allclose(out[0, 0], np.round(block))


def test_resize_nearest_upscale():
    arr = _grad(2, 2)
    out = mc.resize_area(arr, 4, 4)
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[0, 0], arr[0, 0])
    assert np.array_equal(out[3, 3], arr[1, 1])


# ------------------------------------------------- pipeline integration


def test_sniff_format():
    assert mc.sniff_format(mc.encode_bmp(_grad(2, 2))) == "bmp"
    assert mc.sniff_format(mc.encode_ppm(_grad(2, 2))) == "ppm"
    assert mc.sniff_format(mc.encode_wav_pcm16(np.zeros(4))) == "wav"
    assert (
        mc.sniff_format(mc.encode_y4m(np.zeros((1, 2, 2, 3), np.uint8)))
        == "y4m"
    )
    assert mc.sniff_format(b"\x89PNG\r\n\x1a\n plus junk") is None
    assert mc.sniff_format(None) is None


def test_resize_images_real_payload_transform(spark):
    media = multimodal.synth_media_df(spark, n=12)
    images = media.where(F.col("media_type") == "image")
    out = multimodal.resize_images(images, 4, 4).collect()
    assert len(out) > 0
    for r in out:
        assert (r.width, r.height) == (4, 4)
        kind = mc.sniff_format(bytes(r.payload))
        assert kind in ("bmp", "ppm")  # same container as the input
        dec = (
            mc.decode_bmp(bytes(r.payload))
            if kind == "bmp"
            else mc.decode_ppm(bytes(r.payload))
        )
        assert dec.shape == (4, 4, 3)


def test_resize_images_passthrough_for_undecodable(spark):
    df = spark.createDataFrame(
        [(1, "image", b"\x89PNGnotreally", 9, 9, None, "png")],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.resize_images(df, 4, 4).collect()[0]
    assert bytes(r.payload) == b"\x89PNGnotreally"
    assert (r.width, r.height) == (9, 9)  # metadata untouched


def test_sample_frames_decodes_real_y4m(spark):
    media = multimodal.synth_media_df(spark, n=12)
    frames = multimodal.sample_frames(media, every_ms=250).collect()
    vids = {
        r.media_id: r
        for r in media.where(F.col("media_type") == "video").collect()
    }
    assert {r.media_id for r in frames} == set(vids)
    for r in frames:
        assert r.frame_ts_ms % 250 == 0
        assert len(r.features) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.features)
    # sampled indices must stay within each clip's real frame count
    for r in frames:
        fps = 4
        n = mc.y4m_info(bytes(vids[r.media_id].payload))["n_frames"]
        assert 0 <= r.frame_index < n
        assert r.frame_index == min(int(r.frame_ts_ms / 1000 * fps), n - 1)


def test_audio_features_track_signal_energy(spark):
    # silence vs a loud sine: rms/peak must separate them
    silent = mc.encode_wav_pcm16(np.zeros(400), 8000)
    loud = mc.encode_wav_pcm16(
        0.9 * np.sin(2 * np.pi * 440 * np.arange(400) / 8000.0), 8000
    )
    df = spark.createDataFrame(
        [
            (1, "audio", silent, None, None, 50, "wav"),
            (2, "audio", loud, None, None, 50, "wav"),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert rows[1].decoder == "wav" and rows[2].decoder == "wav"
    assert rows[1].features[0] == 0.0  # rms of silence
    assert rows[2].features[0] == pytest.approx(0.9 / np.sqrt(2), rel=0.01)
    assert rows[2].features[2] == pytest.approx(0.9, rel=0.01)  # peak


# ---------------------------------------------------------------- dhash


def test_image_dhash_perceptual_invariance(spark):
    """dHash must survive a monotone brightness change (0.9x scale) that
    completely changes the sha1 — the perceptual property."""
    yy, xx = np.mgrid[0:16, 0:32]
    arr = np.stack(
        [
            ((xx * 23 + yy * 11) % 256).astype(np.uint8),
            (yy * 15).astype(np.uint8),
            ((xx * 7) % 256).astype(np.uint8),
        ],
        axis=2,
    )
    dimmed = np.round(arr * 0.9).astype(np.uint8)
    other = arr[::-1, ::-1]  # reversed image: different structure
    df = spark.createDataFrame(
        [
            (1, "image", mc.encode_bmp(arr), 32, 16, None, "bmp"),
            (2, "image", mc.encode_bmp(dimmed), 32, 16, None, "bmp"),
            (3, "image", mc.encode_ppm(other), 32, 16, None, "ppm"),
            (4, "image", b"not an image", None, None, None, "bin"),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    hashes = {r.media_id: r for r in multimodal.image_dhash(df).collect()}
    assert hashes[1].decoder == "bmp" and hashes[3].decoder == "ppm"
    assert hashes[4].dhash is None and hashes[4].decoder == "fake"

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(hashes[1].dhash, hashes[2].dhash) <= 6  # perceptual match
    assert ham(hashes[1].dhash, hashes[3].dhash) > 6  # structural change

    pairs = multimodal.media_dhash_pairs(df, max_hamming=6).collect()
    assert {(r.a, r.b) for r in pairs} == {(1, 2)}


def test_image_dhash_exact_on_identical(spark):
    media = multimodal.synth_media_df(spark, n=12)
    images = media.where(F.col("media_type") == "image")
    clone = images.where(F.col("media_id") == 0).withColumn(
        "media_id", F.lit(100).cast("long")
    )
    pairs = multimodal.media_dhash_pairs(
        images.unionByName(clone), max_hamming=0
    ).collect()
    assert {(r.a, r.b) for r in pairs} == {(0, 100)}
    assert pairs[0].hamming == 0


# ------------------------------------------------------------- spectral


def test_audio_spectral_features_find_the_tone(spark):
    rate = 8000
    t = np.arange(2048) / rate
    tone = mc.encode_wav_pcm16(0.7 * np.sin(2 * np.pi * 440 * t), rate)
    noise = mc.encode_wav_pcm16(
        0.1 * np.sin(2 * np.pi * 3500 * t), rate
    )  # near Nyquist: top band
    df = spark.createDataFrame(
        [
            (1, "audio", tone, None, None, None, "wav"),
            (2, "audio", noise, None, None, None, "wav"),
            (3, "audio", b"junk", None, None, None, "bin"),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r.media_id: r
        for r in multimodal.audio_spectral_features(df).collect()
    }
    # pure 440 Hz sine: dominant bin within one FFT bin (rate/2048 ≈ 3.9 Hz)
    assert abs(rows[1].dominant_hz - 440.0) < 4.0
    assert abs(rows[1].spectral_centroid_hz - 440.0) < 10.0
    assert rows[2].dominant_hz > 3400.0
    # band energies sum to ~1 and concentrate correctly
    assert abs(sum(rows[1].band_energy) - 1.0) < 1e-3
    assert rows[2].band_energy[-1] > 0.9  # 3.5 kHz in the top band
    assert rows[3].dominant_hz is None  # undecodable -> NULLs


# ------------------------------------------------- streaming twin


def test_streaming_media_feature_extraction_matches_batch(spark, tmp_path):
    """extract_features is a mapInPandas transform, so the SAME operator
    runs unchanged in a Structured Streaming query — prove it: stream
    the media table from parquet, extract features to a memory sink,
    compare against the batch result row-for-row."""
    media = multimodal.synth_media_df(spark, n=18)
    src = str(tmp_path / "media_src")
    media.write.parquet(src)

    batch = {
        (r.media_id, r.sha1, tuple(r.features), r.decoder)
        for r in multimodal.extract_features(media).collect()
    }

    stream = spark.readStream.schema(multimodal.MEDIA_SCHEMA).parquet(src)
    q = (
        multimodal.extract_features(stream)
        .writeStream.format("memory")
        .queryName("media_feats_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r.media_id, r.sha1, tuple(r.features), r.decoder)
        for r in spark.sql("SELECT * FROM media_feats_stream").collect()
    }
    assert got == batch and len(got) == 18
