"""Multimodal plumbing tests: schema, Arrow batch shape, fan-out, and
the loud NotImplementedError when real codecs are required."""

import os

import pytest
from pyspark.sql import Row

from gus_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_features,
    media_summary,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(
            media_id=i,
            content=bytes([i]) * (100 + i),
            meta=Row(
                mime="image/png" if i % 2 == 0 else "video/mp4",
                width=640,
                height=480,
                duration_ms=3500 if i % 2 else None,
                sample_rate=None,
            ),
        )
        for i in range(10)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.fixture(autouse=True)
def fake_decode(monkeypatch):
    monkeypatch.setenv("GUS_MULTIMODAL_FAKE_DECODE", "1")


def test_image_features_deterministic(spark, media):
    out1 = {r.media_id: r for r in decode_image_features(media).collect()}
    out2 = {r.media_id: r for r in decode_image_features(media).collect()}
    assert len(out1) == 10
    for mid in out1:
        assert out1[mid] == out2[mid]
        assert out1[mid].n_bytes == 100 + mid
        assert 0 <= out1[mid].width < 4096


def test_frame_sampling_fanout(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    # only odd ids are videos with duration 3500ms -> 3 frames each
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_index)
    assert set(by_id) == {1, 3, 5, 7, 9}
    assert all(sorted(v) == [0, 1, 2] for v in by_id.values())


def test_media_summary_jvm_only(spark, media):
    rows = {r.mime: r for r in media_summary(media).collect()}
    assert rows["image/png"].n_items == 5
    assert rows["video/mp4"].n_items == 5
    assert rows["image/png"].total_bytes == sum(100 + i for i in (0, 2, 4, 6, 8))


def test_decode_raises_without_stub_flag(spark, media, monkeypatch):
    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    with pytest.raises(Exception) as exc:
        decode_image_features(media).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_media_embeddings_feed_the_vector_index(spark, media, tmp_path):
    """The multimodal → similarity bridge: deterministic unit
    embeddings from the (stub) encoder flow straight into a
    VectorIndex; search returns each media item's neighbors. Also the
    loud-failure contract when no encoder is available."""
    import numpy as np

    from gus_spark.operators.multimodal import media_embeddings
    from gus_spark.operators.vector_index import VectorIndex

    emb = media_embeddings(media)
    rows = emb.collect()
    assert {r.media_id for r in rows} == set(range(10))
    for r in rows:
        assert len(r.embedding) == 64
        assert abs(np.linalg.norm(r.embedding) - 1.0) < 1e-9
    # bit-stable across runs (downstream index tests depend on it)
    again = {r.media_id: r.embedding for r in media_embeddings(media).collect()}
    assert all(again[r.media_id] == r.embedding for r in rows)

    idx = VectorIndex(
        spark, str(tmp_path / "midx"),
        id_col="media_id", vec_col="embedding", iters=1,
    )
    idx.fit(emb, seed_col=None)
    idx.add(emb)
    queries = [(int(rows[0].media_id), list(rows[0].embedding))]
    res = idx.search(queries, k=3, nprobe=4, rerank_df=emb)
    assert res.count() == 3
    assert all(r.neighbor_id != rows[0].media_id for r in res.collect())

    with pytest.raises(Exception, match="encoder"):
        media_embeddings(media, fake=False).collect()


# ---------------------------------------------------------------- real PNG


def _filtered_png(width, height, pixels, filters):
    """Build a grayscale PNG whose row y uses filter type filters[y] —
    applying the FORWARD filter per the spec, so a correct decoder must
    invert each one to recover `pixels`."""
    import struct
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = width
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        prev = pixels[(y - 1) * stride: y * stride] if y else bytes(stride)
        f = filters[y]
        raw.append(f)
        for x in range(stride):
            left = row[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - left
            elif f == 2:
                v = row[x] - up
            elif f == 3:
                v = row[x] - ((left + up) >> 1)
            else:
                v = row[x] - paeth(left, up, ul)
            raw.append(v & 0xFF)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_codec_roundtrip_and_all_filters():
    from gus_spark.operators import png

    # grayscale and RGB round-trips through our own encoder
    gray = bytes((x * 7 + y * 13) % 256 for y in range(5) for x in range(4))
    data = png.encode_png(4, 5, gray, channels=1)
    assert png.is_png(data)
    assert png.decode_png(data) == (4, 5, 1, gray)

    rgb = bytes((i * 31) % 256 for i in range(6 * 3 * 3))
    w, h, ch, px = png.decode_png(png.encode_png(6, 3, rgb, channels=3))
    assert (w, h, ch, px) == (6, 3, 3, rgb)

    # a PNG a REAL encoder might emit: every standard filter type used
    pixels = bytes((x * x + 3 * y) % 256 for y in range(5) for x in range(8))
    foreign = _filtered_png(8, 5, pixels, filters=[0, 1, 2, 3, 4])
    assert png.decode_png(foreign) == (8, 5, 1, pixels)

    # corruption is loud
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(data[:40] + bytes([data[40] ^ 0xFF]) + data[41:])
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"JFIF" + data)


def test_decode_image_features_real_png_no_stub(spark, monkeypatch):
    """End-to-end real decode: genuine PNG bytes through the Arrow
    kernel WITHOUT the fake-decode flag — width/height/mean_luma are
    the true values, proving the plumbing runs a real codec."""
    from pyspark.sql import Row

    from gus_spark.operators import png

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    imgs = {}
    rows = []
    for i, (w, h) in enumerate([(3, 2), (16, 16), (1, 1)]):
        pix = bytes((i * 40 + j) % 256 for j in range(w * h))
        imgs[i] = (w, h, pix)
        rows.append(
            Row(media_id=i, content=png.encode_png(w, h, pix),
                meta=Row(mime="image/png", width=None, height=None,
                         duration_ms=None, sample_rate=None))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           decode_image_features(media, fake=False).collect()}
    assert len(out) == 3
    for i, (w, h, pix) in imgs.items():
        assert (out[i].width, out[i].height) == (w, h)
        assert out[i].mean_luma == f"{sum(pix) / (w * h):.3f}"
        assert out[i].n_bytes == len(png.encode_png(w, h, pix))


def test_resize_images_real_png(spark, monkeypatch):
    """Real resize end-to-end: PNG in, smaller PNG out, pixel values
    verifiable as exact nearest-neighbor samples of the source."""
    import numpy as np
    from pyspark.sql import Row

    from gus_spark.operators import png
    from gus_spark.operators.multimodal import resize_images

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    w, h = 8, 6
    src = bytes((x * 16 + y * 32) % 256 for y in range(h) for x in range(w))
    media = spark.createDataFrame(
        [Row(media_id=1, content=png.encode_png(w, h, src),
             meta=Row(mime="image/png", width=w, height=h,
                      duration_ms=None, sample_rate=None))],
        MEDIA_SCHEMA,
    )
    out = resize_images(media, 4, 3, fake=False).collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (4, 3)
    rw, rh, ch, rpix = png.decode_png(bytes(out[0].content))
    assert (rw, rh, ch) == (4, 3, 1)
    arr = np.frombuffer(src, dtype=np.uint8).reshape(h, w)
    expect = arr[[0, 2, 4]][:, [0, 2, 4, 6]]  # (y*6)//3, (x*8)//4
    assert bytes(out[0].content) != bytes(media.first().content)
    assert rpix == expect.tobytes()

    # RGB source round-trips through the same kernel
    rgb = bytes((i * 7) % 256 for i in range(4 * 4 * 3))
    media3 = spark.createDataFrame(
        [Row(media_id=2, content=png.encode_png(4, 4, rgb, channels=3),
             meta=Row(mime="image/png", width=4, height=4,
                      duration_ms=None, sample_rate=None))],
        MEDIA_SCHEMA,
    )
    out3 = resize_images(media3, 2, 2, fake=False).collect()
    rw, rh, ch, rpix = png.decode_png(bytes(out3[0].content))
    assert (rw, rh, ch) == (2, 2, 3)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(4, 4, 3)
    assert rpix == a[[0, 2]][:, [0, 2]].tobytes()

    # non-PNG without the stub flag still fails loudly
    junk = spark.createDataFrame(
        [Row(media_id=3, content=b"\xff\xd8jpeg-ish", meta=None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc:
        resize_images(junk, 2, 2, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_audio_features_real_wav(spark, monkeypatch):
    """Real WAV decode end-to-end without the stub flag: a stdlib-
    written 16-bit PCM clip comes back with exact rate/sample counts
    and numerically verifiable RMS/peak."""
    import io
    import math
    import struct
    import wave

    from pyspark.sql import Row

    from gus_spark.operators.multimodal import audio_features

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    rate, n = 8000, 800  # 100 ms
    samples = [
        int(10000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)
    ]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    wav = buf.getvalue()
    media = spark.createDataFrame(
        [Row(media_id=7, content=wav,
             meta=Row(mime="audio/wav", width=None, height=None,
                      duration_ms=None, sample_rate=rate))],
        MEDIA_SCHEMA,
    )
    out = audio_features(media, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.sample_rate, r.n_channels, r.n_samples, r.duration_ms) == (
        rate, 1, n, 100
    )
    rms = math.sqrt(sum(s * s for s in samples) / n)
    assert r.rms == f"{rms:.3f}"
    assert r.peak == max(abs(s) for s in samples)

    # compressed audio without the stub flag fails loudly
    mp3ish = spark.createDataFrame(
        [Row(media_id=8, content=b"\xff\xfb\x90mp3-ish", meta=None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc:
        audio_features(mp3ish, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_undecodable_media_variants_fall_back_not_crash(spark, monkeypatch):
    """A PNG/WAV variant the minimal codecs can't decode (RGBA PNG,
    24-bit WAV, truncated buffers) must not kill the stage: with the
    stub flag it falls back to fake features; without it the error is
    a loud NotImplementedError naming the media_id — either way, never
    an unhandled struct/zlib/wave error."""
    import struct
    import zlib

    from pyspark.sql import Row

    from gus_spark.operators.multimodal import audio_features, resize_images

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # color type 6 = RGBA: valid PNG, unsupported by the minimal codec
    rgba = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 8 + b"\x00"
                                           + b"\x02" * 8))
            + chunk(b"IEND", b""))
    truncated = rgba[:20]
    # RIFF/WAVE magic with a corrupt body
    badwav = b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + b"garbage!"
    rows = [
        Row(media_id=1, content=rgba, meta=None),
        Row(media_id=2, content=truncated, meta=None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    wavs = spark.createDataFrame(
        [Row(media_id=3, content=badwav, meta=None)], MEDIA_SCHEMA
    )

    # stub allowed: every row comes back with deterministic features
    monkeypatch.setenv("GUS_MULTIMODAL_FAKE_DECODE", "1")
    assert len(decode_image_features(media, fake=True).collect()) == 2
    assert len(resize_images(media, 2, 2, fake=True).collect()) == 2
    assert len(audio_features(wavs, fake=True).collect()) == 1

    # gated: loud NotImplementedError naming the id, not struct/zlib
    for op in (
        lambda: decode_image_features(media, fake=False).collect(),
        lambda: resize_images(media, 2, 2, fake=False).collect(),
        lambda: audio_features(wavs, fake=False).collect(),
    ):
        with pytest.raises(Exception) as exc:
            op()
        assert "NotImplementedError" in str(exc.value) or isinstance(
            exc.value, NotImplementedError
        )
        assert "media_id=" in str(exc.value)

    # target validation is at the API boundary, not mid-kernel
    with pytest.raises(ValueError, match="target size"):
        resize_images(media, 0, 2)
    with pytest.raises(ValueError, match="target size"):
        resize_images(media, 4, -1)


# --------------------------------------------------------------- real JPEG


def test_jpeg_codec_roundtrip_variants():
    """Baseline JPEG round-trips within lossy tolerance across the
    supported matrix: grayscale/RGB, 4:4:4/4:2:0, odd (MCU-padded)
    dimensions, restart markers, tiny images. Dimensions and channel
    counts are exact; pixels are within the quantization error a q=90
    encode admits."""
    import numpy as np

    from gus_spark.operators import jpeg

    cases = [
        (37, 23, 1, False, 0),   # odd gray
        (32, 16, 3, False, 0),   # RGB 4:4:4
        (29, 21, 3, True, 0),    # RGB 4:2:0, odd (chroma padding)
        (64, 48, 3, True, 3),    # restart markers every 3 MCUs
        (50, 34, 1, False, 2),   # gray + restarts
        (1, 1, 1, False, 0),
        (3, 2, 3, False, 0),
    ]
    for w, h, ch, sub, rst in cases:
        yy, xx = np.mgrid[0:h, 0:w]
        if ch == 3:
            img = np.stack(
                [xx * 5 % 256, yy * 7 % 256, (xx + yy) * 3 % 256], -1
            ).astype(np.uint8)
        else:
            img = ((xx * 4 + yy * 9) % 256).astype(np.uint8)[..., None]
        buf = jpeg.encode_jpeg(
            w, h, img.tobytes(), channels=ch, quality=90,
            subsample=sub, restart_interval=rst,
        )
        assert jpeg.is_jpeg(buf)
        w2, h2, c2, out = jpeg.decode_jpeg(buf)
        assert (w2, h2, c2) == (w, h, ch)
        got = np.frombuffer(out, np.uint8).reshape(h, w, ch).astype(int)
        err = np.abs(img.astype(int) - got).mean()
        # smooth gradients at q=90: tight for 4:4:4, looser for the
        # chroma-subsampled cases (information genuinely discarded)
        assert err < (12.0 if sub else 5.0), (w, h, ch, sub, rst, err)
        # deterministic encode: byte-identical on re-encode
        assert buf == jpeg.encode_jpeg(
            w, h, img.tobytes(), channels=ch, quality=90,
            subsample=sub, restart_interval=rst,
        )


def test_jpeg_decode_rejects_nonbaseline_and_junk():
    import struct

    from gus_spark.operators import jpeg

    good = jpeg.encode_jpeg(8, 8, bytes(range(64)), channels=1)
    for bad in [b"", b"\xff\xd8\xff", good[:40], b"GIF89a" + bytes(50),
                good[:-5]]:
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bad)
    # progressive (SOF2) must be rejected BY NAME, not mis-decoded
    sof0 = good.index(b"\xff\xc0")
    progressive = good[:sof0] + b"\xff\xc2" + good[sof0 + 2:]
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg.decode_jpeg(progressive)
    # 4-component (CMYK-style) frame header
    (seglen,) = struct.unpack(">H", good[sof0 + 2: sof0 + 4])
    with pytest.raises(ValueError, match="component"):
        jpeg.decode_jpeg(
            good[:sof0 + 9] + b"\x04" + good[sof0 + 10:]
        )


def test_decode_image_features_real_jpeg_no_stub(spark, monkeypatch):
    """Genuine JPEG bytes through the Arrow kernel WITHOUT the
    fake-decode flag: width/height are the true values and mean_luma
    matches a reference decode of the same buffer exactly (the kernel
    and the reference share the deterministic in-tree codec)."""
    import numpy as np
    from pyspark.sql import Row

    from gus_spark.operators import jpeg
    from gus_spark.operators.png import mean_luma

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    rows, expected = [], {}
    for i, (w, h, ch, sub) in enumerate(
        [(24, 18, 3, True), (16, 16, 1, False), (9, 7, 3, False)]
    ):
        rng = np.random.default_rng(42 + i)
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        buf = jpeg.encode_jpeg(
            w, h, img.tobytes(), channels=ch, quality=85, subsample=sub
        )
        dw, dh, dch, dpix = jpeg.decode_jpeg(buf)
        expected[i] = (w, h, f"{mean_luma(dw, dh, dch, dpix):.3f}", len(buf))
        rows.append(
            Row(media_id=i, content=buf,
                meta=Row(mime="image/jpeg", width=None, height=None,
                         duration_ms=None, sample_rate=None))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           decode_image_features(media, fake=False).collect()}
    assert len(out) == 3
    for i, (w, h, luma, nbytes) in expected.items():
        assert (out[i].width, out[i].height) == (w, h)
        assert out[i].mean_luma == luma
        assert out[i].n_bytes == nbytes


def test_resize_images_real_jpeg_emits_png(spark, monkeypatch):
    """JPEG in -> PNG thumbnail out: the resize kernel decodes the
    lossy source once and re-encodes losslessly, so the output pixels
    are EXACT nearest-neighbor samples of the decoded JPEG."""
    import numpy as np
    from pyspark.sql import Row

    from gus_spark.operators import jpeg, png
    from gus_spark.operators.multimodal import resize_images

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    w, h = 16, 12
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 15 % 256, yy * 20 % 256, (xx * yy) % 256],
                   -1).astype(np.uint8)
    buf = jpeg.encode_jpeg(w, h, img.tobytes(), channels=3, quality=92)
    media = spark.createDataFrame(
        [Row(media_id=1, content=buf,
             meta=Row(mime="image/jpeg", width=w, height=h,
                      duration_ms=None, sample_rate=None))],
        MEDIA_SCHEMA,
    )
    out = resize_images(media, 4, 3, fake=False).collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (4, 3)
    rw, rh, ch, rpix = png.decode_png(bytes(out[0].content))
    assert (rw, rh, ch) == (4, 3, 3)
    _, _, _, dpix = jpeg.decode_jpeg(buf)
    arr = np.frombuffer(dpix, np.uint8).reshape(h, w, 3)
    ys = (np.arange(3) * h) // 3
    xs = (np.arange(4) * w) // 4
    assert rpix == arr[ys][:, xs].tobytes()


# ---------------------------------------------------------------- real MP4


def test_mp4_parser_roundtrip_and_variants():
    from gus_spark.operators import mp4

    # v0 header, one 640x360 video track
    buf = mp4.encode_mp4(90_500, timescale=600, tracks=[(640, 360)])
    assert mp4.is_mp4(buf)
    meta = mp4.parse_mp4(buf)
    assert meta["duration_ms"] == 90_500
    assert meta["timescale"] == 600
    assert (meta["n_tracks"], meta["width"], meta["height"]) == (1, 640, 360)

    # v1 (64-bit) header, audio track (0x0) before the video track:
    # dimensions must come from the video one
    buf = mp4.encode_mp4(
        3_600_000, timescale=90_000, tracks=[(0, 0), (1920, 1080)],
        version=1,
    )
    meta = mp4.parse_mp4(buf)
    assert meta["duration_ms"] == 3_600_000
    assert (meta["n_tracks"], meta["width"], meta["height"]) == (2, 1920, 1080)

    # audio-only reports 0x0, not an error
    meta = mp4.parse_mp4(mp4.encode_mp4(1000, tracks=[(0, 0)]))
    assert (meta["width"], meta["height"]) == (0, 0)

    # malformed input: always ValueError
    import pytest as _pytest
    good = mp4.encode_mp4(1000)
    for bad in [b"", b"\x00\x00\x00\x08ftyp", good[:20], good[:-4],
                b"RIFF" + good]:
        with _pytest.raises(ValueError):
            mp4.parse_mp4(bad)


def test_video_metadata_real_mp4_no_stub(spark, monkeypatch):
    """Genuine BMFF bytes through the Arrow kernel WITHOUT the
    fake-decode flag: duration/tracks/dimensions are the true parsed
    values, while a non-MP4 buffer still fails loudly."""
    from pyspark.sql import Row

    from gus_spark.operators import mp4
    from gus_spark.operators.multimodal import video_metadata

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    rows = [
        Row(media_id=1, content=mp4.encode_mp4(12_000, tracks=[(320, 240)]),
            meta=Row(mime="video/mp4", width=None, height=None,
                     duration_ms=None, sample_rate=None)),
        Row(media_id=2,
            content=mp4.encode_mp4(48_000, timescale=90_000,
                                   tracks=[(0, 0), (1280, 720)], version=1),
            meta=Row(mime="video/mp4", width=None, height=None,
                     duration_ms=None, sample_rate=None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in video_metadata(media, fake=False).collect()}
    assert (out[1].duration_ms, out[1].n_tracks, out[1].width,
            out[1].height) == (12_000, 1, 320, 240)
    assert (out[2].duration_ms, out[2].n_tracks, out[2].width,
            out[2].height) == (48_000, 2, 1280, 720)

    junk = spark.createDataFrame(
        [Row(media_id=3, content=b"\x1aE\xdf\xa3webm-ish", meta=None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc:
        video_metadata(junk, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_jpeg_decodes_foreign_custom_tables():
    """A hand-assembled JPEG using CUSTOM quantization and Huffman
    tables (not the Annex K set our encoder writes) must decode — the
    generality real-world files require. The stream encodes one 8x8
    block whose only coefficient is DC diff=4 against an all-16 quant
    table: dequantized DC 64 -> IDCT uniform 64/8 -> level-shifted 136
    across every pixel."""
    import struct

    import numpy as np

    from gus_spark.operators import jpeg

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    # custom tables: DC {symbol 3 -> code '0'}, AC {EOB -> code '0'}
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([3])
    dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    dqt = bytes([0x00]) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    # entropy bits: DC code '0', magnitude '100' (=4), EOB '0',
    # padded with 1s -> 0b01000111
    data = (
        b"\xff\xd8"
        + seg(0xFFDB, dqt)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht_dc)
        + seg(0xFFC4, dht_ac)
        + seg(0xFFDA, sos)
        + bytes([0b01000111])
        + b"\xff\xd9"
    )
    w, h, ch, pix = jpeg.decode_jpeg(data)
    assert (w, h, ch) == (8, 8, 1)
    assert np.frombuffer(pix, np.uint8).tolist() == [136] * 64


def test_gif_codec_roundtrip_and_variants():
    """Pure-codec contract: multi-frame round-trip with per-frame
    delays; LZW width growth + table reset on a long low-entropy
    stream; the documented rejects (interlace, disposal 3) are loud."""
    import random

    import pytest

    from gus_spark.operators import gif

    w, h = 13, 9
    pal = bytes([250, 0, 0, 0, 250, 0, 0, 0, 250, 40, 40, 40])
    frames = [bytes((i + f) % 4 for i in range(w * h)) for f in range(4)]
    data = gif.encode_gif(w, h, pal, frames, [7, 0, 12, 3])
    assert gif.is_gif(data)
    rw, rh, rgb, delays = gif.decode_gif(data)
    assert (rw, rh) == (w, h) and delays == [70, 0, 120, 30]
    for f, frame in enumerate(rgb):
        expect = b"".join(
            pal[((i + f) % 4) * 3 : ((i + f) % 4) * 3 + 3]
            for i in range(w * h)
        )
        assert frame == expect
    # LZW stress straight through the codec: one big frame, small
    # palette -> codes outgrow 12 bits and force a mid-stream clear
    rng = random.Random(3)
    big = bytes(rng.randrange(4) for _ in range(120 * 120))
    d2 = gif.encode_gif(120, 120, pal, [big])
    _, _, (only,), _ = gif.decode_gif(d2)
    assert only == b"".join(pal[i * 3 : i * 3 + 3] for i in big)
    # interlace flag set -> ValueError naming it
    idx = d2.index(b"\x2c")
    tampered = bytearray(d2)
    tampered[idx + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gif.decode_gif(bytes(tampered))
    # disposal 3 in a graphic control -> ValueError
    gce = data.index(b"\x21\xf9")
    tampered = bytearray(data)
    tampered[gce + 3] |= 0x0C  # disposal bits -> 3
    with pytest.raises(ValueError, match="disposal"):
        gif.decode_gif(bytes(tampered))


def test_gif_decodes_foreign_local_palette_and_transparency():
    """Hand-assembled GIF exercising what our encoder never writes —
    a LOCAL color table, a transparent index, disposal 2, and a
    sub-canvas frame placement — the generality real animations
    require. Frame 2 paints a 1x1 patch at (1,1) with index 1 of its
    LOCAL palette; its index 0 is declared transparent, so the rest of
    the patch area keeps frame 1's pixels."""
    import struct

    from gus_spark.operators import gif

    def lzw(min_code, idx):
        return bytes([min_code]) + gif._sub_blocks(
            gif._lzw_encode(min_code, idx)
        )

    w = h = 2
    glob = bytes([10, 10, 10, 200, 200, 200])  # 2-entry global table
    local = bytes([0, 0, 0, 99, 88, 77])
    head = (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0x80 | 0, 0, 0])  # global table, 2 entries, bg=0
        + glob
    )
    f1 = (
        b"\x21\xf9\x04" + bytes([0x08 | 0x00]) + struct.pack("<H", 5)
        + b"\x00\x00"  # disposal 2, no transparency, delay 5cs
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        + lzw(2, bytes([1, 0, 0, 1]))
    )
    f2 = (
        b"\x21\xf9\x04" + bytes([0x04 | 0x01]) + struct.pack("<H", 0)
        + b"\x00\x00"  # disposal 1, transparent idx 0
        + b"\x2c" + struct.pack("<HHHH", 1, 1, 1, 1)
        + bytes([0x80 | 0])  # LOCAL table, 2 entries
        + local
        + lzw(2, bytes([1]))
    )
    rw, rh, frames, delays = gif.decode_gif(head + f1 + f2 + b"\x3b")
    assert (rw, rh) == (2, 2) and delays == [50, 0]
    white, dark, paint = glob[3:6], glob[0:3], local[3:6]
    assert frames[0] == white + dark + dark + white
    # disposal 2 restored frame 1's region to bg (dark) BEFORE frame 2,
    # whose only opaque pixel paints (1,1) from its local palette
    assert frames[1] == dark * 3 + paint


def test_sample_frames_real_gif_no_stub(spark, monkeypatch):
    """End-to-end real video-path decode: an animated GIF through the
    Arrow kernel WITHOUT the fake-decode flag — the sampled frames are
    genuine PNG re-encodes of the composited animation frames at the
    right timeline points."""
    from pyspark.sql import Row

    from gus_spark.operators import gif, png

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    w, h = 4, 3
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    frames = [bytes([f] * (w * h)) for f in range(3)]
    # delays 500/500/2000 ms -> total 3000; every_ms=1000 samples
    # t=0 (frame 0), t=1000 (frame 2), t=2000 (frame 2)
    animated = gif.encode_gif(w, h, pal, frames, [50, 50, 200])
    static = gif.encode_gif(w, h, pal, [frames[1]])
    rows = [
        Row(media_id=0, content=animated,
            meta=Row(mime="image/gif", width=None, height=None,
                     duration_ms=None, sample_rate=None)),
        Row(media_id=1, content=static,
            meta=Row(mime="image/gif", width=None, height=None,
                     duration_ms=None, sample_rate=None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(media, every_ms=1000, fake=False).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, {})[r.frame_index] = bytes(r.frame)
    assert sorted(by_id[0]) == [0, 1, 2]
    assert sorted(by_id[1]) == [0]  # static -> one sample
    expect = {0: 0, 1: 2, 2: 2}  # sample k -> source frame
    for k, src in expect.items():
        rw, rh, ch, pix = png.decode_png(by_id[0][k])
        assert (rw, rh, ch) == (w, h, 3)
        assert pix == pal[src * 3 : src * 3 + 3] * (w * h)
    rw, rh, ch, pix = png.decode_png(by_id[1][0])
    assert pix == pal[3:6] * (w * h)


def test_sample_frames_non_gif_still_gated(spark, monkeypatch):
    """The ffmpeg gate stays loud for non-GIF video buffers."""
    import pytest
    from pyspark.sql import Row

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    rows = [Row(media_id=0, content=b"\x00\x00\x00\x18ftypisom",
                meta=Row(mime="video/mp4", width=None, height=None,
                         duration_ms=2000, sample_rate=None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception) as exc:
        sample_frames(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_gif_hostile_buffers_raise_valueerror_only():
    """Hardening matrix: each hostile shape must raise the contracted
    ValueError (never MemoryError / silent corruption) — a 13-byte
    header declaring a 65535x65535 screen (a ~12.9 GB canvas if
    allocated), a frame rectangle outside the logical screen, and an
    LZW stream whose indices exceed the color table."""
    import struct

    import pytest

    from gus_spark.operators import gif

    # oversized logical screen, rejected before any allocation
    huge = b"GIF89a" + struct.pack("<HH", 65535, 65535) + bytes(3)
    with pytest.raises(ValueError, match="decode limit"):
        gif.decode_gif(huge)

    pal = bytes([1, 2, 3, 4, 5, 6])
    base = gif.encode_gif(2, 2, pal, [bytes([0, 1, 1, 0])])
    # frame rectangle exceeding the screen: patch the descriptor's
    # width field (2 -> 3)
    idx = base.index(b"\x2c")
    oob = bytearray(base)
    struct.pack_into("<H", oob, idx + 5, 3)
    with pytest.raises(ValueError, match="exceeds the"):
        gif.decode_gif(bytes(oob))

    # palette index out of range: re-encode a frame that references
    # index 2 against the 2-entry table by splicing in an LZW stream
    # built with a larger alphabet
    body = gif._sub_blocks(gif._lzw_encode(2, bytes([0, 3, 1, 0])))
    spliced = (
        base[: idx + 9]
        + bytes([0])  # no local table, no interlace
        + bytes([2])  # min code size
        + body
        + b"\x3b"
    )
    with pytest.raises(ValueError, match="palette index"):
        gif.decode_gif(spliced)


def test_decode_image_features_real_gif_no_stub(spark, monkeypatch):
    """A GIF is also an image: decode_image_features extracts true
    width/height/mean-luma from the FIRST composited frame, no stub."""
    from pyspark.sql import Row

    from gus_spark.operators import gif
    from gus_spark.operators.png import mean_luma

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    w, h = 5, 4
    pal = bytes([10, 20, 30, 200, 100, 50])
    frame = bytes((i % 2) for i in range(w * h))
    data = gif.encode_gif(w, h, pal, [frame])
    rgb = b"".join(pal[i * 3 : i * 3 + 3] for i in frame)
    media = spark.createDataFrame(
        [Row(media_id=0, content=data,
             meta=Row(mime="image/gif", width=None, height=None,
                      duration_ms=None, sample_rate=None))],
        MEDIA_SCHEMA,
    )
    out = decode_image_features(media, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height, r.n_bytes) == (w, h, len(data))
    assert r.mean_luma == f"{mean_luma(w, h, 3, rgb):.3f}"


def test_gif_max_frames_bomb_and_transparent_oob():
    """Second-pass hardening: max_frames=1 stops after the first
    composited frame; a frame-count bomb (many frames x big canvas)
    hits the decoded-bytes ValueError, not an OOM; a transparent index
    OUTSIDE the color table is legal (the compositor skips it) and
    must decode."""
    import struct

    import pytest

    from gus_spark.operators import gif

    pal = bytes([9, 9, 9, 250, 250, 250])
    frames = [bytes([f % 2] * 4) for f in range(5)]
    data = gif.encode_gif(2, 2, pal, frames, [1] * 5)
    w, h, got, delays = gif.decode_gif(data, max_frames=1)
    assert len(got) == 1 and len(delays) == 1
    assert got[0] == b"".join(pal[i * 3 : i * 3 + 3] for i in frames[0])

    # frame bomb: 2048x2048 canvas (passes the pixel cap) and enough
    # 1x1 frames that frames x canvas exceeds the byte cap
    n_frames = (gif._MAX_DECODE_BYTES // (2048 * 2048 * 3)) + 2
    head = (
        b"GIF89a" + struct.pack("<HH", 2048, 2048)
        + bytes([0x80, 0, 0]) + pal
    )
    one = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + bytes([0])
        + bytes([2]) + gif._sub_blocks(gif._lzw_encode(2, bytes([1])))
    )
    bomb = head + one * n_frames + b"\x3b"
    with pytest.raises(ValueError, match="frame-count bomb"):
        gif.decode_gif(bomb)
    # but max_frames still lets a caller read the first frame cheaply
    _, _, first, _ = gif.decode_gif(bomb, max_frames=1)
    assert len(first) == 1

    # transparent index outside the 2-entry table: compositor skips
    # those pixels, so this must DECODE (regression: the palette-range
    # check used to reject it)
    gce = b"\x21\xf9\x04" + bytes([0x01]) + b"\x00\x00" + b"\x00\x00"
    img = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0])
        + bytes([2])
        + gif._sub_blocks(gif._lzw_encode(2, bytes([0, 3, 1, 3])))
    )
    trans = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0]) + pal
        + gce.replace(b"\x00\x00\x00", b"\x00\x00\x03", 1) + img + b"\x3b"
    )
    w2, h2, fr, _ = gif.decode_gif(trans)
    dark, white = pal[0:3], pal[3:6]
    # transparent pixels keep the background (index 0 -> dark)
    assert fr[0] == dark + dark + white + dark


# ---------------------------------------------------- codec swap-in contract
def test_codec_swap_in_contract(spark, monkeypatch):
    """VERDICT r6 #3: the 'a real pipeline swaps in libjpeg behind the
    same kernel contract' prose (operators/jpeg.py) becomes an ENFORCED
    contract. An injected decoder chain — the in-tree PNG decoder
    masquerading as an external lib, plus a brand-new FAKE format —
    must flow through the identical Spark plumbing: same output
    schema, same values for the masqueraded codec as the default
    chain, real features for the new format, and the same
    NotImplementedError gating for undecodable variants."""
    from gus_spark.operators import png
    from gus_spark.operators.multimodal import default_image_decoders

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)

    # defined LOCALLY so cloudpickle ships them by value — a pytest
    # module isn't importable on executor workers, which is exactly
    # the constraint a real external-decoder closure faces too
    def _fake_lib_sniff(raw):
        return raw[:4] == b"FAKE"

    def _fake_lib_decode(raw):
        # a stand-in 'external library' decoder for a format the
        # in-tree chain has never heard of: FAKE | w | h | grayscale
        if len(raw) < 6:
            raise ValueError("truncated FAKE header")
        fw, fh = raw[4], raw[5]
        pix = raw[6 : 6 + fw * fh]
        if len(pix) < fw * fh:
            raise ValueError("truncated FAKE pixel payload")
        return fw, fh, 1, bytes(pix)

    w, h = 4, 3
    png_pix = bytes(range(w * h))
    fake_pix = bytes(255 - i for i in range(w * h))
    rows = [
        Row(media_id=0, content=png.encode_png(w, h, png_pix),
            meta=Row(mime="image/png", width=None, height=None,
                     duration_ms=None, sample_rate=None)),
        Row(media_id=1, content=b"FAKE" + bytes([w, h]) + fake_pix,
            meta=Row(mime="image/x-fake", width=None, height=None,
                     duration_ms=None, sample_rate=None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    # the injected chain: in-tree PNG decode masquerading as a fast
    # external lib (different name, same callable contract) + the new
    # format the default chain cannot sniff
    injected = [
        ("libfast_png", png.is_png, png.decode_png),
        ("libfake", _fake_lib_sniff, _fake_lib_decode),
    ]
    out = decode_image_features(media, fake=False, decoders=injected)
    got = {r.media_id: r for r in out.collect()}

    # identical feature schema to the default chain
    default_out = decode_image_features(
        media.filter("media_id = 0"), fake=False
    )
    assert out.schema == default_out.schema
    # masqueraded PNG: values identical to the default in-tree chain
    want_png = default_out.collect()[0]
    assert got[0] == want_png
    # new format: REAL features through the same kernel
    assert (got[1].width, got[1].height) == (w, h)
    assert got[1].mean_luma == f"{sum(fake_pix) / (w * h):.3f}"
    assert got[1].n_bytes == 6 + w * h

    # gating contract holds for external decoders: an undecodable
    # variant raises the loud gate (naming the decoder), not a crash
    bad = spark.createDataFrame(
        [Row(media_id=9, content=b"FAKE" + bytes([200, 200]) + b"\x00",
             meta=Row(mime="image/x-fake", width=None, height=None,
                      duration_ms=None, sample_rate=None))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="libfake"):
        decode_image_features(bad, fake=False, decoders=injected).collect()
    # ... and the stub fallback applies to it like any other format
    stubbed = decode_image_features(
        bad, fake=True, decoders=injected
    ).collect()
    assert len(stubbed) == 1 and stubbed[0].n_bytes == 7

    # the default chain is itself expressed as swappable triples
    names = [name for name, _s, _d in default_image_decoders()]
    assert names == ["png", "jpeg", "gif"]


def test_sample_frames_all_zero_delay_gif_uses_first_frame(
    spark, monkeypatch
):
    """ADVICE r6: a multi-frame GIF whose delays are ALL zero has no
    timeline — the sampler must emit exactly one sample showing the
    FIRST frame (the docstring's static-GIF contract), not the last."""
    from gus_spark.operators import gif, png

    monkeypatch.delenv("GUS_MULTIMODAL_FAKE_DECODE", raising=False)
    w, h = 2, 2
    palette = bytes([10, 10, 10, 200, 200, 200])  # dark, bright
    f0 = bytes([0] * (w * h))  # solid dark frame
    f1 = bytes([1] * (w * h))  # solid bright frame
    buf = gif.encode_gif(w, h, palette, [f0, f1], delays_cs=[0, 0])
    media = spark.createDataFrame(
        [Row(media_id=5, content=buf,
             meta=Row(mime="image/gif", width=None, height=None,
                      duration_ms=None, sample_rate=None))],
        MEDIA_SCHEMA,
    )
    out = sample_frames(media, every_ms=100, fake=False).collect()
    assert len(out) == 1 and out[0].frame_index == 0
    pw, ph, pch, pix = png.decode_png(bytes(out[0].frame))
    assert (pw, ph) == (w, h)
    assert set(pix) == {10}, "must be the FIRST frame's pixels"
