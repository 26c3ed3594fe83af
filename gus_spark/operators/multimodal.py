"""Multimodal (image/audio/video) column operators.

Convention: media travels as an opaque ``binary`` column plus a typed
metadata struct — the pattern that scales to 100 TB because Spark never
interprets the bytes until an explicitly-requested decode stage, and
parquet stores/prunes the binary column independently of the metadata.

    MEDIA_SCHEMA: media_id long, content binary,
                  meta struct<mime string, width int, height int,
                             duration_ms int, sample_rate int>

Decode/feature-extraction run as Arrow-batched ``mapInPandas`` stages:
one Python process per partition consumes record batches (never a
per-row UDF), so throughput is bounded by codec speed, not serde.

Codec reality in this environment, per media type:

- **PNG and baseline JPEG images decode AND resize for REAL**:
  ``operators.png`` is a pure-stdlib (zlib/struct) PNG codec and
  ``operators.jpeg`` a pure-Python baseline sequential JPEG codec
  (Annex K tables, 4:4:4 + 4:2:0, restart markers), so
  ``decode_image_features`` extracts true width/height/mean-luminance
  and ``resize_images`` produces true nearest-neighbor thumbnails from
  genuine PNG/JPEG bytes with no PIL — tested end-to-end against
  encoded-then-decoded files. JPEG thumbnails re-encode as PNG:
  lossless and bit-deterministic, so downstream dedup/index tests stay
  exact (a second lossy generation would also compound quality loss).
- **PCM WAV audio decodes for REAL**: ``audio_features`` reads
  RIFF/WAVE buffers with the stdlib ``wave`` module — exact sample
  counts, RMS and peak over the 16-bit samples.
- **MP4/MOV container metadata parses for REAL**: ``video_metadata``
  reads ISO BMFF boxes with the in-tree stdlib parser
  (``operators.mp4``) — duration, track count, video dimensions —
  the pre-decode triage pass; only frame DECODE needs ffmpeg.
- **GIF decodes for REAL** (in-tree stdlib GIF89a codec,
  ``operators.gif`` — LZW, local/global palettes, delays/transparency/
  disposal compositing): ``sample_frames`` samples the animation
  timeline and emits each sampled frame as a lossless RGB PNG — the
  full decoded-frames-out contract without ffmpeg — and
  ``decode_image_features`` treats a GIF as an image via its first
  composited frame (true width/height/mean-luma).
- Other image formats and compressed audio/video codecs
  (webp/opencv/mp3/ffmpeg, progressive JPEG) are NOT available, so
  those paths are gated STUBS:
  with ``GUS_MULTIMODAL_FAKE_DECODE=1`` (and in tests) a deterministic
  fake decoder derives pixel/sample statistics from the content hash —
  exercising the full Spark plumbing (schema, batching, partitioning);
  otherwise the kernels raise NotImplementedError("requires ...") at
  first batch, surfacing the missing dependency loudly rather than
  silently corrupting a pipeline.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gus_spark.operators.util import ensure_parallelism

META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("content", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("mean_luma", StringType()),  # hex-digest stub feature
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def _fake_decode_allowed() -> bool:
    return os.environ.get("GUS_MULTIMODAL_FAKE_DECODE") == "1"


def default_image_decoders() -> list[tuple]:
    """The in-tree codec chain as (name, sniff, decode) triples — the
    DEFAULT argument of ``decode_image_features``'s swap-in seam.
    ``sniff(raw) -> bool`` routes a buffer; ``decode(raw) -> (width,
    height, channels, row-major pixel bytes)`` or raises ValueError
    for an undecodable variant (routed to the stub/gate, never a
    stage kill). A production deployment swaps libjpeg/PIL/opencv in
    by passing its own triples — the Spark plumbing (schema,
    batching, gating) is identical, which tests/test_multimodal.py
    asserts by injecting a masquerading decoder (the prose contract
    at operators/jpeg.py:25, now enforced)."""
    from gus_spark.operators import gif, jpeg, png

    def decode_gif_rgb(raw):
        # image view of a GIF: the FIRST composited frame as RGB;
        # max_frames=1 stops the decoder there — a 500-frame
        # animation costs one frame's work, and corruption in
        # later frames cannot spoil the decodable first one
        w, h, frames, _ = gif.decode_gif(raw, max_frames=1)
        if not frames:
            raise ValueError("GIF contains no image frames")
        return w, h, 3, frames[0]

    return [
        ("png", png.is_png, png.decode_png),
        ("jpeg", jpeg.is_jpeg, jpeg.decode_jpeg),
        ("gif", gif.is_gif, decode_gif_rgb),
    ]


def decode_image_features(
    df: DataFrame,
    batch_hint: int = 256,
    fake: bool | None = None,
    decoders: list[tuple] | None = None,
) -> DataFrame:
    """Per-image feature extraction over Arrow batches.

    PNG, baseline JPEG and GIF buffers are decoded for REAL
    (operators.png / operators.jpeg / operators.gif, pure Python):
    width/height from the container, mean_luma as the actual BT.601
    luminance mean formatted to 3 decimals (a GIF contributes its
    FIRST composited frame, decoded first-frame-only — the rest of an
    animation is never touched). Other formats fall back to the gated
    stub (deterministic pseudo-features from the md5 of the bytes) or
    NotImplementedError when the stub is not allowed.

    ``decoders`` is the codec swap-in seam: a list of (name, sniff,
    decode) triples REPLACING the in-tree chain (see
    ``default_image_decoders`` for the contract). It must be
    picklable — it is serialized into the executor closure (a
    module-level registry would never reach the Python workers)."""
    df = ensure_parallelism(df)
    # resolve driver-side: executor workers do not see env changes made
    # after JVM start, and the decision belongs in the plan anyway
    allow_fake = _fake_decode_allowed() if fake is None else fake

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from gus_spark.operators.png import mean_luma

        chain = (
            decoders if decoders is not None else default_image_decoders()
        )
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "mean_luma": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content or b"")
                hit = next(
                    ((name, dec) for name, sniff, dec in chain if sniff(raw)),
                    None,
                )
                if hit is not None:
                    name, dec = hit
                    # only the documented subsets decode; RGBA/palette/
                    # progressive/corrupt buffers must NOT kill the
                    # whole stage — fall through to the stub (or the
                    # loud gate) like any other undecodable format,
                    # carrying the reason in the error when gated
                    try:
                        w, h, ch, pixels = dec(raw)
                    except ValueError as e:
                        if not allow_fake:
                            raise NotImplementedError(
                                f"media_id={mid}: {name} "
                                f"variant this environment cannot "
                                f"decode ({e}); set "
                                "GUS_MULTIMODAL_FAKE_DECODE=1 to "
                                "stub undecodable buffers"
                            ) from e
                    else:
                        out["media_id"].append(mid)
                        out["width"].append(w)
                        out["height"].append(h)
                        out["n_bytes"].append(len(raw))
                        out["mean_luma"].append(
                            f"{mean_luma(w, h, ch, pixels):.3f}"
                        )
                        continue
                elif not allow_fake:
                    raise NotImplementedError(
                        "non-PNG/JPEG image decode requires PIL/opencv "
                        "— not available in this environment; set "
                        "GUS_MULTIMODAL_FAKE_DECODE=1 for the "
                        "deterministic stub (PNG/baseline JPEG decode "
                        "for real)"
                    )
                digest = hashlib.md5(raw).digest()
                out["media_id"].append(mid)
                out["width"].append(int.from_bytes(digest[0:2], "big") % 4096)
                out["height"].append(int.from_bytes(digest[2:4], "big") % 4096)
                out["n_bytes"].append(len(raw))
                out["mean_luma"].append(digest.hex()[:8])
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def media_embeddings(
    df: DataFrame, dim: int = 64, fake: bool | None = None
) -> DataFrame:
    """Per-media embedding vectors (media_id, embedding array<double>)
    — the bridge from the multimodal family into similarity search:
    the output feeds operators.vector_index.VectorIndex / the ANN
    operators directly.

    A real implementation runs a vision/audio encoder over the decoded
    media (the batched Arrow shape here is exactly what that needs);
    the environment stub derives a deterministic unit vector from the
    content digest — stable across runs and machines, so downstream
    index tests are exact. Same gating as the other kernels:
    NotImplementedError unless the fake decoder is allowed.
    """
    df = ensure_parallelism(df)
    allow_fake = _fake_decode_allowed() if fake is None else fake

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not allow_fake:
                raise NotImplementedError(
                    "media embedding requires an encoder model — not "
                    "available in this environment; set "
                    "GUS_MULTIMODAL_FAKE_DECODE=1 for the stub"
                )
            ids, vecs = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content or b"")
                # expand the 16-byte digest into dim deterministic
                # floats via counter-mode re-hashing
                buf = b"".join(
                    hashlib.md5(raw + i.to_bytes(4, "big")).digest()
                    for i in range((dim * 4 + 15) // 16)
                )
                v = np.frombuffer(buf[: dim * 4], dtype=">u4").astype("float64")
                v = v / 2**32 - 0.5
                v /= np.linalg.norm(v) or 1.0
                ids.append(mid)
                vecs.append(v.tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return df.select("media_id", "content").mapInPandas(
        kernel, schema="media_id long, embedding array<double>"
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool | None = None
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Animated GIF buffers decode for REAL (operators.gif, pure stdlib):
    frames are composited per the 89a animation model (delays,
    transparency, disposal), the animation timeline is sampled at
    ``every_ms`` intervals (the frame on screen at t = k·every_ms;
    zero-duration/static GIFs contribute their first frame), and each
    sampled frame ships as a lossless RGB PNG (operators.png) — the
    same decoded-frames-out contract an ffmpeg-backed implementation
    would have. Other containers (mp4/webm need ffmpeg) fall back to
    the gated stub, which emits one fake frame per declared second by
    slicing bytes deterministically — the fan-out shape (1 video row ->
    N frame rows via mapInPandas) is identical on every path.
    """
    df = ensure_parallelism(df)
    allow_fake = _fake_decode_allowed() if fake is None else fake

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from gus_spark.operators import gif, png

        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame": []}
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                content = bytes(content or b"")
                if gif.is_gif(content):
                    # same stage-survival contract as the image
                    # kernels: unsupported GIF variants fall through to
                    # the stub (or the loud gate), carrying the reason
                    try:
                        w, h, frames, delays = gif.decode_gif(content)
                    except ValueError as e:
                        if not allow_fake:
                            raise NotImplementedError(
                                f"media_id={mid}: GIF variant this "
                                f"environment cannot decode ({e}); set "
                                "GUS_MULTIMODAL_FAKE_DECODE=1 to stub "
                                "undecodable buffers"
                            ) from e
                    else:
                        if frames:
                            total = sum(delays)
                            starts = [
                                sum(delays[:i]) for i in range(len(frames))
                            ]
                            n_samples = max(total // every_ms, 1)
                            for k in range(n_samples):
                                t = k * every_ms
                                # frame on screen at t: the LAST start
                                # <= t — a zero-delay frame is replaced
                                # the same instant, so later tied
                                # starts win. When EVERY delay is zero
                                # there is no timeline at all; the
                                # docstring's static-GIF contract says
                                # the FIRST frame represents the image
                                # (ADVICE r6: max() alone picked the
                                # last frame here).
                                shown = 0 if total == 0 else max(
                                    i for i, s in enumerate(starts)
                                    if s <= t
                                )
                                rows["media_id"].append(mid)
                                rows["frame_index"].append(k)
                                rows["frame"].append(
                                    png.encode_png(
                                        w, h, frames[shown], channels=3
                                    )
                                )
                        continue
                elif not allow_fake:
                    raise NotImplementedError(
                        "non-GIF video decode requires ffmpeg — not "
                        "available; set GUS_MULTIMODAL_FAKE_DECODE=1 "
                        "for the stub (animated GIF decodes for real)"
                    )
                duration = (meta or {}).get("duration_ms")
                # Arrow hands nullable ints to pandas as floats (NaN=null)
                duration = 0 if duration is None or duration != duration \
                    else int(duration)
                for i in range(max(duration // every_ms, 0)):
                    lo = (i * 16) % max(len(content), 1)
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(i)
                    rows["frame"].append(content[lo : lo + 16])
            yield pd.DataFrame(rows)

    return df.select("media_id", "content", "meta").mapInPandas(
        kernel, schema=FRAME_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", StringType()),   # formatted, like mean_luma
        StructField("peak", IntegerType()),
    ]
)


def audio_features(df: DataFrame, fake: bool | None = None) -> DataFrame:
    """Per-clip audio statistics over Arrow batches.

    WAV (RIFF/PCM) buffers decode for REAL via the stdlib ``wave``
    module — sample rate, channel count, exact sample count, duration,
    RMS and peak amplitude computed with one vectorized numpy pass over
    the 16-bit samples. Compressed codecs (mp3/ogg/aac need ffmpeg)
    fall back to the gated stub / NotImplementedError, the same
    contract as the image kernels.
    """
    df = ensure_parallelism(df)
    allow_fake = _fake_decode_allowed() if fake is None else fake

    def kernel(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "sample_rate": [], "n_channels": [],
                "n_samples": [], "duration_ms": [], "rms": [], "peak": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content or b"")
                if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    # malformed headers / non-16-bit PCM must not kill
                    # the stage: fall through to the stub (or the loud
                    # gate) exactly like the image kernel
                    try:
                        with wave.open(io.BytesIO(raw)) as w:
                            if w.getsampwidth() != 2:
                                raise ValueError(
                                    f"only 16-bit PCM WAV supported, got "
                                    f"{8 * w.getsampwidth()}-bit"
                                )
                            rate = w.getframerate()
                            if rate <= 0:
                                raise ValueError("non-positive frame rate")
                            nch = w.getnchannels()
                            frames = w.getnframes()
                            samples = np.frombuffer(
                                w.readframes(frames), dtype="<i2"
                            ).astype("float64")
                    # wave delegates to the chunk module, which raises
                    # EOFError/RuntimeError/struct.error on malformed
                    # bodies besides wave.Error — ANY parse failure of
                    # an untrusted buffer routes to the fallback
                    except Exception as e:
                        if not allow_fake:
                            raise NotImplementedError(
                                f"media_id={mid}: WAV variant this "
                                f"environment cannot decode ({e}); set "
                                "GUS_MULTIMODAL_FAKE_DECODE=1 to stub "
                                "undecodable buffers"
                            ) from e
                    else:
                        out["media_id"].append(mid)
                        out["sample_rate"].append(rate)
                        out["n_channels"].append(nch)
                        out["n_samples"].append(frames)
                        out["duration_ms"].append(int(frames * 1000 / rate))
                        rms = (
                            float(np.sqrt(np.mean(samples**2)))
                            if len(samples)
                            else 0.0
                        )
                        out["rms"].append(f"{rms:.3f}")
                        out["peak"].append(
                            int(np.max(np.abs(samples))) if len(samples)
                            else 0
                        )
                        continue
                elif not allow_fake:
                    raise NotImplementedError(
                        "compressed audio decode requires ffmpeg — not "
                        "available; set GUS_MULTIMODAL_FAKE_DECODE=1 for "
                        "the stub (PCM WAV decodes for real)"
                    )
                digest = hashlib.md5(raw).digest()
                out["media_id"].append(mid)
                out["sample_rate"].append(44100)
                out["n_channels"].append(1 + digest[0] % 2)
                out["n_samples"].append(len(raw))
                out["duration_ms"].append(len(raw) * 1000 // 44100)
                out["rms"].append(digest.hex()[:8])
                out["peak"].append(int.from_bytes(digest[1:3], "big"))
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    fake: bool | None = None,
) -> DataFrame:
    """Batch image resize: (media_id, width, height, content) with
    content re-encoded at the target size.

    PNG and baseline JPEG buffers resize for REAL — decode via the
    in-tree codecs (operators.png / operators.jpeg), nearest-neighbor
    sample with one vectorized numpy gather (no per-pixel Python),
    re-encode PNG. The nearest-neighbor choice is deliberate:
    deterministic, integer-exact across platforms, and the standard
    cheap pre-filter before a training pipeline's learned resizer.
    Thumbnails are ALWAYS re-encoded as PNG — lossless and
    bit-deterministic even for JPEG input, so downstream exact-dedup /
    index tests hold (and a second lossy generation is avoided). Other
    formats fall back to the gated stub (content sliced, dimensions
    faked) or NotImplementedError — same contract as
    decode_image_features.
    """
    if target_width < 1 or target_height < 1:
        raise ValueError(
            f"target size must be >= 1x1, got "
            f"{target_width}x{target_height}"
        )
    df = ensure_parallelism(df)
    allow_fake = _fake_decode_allowed() if fake is None else fake

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from gus_spark.operators import jpeg, png

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "content": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content or b"")
                codec = (
                    png if png.is_png(raw)
                    else jpeg if jpeg.is_jpeg(raw)
                    else None
                )
                if codec is not None:
                    # undecodable variants: fall through to the
                    # SHARED stub block below (or the loud gate) — same
                    # try/except/else shape as decode_image_features,
                    # so the two stub emissions can never drift
                    try:
                        w, h, ch, pixels = (
                            png.decode_png(raw) if codec is png
                            else jpeg.decode_jpeg(raw)
                        )
                    except ValueError as e:
                        if not allow_fake:
                            raise NotImplementedError(
                                f"media_id={mid}: {codec.__name__} "
                                f"variant this environment cannot "
                                f"decode ({e}); set "
                                "GUS_MULTIMODAL_FAKE_DECODE=1 to stub "
                                "undecodable buffers"
                            ) from e
                    else:
                        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
                            h, w, ch
                        )
                        ys = np.minimum(
                            (np.arange(target_height) * h)
                            // target_height, h - 1
                        )
                        xs = np.minimum(
                            (np.arange(target_width) * w)
                            // target_width, w - 1
                        )
                        resized = arr[ys][:, xs]
                        out["media_id"].append(mid)
                        out["width"].append(target_width)
                        out["height"].append(target_height)
                        out["content"].append(
                            png.encode_png(
                                target_width,
                                target_height,
                                resized.tobytes(),
                                channels=ch,
                            )
                        )
                        continue
                elif not allow_fake:
                    raise NotImplementedError(
                        "non-PNG/JPEG resize requires PIL/opencv — not "
                        "available; set GUS_MULTIMODAL_FAKE_DECODE=1 "
                        "for the stub (PNG/baseline JPEG resize for "
                        "real)"
                    )
                out["media_id"].append(mid)
                out["width"].append(target_width)
                out["height"].append(target_height)
                out["content"].append(raw[: target_width * target_height])
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_tracks", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def video_metadata(df: DataFrame, fake: bool | None = None) -> DataFrame:
    """Per-clip container metadata over Arrow batches — the triage a
    pipeline runs BEFORE spending decode cycles (drop zero-duration
    clips, bucket by resolution, size the frame-sample fan-out).

    MP4/MOV (ISO BMFF) buffers parse for REAL via the in-tree stdlib
    box parser (operators.mp4): duration from mvhd timescale, track
    count, video-track presentation dimensions. Frame DECODE still
    requires ffmpeg and remains gated in sample_frames; metadata does
    not. Non-BMFF containers fall back to the gated stub /
    NotImplementedError — same contract as the image kernels.
    """
    df = ensure_parallelism(df)
    allow_fake = _fake_decode_allowed() if fake is None else fake

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from gus_spark.operators import mp4

        for pdf in batches:
            out = {
                "media_id": [], "duration_ms": [], "n_tracks": [],
                "width": [], "height": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content or b"")
                if mp4.is_mp4(raw):
                    try:
                        meta = mp4.parse_mp4(raw)
                    except ValueError as e:
                        if not allow_fake:
                            raise NotImplementedError(
                                f"media_id={mid}: BMFF variant this "
                                f"environment cannot parse ({e}); set "
                                "GUS_MULTIMODAL_FAKE_DECODE=1 to stub "
                                "unparsable buffers"
                            ) from e
                    else:
                        out["media_id"].append(mid)
                        out["duration_ms"].append(meta["duration_ms"])
                        out["n_tracks"].append(meta["n_tracks"])
                        out["width"].append(meta["width"])
                        out["height"].append(meta["height"])
                        continue
                elif not allow_fake:
                    raise NotImplementedError(
                        "non-MP4 container parsing requires ffmpeg — not "
                        "available; set GUS_MULTIMODAL_FAKE_DECODE=1 for "
                        "the stub (ISO BMFF metadata parses for real)"
                    )
                digest = hashlib.md5(raw).digest()
                out["media_id"].append(mid)
                out["duration_ms"].append(
                    int.from_bytes(digest[0:3], "big") % 600000
                )
                out["n_tracks"].append(1 + digest[3] % 3)
                out["width"].append(int.from_bytes(digest[4:6], "big") % 4096)
                out["height"].append(int.from_bytes(digest[6:8], "big") % 4096)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        kernel, schema=VIDEO_META_SCHEMA
    )


def media_summary(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata rollup (no decode): bytes and dimensions per
    mime type — the triage query a pipeline runs before spending decode
    cycles."""
    return (
        df.groupBy(F.col("meta.mime").alias("mime"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.avg("meta.width").alias("avg_width"),
            F.avg("meta.height").alias("avg_height"),
        )
    )
