"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via ``mapInPandas`` in Arrow batches.

Decode support is format-graded:

* **PPM (P6) images, 16-bit PCM WAV audio, and PPM-stream video
  (``ffmpeg image2pipe``'s concatenated-P6 format) are decoded FOR REAL** —
  pure-NumPy header parse + frombuffer; images get nearest-neighbor resize
  and channel-mean + gray-thumbnail features, audio gets duration/RMS/
  zero-crossing-rate + log-spectral band energies (np.fft). No media
  library needed. End-to-end tested.
* every other format (JPEG/PNG/MP3/video containers) raises ``NotImplementedError``
  unless ``deterministic_fake=True`` (seeded stand-in keeping the schema /
  partitioning / batch plumbing testable) — those decoders need libs this
  container doesn't have; swap them in via ``decode_image`` on a real
  cluster, nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature: seeded by payload content hash."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


PPM_MIME = "image/x-portable-pixmap"


def _ppm_header(payload: bytes, offset: int = 0) -> tuple[int, int, int]:
    """Parse a P6 header starting at ``offset``: returns (width, height,
    pixel_block_offset). Reads in place — no payload slicing, so stream
    splitting stays O(header bytes) per frame, not O(remaining stream).
    Handles whitespace-separated tokens and ``#`` comments per the netpbm
    spec; maxval must be 255 (the 8-bit case)."""
    if payload[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens, pos = [], offset + 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        try:
            tokens.append(int(payload[start:pos]))
        except ValueError:
            raise ValueError(f"bad P6 header token at byte {start}") from None
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        # negative tokens parse (int(b"-4")) but would make the frame length
        # non-positive — the exact shape that turned split_ppm_stream into an
        # infinite loop on malformed input
        raise ValueError(f"bad P6 dimensions {w}x{h}")
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, got maxval={maxval}")
    return w, h, pos + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-NumPy P6 (binary PPM) decoder -> (h, w, 3) uint8."""
    w, h, offset = _ppm_header(payload)
    if len(payload) < offset + w * h * 3:
        raise ValueError("truncated P6 pixel block")
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=offset)
    return pixels.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def _resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: src = floor((i+0.5)*src/dst)
    — pure integer index maps, identical on every platform."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return img[rows[:, None], cols[None, :]]


def _ppm_features(img: np.ndarray, thumb: int = 8) -> np.ndarray:
    """Real image feature: per-channel means (3) + gray nearest-neighbor
    thumb×thumb thumbnail (thumb²), all float32 in [0, 1] — enough for
    embedding-cosine near-dup detection over decoded images."""
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    gray = img.astype(np.float32).mean(axis=2)
    t = _resize_nearest(gray, thumb, thumb).reshape(-1) / 255.0
    return np.concatenate([means, t]).astype(np.float32)


def decode_image(payload: bytes, mime: str | None) -> np.ndarray:
    """Format dispatch for image decode. PPM is native (pure NumPy); plug
    other formats in here (PIL etc.) on a cluster that has the libs."""
    if mime == PPM_MIME or (payload or b"").startswith(b"P6"):
        return decode_ppm(payload)
    raise NotImplementedError(
        f"no decoder for mime {mime!r} in this environment (PPM is native; "
        "JPEG/PNG need an imaging library)"
    )


WAV_MIME = "audio/wav"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-NumPy RIFF/WAVE decoder for 16-bit PCM -> (samples float32 in
    [-1, 1] shaped (n, channels), sample_rate). Walks the chunk list, so
    extra chunks (LIST, fact, ...) are skipped per the RIFF spec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (format={audio_format}, bits={bits})")
    if channels < 1 or sample_rate < 1:
        # crafted fmt chunks otherwise reach division by zero in the frame
        # split / duration math — reject, don't crash
        raise ValueError(f"bad fmt chunk (channels={channels}, rate={sample_rate})")
    samples = np.frombuffer(data, dtype="<i2", count=(len(data) // (2 * channels)) * channels)
    return (samples.reshape(-1, channels).astype(np.float32) / 32768.0, sample_rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) float32 in [-1, 1] -> 16-bit PCM RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
    ch, sr, ba = samples.shape[1], sample_rate, samples.shape[1] * 2
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little") + sr.to_bytes(4, "little")
        + (sr * ba).to_bytes(4, "little") + ba.to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _wav_features(samples: np.ndarray, sample_rate: int, n_bands: int = 8) -> np.ndarray:
    """Real audio feature: [duration_s, rms, zero-crossing rate] + ``n_bands``
    log-spectral band energies of the mono mix — deterministic float32, the
    audio sibling of the image thumbnail feature."""
    mono = samples.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(3 + n_bands, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono * mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono)) ** 2
    bands = np.array_split(spec, n_bands)
    energy = np.log1p(np.array([b.sum() for b in bands], dtype=np.float64) / n)
    return np.concatenate(
        [[n / sample_rate, rms, zcr], energy]
    ).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 32, deterministic_fake: bool = False, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).

    The real path decodes natively supported formats (PPM — pure NumPy) into
    channel-mean + gray-thumbnail features; unsupported formats raise
    NotImplementedError (their decoders need libs this container lacks).
    ``deterministic_fake=True`` keeps the seeded stand-in for plumbing tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, kind, mime in zip(
                pdf["payload"],
                pdf.get("kind", ["image"] * len(pdf)),
                pdf.get("mime", [None] * len(pdf)),
            ):
                raw = p if p is not None else b""
                # dispatch on the DECLARED kind/mime first; byte sniffing is
                # only a fallback for missing metadata. Sniff-first misroutes
                # RIFF-container images (WebP) into the WAV decoder, and a
                # video payload starting with P6 would silently yield the
                # features of its FIRST frame only.
                if deterministic_fake:
                    feats.append(_fake_decode(raw, dim).tolist())
                elif kind == "video" or mime == PPM_STREAM_MIME:
                    raise ValueError(
                        "route video rows through sample_video_frames first — "
                        "a whole-payload feature would describe only frame 0"
                    )
                elif kind == "audio" or mime == WAV_MIME or (
                    mime is None
                    and not (isinstance(kind, str) and kind in ("image", "video"))
                    and raw[:4] == b"RIFF"
                ):
                    # RIFF byte-sniff is a fallback for MISSING metadata only:
                    # a declared mime-less image (e.g. WebP, also RIFF) must
                    # reach decode_image's explicit no-decoder error, not fail
                    # as "not a RIFF/WAVE payload" (ADVICE r3)
                    # real audio decode (16-bit PCM WAV, pure NumPy)
                    feats.append(_wav_features(*decode_wav(raw)).tolist())
                else:
                    # real image decode (PPM native; other formats raise with
                    # a clear message — no silent fakes on the real path)
                    feats.append(_ppm_features(decode_image(raw, mime)).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    # repartition by media_id: payloads are large; even spread beats locality
    return media.repartition("media_id").mapInPandas(run, FEATURE_SCHEMA)


PPM_STREAM_MIME = "video/x-ppm-stream"  # ffmpeg image2pipe -vcodec ppm output


def split_ppm_stream(payload: bytes) -> list[tuple[int, int]]:
    """Frame (offset, length) list for a concatenated-P6 stream (the format
    ``ffmpeg -f image2pipe -vcodec ppm`` emits). P6 frames are
    self-delimiting: the header carries w×h, so each frame's byte length is
    known without touching pixel data."""
    frames, pos = [], 0
    while pos < len(payload):
        w, h, pixel_end = _ppm_header(payload, pos)
        length = (pixel_end - pos) + w * h * 3
        if length <= 0:
            raise ValueError(f"non-advancing frame at byte {pos}")  # unreachable belt+braces
        if pos + length > len(payload):
            raise ValueError(f"truncated frame at byte {pos}")
        frames.append((pos, length))
        pos += length
    return frames


def sample_video_frames(
    media: DataFrame, every_n: int = 1, deterministic_fake: bool = False
) -> DataFrame:
    """REAL video frame sampling for PPM streams: split the payload into
    self-delimiting P6 frames (mapInPandas, Arrow batches) and emit every
    ``every_n``-th frame as an IMAGE row — which then flows through
    extract_features / resize_images like any other image. Container formats
    (mp4 etc.) still need a real demuxer and raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "kind", "mime", "width", "height", "duration_ms", "payload")}
            for mid, mime, p, dur in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"], pdf["duration_ms"]
            ):
                raw = bytes(p) if p is not None else b""
                if not (mime == PPM_STREAM_MIME or raw[:2] == b"P6"):
                    if deterministic_fake:
                        # plumbing stand-in (same contract as the siblings'
                        # fake paths): one seeded 8x8 frame per second of
                        # declared duration, sampled like real frames
                        seed = int.from_bytes(raw[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
                        rng = np.random.default_rng(seed)
                        # a null duration_ms arrives as NaN (truthy!) — int()
                        # on it raises; coerce NaN/None to one frame (ADVICE r3)
                        n_frames = 1 if (dur is None or pd.isna(dur)) else max(int(dur) // 1000, 1)
                        for idx in range(0, n_frames, every_n):
                            frame = encode_ppm(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
                            img = decode_ppm(frame)
                            out["media_id"].append(mid)
                            out["kind"].append("image")
                            out["mime"].append(PPM_MIME)
                            out["width"].append(img.shape[1])
                            out["height"].append(img.shape[0])
                            out["duration_ms"].append(idx)
                            out["payload"].append(frame)
                        continue
                    raise NotImplementedError(
                        f"no demuxer for video mime {mime!r} (PPM streams are native)"
                    )
                for idx, (off, ln) in enumerate(split_ppm_stream(raw)):
                    if idx % every_n:
                        continue
                    frame = raw[off : off + ln]
                    img = decode_ppm(frame)
                    out["media_id"].append(mid)
                    out["kind"].append("image")
                    out["mime"].append(PPM_MIME)
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["duration_ms"].append(idx)  # frame index in this slot
                    out["payload"].append(frame)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .repartition("media_id")
        .mapInPandas(run, MEDIA_SCHEMA)
        .withColumnRenamed("duration_ms", "frame_idx")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) — the
    explode is JVM-side; actual frame decode would flow through
    extract_features on the sliced payloads."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts"),
    )


def resize_plan(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving fit-within-box resize targets, computed JVM-side
    (codegen'd): adds (target_w, target_h, scale). Never upscales."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return media.withColumn("scale", scale).withColumn(
        "target_w", F.floor(F.col("width") * F.col("scale")).cast("int")
    ).withColumn("target_h", F.floor(F.col("height") * F.col("scale")).cast("int"))


def resize_images(
    media: DataFrame,
    max_w: int = 256,
    max_h: int = 256,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Image resize via mapInPandas over Arrow batches. Target geometry is
    real (resize_plan); the resample is REAL for natively decodable formats
    (PPM: decode -> deterministic nearest-neighbor -> re-encode) and raises
    for formats whose decoders this container lacks;
    ``deterministic_fake=True`` keeps the seeded stand-in payloads."""
    planned = resize_plan(media.filter(F.col("kind") == "image"), max_w, max_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p, mime, tw, th in zip(
                pdf["payload"], pdf.get("mime", [None] * len(pdf)),
                pdf["target_w"], pdf["target_h"],
            ):
                raw = p if p is not None else b""
                if deterministic_fake:
                    seed = int.from_bytes(raw[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
                    n = max(int(tw) * int(th) // 8, 1)
                    out_payloads.append(np.random.default_rng(seed).bytes(n))
                else:
                    # real resample: decode (PPM native) -> deterministic
                    # nearest-neighbor -> re-encode
                    img = decode_image(raw, mime)
                    out_payloads.append(encode_ppm(_resize_nearest(img, int(tw), int(th))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "width": pdf["target_w"],
                    "height": pdf["target_h"],
                    "duration_ms": pdf["duration_ms"],
                    "payload": out_payloads,
                }
            )

    return planned.repartition("media_id").mapInPandas(run, MEDIA_SCHEMA)
