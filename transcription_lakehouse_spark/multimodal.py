"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas`` kernels.

All three decode legs are REAL, pure numpy, no codec libs:
:func:`decode_wav` (RIFF/PCM audio) feeds :func:`wav_feature_extractor`
and :func:`audio_stats`; :func:`decode_bmp`/:func:`encode_bmp` (BI_RGB
BMP) feed :func:`image_feature_extractor`, :func:`image_stats` and a
real ``resize_fn`` for :func:`resize_media`; and
:func:`decode_avi`/:func:`encode_avi` (uncompressed RIFF/AVI, 24-bit DIB
frames) feed :func:`video_stats`, frame sampling with REAL frame payloads
(:func:`sample_frames` with ``attach_frames=True``) and
:func:`video_frame_features`, which reuses the image extractor over
sampled frames. Compressed containers (MP4/H.264, JPEG, MP3) fail loudly
— swapping in PIL/torchvision/ffmpeg outside this container is a
one-argument ``decode_fn``/``resize_fn`` change; :func:`fake_decode`
remains the deterministic plumbing-test double.

Design for 100 TB: binary payloads stay columnar in parquet; metadata
predicates (media_type, width, duration) push down so decode only touches
selected rows; ``maxRecordsPerBatch`` bounds per-batch memory for large
blobs; feature extraction emits fixed-size float arrays that feed the
operators/similarity.py ANN path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "extract_features",
    "resize_media",
    "sample_frames",
    "fake_decode",
    "decode_wav",
    "wav_feature_extractor",
    "audio_stats",
    "decode_bmp",
    "encode_bmp",
    "bmp_resize_fn",
    "image_feature_extractor",
    "image_stats",
    "encode_avi",
    "decode_avi",
    "video_stats",
    "video_frame_features",
]

# typed metadata + opaque payload — the multimodal column convention
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("codec", StringType(), True),
    ]
)


def media_table(df: DataFrame) -> DataFrame:
    """Validate/coerce a DataFrame into the MEDIA_SCHEMA column set."""
    cols = {f.name for f in MEDIA_SCHEMA.fields}
    missing = cols - set(df.columns)
    if missing:
        raise ValueError(f"media table missing columns: {sorted(missing)}")
    return df.select(*[f.name for f in MEDIA_SCHEMA.fields])


def fake_decode(payload: bytes, dim: int = 32) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded feature
    vector. Replace with a real decode+embed (PIL / torchvision / librosa)
    outside this container."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype("float32")
    return v / (np.linalg.norm(v) or 1.0)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL audio decode, pure numpy — RIFF/WAVE container parse + PCM
    payload decode to a mono float64 waveform in [-1, 1]. Returns
    (sample_rate, samples). Supports PCM u8 / s16 / s32 (format 1) and
    IEEE float32/64 (format 3); multi-channel is averaged to mono. This
    closes the audio leg of the multimodal decode seam without external
    codec libs (the image and video legs close in decode_bmp/decode_avi)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) < csize:
            raise ValueError(
                f"decode_wav: truncated {cid!r} chunk "
                f"(declared {csize} bytes, {len(body)} present)"
            )
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("decode_wav: truncated fmt chunk")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "n_channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("decode_wav: missing fmt or data chunk")
    ch, bits, af = fmt["n_channels"], fmt["bits"], fmt["audio_format"]
    if ch < 1:
        raise ValueError("decode_wav: zero channels")
    if fmt["sample_rate"] < 1:
        raise ValueError("decode_wav: zero sample rate")
    if af == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif af == 1 and bits == 8:
        x = (np.frombuffer(data, dtype="u1").astype(np.float64) - 128.0) / 128.0
    elif af == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    elif af == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif af == 3 and bits == 64:
        x = np.frombuffer(data, dtype="<f8").astype(np.float64)
    else:
        raise ValueError(f"decode_wav: unsupported format={af} bits={bits}")
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
    return fmt["sample_rate"], x


def wav_feature_extractor(dim: int = 32) -> Callable[[bytes], np.ndarray]:
    """A real `decode_fn` for :func:`extract_features`: fixed-size acoustic
    feature vector = [duration_sec, rms, zero_crossing_rate] + (dim-3)
    log-energy bands of the magnitude spectrum (equal-width rFFT pooling —
    a mel-less filterbank that needs only numpy). Deterministic; silence
    yields zero energy bands, and a pure tone peaks in the band holding
    its frequency."""
    if dim < 4:
        raise ValueError("wav_feature_extractor: dim must be >= 4")

    def fn(payload: bytes) -> np.ndarray:
        sr, x = decode_wav(payload)
        if len(x) == 0:
            return np.zeros(dim, dtype=np.float64)
        duration = len(x) / sr
        rms = float(np.sqrt((x * x).mean()))
        zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if len(x) > 1 else 0.0
        mag = np.abs(np.fft.rfft(x))
        n_bands = dim - 3
        # pool |spectrum| into equal-width bands; log1p compresses range
        edges = np.linspace(0, len(mag), n_bands + 1).astype(int)
        bands = np.array(
            [
                np.log1p(mag[a:b].sum()) if b > a else 0.0
                for a, b in zip(edges[:-1], edges[1:])
            ]
        )
        return np.concatenate(([duration, rms, zcr], bands))

    return fn


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode, pure numpy — Windows BMP (BI_RGB, uncompressed)
    to an (H, W, 3) uint8 RGB array. Supports 24-bit BGR, 32-bit BGRA
    (alpha dropped), and 8-bit paletted payloads; bottom-up (positive
    height) and top-down (negative height) row order; 4-byte row padding.
    This closes the image leg of the multimodal decode seam without
    external codec libs (the video leg closes in decode_avi)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("decode_bmp: not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"decode_bmp: unsupported DIB header size {hdr_size}")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise ValueError(f"decode_bmp: only BI_RGB supported, got {compression}")
    if width <= 0 or height == 0:
        raise ValueError(f"decode_bmp: bad dimensions {width}x{height}")
    top_down = height < 0
    h = abs(height)
    row_bytes = (width * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    end = data_off + stride * h
    if end > len(payload):
        raise ValueError("decode_bmp: truncated pixel array")
    rows = np.frombuffer(payload[data_off:end], dtype="u1").reshape(h, stride)
    if bpp == 24:
        px = rows[:, : width * 3].reshape(h, width, 3)[:, :, ::-1]  # BGR→RGB
    elif bpp == 32:
        px = rows[:, : width * 4].reshape(h, width, 4)[:, :, 2::-1]  # BGRA→RGB
    elif bpp == 8:
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], dtype="u1"
        ).reshape(-1, 4)[:, 2::-1]  # BGRX→RGB
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("decode_bmp: palette index out of range")
        px = pal[idx]
    else:
        raise ValueError(f"decode_bmp: unsupported bpp {bpp}")
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit BI_RGB BMP writer (bottom-up, rows padded to 4 bytes) — the
    inverse of :func:`decode_bmp` for round-trip tests and for re-encoding
    after a real in-container resize."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp: expected (H, W, 3) uint8")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    pixel_bytes = rows.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(pixel_bytes)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel_bytes).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")  # 72 DPI
        + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return header + pixel_bytes


def bmp_resize_fn(payload: bytes, target_w: int, target_h: int) -> bytes:
    """A REAL ``resize_fn`` for :func:`resize_media`: decode → nearest-
    neighbor index resize (pure numpy, deterministic) → re-encode 24-bit.
    Nearest-neighbor keeps the transform exactly reproducible across
    platforms (no float filter kernels)."""
    px = decode_bmp(payload)
    h, w = px.shape[:2]
    yi = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    xi = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return encode_bmp(px[yi][:, xi])


def _luma(px: np.ndarray) -> np.ndarray:
    """Rec.601 luminance in [0, 1] from (H, W, 3) uint8."""
    x = px.astype(np.float64) / 255.0
    return 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]


def image_feature_extractor(dim: int = 32) -> Callable[[bytes], np.ndarray]:
    """A real ``decode_fn`` for :func:`extract_features`: fixed-size image
    feature vector = [width, height, aspect, mean_luma, std_luma,
    edge_density] + (dim-6)-bin luminance histogram (mass-normalized).
    Deterministic physics: a solid-color image has zero std/edges and all
    histogram mass in one bin; a half-black/half-white image splits it."""
    if dim < 8:
        raise ValueError("image_feature_extractor: dim must be >= 8")

    def fn(payload: bytes) -> np.ndarray:
        px = decode_bmp(payload)
        h, w = px.shape[:2]
        y = _luma(px)
        gy = np.abs(np.diff(y, axis=0)).mean() if h > 1 else 0.0
        gx = np.abs(np.diff(y, axis=1)).mean() if w > 1 else 0.0
        n_bins = dim - 6
        hist, _ = np.histogram(y, bins=n_bins, range=(0.0, 1.0))
        hist = hist / max(y.size, 1)
        return np.concatenate(
            (
                [
                    float(w),
                    float(h),
                    w / h,
                    float(y.mean()),
                    float(y.std()),
                    float(gy + gx),
                ],
                hist,
            )
        )

    return fn


def audio_stats(media: DataFrame) -> DataFrame:
    """Per-clip audio quality stats over the binary column — the audio twin
    of the text quality battery: (media_id, sample_rate, n_samples,
    duration_sec, rms, peak, clipping_ratio, silence_ratio). Arrow-batched
    mapInPandas over the real WAV decoder; metadata predicates
    (media_type = 'audio') prune before any payload is decoded."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, x = decode_wav(payload)
                n = len(x)
                ax = np.abs(x)
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": sr,
                        "n_samples": n,
                        "duration_sec": n / sr if sr else 0.0,
                        "rms": float(np.sqrt((x * x).mean())) if n else 0.0,
                        "peak": float(ax.max()) if n else 0.0,
                        "clipping_ratio": float((ax >= 0.999).mean()) if n else 0.0,
                        "silence_ratio": float((ax < 1e-4).mean()) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", "payload")
        .mapInPandas(
            kernel,
            schema=(
                "media_id string, sample_rate long, n_samples long, "
                "duration_sec double, rms double, peak double, "
                "clipping_ratio double, silence_ratio double"
            ),
        )
    )


def image_stats(media: DataFrame) -> DataFrame:
    """Per-image quality stats over the binary column — the image twin of
    the text/audio quality batteries: (media_id, width, height, n_pixels,
    mean_luma, std_luma, dark_ratio, bright_ratio, edge_density).
    Arrow-batched mapInPandas over the real BMP decoder; metadata
    predicates (media_type = 'image') prune before any payload decodes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(payload)
                h, w = px.shape[:2]
                y = _luma(px)
                gy = np.abs(np.diff(y, axis=0)).mean() if h > 1 else 0.0
                gx = np.abs(np.diff(y, axis=1)).mean() if w > 1 else 0.0
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_pixels": h * w,
                        "mean_luma": float(y.mean()),
                        "std_luma": float(y.std()),
                        "dark_ratio": float((y < 0.1).mean()),
                        "bright_ratio": float((y > 0.9).mean()),
                        "edge_density": float(gy + gx),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            kernel,
            schema=(
                "media_id string, width long, height long, n_pixels long, "
                "mean_luma double, std_luma double, dark_ratio double, "
                "bright_ratio double, edge_density double"
            ),
        )
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 32,
) -> DataFrame:
    """Arrow-batched feature extraction: (media_id, media_type, features).

    ``decode_fn=None`` raises NotImplementedError semantics per-row only if
    a real decoder is requested elsewhere; here it falls back to
    :func:`fake_decode` so plumbing is testable in-container.
    """
    fn = decode_fn or fake_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p).tolist()[:dim] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema="media_id string, media_type string, features array<float>"
    )


def resize_media(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize: (media_id, payload, width, height) with
    payload resized to (target_w, target_h).

    Pass :func:`bmp_resize_fn` for the REAL in-container path (pure-numpy
    BMP decode → nearest-neighbor → re-encode). ``resize_fn=None`` still
    raises NotImplementedError per batch for non-BMP corpora — a
    PIL-backed ``resize_fn`` drops in unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resize_fn is None:
                raise NotImplementedError(
                    "resize_media: pass resize_fn=(payload, w, h) -> payload "
                    "(bmp_resize_fn for BMP corpora; PIL for everything else)"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        resize_fn(p, target_w, target_h) for p in pdf["payload"]
                    ],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            kernel,
            schema="media_id string, payload binary, width long, height long",
        )
    )


def encode_avi(frames: np.ndarray, fps: float = 25.0) -> bytes:
    """REAL video encode, pure numpy — uncompressed RIFF/AVI ('vids'/'DIB '
    stream, 24-bit BI_RGB '00db' frames, bottom-up BGR rows padded to 4
    bytes, exactly the BMP pixel-array layout). The inverse of
    :func:`decode_avi` for round-trip tests and corpus generation — the
    video twin of :func:`encode_bmp`/the WAV generator."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3 or arr.shape[0] == 0:
        raise ValueError("encode_avi: expected (N, H, W, 3) uint8 with N >= 1")
    if fps <= 0:
        raise ValueError("encode_avi: fps must be positive")
    n, h, w = arr.shape[:3]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((n, h, stride), dtype=np.uint8)
    rows[:, :, : w * 3] = arr[:, ::-1, :, ::-1].reshape(n, h, w * 3)  # RGB→BGR, bottom-up
    frame_bytes = [rows[i].tobytes() for i in range(n)]
    frame_size = stride * h
    scale, rate = 1000, int(round(fps * 1000))

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    def u32(x: int) -> bytes:
        return int(x).to_bytes(4, "little")

    avih = b"".join(
        [
            u32(round(1_000_000 * scale / rate)),  # dwMicroSecPerFrame
            u32(frame_size * rate // scale),  # dwMaxBytesPerSec
            u32(0),  # dwPaddingGranularity
            u32(0),  # dwFlags
            u32(n),  # dwTotalFrames
            u32(0),  # dwInitialFrames
            u32(1),  # dwStreams
            u32(frame_size),  # dwSuggestedBufferSize
            u32(w),
            u32(h),
            u32(0) * 4,  # dwReserved
        ]
    )
    strh = b"".join(
        [
            b"vids",
            b"DIB ",
            u32(0),  # dwFlags
            (0).to_bytes(2, "little") * 2,  # wPriority, wLanguage
            u32(0),  # dwInitialFrames
            u32(scale),
            u32(rate),
            u32(0),  # dwStart
            u32(n),  # dwLength (frames)
            u32(frame_size),  # dwSuggestedBufferSize
            u32(0),  # dwQuality
            u32(0),  # dwSampleSize
            (0).to_bytes(2, "little") * 2  # rcFrame left, top
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little"),
        ]
    )
    strf = b"".join(
        [
            u32(40), u32(w), u32(h),
            (1).to_bytes(2, "little"), (24).to_bytes(2, "little"),
            u32(0),  # BI_RGB
            u32(frame_size),
            u32(2835), u32(2835), u32(0), u32(0),
        ]
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def decode_avi(payload: bytes) -> tuple[float, np.ndarray]:
    """REAL video decode, pure numpy — uncompressed RIFF/AVI to
    (fps, (N, H, W, 3) uint8 RGB). Supports the 'vids' stream with BI_RGB
    24-bit '00db'/'00dc' frames (bottom-up BGR padded rows — the BMP pixel
    layout); anything compressed fails loudly. This closes the video leg of
    the multimodal decode seam (the last decode stub): the same honesty
    standard as :func:`decode_wav`/:func:`decode_bmp` — no codec libs, and
    no pretending about compressed formats."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("decode_avi: not a RIFF/AVI payload")
    scale = rate = None
    w = h = bpp = None
    compression = 0
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal scale, rate, w, h, bpp, compression
        pos, n = 0, len(buf)
        while pos + 8 <= n:
            cid = buf[pos : pos + 4]
            csize = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + csize]
            if len(body) < csize:
                raise ValueError(
                    f"decode_avi: truncated {cid!r} chunk "
                    f"(declared {csize} bytes, {len(body)} present)"
                )
            if cid == b"LIST":
                walk(body[4:])  # skip the 4-byte list kind
            elif cid == b"strh":
                if body[:4] == b"vids":
                    scale = int.from_bytes(body[20:24], "little")
                    rate = int.from_bytes(body[24:28], "little")
            elif cid == b"strf" and w is None:
                w = int.from_bytes(body[4:8], "little", signed=True)
                h = int.from_bytes(body[8:12], "little", signed=True)
                bpp = int.from_bytes(body[14:16], "little")
                compression = int.from_bytes(body[16:20], "little")
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frames.append(body)
            pos += 8 + csize + (csize & 1)  # chunks are word-aligned

    walk(payload[12:])
    if scale in (None, 0) or not rate:
        raise ValueError("decode_avi: missing or zero-rate 'vids' stream header")
    if w is None or w <= 0 or h is None or h == 0:
        raise ValueError(f"decode_avi: bad dimensions {w}x{h}")
    if compression != 0:
        raise ValueError(f"decode_avi: only BI_RGB supported, got {compression}")
    if bpp != 24:
        raise ValueError(f"decode_avi: unsupported bpp {bpp}")
    if not frames:
        raise ValueError("decode_avi: no frame chunks in movi list")
    top_down = h < 0
    hh = abs(h)
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), hh, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames):
        if len(fb) < stride * hh:
            raise ValueError(f"decode_avi: frame {i} truncated")
        rows = np.frombuffer(fb[: stride * hh], dtype="u1").reshape(hh, stride)
        px = rows[:, : w * 3].reshape(hh, w, 3)[:, :, ::-1]  # BGR→RGB
        out[i] = px if top_down else px[::-1]
    return rate / scale, out


def video_stats(media: DataFrame) -> DataFrame:
    """Per-clip video quality stats over the binary column — the video twin
    of the audio/image batteries: (media_id, n_frames, fps, duration_sec,
    width, height, mean_luma, motion, n_scene_cuts). ``motion`` is the mean
    absolute luma delta between consecutive frames (0 for a static clip);
    a scene cut is a frame pair whose mean luma delta exceeds 0.3.
    Arrow-batched mapInPandas over the real AVI decoder; metadata
    predicates (media_type = 'video') prune before any payload decodes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fps, fr = decode_avi(payload)
                n, h, w = fr.shape[:3]
                lum = (
                    0.299 * fr[:, :, :, 0].astype(np.float64)
                    + 0.587 * fr[:, :, :, 1]
                    + 0.114 * fr[:, :, :, 2]
                ) / 255.0
                deltas = (
                    np.abs(np.diff(lum, axis=0)).mean(axis=(1, 2))
                    if n > 1
                    else np.zeros(0)
                )
                rows.append(
                    {
                        "media_id": mid,
                        "n_frames": n,
                        "fps": fps,
                        "duration_sec": n / fps,
                        "width": w,
                        "height": h,
                        "mean_luma": float(lum.mean()),
                        "motion": float(deltas.mean()) if len(deltas) else 0.0,
                        "n_scene_cuts": int((deltas > 0.3).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .mapInPandas(
            kernel,
            schema=(
                "media_id string, n_frames long, fps double, "
                "duration_sec double, width long, height long, "
                "mean_luma double, motion double, n_scene_cuts long"
            ),
        )
    )


def sample_frames(
    media: DataFrame, every_sec: float = 1.0, attach_frames: bool = False
) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp.

    Default (``attach_frames=False``): the pure-column-math PLAN — frame
    indices from metadata ``duration_sec``, no payload touched (the cheap
    path when downstream only needs timestamps).

    ``attach_frames=True``: Arrow-batched decode of the AVI payload; each
    sampled row carries the REAL frame re-encoded as a standalone BMP
    (``frame_payload``), so every image operator (:func:`image_stats`,
    :func:`image_feature_extractor`, :func:`bmp_resize_fn`) composes
    directly over video frames. Sampled index = floor(t·fps) clamped to the
    last frame; duration comes from the decoded stream, not metadata."""
    if every_sec <= 0:
        raise ValueError("sample_frames: every_sec must be positive")
    vids = media.filter(F.col("media_type") == "video")
    if not attach_frames:
        frames = vids.select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(F.col("duration_sec") / every_sec).cast("long"),
                )
            ).alias("frame_idx"),
        )
        return frames.withColumn("frame_time_sec", F.col("frame_idx") * every_sec)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "frame_idx": [], "frame_time_sec": [],
                "frame_payload": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fps, fr = decode_avi(payload)
                n = fr.shape[0]
                duration = n / fps
                k = 0
                while k * every_sec < duration:
                    idx = min(int(k * every_sec * fps), n - 1)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_time_sec"].append(k * every_sec)
                    out["frame_payload"].append(encode_bmp(fr[idx]))
                    k += 1
            yield pd.DataFrame(out)

    return vids.select("media_id", "payload").mapInPandas(
        kernel,
        schema=(
            "media_id string, frame_idx long, frame_time_sec double, "
            "frame_payload binary"
        ),
    )


def video_frame_features(
    media: DataFrame, every_sec: float = 1.0, dim: int = 32
) -> DataFrame:
    """Per-sampled-frame image features for video corpora: sample real
    frames (:func:`sample_frames` with payloads attached), then reuse the
    image leg's :func:`image_feature_extractor` unchanged over the BMP
    frame payloads — one composed Arrow pipeline, no new kernel logic."""
    frames = sample_frames(media, every_sec, attach_frames=True)
    as_media = frames.select(
        F.concat_ws("#", "media_id", F.col("frame_idx").cast("string")).alias(
            "media_id"
        ),
        F.lit("image").alias("media_type"),
        F.col("frame_payload").alias("payload"),
    )
    return extract_features(as_media, decode_fn=image_feature_extractor(dim), dim=dim)
