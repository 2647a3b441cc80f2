"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

Decoders: REAL for every format decodable without external libraries —
binary PGM/PPM and uncompressed 24-bit BMP (pure NumPy), 8-bit
non-interlaced PNG (stdlib ``zlib`` inflate + NumPy unfiltering of all
5 scanline filters), baseline JPEG (from-scratch ITU T.81 codec,
functions/jpegcodec.py), PCM WAV (stdlib ``wave`` + NumPy, with rfft
spectral features), and MJPEG-in-MP4 video (ISO BMFF sample tables via
functions/mp4box.py locate each frame's true byte range; frames that
are baseline JPEG decode to real pixels). Only frames of genuinely
codec-bound video formats (H.264 etc.) fall back to a clearly-marked
deterministic fake, since ffmpeg is not in this container; swapping it
in is a one-function change on the executors. All the Spark-side
plumbing — schemas, Arrow batch shapes, mapInPandas iteration,
partition-size control, the downstream feature pipeline — is identical
either way.

Design rules for 100 TB of media:
- binary payloads never cross a shuffle: metadata is extracted first,
  payloads are processed in place with mapInPandas and dropped;
- Arrow batches stay small (maxRecordsPerBatch already bounded in
  session.py) so one batch of blobs fits executor memory;
- each decode UDF yields per-batch DataFrames — no row-at-a-time Python.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


def decode_pnm(payload: bytes) -> np.ndarray:
    """REAL decoder for binary PGM (P5) / PPM (P6) — pure NumPy.
    Returns a (h, w) uint8 grayscale grid (PPM is channel-averaged)."""
    if not payload.startswith((b"P5", b"P6")):
        raise ValueError("not a binary PNM payload")
    # header: magic, whitespace/comments, width, height, maxval, 1 ws
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    channels = 1 if payload.startswith(b"P5") else 3
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=i)
    if channels == 3:
        pix = pix.reshape(h, w, 3).mean(axis=2).astype(np.uint8)
    else:
        pix = pix.reshape(h, w)
    return pix


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder for uncompressed 24-bit BMP — pure NumPy
    (bottom-up rows, 4-byte row padding, BGR -> grayscale mean)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * abs(h), offset=off)
    rows = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    gray = rows.mean(axis=2).astype(np.uint8)
    return gray[::-1] if h > 0 else gray  # positive height = bottom-up


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for PCM WAV via the stdlib ``wave`` module.
    Returns (mono float64 samples in [-1, 1], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n = wf.getnframes()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        ch = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError("only 8/16-bit PCM WAV supported")
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    return samples, rate


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _unfilter_row(
    f: int, cur: np.ndarray, up: np.ndarray, bpp: int, stride: int
) -> np.ndarray:
    """Undo one PNG scanline filter (shared by decode_png and
    decode_png_channels). Sub is a per-bpp-lane cumulative sum (mod
    distributes over +). Average/Paeth carry a true sequential
    left-dependence (each pixel needs the RECONSTRUCTED left pixel, and
    the floor-divide / predictor-select are non-linear, so no prefix
    trick applies); they run as a flat Python-int loop over lists —
    ~0.1 us/byte — instead of per-pixel NumPy small-array ops whose
    ~us/call dispatch overhead dominated (measured 15-30x slower)."""
    if f == 0:  # None
        rec = cur
    elif f == 2:  # Up
        rec = (cur + up) & 0xFF
    elif f == 1:  # Sub
        rec = (
            (np.cumsum(cur.reshape(-1, bpp), axis=0, dtype=np.int64) & 0xFF)
            .reshape(stride)
            .astype(np.int32)
        )
    elif f in (3, 4):  # Average / Paeth: sequential left-dependence
        cur_l = cur.tolist()
        up_l = up.tolist()
        rec_l = [0] * stride
        if f == 3:
            for j in range(stride):
                a = rec_l[j - bpp] if j >= bpp else 0  # reconstructed left
                rec_l[j] = (cur_l[j] + ((a + up_l[j]) >> 1)) & 0xFF
        else:
            for j in range(stride):
                a = rec_l[j - bpp] if j >= bpp else 0  # left
                b = up_l[j]  # up
                c = up_l[j - bpp] if j >= bpp else 0  # up-left
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec_l[j] = (cur_l[j] + pred) & 0xFF
        rec = np.asarray(rec_l, dtype=np.int32)
    else:
        raise ValueError(f"bad PNG filter {f}")
    return rec.astype(np.uint8)


def decode_png_channels(payload: bytes) -> np.ndarray:
    """Full-channel REAL decoder for non-interlaced 8-bit PNG -> (h, w,
    channels) uint8, stdlib ``zlib`` + NumPy: concatenate IDAT,
    inflate, undo the 5 scanline filters (_unfilter_row). The single
    parse both entry points share — ``decode_png`` collapses the
    result to grayscale for the feature pipeline; the debug-image sink
    roundtrips the actual RGB planes."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        elif ctag == b"IDAT":
            idat += data
        elif ctag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload truncated")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        out[r] = _unfilter_row(
            int(lines[r, 0]),
            lines[r, 1:].astype(np.int32),
            out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32),
            channels,
            stride,
        )
    return out.reshape(h, w, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """Grayscale PNG decode -> (h, w) uint8 for the feature pipeline:
    full-channel decode, then collapse (gray / gray+alpha: the gray
    plane; RGB(A): mean over the color channels, alpha ignored)."""
    grid = decode_png_channels(payload)
    if grid.shape[2] <= 2:  # gray or gray+alpha
        return grid[:, :, 0]
    return grid[:, :, :3].mean(axis=2).astype(np.uint8)


def encode_png_gray(grid: np.ndarray, filter_type: int | None = None) -> bytes:
    """Minimal 8-bit grayscale PNG ENCODER (fixture/test helper): one
    filter type for every row (``filter_type``), or per-row cycling
    through all 5 when None — exercising every unfilter path of
    ``decode_png``."""
    import struct
    import zlib

    g = np.asarray(grid, dtype=np.uint8)
    h, w = g.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        f = (r % 5) if filter_type is None else int(filter_type)
        cur = g[r].astype(np.int32)
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - np.concatenate(([0], cur[:-1]))
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (np.concatenate(([0], cur[:-1])) + prev) // 2
        else:  # Paeth, bpp=1: a=left, b=up, c=up-left
            filt = np.zeros(w, dtype=np.int32)
            for i in range(w):
                a = int(cur[i - 1]) if i else 0
                b = int(prev[i])
                c = int(prev[i - 1]) if (i and r) else 0
                if r == 0:
                    b = c = 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = cur[i] - pred
        raw.append(f)
        raw += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_png_rgb(rgb: np.ndarray, filter_type: int | None = None) -> bytes:
    """8-bit RGB (color type 2) PNG encoder — the debug-image sink's
    writer (reference modules/segmentation_images.py:27-53 saves
    palette-colored segmentation PNGs via matplotlib; here the encoder
    itself is the from-scratch module one). Per-row filter cycling
    like encode_png_gray, generalized to bpp=3 (left neighbor at
    distance 3 bytes per the PNG spec)."""
    import struct
    import zlib

    g = np.asarray(rgb, dtype=np.uint8)
    h, w, ch = g.shape
    if ch != 3:
        raise ValueError("encode_png_rgb expects (h, w, 3)")
    bpp = 3
    stride = w * bpp
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = (r % 5) if filter_type is None else int(filter_type)
        cur = g[r].reshape(stride).astype(np.int32)
        left = np.concatenate((np.zeros(bpp, np.int32), cur[:-bpp]))
        upleft = np.concatenate((np.zeros(bpp, np.int32), prev[:-bpp]))
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth — fully vectorizable on ENCODE (left/up/upleft
            # come from the reconstructed arrays, no sequential dep)
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        raw.append(f)
        raw += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synth_png(i: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic REAL PNG payload (same gradient family as
    synth_pgm, rows filtered with cycling filter types)."""
    yy, xx = np.mgrid[0:h, 0:w]
    grid = ((xx * 7 + yy * 13 + i * 31) % 256).astype(np.uint8)
    return encode_png_gray(grid, filter_type=None)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """FALLBACK DECODER for formats needing codecs this container lacks
    (JPEG/MP4): a deterministic fake grid derived from the payload
    bytes stands in. Replace with
    ``PIL.Image.open(io.BytesIO(payload))`` when PIL is available.
    Raises like a real decoder on empty payloads."""
    if not payload:
        raise NotImplementedError("empty payload; real decoder unavailable in this container")
    seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    reps = int(np.ceil(width * height / len(seed)))
    return np.tile(seed, reps)[: width * height].reshape(height, width)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Dispatch: REAL decode for PNM/BMP/PNG/baseline-JPEG payloads
    (all stdlib+NumPy, see functions/jpegcodec.py for the JPEG scope);
    the documented deterministic fake remains only for genuinely
    codec-bound formats (MP4 frames)."""
    payload = bytes(payload)
    if payload.startswith((b"P5", b"P6")):
        return decode_pnm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        from ..functions.jpegcodec import decode_jpeg

        img = decode_jpeg(payload)
        # grayscale plane for the downstream histogram features
        return img if img.ndim == 2 else np.round(img.mean(axis=-1)).astype(np.uint8)
    return _fake_decode_image(payload, width, height)


def synth_jpeg(i: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic REAL baseline-JPEG payload (gradient family, RGB)."""
    from ..functions.jpegcodec import encode_jpeg

    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            ((yy * 7 + xx * 3 + i) % 256),
            ((yy * 5 + xx * 11 + 2 * i) % 256),
            ((yy * 3 + xx * 13 + 3 * i) % 256),
        ],
        axis=-1,
    ).astype(np.uint8)
    return encode_jpeg(img)


def image_features(media: DataFrame, embed_dim: int = 16) -> DataFrame:
    """Decode -> feature-extract as a mapInPandas pipeline: per batch,
    one pass over the blobs producing a fixed-dim embedding (here:
    histogram moments of the fake-decoded grid — deterministic)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "n_bytes": [], "sha256": [], "embedding": []}
            for mid, payload, w, h in zip(
                b["media_id"], b["payload"], b["width"], b["height"]
            ):
                grid = decode_image(payload, int(w or 16), int(h or 16))
                hist = np.histogram(grid, bins=embed_dim, range=(0, 256))[0]
                emb = (hist / max(grid.size, 1)).astype(np.float32)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload))
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                out["embedding"].append(emb.tolist())
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(extract, IMAGE_FEATURES)


RESIZED = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixels", ArrayType(IntegerType(), False), False),
    ]
)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Decode -> nearest-neighbor resize (NumPy strided sampling)."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, payload, w, h in zip(
                b["media_id"], b["payload"], b["width"], b["height"]
            ):
                grid = decode_image(payload, int(w or 16), int(h or 16))
                yi = (np.arange(out_h) * grid.shape[0] // out_h).clip(0, grid.shape[0] - 1)
                xi = (np.arange(out_w) * grid.shape[1] // out_w).clip(0, grid.shape[1] - 1)
                small = grid[np.ix_(yi, xi)]
                rows["media_id"].append(mid)
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["pixels"].append(small.reshape(-1).astype(np.int32).tolist())
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(rz, RESIZED)


FRAMES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_sha256", StringType(), False),
        StructField("t_ms", DoubleType(), True),
        StructField("frame_bytes", IntegerType(), True),
    ]
)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling (1 -> N expansion inside mapInPandas). For MP4
    payloads the sampling is REAL: the ISO BMFF sample tables
    (functions/mp4box.py) give each frame's true byte range and decode
    time, and the digest is of the ACTUAL frame bytes sliced from
    mdat — no codec needed for extraction. Non-container payloads keep
    the documented deterministic fake (digest of payload+index); only
    pixel DECODE of the extracted frames stays codec-bound."""
    from ..functions.mp4box import extract_frames, is_mp4

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {
                "media_id": [],
                "frame_idx": [],
                "frame_sha256": [],
                "t_ms": [],
                "frame_bytes": [],
            }
            for mid, payload, dur in zip(b["media_id"], b["payload"], b["duration_ms"]):
                payload = bytes(payload)
                if is_mp4(payload):
                    for i, fb, t in extract_frames(payload, every_ms):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(i)
                        rows["frame_sha256"].append(hashlib.sha256(fb).hexdigest())
                        rows["t_ms"].append(float(t))
                        rows["frame_bytes"].append(len(fb))
                    continue
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                n = max(dur // every_ms, 1)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_sha256"].append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "little")).hexdigest()
                    )
                    rows["t_ms"].append(None)
                    rows["frame_bytes"].append(None)
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(frames, FRAMES)


def synth_mp4(
    i: int,
    n_frames: int = 6,
    frame_ms: int = 500,
    w: int = 16,
    h: int = 16,
    uniform: bool = False,
) -> bytes:
    """Deterministic REAL MJPEG-in-MP4 payload: every sample is a real
    baseline-JPEG frame (functions/jpegcodec.encode_jpeg) muxed with
    true ISO BMFF sample tables — both the container walk AND the frame
    pixel decode downstream are real.

    ``uniform=True`` plants one constant luma per frame
    (``frame_luma(i, k)``): uniform grids roundtrip the codec EXACTLY
    (DC-only blocks, verified for all 256 values in pytest), so an
    independent oracle can state the decoded pixel values analytically
    — the basis of the video golden-table contract. Default (gradient)
    frames exercise the full AC path and are checked by PSNR/roundtrip
    pytest instead."""
    from ..functions.jpegcodec import encode_jpeg
    from ..functions.mp4box import encode_mp4

    samples = []
    for k in range(n_frames):
        if uniform:
            frame = np.full((h, w), frame_luma(i, k), dtype=np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            frame = ((yy * 7 + xx * 3 + i * 31 + k * 11) % 256).astype(np.uint8)
        samples.append(encode_jpeg(frame))
    return encode_mp4(samples, sample_dur_ms=frame_ms)


def frame_luma(i: int, k: int) -> int:
    """The constant luma planted in frame k of uniform video i."""
    return (i * 37 + k * 53) % 256


VIDEO_FRAME_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t_ms", DoubleType(), True),
        StructField("codec", StringType(), False),  # mjpeg | fake
        StructField("mean_luma", FloatType(), False),
        StructField("std_luma", FloatType(), False),
    ]
)


def video_frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling + PIXEL decode (1 -> N expansion inside
    mapInPandas): MP4 sample tables give each sampled frame's byte
    range; frames that are baseline JPEG decode through the real T.81
    codec (codec='mjpeg'); anything else — non-container payloads or
    codec-bound frames (H.264 etc.) — takes the documented
    deterministic fake (codec='fake'). Payloads never shuffle: features
    are computed in place and the blobs dropped."""
    from ..functions.mp4box import extract_frames, is_mp4

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k.name: [] for k in VIDEO_FRAME_FEATURES.fields}

            def emit(mid, idx, t, codec, grid):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(idx)
                rows["t_ms"].append(t)
                rows["codec"].append(codec)
                rows["mean_luma"].append(np.float32(grid.mean()))
                rows["std_luma"].append(np.float32(grid.std()))

            for mid, payload, dur, wd, ht in zip(
                b["media_id"], b["payload"], b["duration_ms"], b["width"], b["height"]
            ):
                payload = bytes(payload)
                if is_mp4(payload):
                    for idx, fb, t in extract_frames(payload, every_ms):
                        grid = None
                        if fb.startswith(b"\xff\xd8"):
                            try:
                                grid = decode_image(fb, 0, 0)
                            except (ValueError, IndexError, struct.error):
                                # SOI signature but not baseline-
                                # decodable (progressive/12-bit/
                                # corrupt/truncated): the documented
                                # fake, not a failed task. The from-
                                # scratch codec does raw byte indexing,
                                # so a truncated payload can surface as
                                # IndexError/struct.error rather than
                                # ValueError.
                                grid = None
                        if grid is not None:
                            emit(mid, idx, float(t), "mjpeg", grid)
                        else:
                            w0 = int(wd) if wd and not pd.isna(wd) else 8
                            h0 = int(ht) if ht and not pd.isna(ht) else 8
                            emit(
                                mid, idx, float(t), "fake",
                                _fake_decode_image(fb, w0, h0),
                            )
                    continue
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                n = max(dur // every_ms, 1)
                for idx in range(n):
                    w0 = int(wd) if wd and not pd.isna(wd) else 8
                    h0 = int(ht) if ht and not pd.isna(ht) else 8
                    grid = _fake_decode_image(
                        payload + idx.to_bytes(4, "little"), w0, h0
                    )
                    emit(mid, idx, None, "fake", grid)
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(
        frames, VIDEO_FRAME_FEATURES
    )


AUDIO_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("duration_ms", IntegerType(), False),
        StructField("rms", FloatType(), False),
        StructField("zero_cross_rate", FloatType(), False),
        StructField("dominant_hz", FloatType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


def audio_features(media: DataFrame, embed_dim: int = 8) -> DataFrame:
    """REAL audio feature extraction over WAV payloads (stdlib wave +
    NumPy): RMS, zero-crossing rate, dominant frequency via rfft, and
    log-band FFT energies as the embedding — the same mapInPandas batch
    shape a torchaudio pipeline would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "media_id": [], "sample_rate": [], "duration_ms": [],
                "rms": [], "zero_cross_rate": [], "dominant_hz": [],
                "embedding": [],
            }
            for mid, payload in zip(b["media_id"], b["payload"]):
                samples, rate = decode_wav(bytes(payload))
                n = len(samples)
                rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
                zcr = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if n > 1 else 0.0
                spec = np.abs(np.fft.rfft(samples))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                dom = float(freqs[int(spec[1:].argmax()) + 1]) if n > 2 else 0.0
                # log-spaced band energies, L1-normalized
                edges = np.unique(
                    np.geomspace(1, len(spec) - 1, embed_dim + 1).astype(int)
                )
                bands = np.add.reduceat(spec, edges[:-1])
                emb = (bands / max(bands.sum(), 1e-12)).astype(np.float32)
                emb = np.pad(emb, (0, embed_dim - len(emb)))[:embed_dim]
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(int(n * 1000 / rate))
                out["rms"].append(rms)
                out["zero_cross_rate"].append(zcr)
                out["dominant_hz"].append(dom)
                out["embedding"].append(emb.tolist())
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").mapInPandas(extract, AUDIO_FEATURES)


def synth_pgm(i: int, w: int = 16, h: int = 16) -> bytes:
    """Deterministic REAL binary PGM payload (diagonal gradient + i)."""
    yy, xx = np.mgrid[0:h, 0:w]
    grid = ((xx * 7 + yy * 13 + i * 31) % 256).astype(np.uint8)
    return b"P5 %d %d 255\n" % (w, h) + grid.tobytes()


def synth_wav(i: int, rate: int = 8000, ms: int = 250) -> bytes:
    """Deterministic REAL 16-bit PCM WAV payload (pure tone, frequency
    varies with i)."""
    import io
    import wave

    n = rate * ms // 1000
    freq = 200.0 + (i % 10) * 100.0
    t = np.arange(n) / rate
    samples = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic media fixture (seed-free: pure function of i)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 4
            payload, mime = synth_pgm(i, w, h), "image/x-portable-graymap"
        elif kind == "audio":
            w = h = None
            payload, mime = synth_wav(i), "audio/wav"
        elif i % 12 == 11:  # opaque non-container video: exercises the
            # documented fake fallback (no ftyp -> duration-based frames)
            w = h = None
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4)
            mime = "video/x-opaque"
        else:  # REAL MJPEG-in-MP4, duration matching the metadata column
            w = h = None
            payload = synth_mp4(i, n_frames=3 * (i % 7 + 1), frame_ms=500)
            mime = "video/mp4"
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                mime,
                w,
                h,
                (i % 7 + 1) * 1500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
