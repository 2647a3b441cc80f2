"""ISO BMFF (MP4) container parsing — stdlib ``struct`` only.

The engine's video path previously derived frame digests from a fake.
Extracting the actual per-frame BYTE RANGES from an MP4 needs no codec
at all — it is pure container parsing (ISO/IEC 14496-12 box walk +
sample tables):

- ``mp4_samples``: moov/trak/mdia/minf/stbl walk; decode times from
  ``stts``, sizes from ``stsz``, chunk layout from ``stsc`` +
  ``stco``/``co64`` -> absolute (offset, size, t_ms) per sample.
- ``encode_mp4``: minimal single-track muxer (one chunk, run-length
  stts) for fixtures/tests.

DECODING the frame bytes to pixels (H.264 etc.) is genuinely
codec-bound and remains out of scope — the extraction stage, which is
what the Spark pipeline shuffles and digests, is real.
"""

from __future__ import annotations

import struct


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + tag + payload


def _full(tag: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def encode_mp4(
    samples: list[bytes], sample_dur_ms: int = 1000, timescale: int = 1000
) -> bytes:
    """Minimal valid single-track MP4: ftyp + mdat(samples) + moov with
    real sample tables (one chunk holding all samples)."""
    if not samples:
        raise ValueError("need at least one sample")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    data_off = len(ftyp) + 8  # absolute offset of first sample byte
    dur = sample_dur_ms * len(samples) * timescale // 1000

    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 8 << 16, 8 << 16),
        flags=7,
    )
    mdhd = _full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0)
    )
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00")
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    # generic sample entry ('raw ' fourcc, no codec config)
    entry = struct.pack(">I", 86) + b"raw " + b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry[: 86])
    dur_units = sample_dur_ms * timescale // 1000
    stts = _full(b"stts", struct.pack(">III", 1, len(samples), dur_units))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", struct.pack(">II", 1, data_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box structure")
        yield tag, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, tag: bytes):
    for t, s, e in _walk(data, start, end):
        if t == tag:
            return s, e
    return None


def is_mp4(payload: bytes) -> bool:
    return len(payload) > 12 and payload[4:8] == b"ftyp"


def mp4_samples(payload: bytes) -> list[tuple[int, int, float]]:
    """-> [(abs_offset, size, t_ms)] for every sample of the first
    video (or only) track, from the container's own sample tables."""
    try:
        return _mp4_samples(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed MP4 stream: {e}") from e


def _mp4_samples(payload: bytes) -> list[tuple[int, int, float]]:
    if not is_mp4(payload):
        raise ValueError("not an MP4 payload (no ftyp)")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    # prefer the video track (hdlr handler 'vide'); fall back to the
    # first trak with sample tables when no handler says video
    traks = [(ts, te) for tag, ts, te in _walk(payload, *moov) if tag == b"trak"]

    def _handler(ts: int, te: int) -> bytes:
        mdia = _find(payload, ts, te, b"mdia")
        if mdia is None:
            return b""
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None:
            return b""
        return payload[hdlr[0] + 8 : hdlr[0] + 12]

    traks.sort(key=lambda t: _handler(*t) != b"vide")
    for ts, te in traks:
        mdia = _find(payload, ts, te, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(payload, *mdia, b"mdhd")
        minf_box = _find(payload, *mdia, b"minf")
        if mdhd is None or minf_box is None:
            raise ValueError("MP4 trak missing mdhd/minf")
        version = payload[mdhd[0]]
        if version == 1:
            timescale = struct.unpack(">I", payload[mdhd[0] + 20 : mdhd[0] + 24])[0]
        else:
            timescale = struct.unpack(">I", payload[mdhd[0] + 12 : mdhd[0] + 16])[0]
        if timescale == 0:
            # would otherwise ZeroDivisionError at the t_ms conversion,
            # escaping the ValueError wrapping policy of mp4_samples
            raise ValueError("MP4 mdhd timescale is zero")
        stbl = _find(payload, *minf_box, b"stbl")
        if stbl is None:
            raise ValueError("MP4 trak missing stbl")

        def full(tag4: bytes):
            r = _find(payload, *stbl, tag4)
            return None if r is None else (r[0] + 4, r[1])  # skip version/flags

        stts = full(b"stts")
        stsz = full(b"stsz")
        stsc = full(b"stsc")
        stco = full(b"stco")
        co64 = full(b"co64")
        if None in (stts, stsz, stsc) or (stco is None and co64 is None):
            raise ValueError("MP4 track missing sample tables")

        # sizes
        dflt, count = struct.unpack(">II", payload[stsz[0] : stsz[0] + 8])
        if dflt:
            sizes = [dflt] * count
        else:
            sizes = list(
                struct.unpack(
                    f">{count}I", payload[stsz[0] + 8 : stsz[0] + 8 + 4 * count]
                )
            )
        # decode times
        (n_ent,) = struct.unpack(">I", payload[stts[0] : stts[0] + 4])
        times = []
        t = 0
        p = stts[0] + 4
        for _ in range(n_ent):
            cnt, delta = struct.unpack(">II", payload[p : p + 8])
            for _ in range(cnt):
                times.append(t * 1000.0 / timescale)
                t += delta
            p += 8
        # chunk offsets
        if stco is not None:
            (n_ch,) = struct.unpack(">I", payload[stco[0] : stco[0] + 4])
            offsets = list(
                struct.unpack(
                    f">{n_ch}I", payload[stco[0] + 4 : stco[0] + 4 + 4 * n_ch]
                )
            )
        else:
            (n_ch,) = struct.unpack(">I", payload[co64[0] : co64[0] + 4])
            offsets = list(
                struct.unpack(
                    f">{n_ch}Q", payload[co64[0] + 4 : co64[0] + 4 + 8 * n_ch]
                )
            )
        # chunk map: (first_chunk, samples_per_chunk)
        (n_sc,) = struct.unpack(">I", payload[stsc[0] : stsc[0] + 4])
        scs = [
            struct.unpack(">III", payload[stsc[0] + 4 + 12 * i : stsc[0] + 16 + 12 * i])[:2]
            for i in range(n_sc)
        ]
        out = []
        si = 0
        for ci in range(len(offsets)):
            # samples in this chunk per the stsc run covering chunk ci+1
            spc = 0
            for fc, n in scs:
                if fc <= ci + 1:
                    spc = n
            off = offsets[ci]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                out.append((off, sizes[si], times[si] if si < len(times) else 0.0))
                off += sizes[si]
                si += 1
        return out
    raise ValueError("MP4 has no track")


def extract_frames(payload: bytes, every_ms: int = 1000) -> list[tuple[int, bytes, float]]:
    """-> [(frame_idx, frame_bytes, t_ms)]: one sample per every_ms
    bucket (the first whose decode time enters the bucket) — REAL bytes
    sliced from mdat via the sample tables."""
    samples = mp4_samples(payload)
    out = []
    next_t = 0.0
    idx = 0
    for off, size, t in samples:
        if t + 1e-9 >= next_t:
            out.append((idx, payload[off : off + size], t))
            idx += 1
            next_t = (int(t // every_ms) + 1) * every_ms
    return out
