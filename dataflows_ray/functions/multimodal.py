"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns (codec, dims, sample rate). Decode/resize/frame-sample run as
actor-pool ``map_batches`` stages with SMALL batch sizes (wide binary
rows — SURVEY §7.5).

Round 2: the decode path is REAL for library-free formats, mirroring
what ``streaming/audio.py`` does with PCM —

- ``ppm``: binary netpbm P6 (a real standard image format any image
  tool opens) encoded/decoded here with pure numpy: header parse,
  pixel-buffer reshape, nearest-neighbor resize, channel/luma features;
- ``raw-rgb``: headerless pixel buffer with dims from metadata columns;
- ``rawvideo``: ffmpeg ``-f rawvideo``-layout concatenated RGB frames;
  frame sampling really slices every-nth frame and computes per-frame
  features.

Round 3 adds REAL ``png`` and ``jpeg`` codecs:

- ``png`` (W3C PNG spec; stdlib ``zlib`` + numpy): chunk parse with CRC
  verification, IDAT inflate, all five scanline filters
  (None/Sub/Up/Average/Paeth) on decode, 8-bit color types
  gray/RGB/palette/RGBA (alpha dropped, gray replicated to RGB);
- ``jpeg`` (ITU-T T.81 baseline; see ``functions/jpeg.py``): full
  encoder + decoder, 4:4:4 and 4:2:0, per-image optimal Huffman tables.

The one remaining compressed stub is h264/mp4 video, which genuinely
needs an external codec — ``NotImplementedError`` marks exactly where
the ffmpeg call would slot in; the surrounding Ray plumbing (schema,
batch size, actor signature, output layout) is identical either way.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("format", pa.string()),      # ppm / raw-rgb decode; jpeg/png stubbed
    ("width", pa.int32()),
    ("height", pa.int32()),
])


# ---------------------------------------------------------------------------
# PPM (netpbm P6) codec — a real image format, no libraries required
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Handles whitespace and
    ``#`` comment lines in the header per the netpbm spec."""
    if raw[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":  # comment to end of line
            pos = raw.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(raw, dtype=np.uint8,
                         count=h * w * 3, offset=pos).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# PNG codec — W3C PNG spec (public), stdlib zlib + numpy only
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 -> PNG (8-bit truecolor, no interlace).

    ``filter_type`` applies one scanline filter to every row (0=None is
    the fast path; 1/2/3/4 exist mainly so tests exercise every decode
    unfilter branch with self-produced data)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = img.reshape(h, w * 3).astype(np.int64)
    prev = np.zeros(w * 3, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        cur = rows[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:    # Sub
            left = np.concatenate([np.zeros(3, np.int64), cur[:-3]])
            filt = (cur - left) % 256
        elif filter_type == 2:    # Up
            filt = (cur - prev) % 256
        elif filter_type == 3:    # Average
            left = np.concatenate([np.zeros(3, np.int64), cur[:-3]])
            filt = (cur - (left + prev) // 2) % 256
        elif filter_type == 4:    # Paeth
            left = np.concatenate([np.zeros(3, np.int64), cur[:-3]])
            ul = np.concatenate([np.zeros(3, np.int64), prev[:-3]])
            filt = (cur - _paeth(left, prev, ul)) % 256
        else:
            raise ValueError(f"bad filter {filter_type}")
        out.append(filter_type)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = cur
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (PNG spec §6.6)."""
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def decode_png(raw: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8. Supports 8-bit gray (0), RGB (2),
    palette (3), RGBA (6, alpha dropped); all five scanline filters;
    no interlace. CRC-checked chunk walk, stdlib zlib inflate."""
    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    plte = None
    ihdr = None
    while pos < len(raw):
        (length,) = struct.unpack(">I", raw[pos:pos + 4])
        tag = raw[pos + 4:pos + 8]
        payload = raw[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", raw[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + payload) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt_m, interlace = ihdr
    if depth != 8 or comp != 0 or filt_m != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, comp={comp})")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    data = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    rb = w * channels                      # bytes per scanline (post-filter)
    data = data.reshape(h, rb + 1)
    ftypes = data[:, 0]
    scan = data[:, 1:].astype(np.int64)
    out = np.empty((h, rb), dtype=np.int64)
    prev = np.zeros(rb, dtype=np.int64)
    bpp = channels
    for y in range(h):
        cur = scan[y]
        f = ftypes[y]
        if f == 0:
            row = cur
        elif f == 1:      # Sub: within-row prefix sum at bpp stride
            row = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(rb) % 256
        elif f == 2:      # Up
            row = (cur + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential in x
            row = np.empty(rb, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                s = x * bpp
                up = prev[s:s + bpp]
                if f == 3:
                    pred = (left + up) // 2
                else:
                    ul = (prev[s - bpp:s] if x else
                          np.zeros(bpp, dtype=np.int64))
                    pred = _paeth(left, up, ul)
                left = (cur[s:s + bpp] + pred) % 256
                row[s:s + bpp] = left
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = row
        prev = row
    px = out.astype(np.uint8).reshape(h, w, channels)
    if ctype == 2:
        return px
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])   # drop alpha
    if ctype == 0:
        return np.repeat(px, 3, axis=2)              # gray -> RGB
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    return plte[px[:, :, 0]]                         # ctype 3


def synth_image_table(n: int, seed: int = 42, fmt: str = "ppm") -> pa.Table:
    """Deterministic synthetic images encoded as real binary PPM (or as
    headerless ``raw-rgb``): gradient + per-image sinusoid pattern, so
    features vary smoothly and decode errors are visible."""
    rows = {name: [] for name in IMAGE_SCHEMA.names}
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 7919 + i))
        w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 255 // max(1, w - 1)).astype(np.uint8)
        phase = float(rng.random()) * 2 * np.pi
        wave = (127 + 120 * np.sin(yy / 3.0 + phase)).astype(np.uint8)
        noise = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        img = np.stack([base, wave, noise], axis=2)
        rows["image_id"].append(f"img-{i:08d}")
        if fmt == "mixed":      # alternate real containers per image
            row_fmt = "png" if i % 3 == 2 else "ppm"
        elif fmt == "mixed-jpeg":  # lossy mix: all three real containers
            row_fmt = ("jpeg", "png", "ppm")[i % 3]
        else:
            row_fmt = fmt
        if row_fmt == "ppm":
            rows["bytes"].append(encode_ppm(img))
        elif row_fmt == "png":
            rows["bytes"].append(encode_png(img, filter_type=i % 5))
        elif row_fmt == "jpeg":
            from .jpeg import encode_jpeg
            rows["bytes"].append(encode_jpeg(
                img, quality=90, subsampling=("444", "420")[i % 2]))
        else:
            rows["bytes"].append(img.tobytes())
        rows["format"].append(row_fmt)
        rows["width"].append(w)
        rows["height"].append(h)
    return pa.Table.from_pydict(rows, schema=IMAGE_SCHEMA)


class ImageDecoder:
    """Actor-pool decode stage: real decode for ppm/raw-rgb,
    ``NotImplementedError`` where a PIL/turbojpeg call would slot in.
    Emits per-image features: mean pixel, per-channel means, 8-bin luma
    histogram (normalized)."""

    def __init__(self, target_size: Optional[Tuple[int, int]] = None):
        self.target_size = target_size  # (w, h) nearest-neighbor resize

    def _decode(self, raw: bytes, fmt: str, w: int, h: int) -> np.ndarray:
        if fmt == "ppm":
            return decode_ppm(raw)
        if fmt == "png":
            return decode_png(raw)
        if fmt == "jpeg":
            from .jpeg import decode_jpeg
            return decode_jpeg(raw)
        if fmt == "raw-rgb":
            return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        raise NotImplementedError(
            f"image format {fmt!r}: decoder library not present; "
            "plug PIL.Image.open here")

    def _resize(self, img: np.ndarray) -> np.ndarray:
        if self.target_size is None:
            return img
        tw, th = self.target_size
        ys = (np.arange(th) * img.shape[0] // th)
        xs = (np.arange(tw) * img.shape[1] // tw)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, out_w, out_h = [], [], []
        ch_means = [[], [], []]
        histos = []
        for raw, fmt, w, h in zip(batch["bytes"].to_pylist(),
                                  batch["format"].to_pylist(),
                                  batch["width"].to_pylist(),
                                  batch["height"].to_pylist()):
            img = self._resize(self._decode(raw, fmt, w, h))
            means.append(float(img.mean()))
            for c in range(3):
                ch_means[c].append(float(img[:, :, c].mean()))
            luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                    + 0.114 * img[:, :, 2])
            hist, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
            histos.append((hist / max(1, luma.size)).astype(np.float32))
            out_h.append(img.shape[0])
            out_w.append(img.shape[1])
        out = batch.drop_columns(["bytes"])
        out = out.append_column("mean_pixel", pa.array(means))
        for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
            out = out.append_column(name, pa.array(ch_means[c]))
        out = out.append_column(
            "luma_hist", pa.array([h.tolist() for h in histos],
                                  type=pa.list_(pa.float32())))
        out = out.append_column("out_width", pa.array(out_w, type=pa.int32()))
        out = out.append_column("out_height", pa.array(out_h, type=pa.int32()))
        return out


import functools


@functools.lru_cache(maxsize=4)
def _cached_image_decoder(target_size):
    return ImageDecoder(target_size=target_size)


def _elastic_decode(batch, target_size=None):
    """Module-level (picklable) stateless decode with a per-process
    cached decoder."""
    return _cached_image_decoder(target_size)(batch)


def image_feature_stage(ds: ray.data.Dataset,
                        target_size: Optional[Tuple[int, int]] = None,
                        concurrency: Optional[int] = 2,
                        batch_size: int = 64) -> ray.data.Dataset:
    """Small batch_size: batch bytes x concurrency must fit worker heaps.
    ``concurrency=None`` runs ELASTIC stateless tasks with a per-process
    cached decoder — the right setting when the decode dominates the
    pipeline (a pinned pool caps throughput at pool size while the rest
    of the session idles)."""
    if concurrency is None:
        from functools import partial
        return ds.map_batches(partial(_elastic_decode,
                                      target_size=target_size),
                              batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={"target_size": target_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


VIDEO_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("bytes", pa.binary()),
    ("format", pa.string()),      # rawvideo decodes; mp4/h264 stubbed
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])


def synth_video_table(n: int, seed: int = 99,
                      format_mix: Optional[tuple] = None) -> pa.Table:
    """Deterministic synthetic clips in ffmpeg ``-f rawvideo`` layout
    (or MJPEG/AVI via ``format_mix``): concatenated (h, w, 3) uint8 RGB
    frames, brightness ramping over time so per-frame features are
    distinguishable. The format draw comes LAST so the clip CONTENT is
    identical whatever the container."""
    rows = {name: [] for name in VIDEO_SCHEMA.names}
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 6007 + i))
        w, h = int(rng.integers(8, 16)), int(rng.integers(8, 16))
        nf = int(rng.integers(5, 24))
        t = np.arange(nf, dtype=np.float64)[:, None, None, None]
        base = rng.integers(0, 128, size=(1, h, w, 3)).astype(np.float64)
        clip = np.clip(base + t * (127.0 / max(1, nf - 1)),
                       0, 255).astype(np.uint8)
        fmt = "rawvideo" if not format_mix else \
            format_mix[int(rng.integers(0, len(format_mix)))]
        rows["video_id"].append(f"vid-{i:08d}")
        rows["bytes"].append(encode_mjpeg_avi(clip) if fmt == "mjpeg"
                             else clip.tobytes())
        rows["format"].append(fmt)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(nf)
    return pa.Table.from_pydict(rows, schema=VIDEO_SCHEMA)


class VideoFrameSampler:
    """Every-nth-frame sampling over ``rawvideo`` and ``mjpeg`` (AVI)
    payloads — REAL frame slicing. rawvideo: one reshape + stride view
    per clip, no copies of unsampled frames. mjpeg: RIFF demux is pure
    offset arithmetic, then ONLY the sampled frames are JPEG-decoded
    (the whole point of sampling a compressed stream). Inter-frame
    codecs (h264/vp9) raise — they genuinely need external decoders.
    Emits the sampled-frame count and per-sampled-frame mean
    brightness."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n
        from .jpeg import decode_jpeg       # import once per actor
        self._decode_jpeg = decode_jpeg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_sampled, frame_means = [], []
        for raw, fmt, w, h, nf in zip(batch["bytes"].to_pylist(),
                                      batch["format"].to_pylist(),
                                      batch["width"].to_pylist(),
                                      batch["height"].to_pylist(),
                                      batch["n_frames"].to_pylist()):
            if fmt == "rawvideo":
                frames = np.frombuffer(raw, dtype=np.uint8) \
                    .reshape(nf, h, w, 3)[::self.every_n]
            elif fmt == "mjpeg":
                jpegs, jw, jh = parse_mjpeg_avi(raw)
                if (jw, jh, len(jpegs)) != (w, h, nf):
                    raise ValueError(
                        f"AVI header mismatch: container says "
                        f"{jw}x{jh}x{len(jpegs)}, metadata {w}x{h}x{nf}")
                frames = np.stack([self._decode_jpeg(j)
                                   for j in jpegs[::self.every_n]])
            else:
                raise NotImplementedError(
                    f"video format {fmt!r}: inter-frame codecs need "
                    "external decoders (documented boundary)")
            n_sampled.append(len(frames))
            frame_means.append(frames.mean(axis=(1, 2, 3))
                               .astype(np.float32).tolist())
        out = batch.drop_columns(["bytes"])
        out = out.append_column("sampled_frames",
                                pa.array(n_sampled, type=pa.int32()))
        out = out.append_column("frame_means",
                                pa.array(frame_means,
                                         type=pa.list_(pa.float32())))
        return out


def video_sample_stage(ds: ray.data.Dataset, every_n: int = 10,
                       concurrency: int = 2, batch_size: int = 16
                       ) -> ray.data.Dataset:
    """Video payloads are the widest rows in the engine — batch_size is
    deliberately tiny so batch bytes x concurrency fits worker heaps."""
    return ds.map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


# --- MJPEG video in an AVI/RIFF container ----------------------------
# Round 5: real COMPRESSED video handling without external codecs —
# MJPEG (per-frame baseline JPEG, functions/jpeg.py) muxed into a
# standard AVI file (Microsoft RIFF spec: hdrl/avih/strl/strh/strf +
# movi '00dc' chunks + idx1). Any mainstream player opens these. The
# h264/mp4 boundary remains (inter-frame codecs genuinely need
# external libraries); MJPEG closes the intra-frame half of it.

def encode_mjpeg_avi(frames: np.ndarray, fps: int = 25,
                     quality: int = 90) -> bytes:
    """(n_frames, h, w, 3) uint8 RGB -> MJPEG-in-AVI bytes."""
    from .jpeg import encode_jpeg
    nf, h, w, _ = frames.shape
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(nf)]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    max_sz = max((len(j) for j in jpegs), default=0)
    avih = struct.pack("<14I", 1_000_000 // fps, max_sz * fps, 0,
                       0x10, nf, 0, 1, max_sz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<10I4H", 0, 0, 0, 1, fps,
                                            0, nf, max_sz, 0xFFFFFFFF,
                                            0, 0, 0, w, h))
    strf = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)   # 'MJPG' biCompression
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = [chunk(b"00dc", j) for j in jpegs]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the 'movi' fourcc position (the
    # widely-implemented convention): first chunk sits at offset 4
    idx_entries = []
    off = 4
    for j, c in zip(jpegs, movi_chunks):
        idx_entries.append(b"00dc" + struct.pack("<3I", 0x10, off, len(j)))
        off += len(c)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_mjpeg_avi(raw: bytes):
    """AVI bytes -> (list of per-frame JPEG payloads, width, height).

    RIFF chunk walk: dims come from the strf BITMAPINFOHEADER; frames
    are the '00dc'/'00db' chunks inside LIST movi. The demux is pure
    offset arithmetic — sampling every nth frame never touches (let
    alone decodes) the frames in between, which is the point of frame
    sampling over a compressed stream."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    w = h = None
    jpegs = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h
        while pos + 8 <= end:
            cid = raw[pos:pos + 4]
            size = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"strf" and size >= 24:
                _, w, h = struct.unpack("<I2i", raw[body_start:
                                                    body_start + 12])
            elif cid in (b"00dc", b"00db"):
                jpegs.append(raw[body_start:body_start + size])
            pos = body_start + size + (size & 1)

    walk(12, len(raw))
    if w is None:
        raise ValueError("AVI stream missing strf header")
    return jpegs, int(w), int(abs(h))
