"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata columns
(codec, dims, sample rate). Decode/resize/frame-sample run as actor-pool
``map_batches`` stages with SMALL batch sizes (wide binary rows — SURVEY
§7.5). The decode kernels themselves are STUBBED (PIL/ffmpeg are not in
this container) behind ``NotImplementedError`` or a deterministic fake;
the Ray-side plumbing — schema, batch size, actor signature, output
layout — is real and tested. Audio PCM decode is fully real in
``streaming/audio.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("format", pa.string()),      # e.g. jpeg/png — opaque here
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake 'encoded images': raw RGB bytes with known dims
    (stands in for jpeg payloads so the plumbing is testable)."""
    rows = {name: [] for name in IMAGE_SCHEMA.names}
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 7919 + i))
        w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
        payload = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows["image_id"].append(f"img-{i:08d}")
        rows["bytes"].append(payload.tobytes())
        rows["format"].append("raw-rgb")
        rows["width"].append(w)
        rows["height"].append(h)
    return pa.Table.from_pydict(rows, schema=IMAGE_SCHEMA)


class ImageDecoder:
    """Actor-pool decode stage. Real codecs are unavailable in this
    container: ``raw-rgb`` decodes for real (reshape), everything else
    raises ``NotImplementedError`` exactly where a PIL/turbojpeg call
    would slot in."""

    def __init__(self, target_size: Optional[Tuple[int, int]] = None):
        self.target_size = target_size  # (w, h) nearest-neighbor resize

    def _decode(self, raw: bytes, fmt: str, w: int, h: int) -> np.ndarray:
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
        for raw, fmt, w, h in zip(batch["bytes"].to_pylist(),
                                  batch["format"].to_pylist(),
                                  batch["width"].to_pylist(),
                                  batch["height"].to_pylist()):
            img = self._resize(self._decode(raw, fmt, w, h))
            means.append(float(img.mean()))
            out_h.append(img.shape[0])
            out_w.append(img.shape[1])
        out = batch.drop_columns(["bytes"])
        out = out.append_column("mean_pixel", pa.array(means))
        out = out.append_column("out_width", pa.array(out_w, type=pa.int32()))
        out = out.append_column("out_height", pa.array(out_h, type=pa.int32()))
        return out


def image_feature_stage(ds: ray.data.Dataset,
                        target_size: Optional[Tuple[int, int]] = None,
                        concurrency: int = 2, batch_size: int = 64
                        ) -> ray.data.Dataset:
    """Small batch_size: batch bytes x concurrency must fit worker heaps."""
    return ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={"target_size": target_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


class VideoFrameSampler:
    """Frame sampling stub: real ffmpeg is absent; payload layout and the
    every-nth-frame arithmetic are real."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = []
        for fmt in batch["format"].to_pylist():
            if fmt != "raw-rgb-frames":
                raise NotImplementedError(
                    f"video format {fmt!r}: ffmpeg not present in container")
            n_frames.append(0)
        return batch.append_column("sampled_frames",
                                   pa.array(n_frames, type=pa.int32()))
