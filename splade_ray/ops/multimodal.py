"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata columns next to them.  The Ray-side plumbing — schema, actor-pool
stages, small-batch sizing for wide payloads, output layout — is real and
tested; the actual codec work (JPEG decode, resampling) is STUBBED because
the image/audio libraries are not in this container:

  * ``decode=\"strict\"``  -> NotImplementedError (clearly marked stub)
  * ``decode=\"fake\"``    -> deterministic fake decoder that parses our own
    12-byte header (magic ``SRIM`` + width + height) — enough to exercise
    the full pipeline deterministically.

Production swap-in: replace ``_decode_payload`` with PIL/libvips inside the
same actor class; nothing else changes.  Batches stay ``pyarrow`` end to end
(binary columns don't round-trip pandas cleanly) and ``batch_size`` is kept
small because payload bytes dominate block size (ray_guide: memory-aware).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"SRIM"
HEADER = struct.Struct(">4sII")  # magic, width, height

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | ...
        ("payload", pa.binary()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: SRIM-headed binary payloads."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads = [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        body = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        ids.append(i)
        kinds.append("image")
        payloads.append(HEADER.pack(MAGIC, w, h) + body)
    return pa.table(
        {"media_id": pa.array(ids, type=pa.int64()),
         "kind": pa.array(kinds),
         "payload": pa.array(payloads, type=pa.binary())}
    )


def _decode_payload(buf: bytes, mode: str) -> tuple[int, int, bytes]:
    if mode == "strict":
        raise NotImplementedError(
            "real image decode requires PIL/libvips (not in this container); "
            "use decode='fake' for the deterministic test decoder"
        )
    magic, w, h = HEADER.unpack_from(buf)
    if magic != MAGIC:
        raise ValueError("bad payload header")
    return w, h, buf[HEADER.size :]


class MediaFeatures:
    """Actor-pool stage: decode -> (dims, byte stats, sha-based fake feature).

    One instance per actor; any heavyweight model/codec state would be
    loaded here in ``__init__`` (the ST2 pattern of SURVEY.md §2.3).
    """

    def __init__(self, decode: str = "fake", feature_dim: int = 8):
        self.decode = decode
        self.dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {
            "media_id": [], "width": [], "height": [], "n_bytes": [],
            "mean_byte": [], "feature": [],
        }
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            w, h, body = _decode_payload(payload, self.decode)
            arr = np.frombuffer(body, dtype=np.uint8)
            digest = hashlib.sha256(payload).digest()
            feat = (
                np.frombuffer(digest[: self.dim * 4], dtype=np.uint32)
                .astype(np.float32)
                / np.float32(2**32)
            )
            out["media_id"].append(mid)
            out["width"].append(w)
            out["height"].append(h)
            out["n_bytes"].append(len(payload))
            out["mean_byte"].append(float(arr.mean()) if len(arr) else 0.0)
            out["feature"].append(feat.tolist())
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], type=pa.int64()),
                "width": pa.array(out["width"], type=pa.int64()),
                "height": pa.array(out["height"], type=pa.int64()),
                "n_bytes": pa.array(out["n_bytes"], type=pa.int64()),
                "mean_byte": pa.array(out["mean_byte"], type=pa.float64()),
                "feature": pa.array(out["feature"], type=pa.list_(pa.float32())),
            }
        )


def media_features(ds, *, decode: str = "fake", concurrency: int = 2,
                   batch_size: int = 64):
    """Feature-extraction pipeline over a media Dataset (small batches: the
    binary payload dominates memory, ray_guide 'Memory-aware')."""
    return ds.map_batches(
        MediaFeatures, fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


class MediaResize:
    """Resize stage: nearest-neighbor downsample of the fake raster to a
    fixed (out_w, out_h), re-emitting a valid SRIM payload.  The index math
    is real and vectorized (one fancy-index gather per image); a production
    build swaps the sampler line for PIL/vips inside the same actor."""

    def __init__(self, out_w: int = 16, out_h: int = 16, decode: str = "fake"):
        self.out_w, self.out_h = out_w, out_h
        self.decode = decode
        # precomputed per-actor state (ST2): target sampling grid fractions
        self.fy = (np.arange(out_h) + 0.5) / out_h
        self.fx = (np.arange(out_w) + 0.5) / out_w

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_payload = [], []
        for mid, payload in zip(t["media_id"].to_pylist(),
                                t["payload"].to_pylist()):
            w, h, body = _decode_payload(payload, self.decode)
            arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w)
            ys = np.minimum((self.fy * h).astype(np.int64), h - 1)
            xs = np.minimum((self.fx * w).astype(np.int64), w - 1)
            small = arr[np.ix_(ys, xs)]
            out_id.append(mid)
            out_payload.append(
                HEADER.pack(MAGIC, self.out_w, self.out_h) + small.tobytes()
            )
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "payload": pa.array(out_payload, type=pa.binary()),
            }
        )


def media_resize(ds, *, out_w: int = 16, out_h: int = 16,
                 concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        MediaResize, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


class FrameSampler:
    """Video-style frame sampling stub: emits every ``stride``-th row of the
    payload body as a 'frame' row (flat_map-shaped: more rows out than in)."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_frame, out_bytes = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            w, h, body = _decode_payload(payload, "fake")
            for f in range(0, h, self.stride):
                out_id.append(mid)
                out_frame.append(f)
                out_bytes.append(body[f * w : (f + 1) * w])
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame": pa.array(out_frame, type=pa.int64()),
                "frame_bytes": pa.array(out_bytes, type=pa.binary()),
            }
        )
