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

All three stages are BATCH-vectorized over the binary column's flat Arrow
buffer (``_binary_np`` zero-copy view + index arithmetic): header parse,
byte stats, resize gather and frame slicing each run as a handful of numpy
ops per batch, not per row (parity-pinned against the naive per-row decode
in tests).  The only per-row loop left is sha256 (inherently per-payload,
C-speed, reading memoryview slices).
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


def _pil_image_module():
    """PIL.Image if importable, else None — probed once per actor in the
    stage __init__ (never per batch/row)."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None
    return Image


def _decode_payload(buf: bytes, mode: str,
                    pil=None) -> tuple[int, int, bytes]:
    """One payload -> (width, height, raster bytes).

    ``mode="pil"`` decodes real image formats through PIL when the library
    is present (grayscale raster, so the output contract matches the SRIM
    body layout exactly) — the production swap-in, behind the same
    interface, lighting up without code changes in a container that ships
    PIL.  Per-row callers pass the actor's probed module via ``pil`` so the
    probe stays once-per-actor.  ``mode="strict"`` keeps the loudly-marked
    stub for containers without any codec.  ``mode="fake"`` parses the
    deterministic SRIM header (tests)."""
    if mode == "pil":
        Image = pil if pil is not None else _pil_image_module()
        if Image is None:
            raise NotImplementedError(
                "decode='pil' requires PIL, which is not installed in this "
                "container; use decode='fake' for the deterministic test "
                "decoder"
            )
        import io

        img = Image.open(io.BytesIO(buf)).convert("L")
        return img.width, img.height, img.tobytes()
    if mode == "strict":
        raise NotImplementedError(
            "real image decode requires PIL/libvips (not in this container); "
            "use decode='fake' for the deterministic test decoder, or "
            "decode='pil' where PIL is installed"
        )
    magic, w, h = HEADER.unpack_from(buf)
    if magic != MAGIC:
        raise ValueError("bad payload header")
    return w, h, buf[HEADER.size :]


def _binary_np(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy view of a binary column: (flat bytes, row starts, row ends).

    The whole batch's payload bytes stay one contiguous uint8 view — every
    stage below does its per-row math with index arithmetic on this buffer
    instead of materializing Python bytes objects."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    if len(col) == 0 or bufs[1] is None:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=np.uint8), z, z
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    return data, off[:-1], off[1:]


def _binary_from_ragged(flat: np.ndarray, lens: np.ndarray) -> pa.Array:
    """Binary array from a flat uint8 buffer + per-row lengths (no Python
    bytes objects).  int32 offsets bound one batch to <2 GiB of payload —
    the small-batch sizing for wide payloads guarantees that."""
    total = int(lens.sum())
    if total >= 2**31:
        raise ValueError("batch payload exceeds 2 GiB; lower batch_size")
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.binary(), len(lens),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(flat[:total]).tobytes())],
    )


def _parse_headers(data: np.ndarray, starts: np.ndarray,
                   ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized SRIM header parse: (width, height) per row, magic checked
    batch-wide."""
    if len(starts) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if ((ends - starts) < HEADER.size).any():
        raise ValueError("bad payload header")
    magic = np.frombuffer(MAGIC, dtype=np.uint8)
    for j in range(4):
        if not (data[starts + j] == magic[j]).all():
            raise ValueError("bad payload header")

    def be32(off: int) -> np.ndarray:
        return (
            (data[starts + off].astype(np.int64) << 24)
            | (data[starts + off + 1].astype(np.int64) << 16)
            | (data[starts + off + 2].astype(np.int64) << 8)
            | data[starts + off + 3].astype(np.int64)
        )

    return be32(4), be32(8)


class MediaFeatures:
    """Actor-pool stage: decode -> (dims, byte stats, sha-based fake feature).

    One instance per actor; any heavyweight model/codec state would be
    loaded here in ``__init__`` (the ST2 pattern of SURVEY.md §2.3).
    """

    def __init__(self, decode: str = "fake", feature_dim: int = 8):
        self.decode = decode
        self.dim = feature_dim
        self._pil = None
        if decode == "pil":
            # probe the real codec ONCE per actor (the ST2 init slot where
            # model/codec state belongs); fails fast and loud if absent
            self._pil = _pil_image_module()
            if self._pil is None:
                raise NotImplementedError(
                    "decode='pil' requires PIL in the worker environment")

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decode == "strict":
            _decode_payload(b"", "strict")  # raises the stub error
        data, starts, ends = _binary_np(t["payload"])
        if self.decode == "pil":
            # real codec path: decode is inherently per-payload (compressed
            # formats), reading memoryview slices of the flat buffer
            mv = memoryview(data)
            n = len(starts)
            w = np.empty(n, dtype=np.int64)
            h = np.empty(n, dtype=np.int64)
            mean = np.empty(n, dtype=np.float64)
            for i in range(n):
                wi, hi, body = _decode_payload(
                    bytes(mv[starts[i]:ends[i]]), "pil", pil=self._pil)
                w[i], h[i] = wi, hi
                arr = np.frombuffer(body, dtype=np.uint8)
                mean[i] = float(arr.mean()) if len(arr) else 0.0
        else:
            w, h = _parse_headers(data, starts, ends)
            # batch-wide mean via one prefix sum over the flat byte buffer:
            # body sum per row = csum[end] - csum[body_start]
            csum = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, dtype=np.int64, out=csum[1:])
            body_starts = starts + HEADER.size
            n_body = ends - body_starts
            body_sum = csum[ends] - csum[body_starts]
            mean = np.where(n_body > 0, body_sum / np.maximum(n_body, 1), 0.0)
        # per-row sha256 stays a loop (hashing is inherently per-payload and
        # C-speed) but reads memoryview slices of the flat buffer — no
        # Python bytes materialization of the payload column
        mv = memoryview(data)
        feats = np.empty((len(starts), self.dim), dtype=np.float32)
        for i in range(len(starts)):
            digest = hashlib.sha256(mv[starts[i]:ends[i]]).digest()
            feats[i] = (
                np.frombuffer(digest[: self.dim * 4], dtype=np.uint32)
                .astype(np.float32) / np.float32(2**32)
            )
        return pa.table(
            {
                "media_id": t["media_id"],
                "width": pa.array(w, type=pa.int64()),
                "height": pa.array(h, type=pa.int64()),
                "n_bytes": pa.array(ends - starts, type=pa.int64()),
                "mean_byte": pa.array(mean, type=pa.float64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float32()), self.dim
                ).cast(pa.list_(pa.float32())),
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
        if self.decode == "strict":
            _decode_payload(b"", "strict")
        data, starts, ends = _binary_np(t["payload"])
        n = len(starts)
        w, h = _parse_headers(data, starts, ends)
        if n == 0:
            return pa.table({"media_id": t["media_id"],
                             "payload": pa.array([], type=pa.binary())})
        # ONE gather for the whole batch: flat source index for every output
        # pixel of every image (n, out_h, out_w)
        ys = np.minimum((self.fy[None, :] * h[:, None]).astype(np.int64),
                        (h - 1)[:, None])                    # (n, out_h)
        xs = np.minimum((self.fx[None, :] * w[:, None]).astype(np.int64),
                        (w - 1)[:, None])                    # (n, out_w)
        body_starts = starts + HEADER.size
        idx = (body_starts[:, None, None]
               + ys[:, :, None] * w[:, None, None]
               + xs[:, None, :])
        small = data[idx].reshape(n, self.out_h * self.out_w)
        # constant-size outputs: one flat buffer, uniform offsets
        hdr = np.frombuffer(HEADER.pack(MAGIC, self.out_w, self.out_h),
                            dtype=np.uint8)
        out = np.empty((n, HEADER.size + small.shape[1]), dtype=np.uint8)
        out[:, : HEADER.size] = hdr
        out[:, HEADER.size:] = small
        lens = np.full(n, out.shape[1], dtype=np.int64)
        return pa.table(
            {
                "media_id": t["media_id"],
                "payload": _binary_from_ragged(out.ravel(), lens),
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
        data, starts, ends = _binary_np(t["payload"])
        w, h = _parse_headers(data, starts, ends)
        # frames per image -> ragged expansion (repeat + cumsum-offset), then
        # ONE ragged gather builds the whole frame_bytes column
        n_frames = -(-h // self.stride)  # ceil(h / stride)
        row_of = np.repeat(np.arange(len(starts), dtype=np.int64), n_frames)
        tot = int(n_frames.sum())
        frame = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
        ) * self.stride
        src_starts = starts[row_of] + HEADER.size + frame * w[row_of]
        lens = w[row_of]
        nbytes = int(lens.sum())
        base = np.repeat(src_starts, lens)
        within = (
            np.arange(nbytes, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        flat = data[base + within]
        return pa.table(
            {
                "media_id": t["media_id"].take(pa.array(row_of)),
                "frame": pa.array(frame, type=pa.int64()),
                "frame_bytes": _binary_from_ragged(flat, lens),
            }
        )
