"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with metadata
columns alongside. ``DecodeStage`` REALLY decodes the formats this
container can handle with pure NumPy + stdlib zlib — PCM16 WAV, 24-bit
uncompressed BMP, and 8-bit truecolor PNG with all five scanline filters
(byte-level RIFF/BMP/PNG codecs below, exercised end-to-end by the
``media_decode`` / ``image_decode`` queries) — and raises
NotImplementedError for codecs (JPEG/MP4/...) that need an
imaging/audio library, unless
constructed with ``fake=True`` (deterministic pseudo-decode keeping the
plumbing testable for those formats).

Actor-pool shape: decode/feature-extract are callable CLASSES passed to
``map_batches(Cls, concurrency=N, batch_size=B)`` — codec init happens
once per actor, not per batch. Batches of large binary rows should be
small (``batch_size`` 32-256) so batch x concurrency fits worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def attach_binary_payload(docs: rd.Dataset) -> rd.Dataset:
    """Demo source: wrap each document's utf-8 bytes as an opaque media
    payload (content: binary) with typed metadata, standing in for real
    image/audio bytes."""

    def to_payload(b: pd.DataFrame) -> pa.Table:
        content = [t.encode("utf-8") for t in b["text"]]
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"], pa.int64()),
                "content": pa.array(content, pa.binary()),
                "media_type": pa.array(["text/plain"] * len(b), pa.string()),
            }
        )

    return docs.map_batches(to_payload, batch_format="pandas")


class MediaMetadata:
    """Actor-pool stage: per-payload metadata (size + checksum).
    Operates only on the binary column — the pattern for any real
    ffprobe/PIL header sniffing stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch["content"].to_pylist()
        n_bytes = np.array([len(c) for c in contents], np.int64)
        checksums = [hashlib.md5(c).hexdigest() for c in contents]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes),
                "checksum": pa.array(checksums, pa.string()),
            }
        )


class DecodeStage:
    """Decode: binary payload → dense float32 frame.

    REAL for the formats this environment can decode with pure NumPy +
    stdlib zlib — PCM16 WAV (``RIFF`` magic → normalized samples in
    [-1, 1)), 24-bit uncompressed BMP (``BM`` magic) and 8-bit truecolor
    PNG (signature magic), both images → grayscale mean(RGB)/255 —
    sniffed per payload by magic bytes.

    Remaining compressed codecs (JPEG/MP4/...) need an imaging/audio library
    not present in this container: an unrecognized payload raises
    NotImplementedError (the documented production integration point)
    unless constructed with ``fake=True``, in which case it produces a
    deterministic pseudo-decode (Philox keyed on the payload checksum)
    with a fixed-shape float32 "frame" so downstream plumbing stays
    testable for those formats too.
    """

    def __init__(self, fake: bool = False, shape: tuple = (8, 8)):
        self.fake = fake
        self.shape = shape

    def _decode_one(self, c: bytes) -> np.ndarray:
        if c[:4] == b"RIFF":
            return (
                decode_pcm16_wav(c).astype(np.float32) / np.float32(32768.0)
            )
        if c[:2] == b"BM":
            img = decode_bmp24(c).astype(np.float32)
            return (img.mean(axis=2) / np.float32(255.0)).ravel()
        if c[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(c).astype(np.float32)
            return (img.mean(axis=2) / np.float32(255.0)).ravel()
        if not self.fake:
            raise NotImplementedError(
                "payload is not WAV/BMP/PNG; other compressed codecs "
                "(JPEG/MP4/...) require an imaging/audio library — "
                "construct DecodeStage(fake=True) for the deterministic "
                "stub on such formats"
            )
        key = int.from_bytes(hashlib.md5(c).digest()[:8], "little")
        rng = np.random.Generator(np.random.Philox(key=[key, 0]))
        return rng.random(int(np.prod(self.shape)), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch["content"].to_pylist()
        frames = [self._decode_one(c) for c in contents]
        flat = (
            np.concatenate(frames)
            if frames
            else np.empty(0, np.float32)
        )
        offsets = np.concatenate(
            ([0], np.cumsum([len(f) for f in frames]))
        ).astype(np.int32)
        frame_col = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat, pa.float32())
        )
        return pa.table({"doc_id": batch["doc_id"], "frame": frame_col})


class ResizeStage:
    """Actor-pool stage: decoded frame → downsampled frame by mean
    pooling (REAL, pure NumPy — resize of an already-decoded dense array
    needs no imaging library; only the codec step is stubbed). Input
    ``frame`` lists are (in_shape) images row-major; output lists are
    (out_shape). in_shape must be an integer multiple of out_shape per
    axis — the cheap exact case; fractional bilinear resize would slot in
    here with the same signature."""

    def __init__(self, in_shape: tuple = (8, 8), out_shape: tuple = (4, 4)):
        if any(i % o for i, o in zip(in_shape, out_shape)):
            raise ValueError(
                f"in_shape {in_shape} not a multiple of out_shape {out_shape}"
            )
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = batch["frame"].combine_chunks()
        n = len(lists)
        ih, iw = self.in_shape
        oh, ow = self.out_shape
        mat = lists.values.to_numpy(zero_copy_only=False).reshape(n, ih, iw)
        # one vectorized mean-pool over the whole batch
        pooled = mat.reshape(n, oh, ih // oh, ow, iw // ow).mean(
            axis=(2, 4), dtype=np.float32
        )
        offsets = np.arange(n + 1, dtype=np.int32) * (oh * ow)
        out_col = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(pooled.ravel(), pa.float32())
        )
        return pa.table({"doc_id": batch["doc_id"], "frame": out_col})


class FrameSampleStage:
    """Actor-pool stage: video-like rows → every k-th frame (REAL, pure
    NumPy). Input schema (doc_id, frames: list<float32>, n_frames:
    int32) where ``frames`` is n_frames consecutive equal-size frame
    vectors; output keeps frames 0, k, 2k, ... per row — the
    deterministic stride sampling a video pipeline runs before feature
    extraction. Rows may have differing n_frames within one batch."""

    def __init__(self, every_k: int = 2):
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.every_k = int(every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = batch["frames"].combine_chunks()
        n_frames = batch["n_frames"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        values = lists.values.to_numpy(zero_copy_only=False)
        row_len = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        frame_size = np.where(
            n_frames > 0, row_len // np.maximum(n_frames, 1), 0
        )
        # per-row kept-frame counts → one flat gather index, no row loop
        kept = np.where(n_frames > 0, (n_frames - 1) // self.every_k + 1, 0)
        row_starts = np.concatenate(([0], np.cumsum(row_len)))[:-1]
        # element index = row_start + (frame_idx*every_k)*frame_size + pos
        out_elems = kept * frame_size
        gather = np.empty(int(out_elems.sum()), np.int64)
        pos = 0
        for i in range(len(n_frames)):  # rows, not elements: O(batch rows)
            fs = int(frame_size[i])
            idx = (
                row_starts[i]
                + (np.arange(kept[i])[:, None] * self.every_k * fs)
                + np.arange(fs)[None, :]
            )
            gather[pos : pos + idx.size] = idx.ravel()
            pos += idx.size
        offsets = np.concatenate(
            ([0], np.cumsum(out_elems))
        ).astype(np.int32)
        out_col = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(values[gather], pa.float32())
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "frames": out_col,
                "n_frames": pa.array(kept.astype(np.int32), pa.int32()),
            }
        )


class FeatureExtract:
    """Actor-pool stage: decoded frame → feature vector (mean/std pooling
    stand-in for a real embedding model; model load would go in
    __init__)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = batch["frame"].combine_chunks()
        n = len(lists)
        dim = len(lists[0]) if n else 0
        mat = lists.values.to_numpy(zero_copy_only=False).reshape(n, dim)
        feats = np.stack(
            [mat.mean(axis=1), mat.std(axis=1), mat.min(axis=1), mat.max(axis=1)],
            axis=1,
        ).astype(np.float32)
        offsets = np.arange(n + 1, dtype=np.int32) * 4
        feat_col = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(feats.ravel(), pa.float32())
        )
        return pa.table({"doc_id": batch["doc_id"], "feature": feat_col})


# --------------------------------------------------------------------------
# REAL pure-NumPy codecs for container-friendly formats (no external
# libs): PCM16 WAV and 24-bit uncompressed BMP. Compressed codecs
# (JPEG/MP4/...) remain the documented NotImplementedError integration
# point in DecodeStage.
# --------------------------------------------------------------------------


def pcm16_wav_bytes(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode a mono int16 sample vector as a standards-conformant
    RIFF/WAVE PCM16 byte string."""
    import struct

    samples = np.ascontiguousarray(samples, dtype="<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_pcm16_wav(b: bytes) -> np.ndarray:
    """Decode a mono PCM16 WAV byte string → int16 sample vector.
    Walks the RIFF chunk list properly (fmt may not precede data
    immediately in arbitrary writers)."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, _rate, _br, _ba, bits = fmt
    if (audio_fmt, channels, bits) != (1, 1, 16):
        raise NotImplementedError(
            f"only mono PCM16 supported, got fmt={fmt}"
        )
    return np.frombuffer(data, dtype="<i2")


def bmp24_bytes(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB image as a 24-bit uncompressed
    BMP (bottom-up rows, BGR, 4-byte row padding)."""
    import struct

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(img[y, :, ::-1].tobytes() + b"\x00" * pad)
    data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    return hdr + info + data


def decode_bmp24(b: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP byte string → (H, W, 3) uint8
    RGB array."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack("<I", b[10:14])
    hdr_size, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", b[14:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (bpp={bpp})")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    flat = np.frombuffer(b, np.uint8, count=stride * abs(h), offset=offset)
    rows = flat.reshape(abs(h), stride)[:, :row_bytes].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def attach_media_payload(
    docs: rd.Dataset, kind: str = "wav", n_samples: int = 256
) -> rd.Dataset:
    """Source stage: attach a REAL deterministic media payload per doc —
    PCM16 WAV (``kind='wav'``, Philox(doc_id)-seeded samples), 24-bit
    BMP (``kind='bmp'``, 8x8 seeded RGB), truecolor PNG
    (``kind='png'``, same seeded RGB through the zlib pipeline, scanline
    filter = doc_id % 5 so every PNG filter ships in real payloads), or
    ``kind='image'`` (BMP/PNG alternating by doc_id parity, exercising
    the decoder's magic sniffing) — so the decode stage exercises
    genuine byte-level codecs end-to-end."""

    def to_payload(b: pd.DataFrame) -> pa.Table:
        contents, mtypes = [], []
        for did in b["doc_id"].to_numpy(np.int64):
            rng = np.random.Generator(np.random.Philox(key=[int(did), 77]))
            if kind == "wav":
                samples = rng.integers(
                    -32768, 32768, size=n_samples, dtype=np.int64
                ).astype(np.int16)
                contents.append(pcm16_wav_bytes(samples))
                mtypes.append("audio/wav")
            else:
                img = rng.integers(
                    0, 256, size=(8, 8, 3), dtype=np.int64
                ).astype(np.uint8)
                use_png = kind == "png" or (kind == "image" and did % 2 == 1)
                if use_png:
                    contents.append(
                        png_bytes(img, filter_type=int(did % 5))
                    )
                    mtypes.append("image/png")
                else:
                    contents.append(bmp24_bytes(img))
                    mtypes.append("image/bmp")
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"], pa.int64()),
                "content": pa.array(contents, pa.binary()),
                "media_type": pa.array(mtypes, pa.string()),
            }
        )

    return docs.map_batches(to_payload, batch_format="pandas", batch_size=256)


# -- PNG (8-bit truecolor, non-interlaced) — zlib is stdlib, so this
# compressed codec IS implementable here: full 5-filter decoder, encoder
# with selectable per-row filter. JPEG/MP4 remain the documented
# NotImplementedError integration point.


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over int16-safe inputs."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where(
        (pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def png_bytes(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W, 3) uint8 RGB image as an 8-bit truecolor PNG.
    ``filter_type`` 0-4 applies that PNG filter to every scanline
    (0=None is the fast path; the others exist so the decoder's filter
    reconstruction is testable against real filtered streams)."""
    import struct
    import zlib

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    bpp = 3
    rows = []
    prev = np.zeros(w * bpp, np.uint8)
    for y in range(h):
        raw = img[y].reshape(-1)
        left = np.concatenate([np.zeros(bpp, np.uint8), raw[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if filter_type == 0:
            filt = raw
        elif filter_type == 1:  # Sub
            filt = raw - left
        elif filter_type == 2:  # Up
            filt = raw - prev
        elif filter_type == 3:  # Average
            filt = raw - (
                (left.astype(np.int16) + prev.astype(np.int16)) // 2
            ).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            filt = raw - _paeth(left, prev, ul)
        else:
            raise ValueError(f"unknown filter {filter_type}")
        rows.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = raw
    idat = zlib.compress(b"".join(rows), 9)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor non-interlaced PNG byte string →
    (H, W, 3) uint8 RGB. Implements all five scanline filters: None/Up
    are vectorized; Sub is three channel-wise cumsums; Average/Paeth
    reconstruct pixel-sequentially along the row (the spec's data
    dependency), vectorized across the 3 channels."""
    import struct
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size  # len + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise NotImplementedError(
            f"only 8-bit truecolor non-interlaced PNG, got {ihdr}"
        )
    data = zlib.decompress(b"".join(idat))
    bpp, stride = 3, w * 3
    if len(data) != h * (stride + 1):
        raise ValueError("bad decompressed length")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = data[y * (stride + 1)]
        row = np.frombuffer(
            data, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: channel-wise cumsum mod 256
            rec = row.reshape(w, bpp)
            rec = (np.cumsum(rec.astype(np.int64), axis=0) % 256).astype(
                np.uint8
            ).reshape(-1)
        elif ft == 2:  # Up
            rec = row + prev  # uint8 wraparound
        elif ft == 3:  # Average
            rec = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.int16)
            for x in range(w):
                up = prev[x * bpp : (x + 1) * bpp].astype(np.int16)
                px = row[x * bpp : (x + 1) * bpp] + (
                    ((left + up) // 2).astype(np.uint8)
                )
                rec[x * bpp : (x + 1) * bpp] = px
                left = px.astype(np.int16)
        elif ft == 4:  # Paeth
            rec = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.uint8)
            ul = np.zeros(bpp, np.uint8)
            for x in range(w):
                up = prev[x * bpp : (x + 1) * bpp]
                px = row[x * bpp : (x + 1) * bpp] + _paeth(left, up, ul)
                rec[x * bpp : (x + 1) * bpp] = px
                left = px
                ul = up
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, 3)
