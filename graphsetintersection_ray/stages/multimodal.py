"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with metadata
columns alongside. ``DecodeStage`` REALLY decodes the formats this
container can handle with pure NumPy + stdlib zlib — PCM16 WAV, 24-bit
uncompressed BMP, 8-bit truecolor PNG with all five scanline filters,
and baseline sequential 4:4:4 JPEG (byte-level RIFF/BMP/PNG/JPEG codecs
below, exercised end-to-end by the ``media_decode`` / ``image_decode``
queries) — and raises NotImplementedError for codecs (MP4/...) that
need a media library, unless
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
    [-1, 1)), 24-bit uncompressed BMP (``BM`` magic), 8-bit truecolor
    PNG (signature magic) and baseline sequential 4:4:4 JPEG (SOI+APP
    magic), images → grayscale mean(RGB)/255 — sniffed per payload by
    magic bytes.

    Remaining compressed codecs (MP4/...) need a media library
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
        if c[:3] == b"\xff\xd8\xff":
            img = decode_jpeg(c).astype(np.float32)
            return (img.mean(axis=2) / np.float32(255.0)).ravel()
        if not self.fake:
            raise NotImplementedError(
                "payload is not WAV/BMP/PNG/JPEG; other compressed codecs "
                "(MP4/...) require a media library — construct "
                "DecodeStage(fake=True) for the deterministic stub on "
                "such formats"
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
# (MP4/...) remain the documented NotImplementedError integration
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
    filter = doc_id % 5 so every PNG filter ships in real payloads),
    baseline JPEG (``kind='jpeg'``, same seeded RGB through the DCT +
    huffman pipeline at quality 90), or ``kind='image'`` (BMP / PNG /
    JPEG rotating by doc_id % 3, exercising the decoder's magic
    sniffing) — so the decode stage exercises genuine byte-level codecs
    end-to-end."""

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
                use_png = kind == "png" or (kind == "image" and did % 3 == 1)
                use_jpeg = kind == "jpeg" or (
                    kind == "image" and did % 3 == 2
                )
                if use_png:
                    contents.append(
                        png_bytes(img, filter_type=int(did % 5))
                    )
                    mtypes.append("image/png")
                elif use_jpeg:
                    contents.append(jpeg_bytes(img, quality=90))
                    mtypes.append("image/jpeg")
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
# with selectable per-row filter.


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


# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 baseline sequential DCT, 4:4:4, Annex-K
# tables), pure NumPy + stdlib — closes the last documented codec gap.
# The decoder is fully table-driven (it reads DQT/DHT from the stream),
# the encoder exists so the decoder is testable via lossy roundtrips
# without an imaging library. Reference has no counterpart (target-spec
# multimodal territory); see DecodeStage for the pipeline wiring.
# --------------------------------------------------------------------------

_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)

_JPEG_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    np.int64,
)

_JPEG_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    np.int64,
)

# Annex K huffman specs: (bits-per-length[1..16], symbol list)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix; T @ b @ T.T equals T.81's FDCT
    (and T.T @ S @ T its IDCT)."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    t = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    t[0, :] = 1.0 / np.sqrt(8.0)
    return t


def _jpeg_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_JPEG_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_JPEG_QC * scale + 50) // 100, 1, 255)
    return ql, qc


def _huff_codes(bits: list, vals: list) -> dict:
    """symbol -> (code, length), canonical T.81 assignment."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _jpeg_rgb_to_ycc(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _jpeg_mag_bits(v: int) -> tuple[int, int]:
    """(category, appended-bit pattern) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def jpeg_bytes(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W, 3) uint8 RGB image as a baseline sequential JPEG
    (JFIF, 4:4:4, Annex-K huffman tables, IJG quality scaling). Lossy by
    nature — exists so ``decode_jpeg`` roundtrips are testable offline."""
    import struct

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ql, qc = _jpeg_quant_tables(quality)
    t = _jpeg_dct_matrix()

    # pad to 8-multiples with edge replication
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _jpeg_rgb_to_ycc(padded) - 128.0
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8

    dc_l, dc_c = _huff_codes(*_DC_L), _huff_codes(*_DC_C)
    ac_l, ac_c = _huff_codes(*_AC_L), _huff_codes(*_AC_C)

    # vectorized FDCT + quantize for all blocks of all 3 components
    blocks = (
        ycc.reshape(hb, 8, wb, 8, 3).transpose(4, 0, 2, 1, 3)
    )  # (3, hb, wb, 8, 8)
    coeff = np.einsum("ij,cbwjk,lk->cbwil", t, blocks, t)
    qtab = np.stack([ql, ql, ql], 0).reshape(3, 8, 8)
    qtab[1:] = qc.reshape(8, 8)
    quant = np.round(coeff / qtab[:, None, None]).astype(np.int64)
    zz = quant.reshape(3, hb, wb, 64)[..., _JPEG_ZIGZAG]

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(hb):
        for bx in range(wb):
            for comp in range(3):
                dct, act = (dc_l, ac_l) if comp == 0 else (dc_c, ac_c)
                z = zz[comp, by, bx]
                diff = int(z[0]) - prev_dc[comp]
                prev_dc[comp] = int(z[0])
                s, mb = _jpeg_mag_bits(diff)
                code, ln = dct[s]
                bw.put(code, ln)
                if s:
                    bw.put(mb, s)
                run = 0
                nz = np.flatnonzero(z[1:])
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(z[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    s, mb = _jpeg_mag_bits(v)
                    code, ln = act[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(mb, s)
                    run = 0
                if last < 63:
                    code, ln = act[0x00]  # EOB
                    bw.put(code, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, spec: tuple) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th] + bits + vals)

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(ql[_JPEG_ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, bytes([1]) + bytes(qc[_JPEG_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0, 0, _DC_L))
    out += seg(0xFFC4, dht(1, 0, _AC_L))
    out += seg(0xFFC4, dht(0, 1, _DC_C))
    out += seg(0xFFC4, dht(1, 1, _AC_C))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


class _HuffTable:
    """Canonical huffman decoder state (T.81 F.2.2.3 DECODE), built from
    a DHT segment's (bits, vals)."""

    def __init__(self, bits: list, vals: list) -> None:
        self.mincode = np.zeros(17, np.int64)
        self.maxcode = np.full(17, -1, np.int64)
        self.valptr = np.zeros(17, np.int64)
        self.vals = np.asarray(vals, np.int64)
        code, i = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = i
                self.mincode[length] = code
                code += bits[length - 1]
                i += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        b = self.bits[self.pos : self.pos + n]
        for bit in b:
            v = (v << 1) | int(bit)
        self.pos += n
        return v

    def decode(self, tbl: _HuffTable) -> int:
        code, length = 0, 0
        while True:
            length += 1
            if length > 16:
                raise ValueError("invalid huffman stream")
            code = (code << 1) | int(self.bits[self.pos])
            self.pos += 1
            if tbl.maxcode[length] >= code >= tbl.mincode[length]:
                return int(
                    tbl.vals[tbl.valptr[length] + code - tbl.mincode[length]]
                )


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude pattern to its signed
    value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (8-bit, 1x1 sampling for every
    component, no restart markers — exactly what ``jpeg_bytes`` and any
    4:4:4 baseline encoder emit) → (H, W, 3) uint8 RGB. Fully
    table-driven: quant + huffman tables come from the stream's DQT/DHT
    segments. Progressive / subsampled / restart-interval streams raise
    NotImplementedError loudly."""
    import struct

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple, _HuffTable] = {}
    sof = None
    comps = []  # (id, h, v, tq)
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = b[pos + 1]
        (size,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + size]
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                z = np.frombuffer(body[o + 1 : o + 65], np.uint8)
                tab = np.zeros(64, np.int64)
                tab[_JPEG_ZIGZAG] = z
                qtabs[tq] = tab.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "only 1x1 sampling (4:4:4) baseline JPEG"
                    )
                comps.append((cid, tq))
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("only baseline sequential SOF0")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            pos = pos + 2 + size
            break
        pos += 2 + size
    if sof is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, nc = sof

    # un-stuff entropy bytes up to EOI
    end = b.rfind(b"\xff\xd9")
    raw = b[pos : end if end > pos else len(b)]
    data = raw.replace(b"\xff\x00", b"\xff")

    rd_bits = _BitReader(data)
    hb, wb = (h + 7) // 8, (w + 7) // 8
    t = _jpeg_dct_matrix()
    zz = np.zeros((nc, hb, wb, 64), np.int64)
    prev_dc = [0] * nc
    for by in range(hb):
        for bx in range(wb):
            for ci in range(nc):
                td, ta = scan[ci][1] >> 4, scan[ci][1] & 0xF
                dct, act = htabs[(0, td)], htabs[(1, ta)]
                z = zz[ci, by, bx]
                s = rd_bits.decode(dct)
                diff = _jpeg_extend(rd_bits.read(s), s)
                prev_dc[ci] += diff
                z[0] = prev_dc[ci]
                k = 1
                while k <= 63:
                    rs = rd_bits.decode(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    z[k] = _jpeg_extend(rd_bits.read(s), s)
                    k += 1

    # dequantize, inverse zigzag, batched IDCT
    out = np.empty((hb * 8, wb * 8, nc), np.float64)
    planes = []
    for ci, (_cid, tq) in enumerate(comps):
        q = qtabs[tq].reshape(64)
        deq = zz[ci] * q[None, None, :]
        blocks = np.zeros((hb, wb, 64), np.float64)
        blocks[..., _JPEG_ZIGZAG] = deq
        blocks = blocks.reshape(hb, wb, 8, 8)
        spat = np.einsum("ji,bwjk,kl->bwil", t, blocks, t) + 128.0
        planes.append(
            spat.transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
        )
    out = np.stack(planes, axis=-1)[:h, :w]

    if nc == 3:  # YCbCr -> RGB (JFIF)
        y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    else:
        rgb = np.repeat(out, 3, axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
