"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with metadata
columns alongside. The decode step is STUBBED (no imaging/audio libs in
this container): ``DecodeStage`` raises NotImplementedError unless
constructed with ``fake=True``, in which case it produces a deterministic
fake "decode" (seeded from the payload bytes) so the Ray-side plumbing —
schema, actor signature, batch sizing, output layout — is real and tested.

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
    """STUB decode: binary payload → dense array. Real decode requires an
    imaging/audio library not present in this container.

    With ``fake=False`` (default): raises NotImplementedError at first
    batch — the documented production integration point.
    With ``fake=True``: deterministic pseudo-decode (Philox keyed on the
    payload checksum) producing a fixed-shape float32 "frame".
    """

    def __init__(self, fake: bool = False, shape: tuple = (8, 8)):
        self.fake = fake
        self.shape = shape

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires an imaging/audio library; "
                "construct DecodeStage(fake=True) for the deterministic stub"
            )
        contents = batch["content"].to_pylist()
        frames = []
        for c in contents:
            key = int.from_bytes(hashlib.md5(c).digest()[:8], "little")
            rng = np.random.Generator(np.random.Philox(key=[key, 0]))
            frames.append(
                rng.random(int(np.prod(self.shape)), dtype=np.float32)
            )
        flat = np.concatenate(frames) if frames else np.empty(0, np.float32)
        offsets = np.arange(len(frames) + 1, dtype=np.int32) * int(
            np.prod(self.shape)
        )
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
