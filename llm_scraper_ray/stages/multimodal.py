"""Multimodal binary-column stages: decode / feature-extract / resize /
frame-sample plumbing over opaque ``binary`` payloads.

A 100 TB training-data pipeline carries images/audio/video as binary
columns with typed metadata. The image/audio libraries are not in this
container, so the DECODE step is stubbed behind ``NotImplementedError``
(or a clearly-marked deterministic fake), while everything Ray-side is
real and tested: Arrow schemas, small-batch sizing for wide binary rows
(SURVEY.md §7.4.5), per-actor setup in ``__init__``, list<float> feature
output layout compatible with the ANN stages (pipelines/queries ANN ops).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)


class MediaDecodeStub:
    """Decode stage shape. Real decode (PIL/ffmpeg) is unavailable here:
    ``fake=True`` derives deterministic width/height/duration metadata from
    the payload hash so downstream plumbing runs; ``fake=False`` raises."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def decode_meta(self, payload: bytes, kind: str) -> dict:
        if not self.fake:
            raise NotImplementedError("no image/audio decode stack in this container")
        h = hashlib.blake2b(bytes(payload), digest_size=16).digest()
        if kind == "image":
            return {"width": 64 + h[0] * 8, "height": 64 + h[1] * 8, "channels": 3}
        if kind == "audio":
            return {"sample_rate": 16000, "seconds": 1 + h[0] % 120}
        return {"fps": 24, "frames": 24 * (1 + h[0] % 60)}

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        import json

        metas = [
            json.dumps(self.decode_meta(p, k), sort_keys=True)
            for p, k in zip(batch["payload"], batch["kind"])
        ]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(batch["media_id"], pa.string()),
                "kind": pa.array(batch["kind"], pa.string()),
                "payload": pa.array([bytes(p) for p in batch["payload"]], pa.binary()),
                "decoded_meta": pa.array(metas, pa.string()),
            }
        )


class FeatureExtractStub:
    """Feature stage shape: binary payload → ``list<float32>`` embedding
    (here: hash-derived unit vector; really: a vision/audio encoder). The
    output column type matches the embeddings table, so the ANN operators
    (embedding_topk) compose directly."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def features(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(bytes(payload), digest_size=self.dim * 4).digest()
        v = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
        v = (v / 2**32) * 2 - 1
        return (v / np.linalg.norm(v)).astype(np.float32)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        feats = [self.features(p).tolist() for p in batch["payload"]]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(batch["media_id"], pa.string()),
                "embedding": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampleStub:
    """Video frame-sampling shape: one row in → N frame rows out (flat-map
    inside map_batches); frame payloads are hash-sliced stand-ins."""

    def __init__(self, every_n: int = 24):
        self.every_n = every_n

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        ids, frames, payloads = [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            payload = bytes(payload)
            n_frames = max(1, len(payload) // 256)
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                frames.append(f)
                payloads.append(payload[f * 256 : (f + 1) * 256])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_no": pa.array(frames, pa.int32()),
                "frame_payload": pa.array(payloads, pa.binary()),
            }
        )
