"""Deterministic multimodal payload generation WITH generator truth.

The sandbox has no PIL/ffmpeg, but two real media containers are fully
decodable with the stdlib + numpy: binary PGM (P5) images and PCM WAV
audio. This module renders genuine payloads of both (gradient+noise
images; sine-tone audio), records what it encoded (dimensions, sample
counts, exact integer pixel/sample checksums) as a persisted truth table,
and the decode pipeline (`stages/multimodal.MediaDecode`) must recover
those numbers FROM THE BYTES — generator-writes vs decoder-reads, the
same independent-oracle pattern as ``sources/pages.persist_truth``.

Payload layout mirrors a 100 TB pipeline's media table: opaque ``binary``
column + typed metadata, one row per media item (SURVEY.md §7.4.5 notes
wide-binary rows need small batches — the decode query sizes
``batch_size`` accordingly).
"""

from __future__ import annotations

import io
import os
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MEDIA_VERSION = 3

_CACHE_ROOT = "/tmp/llmsr_cache"


def _rng(media_id: int) -> np.random.RandomState:
    return np.random.RandomState((media_id * 2654435761 + 97) % (2**31 - 1))


def render_pgm(media_id: int, truth: dict | None = None) -> bytes:
    """Binary PGM (P5): deterministic gradient + noise image."""
    r = _rng(media_id)
    w = 8 + int(r.randint(0, 57))  # 8..64
    h = 8 + int(r.randint(0, 57))
    gx = np.linspace(0, 200, w, dtype=np.float64)
    gy = np.linspace(0, 55, h, dtype=np.float64)
    img = (gy[:, None] + gx[None, :] + r.randint(0, 32, size=(h, w))).clip(0, 255)
    arr = img.astype(np.uint8)
    if truth is not None:
        truth.update(
            width=w, height=h, sample_rate=0,
            n_samples=w * h, sum_vals=int(arr.astype(np.int64).sum()),
        )
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


def render_jpeg(media_id: int, truth: dict | None = None) -> bytes:
    """Baseline JPEG (from-scratch codec, ``functions/jpeg.py``):
    deterministic gradient + noise image — same content recipe as the PGM
    class, real lossy container. Truth is computed from the generator's own
    quantized coefficients via the spec reconstruction (never touching the
    entropy-coded bytes), so the engine's byte-level huffman/marker decode
    is independently gated."""
    from ..functions.jpeg import (
        encode_gray,
        quantized_coefficients,
        reconstruct_blocks,
        scaled_qtable,
    )

    r = _rng(media_id)
    w = 8 + int(r.randint(0, 57))  # 8..64
    h = 8 + int(r.randint(0, 57))
    gx = np.linspace(0, 200, w, dtype=np.float64)
    gy = np.linspace(0, 55, h, dtype=np.float64)
    img = (gy[:, None] + gx[None, :] + r.randint(0, 32, size=(h, w))).clip(0, 255)
    arr = img.astype(np.uint8)
    payload = encode_gray(arr, 90)
    if truth is not None:
        dec = reconstruct_blocks(
            quantized_coefficients(arr, 90), scaled_qtable(90), h, w
        )
        truth.update(
            width=w, height=h, sample_rate=0,
            n_samples=w * h, sum_vals=int(dec.astype(np.int64).sum()),
        )
    return payload


def render_png(media_id: int, truth: dict | None = None) -> bytes:
    """PNG (from-scratch codec, ``functions/png.py``): same content recipe,
    LOSSLESS container — truth pins the exact encoded pixels."""
    from ..functions.png import encode_gray

    r = _rng(media_id)
    w = 8 + int(r.randint(0, 57))  # 8..64
    h = 8 + int(r.randint(0, 57))
    gx = np.linspace(0, 200, w, dtype=np.float64)
    gy = np.linspace(0, 55, h, dtype=np.float64)
    img = (gy[:, None] + gx[None, :] + r.randint(0, 32, size=(h, w))).clip(0, 255)
    arr = img.astype(np.uint8)
    if truth is not None:
        truth.update(
            width=w, height=h, sample_rate=0,
            n_samples=w * h, sum_vals=int(arr.astype(np.int64).sum()),
        )
    return encode_gray(arr)


def render_wav(media_id: int, truth: dict | None = None) -> bytes:
    """Mono 16-bit PCM WAV: deterministic sine tone + noise."""
    r = _rng(media_id)
    sr = 8000
    seconds = 1 + int(r.randint(0, 3))  # 1..3 s
    n = sr * seconds
    t = np.arange(n, dtype=np.float64)
    freq = 110.0 + float(r.randint(0, 880))
    sig = 0.6 * np.sin(2 * np.pi * freq * t / sr) + 0.05 * r.randn(n)
    pcm = (sig.clip(-1, 1) * 32000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    if truth is not None:
        truth.update(
            width=0, height=0, sample_rate=sr,
            n_samples=n, sum_vals=int(np.abs(pcm.astype(np.int64)).sum()),
        )
    return buf.getvalue()


def render_media(media_id: int, truth: dict | None = None) -> tuple[str, bytes]:
    """(kind, payload) for one media id — images on even ids (every other
    one a baseline JPEG, the rest PGM — decoders sniff the container, as
    with real web media), audio on odd."""
    if media_id % 2 == 0:
        if media_id % 4 == 2:
            return "image", render_jpeg(media_id, truth)
        if media_id % 8 == 4:
            return "image", render_png(media_id, truth)
        return "image", render_pgm(media_id, truth)
    return "audio", render_wav(media_id, truth)


def persist_media_truth(sf_dir: str) -> str:
    """Write (once per corpus+version) the generator's record of every
    encoded payload: (media_id, kind, width, height, sample_rate,
    n_samples, sum_vals) — all exact integers. Media ids = the documents
    table's doc_ids (one media item per doc)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_CACHE_ROOT, f"mediatruth-{name}-m{MEDIA_VERSION}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    ids = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    rows = {k: [] for k in ("media_id", "kind", "width", "height", "sample_rate", "n_samples", "sum_vals")}
    for d in sorted(ids):
        truth: dict = {}
        kind, _ = render_media(int(d), truth)
        rows["media_id"].append(int(d))
        rows["kind"].append(kind)
        for k in ("width", "height", "sample_rate", "n_samples", "sum_vals"):
            rows[k].append(int(truth[k]))
    t = pa.Table.from_pydict(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "width": pa.array(rows["width"], pa.int64()),
            "height": pa.array(rows["height"], pa.int64()),
            "sample_rate": pa.array(rows["sample_rate"], pa.int64()),
            "n_samples": pa.array(rows["n_samples"], pa.int64()),
            "sum_vals": pa.array(rows["sum_vals"], pa.int64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# shared-asset image variants (perceptual near-dup fixture)

PHASH_LIB = 48  # distinct base assets; docs reference asset = doc_id % LIB


def render_image_variant(doc_id: int, lib: int = PHASH_LIB) -> bytes:
    """P5 payload for a SHARED asset with a small per-doc perturbation —
    the many-docs-one-asset layout of real web media, except variants are
    structural re-edits (0-3 inverted 8×8-grid cells), not byte-identical
    copies: the exact-hash dedup misses them, a perceptual hash must not.
    Assets are asset-seeded random two-level block patterns (levels 60/190
    + 0..7 noise), so block means sit FAR from the global mean (a
    perceptual hash is stable under the noise) while cross-asset hashes
    are ~32 bits apart (random patterns). The BYTES are the cross-side
    contract (engine and the sequential phash oracle decode this exact
    payload); the hash computation is what each side formulates
    independently."""
    asset = int(doc_id) % lib
    ra = _rng(asset * 513239 + 7)
    w = 16 + int(ra.randint(0, 49))  # 16..64
    h = 16 + int(ra.randint(0, 49))
    bits = ra.randint(0, 2, size=(8, 8))
    noise = ra.randint(0, 8, size=(h, w))
    rv = _rng(int(doc_id) * 7919 + 13)
    vbits = bits.copy()
    for _ in range(int(rv.randint(0, 4))):  # invert 0..3 grid cells
        by, bx = int(rv.randint(0, 8)), int(rv.randint(0, 8))
        vbits[by, bx] = 1 - vbits[by, bx]
    row_blk = (np.arange(h) * 8) // h
    col_blk = (np.arange(w) * 8) // w
    levels = np.where(vbits, 190, 60)
    arr = (levels[row_blk[:, None], col_blk[None, :]] + noise).clip(0, 255).astype(np.uint8)
    if doc_id % 3 == 2:  # every third variant ships as a real JPEG
        from ..functions.jpeg import encode_gray

        return encode_gray(arr, 92)
    if doc_id % 3 == 1:  # ... and every third as a real (lossless) PNG
        from ..functions.png import encode_gray as encode_png

        return encode_png(arr)
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
