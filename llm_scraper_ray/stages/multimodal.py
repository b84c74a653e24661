"""Multimodal binary-column stages: decode / feature-extract / resize /
frame-sample plumbing over opaque ``binary`` payloads.

A 100 TB training-data pipeline carries images/audio/video as binary
columns with typed metadata. Formats that need PIL/ffmpeg are stubbed
behind ``NotImplementedError`` (or a clearly-marked deterministic fake),
BUT two containers are fully decodable with stdlib+numpy and get REAL
decoders below (binary PGM images, PCM WAV audio — ``MediaDecode``,
oracled against the generator's persisted truth). Everything Ray-side is
real and tested either way: Arrow schemas, small-batch sizing for wide
binary rows (SURVEY.md §7.4.5), per-actor setup in ``__init__``,
list<float> feature output layout compatible with the ANN stages.
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


# ---------------------------------------------------------------------------
# REAL decoders: two media containers are fully decodable with stdlib+numpy
# (binary PGM images; PCM WAV audio), so for these the decode step is NOT a
# stub — the stage parses actual bytes and must recover exactly what the
# generator encoded (`sources/media.persist_media_truth` is the independent
# truth). PIL/ffmpeg-class formats remain the declared stub boundary above.


def decode_pgm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PGM (P5) → (width, height, uint8 array). Minimal grammar:
    magic, whitespace-separated width/height/maxval, single whitespace,
    raster (maxval ≤ 255)."""
    if payload[:2] != b"P5":
        raise ValueError("not a binary PGM payload")
    # header tokens: walk past magic, then read 3 ASCII integers
    pos, vals = 2, []
    while len(vals) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace before raster
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("multi-byte PGM not supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
    return w, h, arr.reshape(h, w)


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Container-sniffing image decode: binary PGM or baseline JPEG (the
    from-scratch codec in ``functions/jpeg.py``). Anything else stays at
    the declared stub boundary."""
    if payload[:2] == b"P5":
        return decode_pgm(payload)
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_gray

        return decode_gray(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..functions.png import decode_gray as png_decode_gray

        return png_decode_gray(payload)
    raise NotImplementedError("unsupported image container (PIL-class stub boundary)")


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV → (sample_rate, int16 sample array) via the stdlib parser."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM supported")
        sr = wf.getframerate()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype=np.int16)
    return sr, pcm


class MediaDecode:
    """Actor-pool decode stage over wide binary rows: real byte parsing
    (PGM header + raster, RIFF/WAV), emitting exact integer facts — the
    hash gate compares them against the generator truth table. Wide-binary
    inputs ⇒ callers pass a small ``batch_size``."""

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        mids, kinds, ws, hs, srs, ns, sums = [], [], [], [], [], [], []
        for mid, kind, payload in zip(
            batch["media_id"], batch["kind"], batch["payload"]
        ):
            payload = bytes(payload)
            if kind == "image":
                w, h, arr = decode_image(payload)
                ws.append(w); hs.append(h); srs.append(0)
                ns.append(w * h)
                sums.append(int(arr.astype(np.int64).sum()))
            elif kind == "audio":
                sr, pcm = decode_wav(payload)
                ws.append(0); hs.append(0); srs.append(sr)
                ns.append(int(pcm.size))
                sums.append(int(np.abs(pcm.astype(np.int64)).sum()))
            else:
                raise NotImplementedError(f"no real decoder for kind={kind}")
            mids.append(int(mid)); kinds.append(kind)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(mids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "sample_rate": pa.array(srs, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "sum_vals": pa.array(sums, pa.int64()),
            }
        )


class MediaResize:
    """Actor-pool image RESIZE over wide binary rows — a real transform,
    not a stub: decode the PGM raster, exact 2×2 box downsample (integer
    block mean, floor; odd right/bottom edges cropped — the deterministic
    spec), re-encode as PGM. Output = new dims + integer sum + crc32 of
    the resized raster bytes, so the oracle pins the exact pixels.
    PIL-class formats remain the declared stub boundary."""

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        import zlib

        mids, ows, ohs, sums, crcs = [], [], [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            w, h, arr = decode_image(bytes(payload))
            w2, h2 = w // 2, h // 2
            a = arr[: h2 * 2, : w2 * 2].astype(np.int64)
            small = (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]) // 4
            raster = small.astype(np.uint8).tobytes()
            mids.append(int(mid))
            ows.append(w2)
            ohs.append(h2)
            sums.append(int(small.sum()))
            crcs.append(zlib.crc32(raster))
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(mids, pa.int64()),
                "out_w": pa.array(ows, pa.int64()),
                "out_h": pa.array(ohs, pa.int64()),
                "out_sum": pa.array(sums, pa.int64()),
                "out_crc": pa.array(crcs, pa.int64()),
            }
        )


FRAME_LEN = 1024
FRAME_STRIDE = 512


class AudioFrames:
    """Actor-pool audio FRAME-SAMPLING — one wide binary row in, N frame
    rows out (the flat-map-inside-map_batches expansion shape): decode the
    WAV PCM, strided windows (len 1024, stride 512), per frame the exact
    integer energy Σ|x| and zero-crossing count (signbit changes). All
    integers — cross-engine exact. Cumulative-sum formulation: one pass
    over the PCM regardless of overlap."""

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        mids, fnos, energies, zcs = [], [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            _, pcm = decode_wav(bytes(payload))
            n = pcm.size
            if n < FRAME_LEN:
                continue
            starts = np.arange(0, n - FRAME_LEN + 1, FRAME_STRIDE, dtype=np.int64)
            acum = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(np.abs(pcm.astype(np.int64)), out=acum[1:])
            s = np.signbit(pcm)
            ccum = np.zeros(n, dtype=np.int64)
            np.cumsum(s[1:] != s[:-1], out=ccum[1:])
            mids.extend([int(mid)] * len(starts))
            fnos.extend(range(len(starts)))
            energies.extend(acum[starts + FRAME_LEN] - acum[starts])
            zcs.extend(ccum[starts + FRAME_LEN - 1] - ccum[starts])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_no": pa.array(fnos, pa.int64()),
                "energy": pa.array([int(x) for x in energies], pa.int64()),
                "zero_crossings": pa.array([int(x) for x in zcs], pa.int64()),
            }
        )


ZC_PER_TOKEN = 64  # voiced-speech zero-crossing rate per token-envelope unit


class AudioTranscriptProxy:
    """Deterministic whisper-SHAPED transcript proxy — the real kernel
    behind the M11 stub interface (VERDICT r4 #7; reference transcribes
    media at ``util/media/media_downloader.py:6,44-46``): decode the PCM,
    strided frames (FRAME_LEN/FRAME_STRIDE) with exact integer energy and
    zero-crossing counts (one cumulative-sum pass), then speech/silence
    segmentation by the EXACT integer mean rule (frame is speech iff
    energy_f · n_frames > Σ energies, strict — cross-multiplication, no
    float mean), maximal speech runs = segments, and a token-count
    envelope est_tokens = Σ_speech zero_crossings // ZC_PER_TOKEN. A real
    ASR model drops in at exactly this seam (payload → per-clip rows);
    every emitted quantity is an integer, so the sequential oracle gates
    it exactly."""

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        mids, nfs, nsp, nseg, toks = [], [], [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            _, pcm = decode_wav(bytes(payload))
            n = pcm.size
            if n < FRAME_LEN:
                continue
            starts = np.arange(0, n - FRAME_LEN + 1, FRAME_STRIDE, dtype=np.int64)
            acum = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(np.abs(pcm.astype(np.int64)), out=acum[1:])
            s = np.signbit(pcm)
            ccum = np.zeros(n, dtype=np.int64)
            np.cumsum(s[1:] != s[:-1], out=ccum[1:])
            energy = acum[starts + FRAME_LEN] - acum[starts]
            zc = ccum[starts + FRAME_LEN - 1] - ccum[starts]
            nf = len(starts)
            speech = energy * np.int64(nf) > np.int64(energy.sum())
            seg_starts = int(
                np.count_nonzero(speech & ~np.concatenate(([False], speech[:-1])))
            )
            mids.append(int(mid))
            nfs.append(nf)
            nsp.append(int(np.count_nonzero(speech)))
            nseg.append(seg_starts)
            toks.append(int(zc[speech].sum()) // ZC_PER_TOKEN)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(mids, pa.int64()),
                "n_frames": pa.array(nfs, pa.int64()),
                "n_speech": pa.array(nsp, pa.int64()),
                "n_segments": pa.array(nseg, pa.int64()),
                "est_tokens": pa.array(toks, pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# perceptual hashing (average-hash over the decoded raster, exact integers)

PHASH_HAM_T = 3  # near-dup threshold; 4×16-bit bands give provable recall 1.0

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for int64/uint64 arrays (numpy<2 has no
    bitwise_count): byte-view + 256-entry LUT."""
    return _POP8[np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)].sum(1)


def ahash64(arr: np.ndarray) -> int:
    """64-bit average-hash of a grayscale raster: 8×8 grid of floor-bounded
    blocks (block i spans rows [i·h//8, (i+1)·h//8)), bit = block mean >
    global mean decided by EXACT integer cross-multiplication
    (block_sum · total_area > total_sum · block_area — no float mean
    anywhere, so the bit is engine-exact). Bit index = by·8+bx, LSB first;
    returned as a SIGNED int64 bit pattern (the repo-wide key convention:
    hashes ride int64 columns)."""
    h, w = arr.shape
    a = arr.astype(np.int64)
    re = (np.arange(9, dtype=np.int64) * h) // 8
    ce = (np.arange(9, dtype=np.int64) * w) // 8
    rows = np.add.reduceat(a, re[:-1], axis=0)
    blocks = np.add.reduceat(rows, ce[:-1], axis=1)  # (8,8) block sums
    areas = (re[1:] - re[:-1])[:, None] * (ce[1:] - ce[:-1])[None, :]
    total = int(a.sum())
    bits = (blocks * (h * w) > total * areas).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64).reshape(8, 8)
    return int(np.int64((bits * weights).sum().astype(np.uint64).view(np.int64)))
