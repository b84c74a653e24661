"""Baseline JPEG codec (functions/jpeg.py) + whisper-shaped audio
transcript proxy: byte-level decode gated by the coefficient-path spec
reconstruction, media_decode truth over the mixed PGM/JPEG corpus, and the
segmentation query vs its sequential oracle."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (23, 41), (64, 64), (37, 5)])
def test_jpeg_roundtrip_matches_spec_reconstruction(shape):
    from llm_scraper_ray.functions.jpeg import (
        decode_gray,
        encode_gray,
        quantized_coefficients,
        reconstruct_blocks,
        scaled_qtable,
    )

    h, w = shape
    arr = np.random.default_rng(h * 100 + w).integers(0, 256, (h, w), dtype=np.uint8)
    payload = encode_gray(arr, 90)
    w2, h2, dec = decode_gray(payload)
    assert (w2, h2) == (w, h)
    ref = reconstruct_blocks(quantized_coefficients(arr, 90), scaled_qtable(90), h, w)
    # the byte path (huffman + markers + stuffing) must recover EXACTLY the
    # coefficient-path reconstruction — decode is gated bit-for-bit
    assert np.array_equal(dec, ref)
    # lossy but sane: smooth content round-trips within quantization noise
    assert np.abs(dec.astype(int) - arr.astype(int)).mean() < 8


def test_jpeg_rejects_non_baseline():
    from llm_scraper_ray.functions.jpeg import decode_gray, encode_gray

    with pytest.raises(ValueError):
        decode_gray(b"\x00\x01not a jpeg")
    payload = bytearray(encode_gray(np.zeros((8, 8), np.uint8)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError):
        decode_gray(bytes(payload))


def test_media_decode_recovers_jpeg_truth(ray_session):
    """kind='image' rows now mix PGM and JPEG containers (media_id % 4 == 2
    → JPEG); the decode stage sniffs bytes and must recover the generator
    truth for BOTH classes."""
    from llm_scraper_ray.pipelines.queries import q_media_decode
    from llm_scraper_ray.sources.media import persist_media_truth

    out = q_media_decode(SF)
    exp = duckdb.sql(
        "SELECT media_id, kind, width, height, sample_rate, n_samples, sum_vals "
        f"FROM read_parquet('{persist_media_truth(SF)}') ORDER BY media_id"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    jpeg_rows = out[out["media_id"] % 4 == 2]
    assert len(jpeg_rows) > 0 and (jpeg_rows["kind"] == "image").all()


def test_audio_features_match_oracle(ray_session):
    from llm_scraper_ray.pipelines.oracle_analysis import (
        persist_expected_audio_features,
    )
    from llm_scraper_ray.pipelines.queries import q_media_audio_features

    out = q_media_audio_features(SF)
    exp = duckdb.sql(
        "SELECT media_id, n_frames, n_speech, n_segments, est_tokens FROM "
        f"read_parquet('{persist_expected_audio_features(SF)}') ORDER BY media_id"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert len(out) > 0
    # the proxy discriminates: tone+noise clips have real segment structure
    assert (out["n_speech"] > 0).any()
    assert (out["n_speech"] < out["n_frames"]).any()
    assert (out["est_tokens"] > 0).any()


@pytest.mark.parametrize("bs", [2048, 16, 7])
def test_embedding_pca_matches_oracle(ray_session, bs):
    """Batch-folded integer Gram == direct matmul at any batch split (the
    mergeable-sketch exactness claim), then identical spectra."""
    from llm_scraper_ray.pipelines.analytics import q_embedding_pca
    from llm_scraper_ray.pipelines.oracle_analysis import (
        persist_expected_embedding_pca,
    )

    out = q_embedding_pca(SF, batch_size=bs)
    exp = duckdb.sql(
        "SELECT comp, eigval, evr, trace_scatter FROM "
        f"read_parquet('{persist_expected_embedding_pca(SF)}') ORDER BY comp"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert (np.diff(out["eigval"].to_numpy()) <= 1e-12).all()  # descending
    assert abs(out["evr"].sum() - 1.0) < 1e-3


@pytest.mark.parametrize("shape", [(8, 8), (23, 41), (64, 64), (1, 7)])
def test_png_roundtrip_lossless(shape):
    from llm_scraper_ray.functions.png import decode_gray, encode_gray

    h, w = shape
    arr = np.random.default_rng(h * 7 + w).integers(0, 256, (h, w), dtype=np.uint8)
    w2, h2, dec = decode_gray(encode_gray(arr))
    assert (w2, h2) == (w, h)
    assert np.array_equal(dec, arr)  # lossless container


def test_png_all_filter_types_decode():
    """Streams from ANY compliant grayscale-8 encoder parse: hand-build an
    IDAT using each of the five standard filter types on known lines."""
    import struct
    import zlib

    from llm_scraper_ray.functions.png import _chunk, _SIG, decode_gray

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (5, 6), dtype=np.uint8).astype(np.int32)
    lines = []
    prev = np.zeros(6, np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = img[y]
        enc = np.zeros(6, np.int32)
        for x in range(6):
            a = int(cur[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            enc[x] = (int(cur[x]) - pred) & 0xFF
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)
    payload = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
    w, h, dec = decode_gray(payload)
    assert (w, h) == (6, 5)
    assert np.array_equal(dec, img.astype(np.uint8))


def test_media_decode_recovers_png_truth(ray_session):
    from llm_scraper_ray.pipelines.queries import q_media_decode
    from llm_scraper_ray.sources.media import persist_media_truth, render_media

    kind, payload = render_media(4)
    assert kind == "image" and payload[:4] == b"\x89PNG"
    out = q_media_decode(SF)
    exp = duckdb.sql(
        "SELECT media_id, kind, width, height, sample_rate, n_samples, sum_vals "
        f"FROM read_parquet('{persist_media_truth(SF)}') ORDER BY media_id"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
