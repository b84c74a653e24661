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
