"""Perceptual-hash image near-dup pairs: engine (banded multi-index hamming
join over exact-integer average-hashes) vs the sequential brute-force oracle
with an independent Fraction-mean hash formulation."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_media_phash_pairs_match_bruteforce_oracle(ray_session):
    from llm_scraper_ray.pipelines.oracle_analysis import persist_expected_media_phash
    from llm_scraper_ray.pipelines.queries import q_media_phash_dups
    from llm_scraper_ray.sources.media import PHASH_LIB

    out = q_media_phash_dups(SF)
    exp = duckdb.sql(
        f"SELECT doc_a, doc_b, hamming FROM read_parquet('{persist_expected_media_phash(SF)}') "
        "ORDER BY doc_a, doc_b"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert len(out) > 0
    # every near-dup pair is a same-asset variant pair (cross-asset hashes
    # are ~32 bits apart by construction); the exact-dedup op would MISS
    # them all (variants are re-edits, not byte copies)
    assert (out["doc_a"] % PHASH_LIB == out["doc_b"] % PHASH_LIB).all()
    assert (out["hamming"] <= 3).all()
    assert (out["hamming"] > 0).any(), "re-edited variants must be non-identical"


def test_ahash_bits_are_exact_integers(ray_session):
    from llm_scraper_ray.sources.media import render_image_variant
    from llm_scraper_ray.stages.multimodal import ahash64, decode_image

    # determinism + sensitivity: same doc → same hash; a one-cell re-edit
    # (different doc, same asset) moves ≤ a few bits
    _, _, a0 = decode_image(render_image_variant(7))
    _, _, a1 = decode_image(render_image_variant(7))
    assert ahash64(a0) == ahash64(a1)
    h, w = a0.shape
    flipped = a0.copy()
    flipped[: h // 8, : w // 8] = 255 - flipped[: h // 8, : w // 8].astype(np.int64)
    assert ahash64(flipped) != ahash64(a0)


def test_variant_jpeg_class_present(ray_session):
    """doc_id % 3 == 2 variants ship as real baseline JPEGs; both container
    classes decode and same-asset pairs still land within the hamming
    threshold (the phash query's JPEG coverage)."""
    from llm_scraper_ray.sources.media import PHASH_LIB, render_image_variant
    from llm_scraper_ray.stages.multimodal import ahash64, decode_image, popcount64

    # PHASH_LIB % 3 == 0, so every variant of one asset shares a container:
    # asset 2 all-JPEG (2 % 3 == 2), asset 1 all-PNG, asset 0 all-PGM
    ja, jb = 2, 2 + PHASH_LIB  # same asset, both JPEG
    p0, p1 = render_image_variant(ja), render_image_variant(jb)
    assert p0[:2] == b"\xff\xd8" and p1[:2] == b"\xff\xd8"
    assert render_image_variant(1)[:4] == b"\x89PNG"
    assert render_image_variant(0)[:2] == b"P5"
    _, _, a0 = decode_image(p0)
    _, _, a1 = decode_image(p1)
    d = popcount64(
        np.array([np.uint64(ahash64(a0)) ^ np.uint64(ahash64(a1))]).view(np.int64)
    )[0]
    assert d <= 6  # same asset, 0-3 cell edits per variant
