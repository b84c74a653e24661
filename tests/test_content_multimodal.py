"""E4/E5 content scrape + multimodal stub stages."""

import pandas as pd
import pytest

from llm_scraper_ray.functions.content import MODULES, scrape_content
from llm_scraper_ray.stages.multimodal import (
    FeatureExtractStub,
    FrameSampleStub,
    MediaDecodeStub,
)

HTML = """
<html><head><link rel="canonical" href="https://h.example/item1"/></head><body>
<h1 class="h4">Acme Widget</h1>
<a class="c-button-link" href="/b">Acme Corp</a>
<div class="mb-200"><ul><li>Fast</li><li>Cheap</li></ul></div>
<code>{"a": 1}</code><code>x = 2</code>
<img src="/i/1.jpg"/><img src="/i/2.jpg"/>
<video src="/v/clip.mp4"></video>
<video><source src="/v/s1.mp4"/><source src="/v/s2.mp4"/></video>
</body></html>
"""


def test_scrape_content_e5():
    out = scrape_content(HTML, "https://h.example/page")
    assert "Acme Widget" in out["text"] and "Acme Corp" in out["text"]
    assert out["images"] == ["/i/1.jpg", "/i/2.jpg"]
    assert out["code"] == '["{\\"a\\": 1}", "x = 2"]'
    assert out["videos"] == [
        "https://h.example/v/clip.mp4",
        "https://h.example/v/s1.mp4",
        "https://h.example/v/s2.mp4",
    ]


def test_generic_module_parse():
    from llm_scraper_ray.functions.dom import parse_dom

    product, url = MODULES["generic"].parse_products(parse_dom(HTML))
    assert "Acme Widget" in product and "Fast | Cheap" in product
    assert url == "https://h.example/item1"


def test_media_decode_and_features():
    batch = pd.DataFrame(
        {
            "media_id": ["m1", "m2", "m3"],
            "kind": ["image", "audio", "video"],
            "payload": [b"imgbytes", b"audiobytes", b"videobytes" * 100],
        }
    )
    t = MediaDecodeStub(fake=True)(batch)
    metas = t["decoded_meta"].to_pylist()
    assert '"width"' in metas[0] and '"sample_rate"' in metas[1] and '"fps"' in metas[2]
    with pytest.raises(NotImplementedError):
        MediaDecodeStub(fake=False).decode_meta(b"x", "image")

    f = FeatureExtractStub(dim=16)
    feats = f(batch)
    emb = feats["embedding"].to_pylist()
    assert len(emb[0]) == 16
    assert emb[0] == f(batch)["embedding"].to_pylist()[0]  # deterministic
    norm = sum(v * v for v in emb[0]) ** 0.5
    assert abs(norm - 1.0) < 1e-5

    frames = FrameSampleStub(every_n=2)(batch)
    assert frames.num_rows >= 3
    assert set(frames.column_names) == {"media_id", "frame_no", "frame_payload"}


def test_real_decoders_roundtrip():
    """PGM and WAV decode must recover exactly what the renderer encoded
    (generator-writes vs decoder-reads)."""
    import numpy as np

    from llm_scraper_ray.sources.media import render_pgm, render_wav
    from llm_scraper_ray.stages.multimodal import decode_pgm, decode_wav

    for mid in (0, 2, 44, 1234):
        truth: dict = {}
        payload = render_pgm(mid, truth)
        w, h, arr = decode_pgm(payload)
        assert (w, h) == (truth["width"], truth["height"])
        assert int(arr.astype(np.int64).sum()) == truth["sum_vals"]
    for mid in (1, 3, 777):
        truth = {}
        payload = render_wav(mid, truth)
        sr, pcm = decode_wav(payload)
        assert sr == truth["sample_rate"] and pcm.size == truth["n_samples"]
        assert int(np.abs(pcm.astype(np.int64)).sum()) == truth["sum_vals"]


def test_decode_pgm_rejects_foreign_bytes():
    import pytest as _pytest

    from llm_scraper_ray.stages.multimodal import decode_pgm

    with _pytest.raises(ValueError):
        decode_pgm(b"JFIF....")


def test_media_decode_matches_truth_oracle(ray_session):
    import os

    import duckdb

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    sf = "/root/testdata/sf0.001"
    os.environ["LLMSR_ORACLE_SF_DIR"] = sf
    try:
        out = all_queries()["media_decode"](sf)
        exp = duckdb.connect().execute(all_oracle_sql()["media_decode"]).df()
    finally:
        del os.environ["LLMSR_ORACLE_SF_DIR"]
    assert set(out["kind"]) == {"image", "audio"}
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_media_resize_matches_independent_oracle(ray_session):
    """Exact 2x2 box downsample (strided-slice engine vs reshape oracle)
    must agree pixel-for-pixel (crc-pinned), with halved dimensions."""
    import os

    import duckdb

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    sf = "/root/testdata/sf0.001"
    os.environ["LLMSR_ORACLE_SF_DIR"] = sf
    try:
        out = all_queries()["media_resize"](sf)
        exp = duckdb.connect().execute(all_oracle_sql()["media_resize"]).df()
    finally:
        del os.environ["LLMSR_ORACLE_SF_DIR"]
    assert len(out) > 0 and (out["out_w"] >= 4).all() and (out["out_h"] >= 4).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_media_frames_matches_independent_oracle(ray_session):
    """Strided audio frames: cumulative-sum engine formulation vs per-frame
    slice oracle — exact integer energy and zero-crossing parity, and the
    expansion emits the right frame count per clip."""
    import os

    import duckdb
    import numpy as np

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries
    from llm_scraper_ray.sources.media import render_media
    from llm_scraper_ray.stages.multimodal import FRAME_LEN, FRAME_STRIDE, decode_wav

    sf = "/root/testdata/sf0.001"
    os.environ["LLMSR_ORACLE_SF_DIR"] = sf
    try:
        out = all_queries()["media_frames"](sf)
        exp = duckdb.connect().execute(all_oracle_sql()["media_frames"]).df()
    finally:
        del os.environ["LLMSR_ORACLE_SF_DIR"]
    assert len(out) > 0
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # spot-check the expansion arity on one clip
    mid = int(out["media_id"].iloc[0])
    _, payload = render_media(mid)
    _, pcm = decode_wav(payload)
    want_frames = len(range(0, pcm.size - FRAME_LEN + 1, FRAME_STRIDE))
    assert int((out["media_id"] == mid).sum()) == want_frames
    assert int(out.loc[out["media_id"] == mid, "frame_no"].max()) == want_frames - 1
    assert (out["energy"] >= 0).all() and (out["zero_crossings"] >= 0).all()
