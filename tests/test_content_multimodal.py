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
