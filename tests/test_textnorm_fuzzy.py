"""Normalizer + fuzzy-dedup + triplet kernel tests (E9-E21)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from llm_scraper_ray.functions import analysis
from llm_scraper_ray.functions.fuzzy import deduplicate_fields, ratio
from llm_scraper_ray.functions.textnorm import (
    collapse_repeated_words,
    extract_json_fence,
    graph_key,
    normalize_alnum,
    normalize_ws_lower,
    remove_think_tags,
    split_camel_case,
    split_sentences,
)
from llm_scraper_ray.functions.triplets import format_triplet, parse_triplets


def test_normalizers():
    assert normalize_ws_lower("  Hello   WORLD \n x ") == "hello world x"
    assert normalize_alnum("Hello, World_123!") == "helloworld123"
    assert split_camel_case("GoveeSmartLight") == "Govee Smart Light"
    assert collapse_repeated_words("light, light, light on") == "light on"
    assert remove_think_tags("<think>hmm</think>answer") == "answer"
    assert extract_json_fence("```json\n{\"a\":1}\n```") == '{"a":1}'
    assert graph_key("Acme Widget #1!") == "AcmeWidget_1_"
    assert split_sentences("One sentence. Two here! Sh.") == ["One sentence.", "Two here!"]


def test_ratio_matches_definition():
    # indel similarity: 100 * 2*LCS / (la+lb)
    assert ratio("abc", "abc") == 100.0
    assert ratio("", "") == 100.0
    assert ratio("abcd", "bcde") == 2 * 3 / 8 * 100
    assert ratio("abc", "xyz") == 0.0


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40), st.text(max_size=40))
def test_ratio_properties(a, b):
    r = ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == ratio(b, a)
    assert ratio(a, a) == 100.0


def test_field_dedup():
    fields = {
        "name": "Smart LED Light Bar",
        "title": "Smart  LED light bar",  # near-dup of name → dropped
        "desc": "A completely different description of the product.",
    }
    out = deduplicate_fields(fields, threshold=90)
    assert list(out) == ["name", "desc"]


def test_triplet_roundtrip():
    text = """Here: (('device', 'Light Bar'), 'manufacturedBy', ('manufacturer', 'Govee'))
    and (("sensor", "IMU"), "partOf", ("device", "Drone"))"""
    trips = parse_triplets(text)
    assert trips == [
        (("device", "Light Bar"), "manufacturedBy", ("manufacturer", "Govee")),
        (("sensor", "IMU"), "partOf", ("device", "Drone")),
    ]
    variants = format_triplet(trips[0])
    assert variants[0] == "Light Bar is manufactured by Govee"
    assert len(variants) == 5
    assert format_triplet(trips[1]) == []  # unknown predicate


def test_minhash_jaccard_estimate():
    import numpy as np

    a, b = analysis.minhash_coeffs(num_perm=256, seed=1)
    t1 = "the quick brown fox jumps over the lazy dog " * 10
    t2 = "the quick brown fox leaps over the lazy dog " * 10
    t3 = "entirely different words appear in this one here now " * 10
    h1, h2, h3 = (analysis.shingle_hashes(t, k=3) for t in (t1, t2, t3))
    s = analysis.minhash_signature_matrix([h1, h2, h3], a, b)
    true12 = analysis.jaccard(analysis.word_shingles(t1, 3), analysis.word_shingles(t2, 3))
    est12 = float(np.mean(s[0] == s[1]))
    assert abs(est12 - true12) < 0.15
    assert float(np.mean(s[0] == s[2])) < 0.1


def test_simhash_similarity():
    t1 = "the quick brown fox jumps over the lazy dog and runs far away"
    t2 = "the quick brown fox jumps over the lazy cat and runs far away"
    t3 = "completely unrelated text about database systems and query planners"
    h1, h2, h3 = (analysis.simhash64(t) for t in (t1, t2, t3))
    assert analysis.hamming64(h1, h2) < analysis.hamming64(h1, h3)
    assert analysis.hamming64(h1, h1) == 0


def test_text_features():
    assert analysis.count_tokens_ws("a b  c") == 3
    assert analysis.lang_id("the cat sat on the mat with a hat") == "en"
    assert analysis.lang_id("la casa de la madre es una casa") == "es"
    q = analysis.quality_features("Hello world. This is a test!")
    assert q["n_words"] == 6.0
    assert 0 < q["punct_ratio"] < 0.2
    assert analysis.rolling_fingerprint("abc") == analysis.rolling_fingerprint("abc")
    assert analysis.rolling_fingerprint("abc" * 100) != analysis.rolling_fingerprint("abd" * 100)
