"""Legacy-format ingestion (reference on-disk row shapes → Arrow)."""

from llm_scraper_ray.sources.legacy import (
    parse_content_line,
    read_extracted_rows,
    read_raw_triplet_lines,
    read_validated_triplet_lines,
)


def test_parse_content_line():
    line = "{'product_name': 'Acme Widget', 'highlights': 'Fast|Cheap'} https://h.example/item1"
    fields, url = parse_content_line(line)
    assert fields == {"product_name": "Acme Widget", "highlights": "Fast|Cheap"}
    assert url == "https://h.example/item1"
    assert parse_content_line("not a dict https://h.example/x") is None
    assert parse_content_line("{'a': 1} no-url-here") is None


def test_read_extracted_rows():
    lines = [
        "{'a': 'x'} https://h.example/1",
        "",
        "garbage line",
        "{'b': 'y', 'c': 'z'} https://h.example/2",
    ]
    t = read_extracted_rows(lines)
    assert t.num_rows == 2
    assert t["url"].to_pylist() == ["https://h.example/1", "https://h.example/2"]
    assert t["fields"].to_pylist()[1] == [("b", "y"), ("c", "z")]


def test_read_raw_triplet_lines():
    lines = [
        "(('device', 'Light Bar'), 'manufacturedBy', ('manufacturer', 'Acme')) "
        "87.5 https://h.example/1 2025-06-01 12:00:00",
        "malformed",
    ]
    t = read_raw_triplet_lines(lines)
    assert t.num_rows == 1
    r = t.to_pylist()[0]
    assert r["subj_name"] == "Light Bar" and r["pred"] == "manufacturedBy"
    assert r["weight"] == 87.5 and r["url"] == "https://h.example/1"
    assert r["ts"] == "2025-06-01 12:00:00"


def test_read_validated_triplet_lines():
    lines = ["(('device', 'Bar'), 'performs', ('process', 'tracking'), 62.0)"]
    t = read_validated_triplet_lines(lines)
    assert t.num_rows == 1
    r = t.to_pylist()[0]
    assert r["obj_name"] == "tracking" and r["weight"] == 62.0
