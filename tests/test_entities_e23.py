"""E23 pattern-extraction queries + the E15/E12 camel-case round-trip.

The reference camelizes quoted multi-word entities in LLM responses before
parsing (``response_cleaner.py:48-51``) and splits camel case back apart
when matching entities against text (``precision_recall.py:60-72``); the
generated-triplet pipeline here wires both ends.  E23's price/time/number
patterns (``util/scraper/proxy.py:13-15``) run as oracled queries over the
events/orders tables.
"""

import pandas as pd
import pytest

from llm_scraper_ray.functions.textnorm import split_camel_case
from llm_scraper_ray.functions.triplets import camelize_quoted_phrases

SF = "/root/testdata/sf0.001"


def test_camelize_quoted_phrases():
    s = "(('device', 'Govee Smart Light Bulbs'), 'performs', ('process', 'tracking'))"
    out = camelize_quoted_phrases(s)
    assert "'GoveeSmartLightBulbs'" in out
    # single-word quoted strings are untouched
    assert "'performs'" in out and "'tracking'" in out


def test_camelize_split_round_trip():
    # E15 camelize → E12 split restores a spaced, title-cased phrase
    assert split_camel_case("GoveeSmartLightBulbs") == "Govee Smart Light Bulbs"


def test_generator_emits_camelized_names():
    from llm_scraper_ray.stages.llmshim import TripletGenerator

    gen = TripletGenerator()
    trips = gen.generate(["Smart Light Bar", "Acme Corp", "Motion Sensor"])
    names = {sn for (st, sn), _, _ in trips} | {on for _, _, (ot, on) in trips}
    assert "SmartLightBar" in names  # multi-word → camelized (E15)
    assert "AcmeCorp" in names


def test_validation_cascade_splits_camel_for_nli():
    from llm_scraper_ray.stages.llmshim import ValidationCascade

    v = ValidationCascade()
    trip = (("device", "SmartLightBar"), "performs", ("process", "tracking"))
    text = "The smart light bar performs tracking. Unrelated sentence."
    w, method = v.validate(trip, text)
    if method == "nli":
        # the camelized name must still match the spaced source text
        assert w > 0.0


def test_event_props_numbers_matches_oracle():
    import duckdb

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["event_props_numbers"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(all_oracle_sql()["event_props_numbers"]).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_order_price_strings_matches_oracle():
    import duckdb

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["order_price_strings"](SF)
    assert (out["price_str"].str.startswith("$")).all()  # PRICE_RE really matched
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    exp = con.execute(all_oracle_sql()["order_price_strings"]).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_sample_hash_matches_oracle():
    import duckdb

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_sample_hash"](SF)
    assert len(out) == 50
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(all_oracle_sql()["doc_sample_hash"]).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_session_windows_boundary_merge():
    """Tiny batches force sessions to straddle block edges — the summary
    merge must reproduce the single-pass result exactly."""
    import duckdb

    from llm_scraper_ray.pipelines.queries import _SQL_SESSION_WINDOWS, q_session_windows

    out = q_session_windows(SF, batch_size=16)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(_SQL_SESSION_WINDOWS).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
