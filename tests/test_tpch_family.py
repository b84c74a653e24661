"""TPC-H-shaped relational classes (pipelines/tpch.py): oracle-SQL equality
at sf0.001 — the same compare the driver runs at sf0.01 — plus the semantic
invariants each shape exists for (exact integer decisions, scale-invariant
thresholds, majority strictness, argmax tie integrity)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["lineitem", "orders", "customer", "supplier", "nation", "region", "part"]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _assert_match(out: pd.DataFrame, exp: pd.DataFrame):
    out = out[sorted(out.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


@pytest.mark.parametrize(
    "qname",
    [
        "q7_nation_volume",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_revenue",
        "part_value_concentration",
        "q12_priority_class",
        "q14_promo_effect",
        "q15_top_supplier",
        "supplier_part_counts",
        "q19_disjunctive_revenue",
        "supplier_part_share",
        "missed_opportunities",
    ],
)
def test_tpch_query_matches_oracle(ray_session, qname):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()[qname](SF)
    exp = _oracle(all_oracle_sql()[qname])
    _assert_match(out, exp)


def test_q15_argmax_is_exact_integer(ray_session):
    """The decided quantity (max revenue) must be integer cents — a float
    argmax could flip across engines."""
    from llm_scraper_ray.pipelines.tpch import q_q15_top_supplier

    out = q_q15_top_supplier(SF)
    assert out["total_rev_cents"].dtype.kind == "i"
    assert len(out) >= 1


def test_supplier_part_share_majority_is_strict(ray_session):
    """2·qty_supp > qty_part is strict: a supplier with exactly half the
    volume must NOT appear; every emitted share exceeds 1/2 exactly."""
    from llm_scraper_ray.pipelines.tpch import q_supplier_part_share

    out = q_supplier_part_share(SF)
    assert (2 * out["qty_supp"] > out["qty_part"]).all()
    # at most one majority supplier can exist per part
    assert out["p_partkey"].is_unique


def test_part_value_concentration_threshold_scale_invariant(ray_session):
    """Every survivor exceeds 1.5× the mean per-part value (exact ints)."""
    from llm_scraper_ray.pipelines.tpch import q_part_value_concentration

    out = q_part_value_concentration(SF)
    tot = _oracle(
        "SELECT CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT)"
        " AS t, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n FROM lineitem"
    )
    t, n = int(tot["t"][0]), int(tot["n"][0])
    assert (2 * out["value_cents"].to_numpy(np.int64) * n > 3 * t).all()


def test_q8_share_is_quotient_of_exact_ints(ray_session):
    from llm_scraper_ray.pipelines.tpch import q_q8_market_share

    out = q_q8_market_share(SF)
    assert out["nat_cents"].dtype.kind == "i" and out["tot_cents"].dtype.kind == "i"
    recomputed = (out["nat_cents"] / out["tot_cents"]).round(6)
    assert (recomputed == out["mkt_share"]).all()


def test_q4_order_priority(ray_session):
    import duckdb

    from llm_scraper_ray.pipelines.tpch import SQL_Q4_ORDER_PRIORITY, q_q4_order_priority

    out = q_q4_order_priority(SF)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    exp = con.sql(SQL_Q4_ORDER_PRIORITY).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert out["order_count"].sum() > 0


def test_q6_forecast_revenue(ray_session):
    import duckdb

    from llm_scraper_ray.pipelines.tpch import (
        SQL_Q6_FORECAST_REVENUE,
        q_q6_forecast_revenue,
    )

    out = q_q6_forecast_revenue(SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    exp = con.sql(SQL_Q6_FORECAST_REVENUE).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert int(out["revenue_num"].iloc[0]) > 0
