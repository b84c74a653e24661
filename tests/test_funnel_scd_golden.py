"""Round-4 additions: ordered time-window funnel, SCD2 validity-interval
reconstruction, 3-way golden-record majority merge — oracle-SQL equality at
sf0.001 plus semantic units (strict-after anchoring, open intervals,
majority flips)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _oracle(view_sqls: list[str], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for v in view_sqls:
        con.execute(v)
    return con.execute(sql).df()


def _views(d: str, tables: list[str]) -> list[str]:
    return [
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        for t in tables
    ]


def test_funnel_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["events_funnel_windowed"](SF)
    exp = _oracle(_views(SF, ["events"]), all_oracle_sql()["events_funnel_windowed"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    n = out["n_users"].to_numpy()
    assert n[0] > n[1] > n[2] >= 0  # non-degenerate at this fixture


def test_funnel_anchors_strictly_after(ray_session):
    """A click AT the first view's timestamp must not convert (strict >);
    a click inside W converts; a purchase anchored on the CLICK's time (not
    the view's) converts even when outside W of the view."""
    from llm_scraper_ray.pipelines.analytics import FUNNEL_W_US, q_events_funnel_windowed

    d = "/tmp/llmsr_funnel_unit"
    os.makedirs(d, exist_ok=True)
    base = 1_700_000_000_000_000
    rows = [
        # user 1: click at exactly t0 -> ignored; next click within W ok;
        # purchase within W of the CLICK but beyond W of the view -> ok
        (1, base, "view"), (1, base, "click"),
        (1, base + FUNNEL_W_US - 5, "click"),
        (1, base + FUNNEL_W_US - 5 + FUNNEL_W_US, "purchase"),
        # user 2: click after W -> funnel stops at view
        (2, base, "view"), (2, base + FUNNEL_W_US + 1, "click"),
        (2, base + FUNNEL_W_US + 2, "purchase"),
        # user 3: never views -> counted nowhere
        (3, base, "click"), (3, base + 1, "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    out = q_events_funnel_windowed(d)
    assert out["n_users"].tolist() == [2, 1, 1]


def test_scd_intervals_match_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["events_scd_intervals"](SF)
    assert len(out) > 0
    exp = _oracle(_views(SF, ["events"]), all_oracle_sql()["events_scd_intervals"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # exactly one open interval per user; intervals tile without gaps
    for _, g in out.groupby("user_id"):
        assert (g["valid_to"] == -1).sum() == 1
        closed = g[g["valid_to"] != -1]
        nxt = g["valid_from"].to_numpy()[1:]
        assert (closed["valid_to"].to_numpy() == nxt).all()


def test_golden_record_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["orders_golden_record"](SF)
    assert len(out) > 0
    exp = _oracle(_views(SF, ["orders"]), all_oracle_sql()["orders_golden_record"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_golden_record_majority_semantics(ray_session):
    """k divisible by 11 AND 23: sides A and C both bump cents, so the
    MAJORITY is the bumped value — the vote must flip away from the base.
    k divisible by 11 only: majority keeps the base cents. Status corruption
    (side B) is always outvoted 2-1."""
    from llm_scraper_ray.pipelines.analytics import q_orders_golden_record

    d = "/tmp/llmsr_golden_unit"
    os.makedirs(d, exist_ok=True)
    ks = np.array([11 * 23, 11, 13, 17, 5], dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ks),
                "o_totalprice": pa.array([100.0] * len(ks), pa.float64()),
                "o_orderstatus": pa.array(["F"] * len(ks)),
                "o_orderdate": pa.array(
                    [1_700_000_000_000_000] * len(ks), pa.timestamp("us")
                ),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    out = q_orders_golden_record(d).set_index("o_orderkey")
    assert int(out.loc[11 * 23, "g_cents"]) == 10100  # majority = bumped
    assert int(out.loc[11, "g_cents"]) == 10000       # majority = base
    assert out.loc[13, "g_st"] == "F"                  # corruption outvoted
    assert int(out.loc[17, "g_day"]) == 1_700_000_000_000_000 // 86_400_000_000
    assert 5 not in out.index                          # clean key is silent
