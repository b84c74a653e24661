"""Round-4 additions: Q21-style decorrelated multi-EXISTS self-join, keyed
two-snapshot diff, and the per-column dataset profiler — oracle-SQL equality
at sf0.001 plus hand-built semantic units (the classification/edge cases the
scale corpus may not pin)."""

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


def test_lone_return_supplier_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["lineitem_lone_return_supplier"](SF)
    assert len(out) > 0 and (out["numwait"] > 0).all()
    exp = _oracle(
        _views(SF, ["lineitem"]), all_oracle_sql()["lineitem_lone_return_supplier"]
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_lone_return_semantics_unit(ray_session):
    """Hand-built orders: single-supplier orders never count (EXISTS-other
    fails even when returned); multi-supplier orders with 0 or 2 returning
    suppliers never count (NOT-EXISTS-other-late fails); the cross-line OR
    per (order, supplier) holds — a supplier with one 'R' and one 'N' line
    is still a returning supplier."""
    from llm_scraper_ray.pipelines.analytics import q_lineitem_lone_return_supplier
    from llm_scraper_ray.pipelines.queries import all_oracle_sql

    d = "/tmp/llmsr_q21_unit"
    os.makedirs(d, exist_ok=True)
    rows = [
        # order 1: suppliers 10 (R), 11 (N) → lone supplier 10 counts
        (1, 10, "R"), (1, 11, "N"),
        # order 2: single supplier 10, returned → EXISTS-other fails
        (2, 10, "R"),
        # order 3: suppliers 10 (R), 11 (R) → two returners, nobody counts
        (3, 10, "R"), (3, 11, "R"),
        # order 4: suppliers 10 (N), 11 (N) → no returner
        (4, 10, "N"), (4, 11, "N"),
        # order 5: supplier 12 has lines N and R (OR → returner), 13 clean
        (5, 12, "N"), (5, 12, "R"), (5, 13, "N"),
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    out = q_lineitem_lone_return_supplier(d).set_index("s_suppkey")
    assert out["numwait"].to_dict() == {10: 1, 12: 1}
    exp = _oracle(
        _views(d, ["lineitem"]),
        __import__(
            "llm_scraper_ray.pipelines.queries", fromlist=["all_oracle_sql"]
        ).all_oracle_sql()["lineitem_lone_return_supplier"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index().reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )


def test_orders_snapshot_diff_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["orders_snapshot_diff"](SF)
    assert set(out["change"]) == {"added", "removed", "changed"}  # all classes bind
    exp = _oracle(_views(SF, ["orders"]), all_oracle_sql()["orders_snapshot_diff"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # the silent class is real: most keys are unchanged and absent
    n_orders = len(
        pd.read_parquet(os.path.join(SF, "orders.parquet"), columns=["o_orderkey"])
    )
    assert len(out) < n_orders / 2


def test_events_profile_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["events_profile"](SF)
    exp = _oracle(_views(SF, ["events"]), all_oracle_sql()["events_profile"])
    pd.testing.assert_frame_equal(
        out.sort_values("col").reset_index(drop=True),
        exp.sort_values("col").reset_index(drop=True),
        check_dtype=False,
    )
    p = out.set_index("col")
    assert p.loc["etype_ok", "n_null"] > 0  # the null path binds
    assert p.loc["event_id", "n_distinct"] == p.loc["event_id", "n"]  # unique key
    assert (
        p.loc["etype_ok", "n_distinct"] == p.loc["event_type", "n_distinct"] - 1
    )  # 'error' nulled out


def test_events_profile_unit(ray_session):
    """Synthetic events pin the profiler semantics: count(*) includes nulls,
    distinct/min/max exclude them, int columns compare numerically (100 > 99
    even though '100' < '99' lexicographically), strings lexicographically."""
    from llm_scraper_ray.pipelines.analytics import q_events_profile

    d = "/tmp/llmsr_profile_unit"
    os.makedirs(d, exist_ok=True)
    t0 = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame(
        {
            "event_id": pd.array([99, 100, 5, 7], dtype="int64"),
            "ts": [t0, t0, t0 + pd.Timedelta(days=2), t0],
            "user_id": pd.array([1, 1, 1, 2], dtype="int64"),
            "event_type": ["view", "error", "error", "apple"],
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ["{}", "{}", "{}", "{}"],
        }
    )
    tbl = pa.Table.from_pandas(ev, preserve_index=False)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"), "ts", tbl["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    p = q_events_profile(d).set_index("col")
    assert p.loc["event_id"].tolist() == [4, 0, 4, "5", "100"]  # numeric min/max
    assert p.loc["user_id"].tolist() == [4, 0, 2, "1", "2"]
    assert p.loc["event_type"].tolist() == [4, 0, 3, "apple", "view"]
    assert p.loc["etype_ok"].tolist() == [4, 2, 2, "apple", "view"]
    assert p.loc["day", "n_distinct"] == 2
