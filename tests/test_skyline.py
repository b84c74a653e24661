"""orders_skyline — multi-dimensional Pareto frontier: unit semantics
(dominance, duplicate-tuple survival), the mergeability/associativity of the
local-skyline cut at hostile chunk sizes, and oracle-SQL equality at
sf0.001."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _oracle(d: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')"
    )
    return con.execute(sql).df()


def test_orders_skyline_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["orders_skyline"](SF)
    assert 0 < len(out) < 200  # a frontier, not the table
    exp = _oracle(SF, all_oracle_sql()["orders_skyline"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_skyline_semantics_unit(ray_session):
    """Hand-built frontier: strictly-dominated rows vanish, incomparable
    rows survive, and IDENTICAL dim tuples all survive (strict dominance
    needs a differing coordinate) — for the engine AND the oracle."""
    from llm_scraper_ray.pipelines.analytics import q_orders_skyline
    from llm_scraper_ray.pipelines.queries import all_oracle_sql

    d = "/tmp/llmsr_skyline_unit"
    os.makedirs(d, exist_ok=True)
    day0 = pd.Timestamp("2020-01-01")
    rows = [
        # (key, price, day-offset, priority)  maximize price, minimize day+prio
        (1, 100.0, 0, "1-URGENT"),   # frontier (best everything)
        (2, 100.0, 0, "1-URGENT"),   # identical tuple → also survives
        (3, 90.0, 0, "1-URGENT"),    # dominated by 1 (price lower)
        (4, 120.0, 5, "3-MEDIUM"),   # frontier (higher price)
        (5, 120.0, 5, "2-HIGH"),     # dominates 4? no — same price/day, better prio → 4 dominated
        (6, 80.0, -1, "5-LOW"),      # frontier (earliest day)
        (7, 80.0, -1, "5-LOW"),      # identical tuple → survives
        (8, 79.0, -1, "5-LOW"),      # dominated by 6
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
                "o_orderdate": pa.array(
                    [day0 + pd.Timedelta(days=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    out = q_orders_skyline(d)
    assert out["o_orderkey"].tolist() == [1, 2, 5, 6, 7]
    exp = _oracle(d, all_oracle_sql()["orders_skyline"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_skyline_fold_chunk_invariance_and_merge():
    """The fold is exact at any chunk size, and merging partial skylines
    re-folded equals the one-shot skyline (the property the per-batch cut
    and a 100-TB tree reduce both rest on)."""
    from llm_scraper_ray.pipelines.analytics import _skyline_fold

    # deterministic pseudo-random points with many ties (small int domain)
    n = 4000
    x = (np.arange(n, dtype=np.int64) * 2654435761) % 97
    y = (np.arange(n, dtype=np.int64) * 40503) % 89
    z = (np.arange(n, dtype=np.int64) * 9973) % 7
    P = np.stack([x, y, z], axis=1)
    keys = np.arange(n, dtype=np.int64)

    def as_set(S, SK):
        return set(map(tuple, np.column_stack([S, SK[:, None]])))

    S0, K0 = _skyline_fold(P, keys)
    assert 0 < len(S0) < n
    for chunk in (1, 3, 7, 4096):
        S, K = _skyline_fold(P, keys, chunk=chunk)
        assert as_set(S, K) == as_set(S0, K0)
    # split-merge associativity
    Sa, Ka = _skyline_fold(P[: n // 3], keys[: n // 3], chunk=5)
    Sb, Kb = _skyline_fold(P[n // 3 :], keys[n // 3 :], chunk=11)
    Sm, Km = _skyline_fold(
        np.concatenate([Sa, Sb]), np.concatenate([Ka, Kb]), chunk=13
    )
    assert as_set(Sm, Km) == as_set(S0, K0)
    # no skyline member is dominated by any input point (exactness)
    dom = (
        (P[None, :, :] >= S0[:, None, :]).all(2)
        & (P[None, :, :] != S0[:, None, :]).any(2)
    ).any(1)
    assert not dom.any()
