"""Round-4 additions: one-pass K-scenario what-if sweep, sorted-neighborhood
ER blocking with exact edit-distance verify, and grouped mode — oracle-SQL
equality at sf0.001 plus semantic units (window completeness across block
ghosts, tie-breaks)."""

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


def test_discount_scenarios_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["orders_discount_scenarios"](SF)
    assert len(out) == 8 and (out["n_affected"] > 0).any()
    exp = _oracle(_views(SF, ["orders"]), all_oracle_sql()["orders_discount_scenarios"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # net + discount reconstructs one shared gross — the single-scan invariant
    gross = (out["net_cents"] + out["discount_cents"]).unique()
    assert len(gross) == 1


def test_snm_pairs_match_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["part_name_snm_pairs"](SF)
    assert len(out) > 0 and (out["lev"] <= 2).all()
    exp = _oracle(_views(SF, ["part"]), all_oracle_sql()["part_name_snm_pairs"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_snm_window_spans_block_boundaries(ray_session):
    """Pairs whose ranks straddle a SPAN boundary must still be found via
    the ghost emission: build names so that EVERY adjacent rank pair is a
    lev-1 match — the output must contain exactly n-1 d=1 pairs plus all
    in-window d<WIN pairs, regardless of where blocks split."""
    from llm_scraper_ray.pipelines.analytics import (
        SNM_WIN,
        q_part_name_snm_pairs,
    )

    d = "/tmp/llmsr_snm_unit"
    os.makedirs(d, exist_ok=True)
    n = 200  # > 3 SPAN blocks
    # names 'aaa…a' with increasing single-char suffix rank: 'a0','a1',…
    # sorted order == numeric order; lev(name_i, name_j)<=2 for all i,j
    # sharing the same length → all in-window pairs verify.
    names = [f"a{i:03d}" for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
                "p_name": pa.array(names),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    out = q_part_name_snm_pairs(d)
    # every rank pair with distance < WIN and lev<=2: names differ in at
    # most 3 digit positions → lev can exceed 2; count via brute force
    from llm_scraper_ray.pipelines.analytics import SNM_MAXLEV, _levenshtein

    expect = []
    for i in range(n):
        for j in range(i + 1, min(i + SNM_WIN, n)):
            if _levenshtein(names[i], names[j]) <= SNM_MAXLEV:
                expect.append((i, j))
    got = list(zip(out["pa_key"].tolist(), out["pb_key"].tolist()))
    assert sorted(got) == sorted(expect)
    # d=1 neighbors differ by one digit most of the time; ensure pairs that
    # straddle every SPAN multiple are present (ghost path exercised)
    from llm_scraper_ray.pipelines.analytics import SNM_SPAN

    straddlers = [
        (a, b) for (a, b) in expect if (a // SNM_SPAN) != (b // SNM_SPAN)
    ]
    assert straddlers and all(p in got for p in straddlers)


def test_customer_mode_segment_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["customer_mode_segment"](SF)
    assert len(out) > 0
    exp = _oracle(
        _views(SF, ["customer", "nation"]), all_oracle_sql()["customer_mode_segment"]
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_mode_tie_breaks_lexicographically(ray_session):
    from llm_scraper_ray.pipelines.analytics import q_customer_mode_segment

    d = "/tmp/llmsr_mode_unit"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(6, dtype=np.int64)),
                "c_nationkey": pa.array([0, 0, 0, 0, 1, 1], pa.int64()),
                "c_mktsegment": pa.array(
                    ["MACHINERY", "AUTOMOBILE", "MACHINERY", "AUTOMOBILE",
                     "HOUSEHOLD", "HOUSEHOLD"]
                ),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["N_A", "N_B"]),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )
    out = q_customer_mode_segment(d)
    # nation 0: 2-2 tie -> AUTOMOBILE (lexicographically first)
    assert out.loc[out["n_name"] == "N_A", "mode_segment"].iloc[0] == "AUTOMOBILE"
    assert out.loc[out["n_name"] == "N_B", "mode_segment"].iloc[0] == "HOUSEHOLD"
