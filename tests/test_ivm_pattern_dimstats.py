"""Round-4 additions: incremental view maintenance (delta merge ==
recompute), MATCH_RECOGNIZE-class sequence-pattern matching, per-dimension
embedding stats — oracle-SQL equality at sf0.001 plus semantic units."""

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


def test_view_maintenance_matches_recompute(ray_session):
    """The oracle recomputes the view from the CURRENT table; the engine
    never sees the current table — it merges a base aggregate with CDC
    delta partials. Equality proves the IVM contract."""
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["orders_view_maintenance"](SF)
    assert len(out) > 0
    exp = _oracle(_views(SF, ["orders"]), all_oracle_sql()["orders_view_maintenance"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_view_maintenance_delta_semantics(ray_session):
    """Inserted keys contribute full rows at their CURRENT price (including
    their own update when 31|k); updated base keys contribute a pure
    +100-cents delta with no count change."""
    from llm_scraper_ray.pipelines.analytics import q_orders_view_maintenance

    d = "/tmp/llmsr_ivm_unit"
    os.makedirs(d, exist_ok=True)
    # keys: 101 (insert), 31 (update), 101*31=3131 (insert carrying its own
    # update), 7 (plain base)
    ks = np.array([101, 31, 3131, 7], dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ks),
                "o_totalprice": pa.array([100.0] * 4, pa.float64()),
                "o_orderdate": pa.array(
                    [1_700_000_000_000_000] * 4, pa.timestamp("us")
                ),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    out = q_orders_view_maintenance(d)
    assert len(out) == 1
    assert int(out["n_orders"].iloc[0]) == 4
    # 7: 10000; 31: 10000+100; 101: 10000; 3131: 10000+100
    assert int(out["sum_cents"].iloc[0]) == 40200


def test_pattern_match_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["events_pattern_match"](SF)
    exp = _oracle(_views(SF, ["events"]), all_oracle_sql()["events_pattern_match"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # selective at this fixture: some but not all users match
    import pyarrow.parquet as _pq

    n_users = len(
        np.unique(_pq.read_table(os.path.join(SF, "events.parquet"))["user_id"])
    )
    assert 0 < len(out) < n_users


def test_pattern_match_semantics_unit(ray_session):
    """s[cv]{2,}p: an error inside the run breaks it; exactly two
    clicks/views satisfy the {2,}; one does not."""
    from llm_scraper_ray.pipelines.analytics import q_events_pattern_match

    d = "/tmp/llmsr_pattern_unit"
    os.makedirs(d, exist_ok=True)
    seqs = {
        1: "scvp",    # match: 2 in [cv]
        2: "scp",     # no: only 1
        3: "scvevcp", # no: error splits; tail 'vcp' lacks the signup
        4: "xscvvvp", # match inside longer seq (x stands in for view)
        5: "scvpe",   # match: trailing error after purchase is fine
    }
    t = {"c": "click", "v": "view", "p": "purchase", "s": "signup",
         "e": "error", "x": "view"}
    rows = []
    for u, seq in seqs.items():
        for i, ch in enumerate(seq):
            rows.append((u, 1_700_000_000_000_000 + i * 1_000_000, t[ch]))
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
    out = q_events_pattern_match(d)
    assert out["user_id"].tolist() == [1, 4, 5]


def test_embedding_dim_stats_match_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["embedding_dim_stats"](SF)
    assert len(out) == 64 and (out["n"] == out["n"].iloc[0]).all()
    exp = _oracle(
        _views(SF, ["embeddings"]), all_oracle_sql()["embedding_dim_stats"]
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    assert (out["var_q"] > 0).all()
