"""Round-4 additions: Q17-shape correlated small-quantity revenue, the
per-part argmin join (Q2's min-supplycost shape), and the order-independent
partition checksum — oracle-SQL equality at sf0.001 plus semantic units
(threshold strictness, argmin tie-break, permutation invariance)."""

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


def test_small_qty_revenue_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["lineitem_small_qty_revenue"](SF)
    assert len(out) == 1 and int(out["n_small"].iloc[0]) > 0
    exp = _oracle(
        _views(SF, ["lineitem", "part"]),
        all_oracle_sql()["lineitem_small_qty_revenue"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_small_qty_threshold_is_strict(ray_session):
    """A row at EXACTLY 20% of its part's average quantity must not count
    (strict <): part 1 has quantities (1, 4) -> avg 2.5, threshold 0.5 —
    nothing below; part 2 has (1, 1, 1, 1, 16) -> avg 4, threshold 0.8 —
    nothing; part 3 has (1, 9) -> avg 5, threshold 1.0: qty 1 == threshold
    exactly, excluded. Then (1, 24): threshold 2.5 -> qty 1 counts."""
    from llm_scraper_ray.pipelines.analytics import (
        SMALLQTY_BRAND,
        q_lineitem_small_qty_revenue,
    )

    d = "/tmp/llmsr_q17_unit"
    os.makedirs(d, exist_ok=True)
    li = [
        (1, 1.0, 100.0), (1, 4.0, 100.0),
        (2, 1.0, 100.0), (2, 1.0, 100.0), (2, 1.0, 100.0), (2, 1.0, 100.0),
        (2, 16.0, 100.0),
        (3, 1.0, 100.0), (3, 9.0, 100.0),          # qty 1 == 0.2*avg -> out
        (4, 1.0, 700.0), (4, 24.0, 100.0),          # qty 1 < 0.2*avg -> in
        (5, 1.0, 999.0),                             # wrong brand part
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in li], pa.int64()),
                "l_quantity": pa.array([r[1] for r in li], pa.float64()),
                "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "p_brand": pa.array(
                    [SMALLQTY_BRAND] * 4 + ["Brand#99"], pa.string()
                ),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    out = q_lineitem_small_qty_revenue(d)
    assert int(out["n_small"].iloc[0]) == 1
    assert int(out["total_cents"].iloc[0]) == 70000
    assert float(out["avg_yearly"].iloc[0]) == round(70000 / 700.0, 6)


def test_cheapest_supplier_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["part_cheapest_supplier"](SF)
    assert len(out) > 0
    exp = _oracle(
        _views(SF, ["lineitem", "supplier", "nation"]),
        all_oracle_sql()["part_cheapest_supplier"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_cheapest_supplier_tie_breaks_to_min_suppkey(ray_session):
    from llm_scraper_ray.pipelines.analytics import q_part_cheapest_supplier

    d = "/tmp/llmsr_argmin_unit"
    os.makedirs(d, exist_ok=True)
    li = [
        (1, 7, 50.0), (1, 3, 50.0), (1, 9, 49.0),   # part 1: min cents 4900 @ s=9
        (2, 8, 10.0), (2, 2, 10.0),                  # part 2: tie -> s=2
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in li], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
                "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([2, 3, 7, 8, 9], pa.int64()),
                "s_name": pa.array([f"S{k}" for k in (2, 3, 7, 8, 9)]),
                "s_nationkey": pa.array([0] * 5, pa.int64()),
            }
        ),
        os.path.join(d, "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {"n_nationkey": pa.array([0], pa.int64()), "n_name": pa.array(["N0"])}
        ),
        os.path.join(d, "nation.parquet"),
    )
    out = q_part_cheapest_supplier(d)
    assert out["p_partkey"].tolist() == [1, 2]
    assert out["s_suppkey"].tolist() == [9, 2]
    assert out["min_cents"].tolist() == [4900, 1000]


def test_partition_checksum_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["orders_partition_checksum"](SF)
    assert len(out) > 0 and (out["n_rows"] > 0).all()
    exp = _oracle(
        _views(SF, ["orders"]), all_oracle_sql()["orders_partition_checksum"]
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_partition_checksum_is_order_invariant(ray_session):
    """The whole point of a (count, sum-mod, xor) fingerprint: a permuted
    copy of the table checksums identically; a 1-cent corruption does not."""
    from llm_scraper_ray.pipelines.analytics import q_orders_partition_checksum

    src = pq.read_table(os.path.join(SF, "orders.parquet"))
    rng = np.random.default_rng(7)
    perm = rng.permutation(src.num_rows)

    d_perm = "/tmp/llmsr_cksum_perm"
    os.makedirs(d_perm, exist_ok=True)
    pq.write_table(src.take(pa.array(perm)), os.path.join(d_perm, "orders.parquet"))

    base = q_orders_partition_checksum(SF)
    permuted = q_orders_partition_checksum(d_perm)
    pd.testing.assert_frame_equal(base, permuted)

    d_bad = "/tmp/llmsr_cksum_bad"
    os.makedirs(d_bad, exist_ok=True)
    prices = src["o_totalprice"].to_numpy(zero_copy_only=False).copy()
    prices[0] += 0.01
    bad = src.set_column(
        src.schema.get_field_index("o_totalprice"),
        "o_totalprice",
        pa.array(prices, pa.float64()),
    )
    pq.write_table(bad, os.path.join(d_bad, "orders.parquet"))
    corrupted = q_orders_partition_checksum(d_bad)
    merged = base.merge(corrupted, on="month", suffixes=("_a", "_b"))
    assert (merged["n_rows_a"] == merged["n_rows_b"]).all()
    assert (merged["sum_hash_a"] != merged["sum_hash_b"]).any()
