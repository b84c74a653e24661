"""Robust statistics (exact MAD, winsorized mean) + exact integer
Mann-Whitney ROC-AUC: oracle-SQL equality at sf0.001, plus a heavy-tie
synthetic stream that forces tie groups to straddle MANY batch boundaries
(values drawn from a 3-element domain at batch_size=7) — the cross-batch
tie-correction path the real corpus (947/1000 distinct cents) barely
exercises."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(table: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{SF}/{table}.parquet')"
    )
    return con.execute(sql).df()


def test_events_value_mad_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import SQL_EVENTS_VALUE_MAD, q_events_value_mad

    out = q_events_value_mad(SF)
    exp = _oracle("events", SQL_EVENTS_VALUE_MAD)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert out["mad_cents"].iloc[0] > 0


def test_orders_winsorized_mean_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.tpch import (
        SQL_ORDERS_WINSORIZED_MEAN,
        q_orders_winsorized_mean,
    )

    out = q_orders_winsorized_mean(SF)
    exp = _oracle("orders", SQL_ORDERS_WINSORIZED_MEAN)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # the clamp must actually bite on a heavy-tailed price column
    assert out["p05_cents"].iloc[0] < out["p95_cents"].iloc[0]


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_auc_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import SQL_EVENTS_AUC, q_events_auc

    out = q_events_auc(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_AUC)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _ref_auc2(cents: np.ndarray, pos: np.ndarray) -> int:
    """Independent reference: 2U via average ranks (numpy, O(n log n))."""
    order = np.argsort(cents, kind="stable")
    c, p = cents[order], pos[order]
    n = len(c)
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    cnt = np.diff(np.append(starts, n))
    # 2·avg_rank per element = 2·min_rank + cnt − 1 (integers throughout)
    min_rank = np.repeat(starts + 1, cnt)
    two_rank = 2 * min_rank + np.repeat(cnt, cnt) - 1
    p_tot = int(p.sum())
    return int(two_rank[p == 1].sum()) - p_tot * (p_tot + 1)


@pytest.mark.parametrize("bs", [7, 16, 64])
def test_events_auc_heavy_ties(ray_session, tmp_path, bs):
    """3-element value domain ⇒ every batch boundary splits a tie group."""
    from llm_scraper_ray.pipelines.analytics import AUC_POS_TYPE, q_events_auc

    rng = np.random.default_rng(42)
    n = 2000
    vals = rng.choice([1.0, 2.0, 3.0], size=n)
    types = rng.choice([AUC_POS_TYPE, "view"], size=n, p=[0.3, 0.7])
    tab = pa.Table.from_pydict(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tab, os.path.join(tmp_path, "events.parquet"))
    out = q_events_auc(str(tmp_path), batch_size=bs)
    cents = np.floor(vals * 100.0).astype(np.int64)
    pos = (types == AUC_POS_TYPE).astype(np.int64)
    assert int(out["u2"].iloc[0]) == _ref_auc2(cents, pos)
    assert int(out["n_pos"].iloc[0]) == int(pos.sum())


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_twap_matches_oracle(ray_session, bs):
    """Seam fixup stressed: at bs=7 nearly every user's run is split."""
    from llm_scraper_ray.pipelines.analytics import SQL_EVENTS_TWAP, q_events_twap

    out = q_events_twap(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_TWAP)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert len(out) > 0


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_orders_gini_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.tpch import SQL_ORDERS_GINI, q_orders_gini

    out = q_orders_gini(SF, batch_size=bs)
    exp = _oracle("orders", SQL_ORDERS_GINI)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


@pytest.mark.parametrize("bs", [7, 16])
def test_orders_gini_heavy_ties(ray_session, tmp_path, bs):
    """3-value domain at tiny batches: tie blocks span many batch seams,
    and all-one-value batches force the (first_val, last_val) positional
    ordering (first_val alone would misorder [v,v] after [v,w])."""
    from llm_scraper_ray.pipelines.tpch import q_orders_gini

    rng = np.random.default_rng(7)
    n = 500
    vals = rng.choice([10.0, 20.0, 30.0], size=n)
    tab = pa.Table.from_pydict({"o_totalprice": pa.array(vals, pa.float64())})
    pq.write_table(tab, os.path.join(tmp_path, "orders.parquet"))
    out = q_orders_gini(str(tmp_path), batch_size=bs)
    c = np.sort(np.floor(vals * 100.0).astype(np.int64))
    i = np.arange(1, n + 1, dtype=np.int64)
    num = 2 * int((i * c).sum()) - (n + 1) * int(c.sum())
    assert int(out["gini_num"].iloc[0]) == num
    assert int(out["gini_den"].iloc[0]) == n * int(c.sum())
