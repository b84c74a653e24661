"""Windowed / ranked event analytics (pipelines/analytics.py) + the new
curation ops: oracle-SQL equality at sf0.001 — the same compare the driver
runs at sf0.01 — with the edge-fixup paths boundary-stressed at
batch_size=16 (every row near a block edge)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(table: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{SF}/{table}.parquet')"
    )
    return con.execute(sql).df()


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_topk_per_user_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_TOPK,
        TOPK_K,
        q_events_topk_per_user,
    )

    out = q_events_topk_per_user(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_TOPK)
    assert out["rank"].max() <= TOPK_K
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_sliding_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import SQL_EVENTS_SLIDING, q_events_sliding

    out = q_events_sliding(SF)
    exp = _oracle("events", SQL_EVENTS_SLIDING)
    # every event lands in exactly 4 windows
    assert out["n_events"].sum() == 4 * duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_window_count_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_WINDOW_COUNT,
        q_events_window_count,
    )

    out = q_events_window_count(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_WINDOW_COUNT)
    assert (out["n_prev_hour"] > 0).any(), "window must be non-trivial"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_range_join_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_RANGE_JOIN,
        q_events_range_join,
    )

    out = q_events_range_join(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_RANGE_JOIN)
    assert len(out) > 0, "range join must produce pairs at sf0.001"
    assert (out["gap_s"] >= 0).all() and (out["gap_s"] < 24 * 3600).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_funnel_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import SQL_EVENTS_FUNNEL, q_events_funnel

    out = q_events_funnel(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_FUNNEL)
    assert out["funnel_stage"].max() == 3, "some user must complete the funnel"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_distinct_users_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_DISTINCT_USERS,
        q_events_distinct_users,
    )

    out = q_events_distinct_users(SF)
    exp = _oracle("events", SQL_EVENTS_DISTINCT_USERS)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_distinct_hll_within_bound(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_DISTINCT_USERS,
        q_events_distinct_hll,
    )

    est = q_events_distinct_hll(SF).set_index("event_type")["n_users_est"]
    exact = _oracle("events", SQL_EVENTS_DISTINCT_USERS).set_index("event_type")[
        "n_users"
    ]
    assert set(est.index) == set(exact.index)
    for ty in exact.index:
        rel = abs(est[ty] - exact[ty]) / max(1, exact[ty])
        assert rel < 0.05, f"{ty}: est {est[ty]} vs exact {exact[ty]}"


def test_orders_rollup_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import SQL_ORDERS_ROLLUP, q_orders_rollup

    out = q_orders_rollup(SF)
    exp = _oracle("orders", SQL_ORDERS_ROLLUP)
    # every level present: finest rows + per-priority subtotals + grand total
    assert (out["o_orderpriority"] == "ALL").sum() == 1
    assert (out["o_orderstatus"] == "ALL").sum() > 1
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_split_assign_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import (
        SQL_DOC_SPLIT_ASSIGN,
        q_doc_split_assign,
    )

    out = q_doc_split_assign(SF)
    exp = _oracle("documents", SQL_DOC_SPLIT_ASSIGN)
    frac = (out["split"] == "train").mean()
    assert 0.7 < frac < 0.9, "hash split must land near the 80% band"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_tfidf_top_terms_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import (
        SQL_DOC_TFIDF_TOP_TERMS,
        q_doc_tfidf_top_terms,
    )

    out = q_doc_tfidf_top_terms(SF)
    exp = _oracle("documents", SQL_DOC_TFIDF_TOP_TERMS)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_search_terms_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import (
        SEARCH_TERMS,
        SQL_DOC_SEARCH_TERMS,
        q_doc_search_terms,
    )

    out = q_doc_search_terms(SF)
    exp = _oracle("documents", SQL_DOC_SEARCH_TERMS)
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert 0 < len(out) < n_docs, "AND search must be non-trivial"
    assert (out[[f"n_{t}" for t in SEARCH_TERMS]] > 0).all().all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_event_value_quantiles_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENT_VALUE_QUANTILES,
        q_event_value_quantiles_by_type,
    )

    out = q_event_value_quantiles_by_type(SF)
    exp = _oracle("events", SQL_EVENT_VALUE_QUANTILES)
    assert out.groupby("event_type").size().eq(5).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_bigram_scores_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import (
        SQL_DOC_BIGRAM_SCORES,
        q_doc_bigram_scores,
    )

    out = q_doc_bigram_scores(SF)
    exp = _oracle("documents", SQL_DOC_BIGRAM_SCORES)
    assert (out["sum_freq"] >= out["n_bigrams"]).all()  # every freq >= 1
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_dup_span_scrub_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import (
        SCRUB_K,
        SQL_DOC_DUP_SPAN_SCRUB,
        q_doc_dup_span_scrub,
    )

    out = q_doc_dup_span_scrub(SF)
    exp = _oracle("documents", SQL_DOC_DUP_SPAN_SCRUB)
    assert len(out) > 0, "generated corpora repeat template phrases"
    # covered tokens per doc are bounded by K per dup instance
    assert (out["dup_tokens"] <= out["n_dup5"] * SCRUB_K).all()
    assert (out["dup_tokens"] >= SCRUB_K).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_q3_shipping_priority_matches_oracle(ray_session):
    import duckdb

    from llm_scraper_ray.pipelines.queries import (
        _SQL_Q3_SHIPPING,
        q_q3_shipping_priority,
    )

    out = q_q3_shipping_priority(SF)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.execute(_SQL_Q3_SHIPPING).df()
    assert len(out) == 10
    assert list(out["revenue"]) == sorted(out["revenue"], reverse=True)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_part_name_fuzzy_join_matches_oracle(ray_session):
    import duckdb

    from llm_scraper_ray.pipelines.queries import (
        _SQL_PART_NAME_FUZZY,
        q_part_name_fuzzy_join,
    )

    out = q_part_name_fuzzy_join(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{SF}/part.parquet')"
    )
    exp = con.execute(_SQL_PART_NAME_FUZZY).df()
    assert len(out) > 0 and (out["name_a"] < out["name_b"]).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_levenshtein_is_duckdb_twin():
    import duckdb
    import random
    import string

    from llm_scraper_ray.pipelines.queries import _levenshtein

    rng = random.Random(3)
    con = duckdb.connect()
    for _ in range(200):
        a = "".join(rng.choices(string.ascii_lowercase + " ", k=rng.randint(0, 12)))
        b = "".join(rng.choices(string.ascii_lowercase + " ", k=rng.randint(0, 12)))
        assert (
            con.execute("select levenshtein(?,?)", [a, b]).fetchone()[0]
            == _levenshtein(a, b)
        )


def test_orders_cube_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import SQL_ORDERS_CUBE, q_orders_cube

    out = q_orders_cube(SF)
    exp = _oracle("orders", SQL_ORDERS_CUBE)
    # all four levels present: finest + both marginals + grand total
    n_prio_all = (out["o_orderpriority"] == "ALL").sum()
    n_stat_all = (out["o_orderstatus"] == "ALL").sum()
    assert n_prio_all > 1 and n_stat_all > 1  # marginals + the shared total
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_retention_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_RETENTION,
        q_events_retention,
    )

    out = q_events_retention(SF)
    exp = _oracle("events", SQL_EVENTS_RETENTION)
    assert (out["week_offset"] >= 0).all()
    # offset-0 count per cohort == cohort size (every user is active in
    # their own first week by construction)
    zero = out[out["week_offset"] == 0]
    assert zero["n_users"].sum() == duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_outliers_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_OUTLIERS,
        q_events_outliers,
    )

    out = q_events_outliers(SF)
    exp = _oracle("events", SQL_EVENTS_OUTLIERS)
    assert (out["n_outliers"] <= out["n"]).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_hourly_users_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_HOURLY_USERS,
        q_events_hourly_users,
    )

    out = q_events_hourly_users(SF)
    exp = _oracle("events", SQL_EVENTS_HOURLY_USERS)
    assert len(out) > 1
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_q5_local_supplier_volume_matches_oracle(ray_session):
    import duckdb

    from llm_scraper_ray.pipelines.queries import (
        _SQL_Q5_LOCAL,
        q_q5_local_supplier_volume,
    )

    out = q_q5_local_supplier_volume(SF)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.execute(_SQL_Q5_LOCAL).df()
    assert len(out) > 0
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_orders_ntile_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import (
        NTILE_K,
        SQL_ORDERS_NTILE,
        q_orders_ntile,
    )

    out = q_orders_ntile(SF, batch_size=bs)
    exp = _oracle("orders", SQL_ORDERS_NTILE)
    # ranks are a permutation of 1..n; tiles obey SQL size semantics
    n = len(out)
    assert sorted(out["rnk"]) == list(range(1, n + 1))
    sizes = out["tile"].value_counts()
    q, rem = divmod(n, NTILE_K)
    assert all(sizes[t] == q + (1 if t <= rem else 0) for t in sizes.index)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_orders_bloom_semijoin_matches_oracle_and_prunes(ray_session):
    import numpy as np

    from llm_scraper_ray.pipelines.queries import (
        _BLOOM_SEGMENT,
        _SQL_ORDERS_BLOOM,
        _bloom_positions,
        q_orders_bloom_semijoin,
    )

    out = q_orders_bloom_semijoin(SF)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.execute(_SQL_ORDERS_BLOOM).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # the filter must actually prune: non-segment customers mostly miss
    cust = con.execute(
        "SELECT c_custkey, c_mktsegment FROM customer"
    ).df()
    in_seg = cust[cust["c_mktsegment"] == _BLOOM_SEGMENT]["c_custkey"].to_numpy()
    from llm_scraper_ray.pipelines.queries import _BLOOM_M

    bits = np.zeros(_BLOOM_M, dtype=bool)
    bits[_bloom_positions(in_seg).ravel()] = True
    other = cust[cust["c_mktsegment"] != _BLOOM_SEGMENT]["c_custkey"].to_numpy()
    assert bits[_bloom_positions(in_seg)].all()  # zero false negatives
    fp = bits[_bloom_positions(other)].all(axis=1).mean()
    assert fp < 0.05  # 16 KiB filter keeps false positives marginal


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_moving_avg_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import (
        MAVG_K,
        SQL_EVENTS_MOVING_AVG,
        q_events_moving_avg,
    )

    out = q_events_moving_avg(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_MOVING_AVG)
    assert out["w_n"].max() == MAVG_K + 1, "some frame must be full"
    assert out["w_n"].min() == 1, "partition-first rows have a 1-row frame"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_orders_cust_distribution_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_ORDERS_CUST_DISTRIBUTION,
        q_orders_cust_distribution,
    )

    out = q_orders_cust_distribution(SF)
    con = duckdb.connect()
    for tbl in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    exp = con.execute(SQL_ORDERS_CUST_DISTRIBUTION).df()
    assert (out["c_count"] == 0).any(), "zero-order bin must be exercised"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_value_histogram_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_VALUE_HISTOGRAM,
        q_events_value_histogram,
    )

    out = q_events_value_histogram(SF)
    exp = _oracle("events", SQL_EVENTS_VALUE_HISTOGRAM)
    assert out["bin"].nunique() > 3, "histogram must have several bins"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_pivot_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import SQL_EVENTS_PIVOT, q_events_pivot

    out = q_events_pivot(SF)
    exp = _oracle("events", SQL_EVENTS_PIVOT)
    assert (
        out[[c for c in out.columns if c.startswith("n_") and c != "n_total"]].sum(axis=1)
        == out["n_total"]
    ).all(), "type counts must partition the total"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_events_transitions_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_TRANSITIONS,
        q_events_transitions,
    )

    out = q_events_transitions(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_TRANSITIONS)
    # every event except each user's first contributes one transition
    n_events = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()
    assert out["n"].sum() == n_events[0] - n_events[1]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_user_sets_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_USER_SETS,
        q_events_user_sets,
    )

    out = q_events_user_sets(SF)
    exp = _oracle("events", SQL_EVENTS_USER_SETS)
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert out["n_users"].sum() == n_users, "set ops must partition the universe"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_lineitem_corr_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import SQL_LINEITEM_CORR, q_lineitem_corr

    out = q_lineitem_corr(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    exp = con.execute(SQL_LINEITEM_CORR).df()
    assert (out["corr_qty_price"].abs() <= 1.0).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_orders_open_by_month_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_ORDERS_OPEN_BY_MONTH,
        q_orders_open_by_month,
    )

    out = q_orders_open_by_month(SF)
    con = duckdb.connect()
    for tbl in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    exp = con.execute(SQL_ORDERS_OPEN_BY_MONTH).df()
    assert out["n_open"].max() > 1, "months must overlap"
    assert (out["n_open"] >= 0).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_nation_segments_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_NATION_SEGMENTS,
        q_nation_segments,
    )

    out = q_nation_segments(SF)
    con = duckdb.connect()
    for tbl in ("customer", "nation"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    exp = con.execute(SQL_NATION_SEGMENTS).df()
    assert out["segments"].str.contains(",").any(), "multi-segment nations exist"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_users_week_delta_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_USERS_WEEK_DELTA,
        q_users_week_delta,
    )

    out = q_users_week_delta(SF)
    exp = _oracle("events", SQL_USERS_WEEK_DELTA)
    # the full-outer null path must be exercised: at least one user absent
    # on one side (zero there) at this sf
    assert ((out["w1_click_value"] == 0) | (out["w4_purchase_value"] == 0)).any()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_orders_pareto_matches_oracle(ray_session, bs):
    from llm_scraper_ray.pipelines.analytics import SQL_ORDERS_PARETO, q_orders_pareto

    out = q_orders_pareto(SF, batch_size=bs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    exp = con.execute(SQL_ORDERS_PARETO).df()
    assert out["covered_pct"].iloc[0] >= 80.0
    assert out["n_customers"].iloc[0] < out["total_customers"].iloc[0]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7, 1])
def test_events_journeys_matches_oracle(ray_session, bs):
    """At bs=1 every trigram window spans THREE one-row batches — the seam
    reconstruction must walk the tail stream, not just adjacent pairs."""
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_JOURNEYS,
        q_events_journeys,
    )

    out = q_events_journeys(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_JOURNEYS)
    assert len(out) > 0 and out["n"].iloc[0] >= out["n"].iloc[-1]
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_orders_monthly_locf_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_ORDERS_MONTHLY_LOCF,
        q_orders_monthly_locf,
    )

    out = q_orders_monthly_locf(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    exp = con.execute(SQL_ORDERS_MONTHLY_LOCF).df()
    assert out["filled"].sum() > 0, "gap-fill path must be exercised"
    # a filled month carries its predecessor's value forward
    f = out[out["filled"] == 1].index
    nonzero_fill = [
        i for i in f if i > 0 and out["priority"][i] == out["priority"][i - 1]
    ]
    assert all(out["rev_locf"][i] == out["rev_locf"][i - 1] for i in nonzero_fill)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_orders_diversified_topk_quota_binds(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        DIV_PER_GROUP,
        SQL_ORDERS_DIVERSIFIED_TOPK,
        q_orders_diversified_topk,
    )

    out = q_orders_diversified_topk(SF)
    exp = _oracle("orders", SQL_ORDERS_DIVERSIFIED_TOPK)
    assert (out.groupby("o_orderpriority").size() <= DIV_PER_GROUP).all()
    # the quota must actually bind: the unconstrained top-10 has >2 of
    # some priority at this sf (else the op degenerates to plain top-k)
    raw = duckdb.sql(
        f"""SELECT o_orderpriority, count(*) c FROM (
              SELECT * FROM read_parquet('{SF}/orders.parquet')
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
            GROUP BY 1 ORDER BY c DESC"""
    ).df()
    assert raw["c"].max() > DIV_PER_GROUP
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_seasonal_anomaly_flags_at_small_sf(ray_session):
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_SEASONAL_ANOMALY,
        q_events_seasonal_anomaly,
    )

    out = q_events_seasonal_anomaly(SF)
    exp = _oracle("events", SQL_EVENTS_SEASONAL_ANOMALY)
    assert len(out) > 0, "sparse sf0.001 cells must produce anomalies"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7, 1])
def test_events_debounce_matches_oracle(ray_session, bs):
    """Greedy chained keep-state: at bs=1 every decision chains through
    the driver carry — the anchor argument and exit-state relay must
    reproduce the sequential recursion exactly."""
    from llm_scraper_ray.pipelines.analytics import (
        SQL_EVENTS_DEBOUNCE,
        q_events_debounce,
    )

    out = q_events_debounce(SF, batch_size=bs)
    exp = _oracle("events", SQL_EVENTS_DEBOUNCE)
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert 0 < len(out) < n_events, "debounce must drop some rows, keep some"
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_debounce_and_moving_avg_on_random_streams(ray_session, tmp_path):
    """Randomized boundary coverage for the chained-state family: seeded
    random event streams (clustered timestamps to force dense debounce
    chains, duplicate-ts ties, single-event users) must match the DuckDB
    oracle at adversarial batch sizes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from llm_scraper_ray.pipelines.analytics import (
        DEBOUNCE_US,
        SQL_EVENTS_DEBOUNCE,
        SQL_EVENTS_MOVING_AVG,
        q_events_debounce,
        q_events_moving_avg,
    )

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 400
        users = rng.integers(0, 12, n)
        # cluster ts so many raw gaps are << W and some are > W; include ties
        base = rng.integers(0, 40, n).astype(np.int64) * (DEBOUNCE_US // 8)
        jitter = rng.integers(0, 4, n).astype(np.int64)  # µs-scale ties
        ts = base + jitter
        t = pa.Table.from_pydict(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(users.astype(np.int64), pa.int64()),
                "event_type": pa.array(["click"] * n),
                "value": pa.array(
                    rng.integers(1, 10_000, n).astype(np.float64) / 100.0
                ),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / f"rs{trial}"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        for bs in (13, 4):
            out = q_events_debounce(str(d), batch_size=bs)
            exp = con.execute(SQL_EVENTS_DEBOUNCE).df()
            pd.testing.assert_frame_equal(
                out.reset_index(drop=True), exp.reset_index(drop=True),
                check_dtype=False,
            )
            out2 = q_events_moving_avg(str(d), batch_size=bs)
            exp2 = con.execute(SQL_EVENTS_MOVING_AVG).df()
            pd.testing.assert_frame_equal(
                out2.reset_index(drop=True), exp2.reset_index(drop=True),
                check_dtype=False,
            )
