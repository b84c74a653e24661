"""Grouped-scan family: partitioned row_number carry chain under batch-size
stress (65536/16/7 — groups spanning many batches, repeated leading sort
columns at boundaries), plus the three operators built on it."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from llm_scraper_ray.pipelines.scan import grouped_rank
from llm_scraper_ray.pipelines.curation import (
    q_doc_mixture_order,
    q_doc_stratified_sample,
)
from llm_scraper_ray.pipelines.analytics import q_events_rate_limit

SF = "/root/testdata/sf0.001"


def _ranked_df(df: pd.DataFrame, sort_cols, group_cols, bs) -> pd.DataFrame:
    out = (
        grouped_rank(rd.from_pandas(df), sort_cols, group_cols, batch_size=bs)
        .to_pandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    return out


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_grouped_rank_matches_pandas(bs):
    # adversarial: few groups -> every group spans many 7-row batches, and
    # the leading sort column repeats across almost every boundary
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 3, 200),
            "k": np.arange(200)[::-1],  # unique tiebreaker
        }
    )
    got = _ranked_df(df, ["g", "k"], ["g"], bs)
    exp = df.sort_values(["g", "k"]).reset_index(drop=True)
    exp["grank"] = exp.groupby("g").cumcount() + 1
    pd.testing.assert_frame_equal(
        got[["g", "k", "grank"]], exp[["g", "k", "grank"]], check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_grouped_rank_single_group_is_global_row_number(bs):
    df = pd.DataFrame({"one": np.zeros(100, dtype=np.int64), "k": np.arange(100)})
    got = _ranked_df(df, ["one", "k"], ["one"], bs)
    assert got["grank"].tolist() == list(range(1, 101))


@pytest.mark.parametrize("bs", [16, 7])
def test_operators_batch_size_invariant(bs):
    base = q_doc_stratified_sample(SF)
    small = q_doc_stratified_sample(SF, batch_size=bs)
    pd.testing.assert_frame_equal(base, small)

    base = q_events_rate_limit(SF)
    small = q_events_rate_limit(SF, batch_size=bs)
    pd.testing.assert_frame_equal(base, small)


def test_mixture_order_batch_size_invariant_and_weighted():
    base = q_doc_mixture_order(SF)
    small = q_doc_mixture_order(SF, batch_size=7)
    pd.testing.assert_frame_equal(base, small)
    # mix_pos is a permutation of 1..n
    n = len(base)
    assert sorted(base["mix_pos"]) == list(range(1, n + 1))
    # weighted interleave: within any prefix, a weight-4 lang appears at
    # least as often as a weight-1 lang once both have docs remaining
    order = base.sort_values("mix_pos")["lang"].tolist()
    head = order[:40]
    assert head.count("en") >= head.count("de")
    assert head.count("en") >= head.count("fr")
