"""Round-4 additions: positional phrase search, Misra-Gries heavy hitters,
multi-source BFS depths — kernel semantics plus oracle-SQL equality at
sf0.001 (the same strict compare scripts/check_queries.py runs)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _oracle(view_sql: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(view_sql)
    return con.execute(sql).df()


def test_doc_phrase_search_matches_oracle(ray_session):
    """Positional-posting intersection (engine) vs ordinal self-join (SQL):
    per (phrase, doc) occurrence counts must agree exactly, and the fixed
    phrase set must actually hit the corpus (non-trivial result)."""
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_phrase_search"](SF)
    assert len(out) > 0 and out["n"].min() >= 1
    assert out["phrase"].nunique() >= 2  # more than one phrase hits
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_phrase_search"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_phrase_kernel_adjacent_and_overlapping():
    """The intersection kernel must count starting positions exactly,
    including back-to-back repeats a boundary-consuming regex undercounts."""
    from llm_scraper_ray.pipelines.curation import PHRASES

    # build a one-doc corpus inline through the same query machinery
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = "/tmp/llmsr_phrase_unit"
    os.makedirs(d, exist_ok=True)
    p0 = PHRASES[0]  # two words
    text = f"{p0} {p0} x {p0.split()[0]} y"
    pq.write_table(
        pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array([text])}),
        os.path.join(d, "documents.parquet"),
    )
    from llm_scraper_ray.pipelines.curation import q_doc_phrase_search

    out = q_doc_phrase_search(d)
    hit = out[out["phrase"] == p0]
    assert len(hit) == 1 and int(hit["n"].iloc[0]) == 2


def test_vocab_heavy_hitters_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["vocab_heavy_hitters"](SF)
    assert len(out) > 0
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["vocab_heavy_hitters"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_mg_trim_guarantee():
    """The Misra-Gries compression invariant: estimates only ever shrink,
    at most K counters survive, and the total decrement per trim is
    bounded by (removed mass)/(K+1)·(K+1) — so across any merge tree a
    word with true count > N/(K+1) cannot reach zero."""
    from llm_scraper_ray.pipelines.curation import MG_K, _mg_trim

    rng = np.random.RandomState(7)
    counts = pd.Series(
        rng.zipf(1.3, 5000), index=[f"w{i}" for i in range(5000)]
    ).astype("int64")
    trimmed = _mg_trim(counts)
    assert len(trimmed) <= MG_K
    assert (trimmed <= counts.reindex(trimmed.index)).all()
    dec = counts.reindex(trimmed.index) - trimmed
    assert dec.nunique() == 1  # uniform decrement
    n = int(counts.sum())
    assert int(dec.iloc[0]) * (MG_K + 1) <= n  # decrement ≤ N/(K+1)


def test_bfs_depths_chain_and_convergence_raise(ray_session):
    """A 0-1-2-…-10 path (consecutive nodes in different hash buckets)
    seeded at node 0: depths must be exact hop counts; with a 1-round
    budget the unapplied cross-bucket message must RAISE, not silently
    return too-deep depths."""
    from llm_scraper_ray.pipelines.graph import bfs_depths

    n = 11
    edges = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    out = bfs_depths(rd.from_pandas(edges)).sort_values("node").reset_index(drop=True)
    # seeds: 0 and 8 (both % 8 == 0) — depth = distance to nearer seed
    want = [min(i, abs(i - 8)) for i in range(n)]
    assert out["node"].tolist() == list(range(n))
    assert out["depth"].tolist() == want
    with pytest.raises(RuntimeError, match="did not converge"):
        bfs_depths(rd.from_pandas(edges), rounds=1)


def test_kg_bfs_depths_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    os.environ["LLMSR_ORACLE_SF_DIR"] = SF
    try:
        out = all_queries()["kg_bfs_depths"](SF)
        exp = duckdb.connect().execute(all_oracle_sql()["kg_bfs_depths"]).df()
    finally:
        del os.environ["LLMSR_ORACLE_SF_DIR"]
    assert len(out) > 0 and int(out["depth"].max()) >= 1  # propagation happened
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_ngram_prefix_pairs_matches_exact_and_oracle(ray_session):
    """The prefix-filtered candidate plan must reproduce the all-shared-
    shingle plan's EXACT pair set (same threshold semantics: kept-shingle
    intersections, full-size unions) and the shared SQL oracle."""
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["ngram_prefix_pairs"](SF)
    exact = all_queries()["ngram_jaccard_pairs"](SF)
    assert len(out) > 0
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exact.reset_index(drop=True), check_dtype=False
    )
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["ngram_prefix_pairs"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
