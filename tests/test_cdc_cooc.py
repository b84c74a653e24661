"""Round-4 additions: CDC/SCD1 upsert materialization and a-priori pruned
word co-occurrence mining — unit semantics on synthetic tables plus
oracle-SQL equality at sf0.001 (the same strict compare
scripts/check_queries.py runs)."""

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


def test_events_cdc_upsert_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["events_cdc_upsert"](SF)
    assert len(out) > 0
    assert set(out["src"]) >= {"base", "event"}  # both paths exercised
    exp = _oracle(_views(SF, ["events", "customer"]), all_oracle_sql()["events_cdc_upsert"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_cdc_semantics_unit(ray_session):
    """Latest-wins + tombstone + insert classification on a hand-built
    stream: base-only key survives as 'base'; a key whose LATEST change is
    'error' vanishes (base row included); a tombstone followed by a later
    non-tombstone re-inserts; keys absent from the base are 'insert'; and
    the (ts, seq) tiebreak decides equal-timestamp versions."""
    from llm_scraper_ray.pipelines.analytics import q_events_cdc_upsert
    from llm_scraper_ray.pipelines.queries import all_oracle_sql

    d = "/tmp/llmsr_cdc_unit"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    t0 = pd.Timestamp("2024-01-01")
    us = lambda h: t0 + pd.Timedelta(hours=h)  # noqa: E731
    ev = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4, 5, 6, 7], dtype="int64"),
            "ts": [us(1), us(2), us(1), us(3), us(3), us(5), us(6)],
            "user_id": pd.array([2, 2, 3, 3, 3, 99, 98], dtype="int64"),
            "event_type": ["view", "error", "error", "click", "purchase", "view", "error"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        }
    )
    # user 3 has two events at the SAME ts (h=3): event_id 5 wins the tiebreak
    tbl = pa.Table.from_pandas(ev, preserve_index=False)
    tbl = tbl.set_column(  # match the real table's timestamp[us]
        tbl.schema.get_field_index("ts"), "ts", tbl["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))

    out = q_events_cdc_upsert(d).set_index("user_id")
    assert 2 not in out.index  # latest change is a tombstone → key gone
    assert 98 not in out.index  # insert whose latest is a tombstone → absent
    assert out.loc[1, "src"] == "base" and out.loc[1, "value"] == 10.0
    assert out.loc[3, "src"] == "event" and out.loc[3, "last_type"] == "purchase"
    assert out.loc[3, "value"] == 5.0  # event_id tiebreak at equal ts
    assert out.loc[4, "src"] == "base"
    assert out.loc[99, "src"] == "insert" and out.loc[99, "last_type"] == "view"
    exp = _oracle(_views(d, ["events", "customer"]), all_oracle_sql()["events_cdc_upsert"])
    pd.testing.assert_frame_equal(
        out.reset_index().reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )


def test_word_cooccurrence_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["word_cooccurrence"](SF)
    assert len(out) > 0
    assert (out["w1"] < out["w2"]).all()  # canonical pair order
    exp = _oracle(_views(SF, ["documents"]), all_oracle_sql()["word_cooccurrence"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_cooccurrence_apriori_prune_is_lossless(ray_session):
    """A corpus where the a-priori stage MUST prune (a rare word co-occurs
    with a frequent one below support): the engine's pruned plan equals the
    unpruned SQL oracle exactly, and the rare pair is absent."""
    from llm_scraper_ray.pipelines.curation import q_word_cooccurrence
    from llm_scraper_ray.pipelines.queries import all_oracle_sql

    d = "/tmp/llmsr_cooc_unit"
    os.makedirs(d, exist_ok=True)
    n = 30  # min_sup = ceil(0.1 * 30) = 3
    texts = ["alpha beta gamma" for _ in range(n)]
    texts[0] = "alpha beta rare"  # df(rare)=1 < 3 → pruned pre-pair
    texts[1] = "alpha delta"  # df(delta)=2 < 3 → pruned pre-pair
    texts[2] = "alpha delta"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    out = q_word_cooccurrence(d)
    exp = _oracle(_views(d, ["documents"]), all_oracle_sql()["word_cooccurrence"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    pairs = set(zip(out["w1"], out["w2"]))
    assert ("alpha", "rare") not in pairs and ("alpha", "delta") not in pairs
    assert ("alpha", "beta") in pairs and ("beta", "gamma") in pairs
    sup = out.set_index(["w1", "w2"])["support"]
    assert int(sup[("alpha", "gamma")]) == n - 3  # docs 0-2 lack gamma


def test_doc_split_leakage_safe(ray_session):
    """Oracle equality plus the two invariants that define the op: every
    near-dup cluster is split-homogeneous, and non-dup docs keep exactly
    the plain hash split (strict refinement of doc_split_assign)."""
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_split_leakage_safe"](SF)
    assert len(out) > 0
    exp = _oracle(_views(SF, ["documents"]), all_oracle_sql()["doc_split_leakage_safe"])
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # cluster homogeneity: one split per rep
    assert (out.groupby("rep")["split"].nunique() == 1).all()
    # some cluster actually has >1 member (the guard is exercised)
    assert (out.groupby("rep").size() > 1).any()
    plain = all_queries()["doc_split_assign"](SF)[["doc_id", "split"]]
    merged = out.merge(plain, on="doc_id", suffixes=("", "_plain"))
    nondup = merged[merged["rep"] == merged["doc_id"]]
    dupmember = merged[merged["rep"] != merged["doc_id"]]
    assert (nondup["split"] == nondup["split_plain"]).all()
    # at least one dup member was REASSIGNED relative to the plain split
    # (if none differ the guard was vacuous at this scale — flag it)
    assert len(dupmember) > 0
