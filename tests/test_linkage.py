"""Record-linkage / data-quality ops (pipelines/linkage.py): oracle-SQL
equality at sf0.001 plus the semantic invariants — the FastSS candidate
generator must reject distance-2 'anagram' candidates (shared-variant ≠
ED 1), bitmap popcounts must be consistent, and the audit's orphan checks
must be exactly the SQL NOT-IN counts."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["lineitem", "orders", "customer", "supplier", "part", "events", "documents"]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


@pytest.mark.parametrize(
    "qname",
    [
        "customer_name_ed1_pairs",
        "events_activity_bitmap",
        "referential_integrity_audit",
        "doc_ks_distance",
        "orders_exact_median",
    ],
)
def test_linkage_query_matches_oracle(ray_session, qname):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()[qname](SF)
    exp = _oracle(all_oracle_sql()[qname])
    out = out[sorted(out.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_ed1_rejects_shared_variant_distance2():
    """'ab' and 'ba' share the deletion variant 'a' but are distance 2 —
    the verification step must reject them; classic FastSS false positive."""
    from llm_scraper_ray.pipelines.linkage import _ed1

    assert not _ed1("ab", "ba")
    assert _ed1("ab", "ac")       # substitution
    assert _ed1("ab", "aab")      # insertion
    assert _ed1("aab", "ab")      # deletion, asymmetric call
    assert _ed1("ab", "ab")       # equal
    assert not _ed1("ab", "abcd")  # length gap 2
    assert not _ed1("abc", "axy")  # two substitutions


def test_activity_bitmap_popcount_consistent(ray_session):
    from llm_scraper_ray.pipelines.linkage import q_events_activity_bitmap

    out = q_events_activity_bitmap(SF)
    assert (out["days_mask"] > 0).all()
    pops = [int(m).bit_count() for m in out["days_mask"]]
    assert (out["n_active_days"] == pops).all()
    assert (out["n_active_days"] <= 31).all()


def test_audit_orphans_zero_on_consistent_corpus(ray_session):
    """The synthetic tables are referentially consistent: every orphan
    check must be 0, while the unreferenced-dimension checks may not be."""
    from llm_scraper_ray.pipelines.linkage import q_referential_integrity_audit

    out = q_referential_integrity_audit(SF).set_index("check_name")["n_bad"]
    for c in (
        "lineitem_orphan_order",
        "order_orphan_customer",
        "lineitem_orphan_part",
        "lineitem_orphan_supplier",
        "orders_dup_orderkey",
        "document_empty_text",
    ):
        assert out[c] == 0, c
    exp = _oracle(
        "SELECT CAST(count(*) AS BIGINT) AS n FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
    )
    assert out["customer_without_orders"] == int(exp["n"][0])
