"""Training-data curation operators: Gopher-rule quality filter + PII
redaction — kernel semantics plus oracle-SQL equality at sf0.001 (the same
compare the driver runs at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(view_sql: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(view_sql)
    return con.execute(sql).df()


def test_scrub_pii_order_and_counts():
    from llm_scraper_ray.functions.pii import scrub_pii

    text = (
        "Mail a.b-c%d@sub.example.org or +1-555-0042-99, host 192.168.0.1, "
        "then bad..email@@x and 999.999.999.999 edge"
    )
    scrubbed, counts = scrub_pii(text)
    assert counts == {"n_email": 1, "n_phone": 1, "n_ipv4": 2}
    assert "<EMAIL>" in scrubbed and "<PHONE>" in scrubbed
    assert "192.168.0.1" not in scrubbed
    # email scrubbed FIRST: its digits must not be double-counted as phone
    assert scrubbed.count("<PHONE>") == 1


def test_gopher_rules_integer_predicates():
    from llm_scraper_ray.functions.analysis import gopher_rules, quality_counts

    keep_text = "the quick brown fox jumps over the lazy dog and " * 5  # 50 words
    r = gopher_rules(quality_counts(keep_text))
    assert r["r_words"] == 1 and r["r_stop"] == 1
    # degenerate repetition trips r_rep
    r2 = gopher_rules(quality_counts("spam " * 60))
    assert r2["r_rep"] == 0 and r2["keep"] == 0


def test_doc_gopher_filter_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_gopher_filter"](SF)
    assert 0 < out["keep"].sum() < len(out), "filter must be non-trivial"
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_gopher_filter"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_lag_matches_oracle_and_boundaries(ray_session):
    """Windowed lag: the distributed head/tail edge fixup must reproduce
    the single-window result even when tiny batches force every row to a
    block edge (batch_size=16 → many 1-row-adjacent head/tail pairs)."""
    from llm_scraper_ray.pipelines.queries import _SQL_EVENTS_LAG, q_events_lag

    exp = _oracle(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')",
        _SQL_EVENTS_LAG,
    )
    for bs in (65536, 16):
        out = q_events_lag(SF, batch_size=bs)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), exp.reset_index(drop=True),
            check_dtype=False,
        )
    assert out["prev_value"].isna().sum() > 0  # per-user firsts are NULL


def test_render_truth_is_byte_neutral():
    """Capturing generator ground truth must not perturb the rng stream —
    rendered HTML is byte-identical with and without the truth parameter."""
    import pyarrow.parquet as pq

    from llm_scraper_ray.sources.pages import render_html

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    n = len(docs)
    n_products = 0
    for d, t in zip(docs["doc_id"][:200], docs["text"][:200]):
        truth: dict = {}
        assert render_html(int(d), n, t, truth=truth) == render_html(int(d), n, t)
        n_products += truth["is_product"]
        if truth["is_product"]:
            assert truth["product_name"].endswith(str(d))
    assert 0 < n_products < 200


def test_extract_fields_product_matches_truth_oracle(ray_session):
    """Generator-writes vs parser-reads: the extraction pipeline must
    recover exactly the product fields the renderer embedded."""
    import os

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    os.environ["LLMSR_ORACLE_SF_DIR"] = SF
    try:
        out = all_queries()["extract_fields_product"](SF)
        exp = _oracle(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
            all_oracle_sql()["extract_fields_product"],
        )
    finally:
        del os.environ["LLMSR_ORACLE_SF_DIR"]
    assert (out["product_name"] != "").sum() > 0
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_sessionize_pages_matches_truth_oracle(ray_session):
    """The DOM-parse → heading-extraction → sessionize pipeline must equal
    the generator's recorded heading stream folded the same way."""
    import os

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    os.environ["LLMSR_ORACLE_SF_DIR"] = SF
    try:
        out = all_queries()["sessionize_pages"](SF)
        exp = _oracle(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
            all_oracle_sql()["sessionize_pages"],
        )
    finally:
        del os.environ["LLMSR_ORACLE_SF_DIR"]
    exp = exp.sort_values(["url_hash", "heading_path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp, check_dtype=False
    )


def test_doc_pii_scrub_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_pii_scrub"](SF)
    assert (out["n_email"] >= 1).all() and (out["n_phone"] >= 1).all()
    assert (out["n_ipv4"] >= 1).all()
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_pii_scrub"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_connected_components_deep_chain(ray_session):
    """Edge contraction must propagate min labels across long chains, far
    beyond one hop per round (reach ~doubles per round): an 18-node chain
    plus a disjoint triangle resolve to exactly two clusters."""
    import ray.data as rd

    from llm_scraper_ray.pipelines.curation import connected_components

    chain = pd.DataFrame(
        {"doc_a": list(range(100, 117)), "doc_b": list(range(101, 118))}
    )
    tri = pd.DataFrame({"doc_a": [7, 7, 8], "doc_b": [8, 9, 9]})
    pairs = rd.from_pandas(pd.concat([chain, tri], ignore_index=True))
    lab = connected_components(pairs, iterations=8).to_pandas().sort_values("doc_id")
    assert set(lab.loc[lab["doc_id"] >= 100, "cluster_id"]) == {100}
    assert set(lab.loc[lab["doc_id"] < 100, "cluster_id"]) == {7}
    assert len(lab) == 21


def test_connected_components_default_rounds_cover_moderate_chains(ray_session):
    """The default round count must cover chains much deeper than the
    observed clique-shaped dup components (diameter 1 at every test sf)."""
    import ray.data as rd

    from llm_scraper_ray.pipelines.curation import connected_components

    chain = pd.DataFrame({"doc_a": list(range(0, 8)), "doc_b": list(range(1, 9))})
    lab = connected_components(rd.from_pandas(chain)).to_pandas()
    assert set(lab["cluster_id"]) == {0} and len(lab) == 9


def test_connected_components_underbudget_raises(ray_session):
    """A deliberately-too-small round budget must RAISE, not silently
    return under-converged labels (the 100×-graph safety net): a 40-node
    chain needs ~log2(40) contraction rounds; 1 round cannot finish it."""
    import pytest
    import ray.data as rd

    from llm_scraper_ray.pipelines.curation import connected_components

    chain = pd.DataFrame({"doc_a": list(range(0, 40)), "doc_b": list(range(1, 41))})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_pandas(chain), iterations=1)


def test_doc_dedup_clusters_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_dedup_clusters"](SF)
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_dedup_clusters"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # exactly one canonical keep per cluster; clusters are non-trivial
    per = out.groupby("cluster_id")["keep"].sum()
    assert (per == 1).all()
    assert (out.groupby("cluster_id").size() >= 2).all()


def test_doc_decontaminate_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_decontaminate"](SF)
    assert len(out) > 0 and (out["doc_id"] % 37 != 0).all()
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_decontaminate"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_repetition_kernel():
    from llm_scraper_ray.pipelines.curation import repetition_counts

    n, top2, dup5, n5 = repetition_counts("a b a b a b a")
    assert n == 7 and top2 == 3  # ('a','b') x3
    # 5-grams: (a b a b a), (b a b a b), (a b a b a) -> 'a b a b a' repeats,
    # covering 2 of the 3 positions
    assert n5 == 3 and dup5 == 2
    n, top2, dup5, n5 = repetition_counts("a b a b a b a b a")
    assert n5 == 5 and dup5 == 5  # every 5-gram position is a repeat
    n, top2, dup5, n5 = repetition_counts("one two three four")
    assert (n, top2, dup5, n5) == (4, 1, 0, 0)
    assert repetition_counts("") == (0, 0, 0, 0)


def test_doc_repetition_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_repetition"](SF)
    assert (out["top2_count"] >= 1).any()
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_repetition"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_source_quota_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import QUOTA_K
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_source_quota"](SF)
    assert (out.groupby("source").size() <= QUOTA_K).all()
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_source_quota"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_token_bins_matches_oracle_and_boundaries(ray_session):
    """Distributed scan: per-batch local cumsum + O(#batches) driver offset
    merge must equal the single-window prefix sum even when tiny batches
    make every row batch-adjacent."""
    from llm_scraper_ray.pipelines.curation import q_doc_token_bins
    from llm_scraper_ray.pipelines.queries import all_oracle_sql

    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_token_bins"],
    )
    for bs in (65536, 16):
        out = q_doc_token_bins(SF, batch_size=bs)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
        )
    assert out["bin_id"].nunique() > 1  # packing actually splits the stream
    # bins are contiguous in doc order
    assert (out["bin_id"].diff().dropna() >= 0).all()


def test_doc_length_quantiles_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_length_quantiles"](SF)
    assert (out["value"].diff().dropna() >= 0).all()  # monotone in q
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_length_quantiles"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_vocab_top_terms_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import VOCAB_TOP_K
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["vocab_top_terms"](SF)
    assert 0 < len(out) <= VOCAB_TOP_K  # synthetic vocab is < K words
    assert (out["n"].diff().dropna() <= 0).all()  # descending counts
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["vocab_top_terms"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_events_asof_join_matches_oracle_and_boundaries(ray_session):
    """Distributed as-of join vs DuckDB's native ASOF LEFT JOIN, including
    tiny batches that force per-user runs across many block edges."""
    from llm_scraper_ray.pipelines.queries import _SQL_EVENTS_ASOF, q_events_asof_join

    exp = _oracle(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')",
        _SQL_EVENTS_ASOF,
    )
    for bs in (65536, 16):
        out = q_events_asof_join(SF, batch_size=bs)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
        )
    assert out["prev_purchase_value"].notna().sum() > 0
    assert out["prev_purchase_value"].isna().sum() > 0  # pre-purchase clicks


def test_doc_dedup_corpus_matches_oracle_and_invariants(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_dedup_corpus"](SF)
    row = out.iloc[0]
    assert row["n_docs"] == row["n_kept"] + row["n_dropped"]
    assert row["n_dropped"] > 0  # corpus has dup clusters
    # consistency with the cluster listing: dropped = non-canonical nodes
    clusters = all_queries()["doc_dedup_clusters"](SF)
    assert row["n_dropped"] == int((clusters["keep"] == 0).sum())
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_dedup_corpus"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_unigram_scores_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_unigram_scores"](SF)
    assert (out["sum_freq"] >= out["n_words"]).all()  # every word counts itself
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_unigram_scores"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_rarest_term_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    out = all_queries()["doc_rarest_term"](SF)
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["doc_rarest_term"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_curation_pipeline_matches_composed_oracle(ray_session):
    """The flagship composed chain (Gopher filter → dedup drop → source
    quota → packed stats) must equal ONE composed SQL oracle, and be
    consistent with its stages run individually."""
    from llm_scraper_ray.pipelines.curation import QUOTA_K
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    q = all_queries()
    out = q["curation_pipeline"](SF)
    assert len(out) > 0 and (out["n_kept"] <= QUOTA_K).all()
    # cross-stage consistency: every surviving doc passes the gopher filter
    gopher_keep = set(
        q["doc_gopher_filter"](SF).query("keep == 1")["doc_id"]
    )
    clusters = q["doc_dedup_clusters"](SF)
    dropped = set(clusters.loc[clusters["keep"] == 0, "doc_id"])
    assert out["n_kept"].sum() <= len(gopher_keep - dropped)
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        all_oracle_sql()["curation_pipeline"],
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_bm25_topk_matches_oracle(ray_session):
    from llm_scraper_ray.pipelines.curation import (
        BM25_TOPK,
        SQL_DOC_BM25_TOPK,
        q_doc_bm25_topk,
    )

    out = q_doc_bm25_topk(SF)
    assert len(out) == BM25_TOPK
    # ranked: scores non-increasing, ties broken by doc_id ascending
    assert (out["bm25"].diff().dropna() <= 1e-12).all()
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        SQL_DOC_BM25_TOPK,
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("bs", [65536, 16, 7])
def test_doc_weighted_sample_matches_oracle(ray_session, bs):
    import duckdb

    from llm_scraper_ray.pipelines.curation import (
        SQL_DOC_WEIGHTED_SAMPLE,
        q_doc_weighted_sample,
    )

    out = q_doc_weighted_sample(SF, batch_size=bs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(SQL_DOC_WEIGHTED_SAMPLE).df()
    assert len(out) > 1, "sample must pick several docs"
    # pick indices are strictly increasing along the stream
    assert (out["pick_idx"].diff().dropna() >= 1).all()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_ngram_containment_catches_subset_jaccard_misses(ray_session, tmp_path):
    """A doc fully contained in a 3x-longer doc: containment >= 0.8 on the
    short side while Jaccard stays under the 0.5 threshold — the
    asymmetric case the symmetric near-dup op cannot flag. Also checked:
    the distributed pair machinery agrees with the SQL twin on the
    crafted corpus."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from llm_scraper_ray.pipelines import neardup as N

    base = " ".join(f"w{i} common text token" for i in range(20))  # 80 tokens
    extra = " ".join(f"extra{i} unrelated filler words" for i in range(40))
    docs = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, base + " " + extra, "something else entirely here"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(base), len(base) + 1 + len(extra), 29], pa.int64()),
        }
    )
    d = tmp_path / "sfx"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    out = N.ngram_containment_pairs(str(d))
    pair = out[(out["doc_a"] == 1) & (out["doc_b"] == 2)]
    assert len(pair) == 1 and pair["direction"].iloc[0] == "a_in_b"
    # the same pair fails the symmetric Jaccard threshold
    jac = N.ngram_jaccard_pairs(str(d))
    assert not (((jac["doc_a"] == 1) & (jac["doc_b"] == 2)).any())
    # SQL twin agrees on the crafted corpus
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.execute(N.SQL_NGRAM_CONTAINMENT).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_doc_export_splits_resumable_roundtrip(ray_session):
    """The export sink writes hive-partitioned parquet once (resume skips
    behind the _DONE marker) and the read-back manifest equals the
    source-derived oracle — write+read round trip loses nothing."""
    import os

    from llm_scraper_ray.pipelines.curation import (
        EXPORT_VERSION,
        SQL_DOC_EXPORT_SPLITS,
        q_doc_export_splits,
    )

    out1 = q_doc_export_splits(SF)
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    exp_dir = [
        d for d in os.listdir(base)
        if d.startswith("export-sf0.001-") and d.endswith(f"-v{EXPORT_VERSION}")
    ]
    assert exp_dir, "export directory must exist"
    d = os.path.join(base, exp_dir[0])
    assert os.path.exists(os.path.join(d, "_DONE"))
    assert {"split=train", "split=valid", "split=test"} <= set(os.listdir(d))
    mtimes = {
        p: os.path.getmtime(os.path.join(d, p)) for p in os.listdir(d)
    }
    out2 = q_doc_export_splits(SF)  # resume path: no re-write
    assert mtimes == {
        p: os.path.getmtime(os.path.join(d, p)) for p in os.listdir(d)
    }
    pd.testing.assert_frame_equal(out1, out2)
    exp = _oracle(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')",
        SQL_DOC_EXPORT_SPLITS,
    )
    pd.testing.assert_frame_equal(
        out1.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_neardup_eval_matches_oracle_and_invariants(ray_session):
    """Candidate-set eval: the bucketed tagged-union fold must equal the
    SQL oracle (exact pairs CTE × persisted sequential candidate set) and
    satisfy the set-algebra invariants."""
    import duckdb

    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    import os

    out = all_queries()["neardup_eval"](SF)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_hit"] <= r["n_cands"] and r["n_hit"] <= r["n_exact"]
    os.environ["LLMSR_ORACLE_SF_DIR"] = SF
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(all_oracle_sql()["neardup_eval"]).df()
    assert int(r["n_exact"]) == int(want.iloc[0]["n_exact"])
    assert int(r["n_cands"]) == int(want.iloc[0]["n_cands"])
    assert int(r["n_hit"]) == int(want.iloc[0]["n_hit"])


def test_incremental_dedup_consistent_with_pairs(ray_session):
    """Every flagged incoming doc must appear as doc_b of a straddling
    exact pair, with first_partner equal to its minimum existing partner."""
    import pyarrow.parquet as pq

    from llm_scraper_ray.pipelines.curation import INCR_DEN, INCR_NUM
    from llm_scraper_ray.pipelines.neardup import ngram_jaccard_pairs
    from llm_scraper_ray.pipelines.queries import all_queries

    out = all_queries()["doc_incremental_dedup"](SF)
    mx = int(pq.read_table(SF + "/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy().max())
    t = (mx * INCR_NUM) // INCR_DEN
    pairs = ngram_jaccard_pairs(SF)
    straddle = pairs[(pairs["doc_a"] < t) & (pairs["doc_b"] >= t)]
    exp = (
        straddle.groupby("doc_b", as_index=False)
        .agg(n_dup_existing=("doc_a", "size"), first_partner=("doc_a", "min"))
        .rename(columns={"doc_b": "doc_id"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp.astype("int64"), check_dtype=False)
