"""Engine-vs-oracle equivalence: crawl order, seen set, byte-identical text,
politeness budgets, resume (FIXTURES.md F5 goldens, SURVEY.md §5)."""

import os

import pytest

from llm_scraper_ray.pipelines.crawl import CrawlEngine
from llm_scraper_ray.pipelines.oracle import oracle_crawl

MAX_ROUNDS = 40


@pytest.fixture(scope="module")
def oracle_result(corpus_sf0001):
    return oracle_crawl(corpus_sf0001, max_rounds=MAX_ROUNDS)


@pytest.fixture(scope="module")
def engine_result(corpus_sf0001, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("crawl") / "run")
    eng = CrawlEngine(corpus_sf0001, run_dir, max_rounds=MAX_ROUNDS, fetch_concurrency=2)
    result = eng.run(resume=False)
    eng.shutdown()
    return result


def test_distributed_path_matches_oracle(corpus_sf0001, tmp_path_factory):
    """driver_threshold=0 forces the fully distributed control plane (the
    at-scale path: Ray Data groupby dedup + shard-actor filter + host
    selection shuffle); few rounds keep runtime bounded."""
    run_dir = str(tmp_path_factory.mktemp("crawl_dist") / "run")
    eng = CrawlEngine(
        corpus_sf0001, run_dir, max_rounds=4, fetch_concurrency=2, driver_threshold=0
    )
    r = eng.run(resume=False)
    eng.shutdown()  # release actor CPU reservations (4-CPU session!)
    o = oracle_crawl(corpus_sf0001, max_rounds=4)
    assert r.assemble_order() == [h.hex() for h in o.order]
    assert r.seen_digests() == o.seen


def test_salted_selection_matches_oracle(corpus_sf0001, tmp_path_factory):
    """Hot-host handling (sort-range splitting + boundary top-k forwarding)
    must not change results under a small distributed batch size."""
    run_dir = str(tmp_path_factory.mktemp("crawl_salt") / "run")
    eng = CrawlEngine(
        corpus_sf0001,
        run_dir,
        max_rounds=3,
        fetch_concurrency=2,
        driver_threshold=0,
    )
    r = eng.run(resume=False)
    eng.shutdown()
    o = oracle_crawl(corpus_sf0001, max_rounds=3)
    assert r.assemble_order() == [h.hex() for h in o.order]
    assert r.seen_digests() == o.seen


def test_seen_set_equal(oracle_result, engine_result):
    assert engine_result.seen_digests() == oracle_result.seen


def test_crawl_order_equal(oracle_result, engine_result):
    engine_order = engine_result.assemble_order()
    oracle_order = [h.hex() for h in oracle_result.order]
    assert engine_order == oracle_order


def test_order_dataset_equals_assemble_order(engine_result):
    """The distributed order ledger (per-round Dataset sort) must equal the
    driver-side assembly row for row."""
    got = [
        h
        for b in engine_result.order_dataset().iter_batches(batch_format="pandas")
        for h in b["url_hash"]
    ]
    assert got == engine_result.assemble_order()


def test_extracted_text_byte_identical(oracle_result, engine_result):
    t = engine_result.collect_extracted()
    got = {
        h: (s, txt)
        for h, s, txt in zip(
            t["url_hash"].to_pylist(),
            t["fetch_status"].to_pylist(),
            t["text"].to_pylist(),
        )
    }
    want = {
        h.hex(): (v["fetch_status"], v["text"]) for h, v in oracle_result.extracted.items()
    }
    assert got == want  # url set, statuses AND text bytes


def test_text_matches_pages_table(corpus_sf0001, engine_result):
    """Extracted text == the pages table's text column (the input_hint
    byte-identity invariant), joined on url_hash."""
    import pyarrow.dataset as pads

    pages = pads.dataset(corpus_sf0001.pages_dir, format="parquet").to_table(
        columns=["url_hash", "text"]
    )
    page_text = {h.as_py().hex(): t.as_py() for h, t in zip(pages["url_hash"], pages["text"])}
    t = engine_result.collect_extracted()
    checked = 0
    for h, s, txt in zip(
        t["url_hash"].to_pylist(), t["fetch_status"].to_pylist(), t["text"].to_pylist()
    ):
        if s == "hit":
            assert txt == page_text[h]
            checked += 1
    assert checked > 100


def test_politeness_budget_never_exceeded(corpus_sf0001, engine_result):
    import collections

    import pyarrow.parquet as pq

    pol = pq.read_table(corpus_sf0001.politeness_path)
    budgets = {h.as_py(): m.as_py() for h, m in zip(pol["host"], pol["max_per_round"])}
    for d in engine_result._round_dirs():
        import pyarrow.dataset as pads

        t = pads.dataset(os.path.join(d, "extracted"), format="parquet").to_table(
            columns=["host"], filter=pads.field("hrank") >= 0
        )
        for host, n in collections.Counter(t["host"].to_pylist()).items():
            assert n <= budgets.get(host, 4), (d, host, n)


def test_robots_never_fetched(corpus_sf0001, engine_result):
    t = engine_result.collect_extracted()
    for url in t["canon_url"].to_pylist():
        # robots hosts disallow /private; engine must never fetch those
        pass  # coverage via seen-set equality; explicit check below
    import pyarrow.parquet as pq

    pol = pq.read_table(corpus_sf0001.politeness_path)
    blocked_hosts = {
        h.as_py() for h, r in zip(pol["host"], pol["robots_disallow"]) if len(r) > 0
    }
    fetched = [
        u
        for u, h in zip(t["canon_url"].to_pylist(), t["host"].to_pylist())
        if h in blocked_hosts and "/private" in u
    ]
    assert fetched == []


def test_resume_equals_uninterrupted(corpus_sf0001, oracle_result, tmp_path_factory):
    """Kill after K rounds (simulated by max_rounds=K), resume to completion —
    outputs identical to the one-shot run (SURVEY.md M4)."""
    run_dir = str(tmp_path_factory.mktemp("crawl_resume") / "run")
    partial = CrawlEngine(corpus_sf0001, run_dir, max_rounds=5, fetch_concurrency=2)
    r1 = partial.run(resume=False)
    partial.shutdown()
    assert r1.rounds == 5
    # resume with the full budget — must continue from round 6, not restart
    full = CrawlEngine(corpus_sf0001, run_dir, max_rounds=MAX_ROUNDS, fetch_concurrency=2)
    r2 = full.run(resume=True)
    full.shutdown()
    assert r2.rounds > 5
    assert [h.hex() for h in oracle_result.order] == r2.assemble_order()
    assert oracle_result.seen == r2.seen_digests()


def test_mixed_paths_match_oracle(corpus_sf0001, oracle_result, tmp_path_factory):
    """driver_threshold mid-range → early/late small rounds run the driver
    fast path while big middle rounds run distributed — the hybrid must be
    indistinguishable from the oracle end to end."""
    run_dir = str(tmp_path_factory.mktemp("crawl_mixed") / "run")
    eng = CrawlEngine(
        corpus_sf0001, run_dir, max_rounds=MAX_ROUNDS, fetch_concurrency=2,
        driver_threshold=150,
    )
    r = eng.run(resume=False)
    eng.shutdown()
    paths = {m.get("path") for m in r.metrics}
    assert paths == {"driver", "distributed"}  # both actually exercised
    assert r.assemble_order() == [h.hex() for h in oracle_result.order]
    assert r.seen_digests() == oracle_result.seen


def test_distributed_tiny_select_batches_match_oracle(
    corpus_sf0001, tmp_path_factory, monkeypatch
):
    """Boundary-stress for the FUSED single-execution round: a 16-row
    select batch forces hundreds of batch boundaries per round, so nearly
    every host is a boundary host and the pass2 placeholder → driver fixup
    → direct actor fetch path carries most of the selection. Order and
    seen-set must still equal the sequential oracle exactly."""
    monkeypatch.setenv("LLMSR_SELECT_BATCH", "16")
    run_dir = str(tmp_path_factory.mktemp("crawl_tinybatch") / "run")
    eng = CrawlEngine(
        corpus_sf0001, run_dir, max_rounds=3, fetch_concurrency=2, driver_threshold=0
    )
    r = eng.run(resume=False)
    eng.shutdown()
    o = oracle_crawl(corpus_sf0001, max_rounds=3)
    assert r.assemble_order() == [h.hex() for h in o.order]
    assert r.seen_digests() == o.seen
