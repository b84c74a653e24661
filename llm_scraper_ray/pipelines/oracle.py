"""Sequential oracle crawler — the single-process truth the Ray engine must match.

Plain-Python re-statement of the reference's sequential loop semantics
(``extract_pages.py:131-164``: read URL list, fetch one by one, extract,
append) under the *defined* parallel-safe order of pipelines/spec.py. Used
only in tests (sf0.001/sf0.01); shares the pure kernels (canonicalize,
extract_text) with the engine so the comparison exercises distribution, not
kernel drift — the frontier/seen/politeness logic here is implemented
independently with dicts and lists.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from ..functions.html_text import extract_text_and_links
from ..functions.urls import canonicalize_url, host_of, path_of, url_sha1
from ..sources.pages import PagesCorpus
from .spec import DEFAULT_BUDGET, UNKNOWN_TS, priority_key


@dataclass
class OracleResult:
    # url_hash → row dict (canon_url, depth, warc_ts, status, text, n_links)
    extracted: dict[bytes, dict] = field(default_factory=dict)
    order: list[bytes] = field(default_factory=list)  # global ledger of url_hash
    seen: set[bytes] = field(default_factory=set)
    metrics: list[dict] = field(default_factory=list)
    rounds: int = 0


def load_corpus_state(corpus: PagesCorpus):
    """(pages dict url_hash→(html, warc_ts_us, canon, host), budgets, robots)"""
    pages: dict[bytes, tuple] = {}
    meta = pq.read_table(corpus.meta_path)
    meta_by_hash = {
        h.as_py(): (c.as_py(), ho.as_py(), ts.value)
        for h, c, ho, ts in zip(
            meta["url_hash"], meta["canon_url"], meta["host"], meta["warc_ts"]
        )
    }
    for b in range(corpus.num_buckets):
        path = corpus.bucket_path(b)
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, columns=["url_hash", "html"])
        for h, html in zip(t["url_hash"], t["html"]):
            hb = h.as_py()
            canon, host, ts = meta_by_hash[hb]
            pages[hb] = (html.as_py(), ts, canon, host)
    pol = pq.read_table(corpus.politeness_path)
    budgets = {
        h.as_py(): int(m.as_py()) for h, m in zip(pol["host"], pol["max_per_round"])
    }
    robots = {
        h.as_py(): list(r.as_py())
        for h, r in zip(pol["host"], pol["robots_disallow"])
        if len(r) > 0
    }
    return pages, budgets, robots


def oracle_crawl(corpus: PagesCorpus, max_rounds: int = 64) -> OracleResult:
    pages, budgets, robots = load_corpus_state(corpus)
    warc_of = {h: p[1] for h, p in pages.items()}

    seeds = pq.read_table(corpus.seeds_path)
    frontier: list[tuple] = []  # (url_hash, canon, host, depth, warc_ts)
    for url in seeds["url"].to_pylist():
        canon = canonicalize_url(url)
        if canon is None:
            continue
        h = url_sha1(canon)
        frontier.append((h, canon, host_of(canon), 0, warc_of.get(h, UNKNOWN_TS)))

    res = OracleResult()
    for rnd in range(1, max_rounds + 1):
        # 1. DEDUP by hash, keep min depth
        best: dict[bytes, tuple] = {}
        for cand in frontier:
            cur = best.get(cand[0])
            if cur is None or cand[3] < cur[3]:
                best[cand[0]] = cand
        # 2. SEEN
        cands = [c for c in best.values() if c[0] not in res.seen]
        n_seen_dropped = len(best) - len(cands)
        # 3. ROBOTS (blocked → seen)
        kept = []
        n_robots = 0
        for c in cands:
            prefixes = robots.get(c[2], ())
            if prefixes and any(path_of(c[1]).startswith(p) for p in prefixes):
                res.seen.add(c[0])
                n_robots += 1
            else:
                kept.append(c)
        if not kept:
            res.metrics.append(
                {
                    "round": rnd, "candidates": len(frontier), "unique": len(best),
                    "seen_dropped": n_seen_dropped, "robots": n_robots,
                    "selected": 0, "deferred": 0,
                }
            )
            res.rounds = rnd
            break
        # 4. SELECT per host by priority
        by_host: dict[str, list] = {}
        for c in kept:
            by_host.setdefault(c[2], []).append(c)
        selected, deferred = [], []
        for host, cs in by_host.items():
            cs.sort(key=lambda c: priority_key(c[3], c[4], c[0]))
            k = budgets.get(host, DEFAULT_BUDGET)
            selected.extend(cs[:k])
            deferred.extend(cs[k:])
        # 5. MARK
        for c in selected:
            res.seen.add(c[0])
        # 7. ORDER: within-host rank, then (hrank, priority)
        ranked = []
        for host, cs in by_host.items():
            k = budgets.get(host, DEFAULT_BUDGET)
            for i, c in enumerate(cs[:k]):
                ranked.append((i, priority_key(c[3], c[4], c[0]), c))
        ranked.sort(key=lambda t: (t[0], t[1]))
        res.order.extend(c[0] for _, _, c in ranked)
        # 6/8. FETCH + EXPAND
        new_cands = []
        for hrank, _, c in ranked:
            hsh, canon, host, depth, ts = c
            page = pages.get(hsh)
            if page is None:
                res.extracted[hsh] = {
                    "canon_url": canon, "depth": depth, "warc_ts": ts,
                    "hrank": hrank, "fetch_status": "miss", "text": "",
                    "n_chars": 0, "n_links": 0,
                }
                continue
            html, pts, pcanon, phost = page
            text, links = extract_text_and_links(html, canon)
            n_links = 0
            for link in links:
                lc = canonicalize_url(link)
                if lc is None:
                    continue
                lh = url_sha1(lc)
                new_cands.append((lh, lc, host_of(lc), depth + 1, warc_of.get(lh, UNKNOWN_TS)))
                n_links += 1
            res.extracted[hsh] = {
                "canon_url": canon, "depth": depth, "warc_ts": ts,
                "hrank": hrank, "fetch_status": "hit", "text": text,
                "n_chars": len(text), "n_links": n_links,
            }
        res.metrics.append(
            {
                "round": rnd,
                "candidates": len(frontier),
                "unique": len(best),
                "seen_dropped": n_seen_dropped,
                "robots": n_robots,
                "selected": len(selected),
                "deferred": len(deferred),
                "new": len(new_cands),
            }
        )
        res.rounds = rnd
        frontier = deferred + new_cands
        if not frontier:
            break
    return res


# bump when oracle semantics / persisted shapes change (cache key component)
ORACLE_VERSION = 1


def persist_expected(sf_dir: str, max_rounds: int = 64) -> str:
    """Run the sequential oracle ONCE per (corpus, oracle version) and
    persist its expected extracted/order/metrics tables as Parquet beside
    the corpus cache — giving the driver's crawl queries real oracle SQL
    (``SELECT .. FROM read_parquet(expected)``), so engine-vs-independent-
    oracle equality shows up as green CORRECTNESS rows instead of living
    only in pytest. Returns the sealed directory."""
    import json

    import pyarrow as pa

    from ..sources.pages import GEN_VERSION, generate_corpus

    corpus = generate_corpus(sf_dir)
    exp_dir = os.path.join(
        os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache"),
        "expected-{}-n{}-g{}-o{}".format(
            os.path.basename(os.path.normpath(sf_dir)),
            corpus.n_pages, GEN_VERSION, ORACLE_VERSION,
        ),
    )
    done = os.path.join(exp_dir, "DONE.json")
    if os.path.exists(done):
        return exp_dir
    res = oracle_crawl(corpus, max_rounds=max_rounds)
    os.makedirs(exp_dir, exist_ok=True)

    hashes = sorted(res.extracted)
    rows = [res.extracted[h] for h in hashes]
    pq.write_table(
        pa.table(
            {
                "url_hash": pa.array([h.hex() for h in hashes], pa.string()),
                "canon_url": pa.array([r["canon_url"] for r in rows], pa.string()),
                "depth": pa.array([r["depth"] for r in rows], pa.int64()),
                "hrank": pa.array([r["hrank"] for r in rows], pa.int64()),
                "fetch_status": pa.array([r["fetch_status"] for r in rows], pa.string()),
                "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            }
        ),
        os.path.join(exp_dir, "extracted.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "ord": pa.array(range(len(res.order)), pa.int64()),
                "url_hash": pa.array([h.hex() for h in res.order], pa.string()),
            }
        ),
        os.path.join(exp_dir, "order.parquet"),
    )
    cols = ["round", "candidates", "unique", "seen_dropped", "robots",
            "selected", "deferred"]
    pq.write_table(
        pa.table(
            {c: pa.array([m[c] for m in res.metrics], pa.int64()) for c in cols}
        ),
        os.path.join(exp_dir, "metrics.parquet"),
    )
    with open(done, "w") as f:
        json.dump({"rounds": res.rounds, "urls": len(res.order)}, f)
    return exp_dir
