"""FetchExtract actor pool — politeness-scoped fetch + E1 extraction (F1, E1).

The reference fetches with one Playwright browser per worker
(``extract_pages.py:139-157``) and extracts afterwards; in this engine the
sandbox has no network, so "fetch" = keyed lookup into the bucketed Parquet
pages table behind the same stateful-actor interface a real fetcher would
use (browser/session state ↔ bucket readers + token bucket).

Design notes for 100 TB scale:
  - fetch and extract are FUSED in one actor so the raw ``html`` bytes never
    enter the object store — only the ≤4000-char text and the outlink list
    leave the stage (SURVEY.md §7.4.5: drop the wide binary column as early
    as possible);
  - the selected set is sorted by ``url_hash`` before this stage, so each
    batch touches few hash buckets and few row groups within them; the
    actor prunes to the row groups whose [min,max] hash statistics cover
    the batch's digests and LRU-caches decoded row groups — per-actor
    memory is row-group-bounded, never bucket-bounded;
  - per-actor ``TokenBucket`` guards the per-host lease even under task
    replays (the global budget is enforced by the selection shuffle).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import analysis as A
from ..functions.html_text import extract_text_and_links
from ..functions.urls import canonicalize_url, host_of, url_sha1_hex
from ..sources.pages import bucket_of
from ..state.tokenbucket import TokenBucket

EXTRACTED_FIELDS = [
    "url_hash", "canon_url", "host", "depth", "warc_ts", "hrank",
    "fetch_status", "text", "n_chars", "links", "link_hashes", "link_hosts",
    "link_warcts", "n_links",
    "lang_pred", "n_tokens", "alpha_ratio", "stopword_ratio", "simhash", "fp64",
]


class FetchExtract:
    def __init__(
        self,
        pages_dir: str,
        num_buckets: int,
        budgets: dict[str, int] | None = None,
        cache_cap: int | None = None,
    ):
        from ..state.rangeindex import BucketRangeReader

        self.pages_dir = pages_dir
        self.num_buckets = num_buckets
        self.bucket = TokenBucket(budgets or {}, default=1 << 30)
        # Range-read layout (state/rangeindex.py): per batch the actor
        # prunes to just the row groups whose [min,max] hash statistics
        # cover its digests. Per-actor memory is bounded by cache_cap ROW
        # GROUPS — never a whole bucket (at 10^10 URLs a bucket is ~100s of
        # GB; a row group stays ~MBs). Actors serve a stable slice of
        # buckets (routing in pipelines/crawl._dispatch_fetch) so the cache
        # stays hot across rounds; an undersized cap measured 6x loss.
        self.reader = BucketRangeReader(
            pages_dir,
            num_buckets,
            "html",
            cache_cap=cache_cap if cache_cap is not None else 1024,
            decode=lambda v: v.as_py(),
        )
        # outlink warc_ts resolves HERE, in the persistent actor pool, so
        # frontier expansion downstream is pure list assembly: per-task
        # WarcIndex caches were rebuilt cold on every worker process and
        # dominated the next-frontier phase at high CPU counts (105s vs
        # 13s); actors persist across rounds, so this cache warms once
        self.warc_reader = BucketRangeReader(
            pages_dir, num_buckets, "warc_ts", cache_cap=4096,
            decode=lambda v: v.value,
        )

    def ping(self, preload_buckets: list[int] | None = None) -> int:
        """Actor warm-up: forces process spawn + imports; optionally
        pre-loads this actor's pages buckets so the first crawl round
        measures fetching, not cold caches."""
        n = 0
        for b in preload_buckets or []:
            pf, _, _, rgs = self.reader._bucket_meta(b)
            if pf is None:
                continue
            for rg in rgs:
                n += len(self.reader._rg_table(b, pf, rg))
        return n

    def lookup_bucket(self, b: int, digs: list[bytes]) -> dict[bytes, bytes | None]:
        """Keyed fetch for one bucket: row groups pruned by hash range."""
        return self.reader.lookup_bucket(b, digs)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        n = len(batch)
        statuses: list[str] = []
        texts: list[str] = []
        n_chars: list[int] = []
        links_col: list[list[str]] = []
        lhash_col: list[list[str]] = []
        lhost_col: list[list[str]] = []
        lts_col: list[list[int]] = []
        langs: list[str] = []
        n_tokens: list[int] = []
        alpha_ratios: list[float] = []
        stop_ratios: list[float] = []
        simhashes: list[int] = []
        fps: list[int] = []
        # group rows by bucket (input sorted by url_hash → 1-2 buckets/batch)
        digests = [bytes.fromhex(h) for h in batch["url_hash"]]
        by_bucket: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            by_bucket.setdefault(bucket_of(d, self.num_buckets), []).append(i)
        html_of: dict[int, bytes | None] = {}
        for b, idxs in by_bucket.items():
            got = self.lookup_bucket(b, [digests[i] for i in idxs])
            for i in idxs:
                html_of[i] = got[digests[i]]
        for i in range(n):
            host = batch["host"].iloc[i]
            self.bucket.try_take(host)  # per-actor lease guard (never binding here)
            html = html_of[i]
            if html is None:
                statuses.append("miss")
                texts.append("")
                n_chars.append(0)
                links_col.append([])
                lhash_col.append([])
                lhost_col.append([])
                lts_col.append([])
                langs.append("und")
                n_tokens.append(0)
                alpha_ratios.append(0.0)
                stop_ratios.append(0.0)
                simhashes.append(0)
                fps.append(0)
                continue
            text, raw_links = extract_text_and_links(html, batch["canon_url"].iloc[i])
            # canonicalize outlinks HERE (in the actor pool, parallel) so the
            # frontier-expansion step downstream is a pure lookup, not a
            # per-round single-threaded URL-parsing loop (F15)
            canons, hashes, hosts = [], [], []
            for link in raw_links:
                c = canonicalize_url(link)
                if c is None:
                    continue
                canons.append(c)
                hashes.append(url_sha1_hex(c))
                hosts.append(host_of(c))
            statuses.append("hit")
            texts.append(text)
            n_chars.append(len(text))
            links_col.append(canons)
            lhash_col.append(hashes)
            lhost_col.append(hosts)
            lts_col.append([])  # filled in one batched pass below
            # full per-page analysis in the same pass (the training-data
            # pipeline work a real crawl ships with every page): language-ID,
            # quality signals, simhash + rolling fingerprint, token count
            q = A.quality_features(text)
            langs.append(A.lang_id(text))
            n_tokens.append(A.count_tokens_ws(text))
            alpha_ratios.append(q["alpha_ratio"])
            stop_ratios.append(q["stopword_ratio"])
            s = A.simhash64(text)
            simhashes.append(s - (1 << 64) if s >= (1 << 63) else s)
            fps.append(A.rolling_fingerprint(text) & 0x7FFFFFFFFFFFFFFF)
        # one batched warc_ts resolution for every outlink in the batch
        all_digs = [bytes.fromhex(h) for row in lhash_col for h in row]
        got = self.warc_reader.get_many(all_digs) if all_digs else {}
        pos = 0
        for i, row in enumerate(lhash_col):
            if row:
                lts_col[i] = [
                    got[d] if got[d] is not None else -1
                    for d in all_digs[pos : pos + len(row)]
                ]
                pos += len(row)
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(batch["url_hash"], pa.string()),
                "canon_url": pa.array(batch["canon_url"], pa.string()),
                "host": pa.array(batch["host"], pa.string()),
                "depth": pa.array(batch["depth"].astype("int64"), pa.int32()),
                "warc_ts": pa.array(batch["warc_ts"].astype("int64"), pa.int64()),
                "hrank": pa.array(batch["hrank"].astype("int64"), pa.int32()),
                "fetch_status": pa.array(statuses, pa.string()),
                "text": pa.array(texts, pa.string()),
                "n_chars": pa.array(n_chars, pa.int32()),
                "links": pa.array(links_col, pa.list_(pa.string())),
                "link_hashes": pa.array(lhash_col, pa.list_(pa.string())),
                "link_hosts": pa.array(lhost_col, pa.list_(pa.string())),
                "link_warcts": pa.array(lts_col, pa.list_(pa.int64())),
                # next round's candidate count derives from sum(n_links) —
                # the fused frontier expansion never materializes a frontier
                # table, so the loop control needs this scalar per row
                "n_links": pa.array([len(r) for r in links_col], pa.int32()),
                "lang_pred": pa.array(langs, pa.string()),
                "n_tokens": pa.array(n_tokens, pa.int32()),
                "alpha_ratio": pa.array(alpha_ratios, pa.float64()),
                "stopword_ratio": pa.array(stop_ratios, pa.float64()),
                "simhash": pa.array(simhashes, pa.int64()),
                "fp64": pa.array(fps, pa.int64()),
            }
        )
