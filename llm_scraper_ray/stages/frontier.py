"""Frontier batch kernels: canonicalize, robots+seen filter, selection, expansion.

These are the per-round transforms of the crawl loop (pipelines/crawl.py),
implementing steps 1–4 and 8 of pipelines/spec.py as Ray Data
``map_batches`` / ``groupby().map_groups`` callables. Everything is pure
given its broadcast inputs except the robots step, which marks blocked
digests seen via the shard actors (hash-unique per round → race-free).

Engine frontier schema (Arrow):
  url_hash: string (40-char sha1 hex — hex sort order == byte sort order),
  canon_url: string, host: string, depth: int32, warc_ts: int64 (us; -1 unknown)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.html_text import extract_text_and_links  # noqa: F401  (fetch stage)
from ..functions.urls import canonicalize_url, host_of, path_of, url_sha1_hex
from ..pipelines.spec import DEFAULT_BUDGET

FRONTIER_SCHEMA = pa.schema(
    [
        ("url_hash", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("warc_ts", pa.int64()),
    ]
)


def _ts_of(warc_lookup, hex_hashes: list[str]) -> list[int]:
    """Batch warc_ts resolution: a WarcIndex (disk-backed range reads) or a
    plain dict both work — -1 for unknown hashes (dangling links)."""
    if hasattr(warc_lookup, "ts_for_hex"):
        return warc_lookup.ts_for_hex(hex_hashes)
    return [warc_lookup.get(h, -1) for h in hex_hashes]


def candidates_from_urls(urls: list[str], depth: int, warc_lookup) -> pa.Table:
    """Canonicalize raw URLs → frontier rows; non-http(s)/invalid dropped (F14)."""
    hashes, canons, hosts, depths = [], [], [], []
    for url in urls:
        canon = canonicalize_url(url)
        if canon is None:
            continue
        h = url_sha1_hex(canon)
        hashes.append(h)
        canons.append(canon)
        hosts.append(host_of(canon))
        depths.append(depth)
    tss = _ts_of(warc_lookup, hashes)
    return pa.Table.from_pydict(
        {
            "url_hash": pa.array(hashes, pa.string()),
            "canon_url": pa.array(canons, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "warc_ts": pa.array(tss, pa.int64()),
        },
        schema=FRONTIER_SCHEMA,
    )


def pre_dedup(batch: pd.DataFrame) -> pd.DataFrame:
    """Combiner before the dedup shuffle (spec step 1): within-batch
    keep-min-depth, so the groupby moves one row per (batch, hash) instead of
    every duplicate. The exact dedup is then a vectorized
    ``groupby("url_hash").aggregate(Min(...))`` — every non-depth column is a
    pure function of the hash, so Min reproduces it."""
    return batch.sort_values(["url_hash", "depth"], kind="stable").drop_duplicates(
        "url_hash", keep="first"
    )


def pre_dedup_arrow(batch: pa.Table) -> pa.Table:
    """pre_dedup on zero-copy Arrow batches (the distributed path's hot
    frontier stage — no pandas block conversion): sort by (hash, depth),
    keep each hash's first row via a shifted not-equal mask."""
    import pyarrow.compute as pc

    if batch.num_rows <= 1:
        return batch
    t = batch.sort_by([("url_hash", "ascending"), ("depth", "ascending")])
    uh = t["url_hash"].combine_chunks()
    first = pc.not_equal(uh.slice(1), uh.slice(0, len(uh) - 1))
    mask = pa.chunked_array([pa.array([True]), first])
    return t.filter(mask)


def make_robots_seen_filter_arrow(seen_actors, num_shards: int, robots: dict[str, list[str]]):
    """Arrow-batch variant of make_robots_seen_filter (appends ``status``)
    — the per-row robots prefix checks remain Python (tiny closed-form
    work), but blocks never convert to pandas."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("status", pa.array([], pa.string()))
        digests = [bytes.fromhex(h) for h in batch["url_hash"].to_pylist()]
        routes: dict[int, list[int]] = {}
        for pos, d in enumerate(digests):
            routes.setdefault(d[0] % num_shards, []).append(pos)
        seen_mask = [False] * n
        futures = {
            s: seen_actors[s].contains_many.remote([digests[p] for p in poss])
            for s, poss in routes.items()
        }
        for s, poss in routes.items():
            for p, val in zip(poss, ray.get(futures[s])):
                seen_mask[p] = val
        status = []
        blocked: dict[int, list[bytes]] = {}
        for i, (host, canon) in enumerate(
            zip(batch["host"].to_pylist(), batch["canon_url"].to_pylist())
        ):
            if seen_mask[i]:
                status.append("seen")
                continue
            prefixes = robots.get(host)
            if prefixes and any(path_of(canon).startswith(p) for p in prefixes):
                status.append("robots")
                d = digests[i]
                blocked.setdefault(d[0] % num_shards, []).append(d)
            else:
                status.append("ok")
        if blocked:
            ray.get(
                [seen_actors[s].add_many.remote(ds) for s, ds in blocked.items()]
            )
        return batch.append_column("status", pa.array(status, pa.string()))

    return fn


def make_robots_seen_filter(seen_actors, num_shards: int, robots: dict[str, list[str]]):
    """Spec steps 2+3 as one map_batches fn: appends ``status`` ∈
    {ok, seen, robots}; robots-blocked digests are added to the seen shards.

    ``seen_actors`` is the list of SeenShardActor handles (serialized into
    the task closure); ``robots`` is the broadcast host→prefix map.
    """
    import ray

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            batch["status"] = pd.Series([], dtype="object")
            return batch
        digests = [bytes.fromhex(h) for h in batch["url_hash"]]
        # route per shard, one batched contains per shard
        routes: dict[int, list[int]] = {}
        for pos, d in enumerate(digests):
            routes.setdefault(d[0] % num_shards, []).append(pos)
        seen_mask = [False] * len(digests)
        futures = {
            s: seen_actors[s].contains_many.remote([digests[p] for p in poss])
            for s, poss in routes.items()
        }
        for s, poss in routes.items():
            for p, val in zip(poss, ray.get(futures[s])):
                seen_mask[p] = val
        status = []
        blocked: dict[int, list[bytes]] = {}
        for i, (host, canon) in enumerate(zip(batch["host"], batch["canon_url"])):
            if seen_mask[i]:
                status.append("seen")
                continue
            prefixes = robots.get(host)
            if prefixes and any(path_of(canon).startswith(p) for p in prefixes):
                status.append("robots")
                d = digests[i]
                blocked.setdefault(d[0] % num_shards, []).append(d)
            else:
                status.append("ok")
        if blocked:
            ray.get(
                [seen_actors[s].add_many.remote(ds) for s, ds in blocked.items()]
            )
        batch = batch.copy()
        batch["status"] = status
        return batch

    return fn


def _sort_by_priority(df: pd.DataFrame) -> pd.DataFrame:
    """Normative priority (spec): depth asc, warc_ts desc, url_hash asc."""
    return df.sort_values(
        ["depth", "warc_ts", "url_hash"],
        ascending=[True, False, True],
        kind="stable",
    )


def expand_links_ts(
    links_iter, hash_iter, host_iter, ts_iter, depth_iter
) -> pa.Table:
    """Spec step 8, lookup-free: the fetch actors resolved each outlink's
    warc_ts already (stages/fetch.py) — expansion is pure list assembly."""
    out: dict[str, list] = {k: [] for k in FRONTIER_SCHEMA.names}
    for links, hashes, hosts, tss, depth in zip(
        links_iter, hash_iter, host_iter, ts_iter, depth_iter
    ):
        if links is None or len(links) == 0:
            continue
        d = int(depth) + 1
        out["url_hash"].extend(hashes)
        out["canon_url"].extend(links)
        out["host"].extend(hosts)
        out["depth"].extend([d] * len(links))
        out["warc_ts"].extend(int(t) for t in tss)
    return pa.Table.from_pydict(out, schema=FRONTIER_SCHEMA)


def select_topk_vectorized(flags: pd.DataFrame, budgets: dict[str, int]) -> pd.DataFrame:
    """Spec steps 4+7, fully vectorized (driver fast path): one stable sort
    by (host, priority), per-host running count of ok rows via grouped
    cumsum, budget lookup via Series.map — no per-group Python calls."""
    import numpy as np

    df = flags.sort_values(
        ["host", "depth", "warc_ts", "url_hash"],
        ascending=[True, True, False, True],
        kind="stable",
    ).reset_index(drop=True)
    ok = df["status"].eq("ok")
    rank = ok.groupby(df["host"]).cumsum() - 1  # 0-based ok-rank within host
    k = df["host"].map(budgets).fillna(DEFAULT_BUDGET)
    sel = ok & (rank < k)
    df["selected"] = sel
    df["hrank"] = np.where(sel, rank, -1).astype("int64")
    return df


_WARC_INDEXES: dict = {}


def warc_index_for(pages_dir: str, num_buckets: int):
    """Process-local WarcIndex (one per worker process, reused across the
    round's tasks and across rounds — Ray reuses worker processes, so the
    row-group cache stays warm without any actor lifecycle management).
    This replaces the round-1 ``ray.put`` broadcast of a driver-built
    hash→warc_ts dict: no O(corpus) structure exists anywhere now."""
    from ..state.rangeindex import WarcIndex

    key = (pages_dir, num_buckets)
    idx = _WARC_INDEXES.get(key)
    if idx is None:
        idx = _WARC_INDEXES[key] = WarcIndex(pages_dir, num_buckets)
    return idx
