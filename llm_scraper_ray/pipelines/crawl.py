"""The Ray-Data crawl loop: iterative frontier rounds with per-round lineage.

Ray-native restatement of the reference's fetch+extract entry point
(``extract_pages.py:131-164``; SURVEY.md §3.2) under the defined semantics of
pipelines/spec.py. Each frontier round runs (fused, one execution):

  prev round's output ──expand (deferred ∪ hits' outlinks; FUSED — the
  frontier is never materialized after round 1) ──pre_dedup──▶ robots+seen
  status (shard actors, per batch) ─▶ sort(host, url_hash) + per-batch
  dedup + top-k select (same url_hash ⇒ same host, so ONE shuffle covers
  both) ─▶ mark-seen + FetchExtract actors (html never leaves the stage;
  outlinks canonicalized in-pool) / passthrough ledger rows ─▶ round out

Two physical paths implement the SAME spec (tested equal):

  - **distributed** (big rounds): the dataflow above as Ray Data executions —
    the only path that exists at 10^10-frontier scale;
  - **driver fast path** (rounds below ``driver_threshold`` candidates):
    the control plane (dedup/robots/select/expand — pure-kernel pandas) runs
    on the driver, while the seen-set shard actors and the persistent
    FetchExtract actor pool still do the stateful/data work. This is the
    local-mode analog of a scheduler handling metadata-sized stages inline
    instead of paying full task-graph overhead for 30-row rounds.

FetchExtract actors are created ONCE per run and reused across rounds
(bucket caches stay warm); batches route to ``actor[bucket % n]`` so each
actor owns a stable slice of the pages table.

Checkpoint/resume (SURVEY.md F11, §7.4.6): every round directory
``round-NNNN/`` holds flags, the complete round output (fetched rows +
deferred/robots/seen passthrough ledger rows — the next round's candidate
source), serialized seen shards and metrics, sealed by ``_COMPLETE``.
``run(resume=True)`` restarts from the last sealed round; replaying a
partial round is idempotent (seen adds are set-inserts, fetch is
deterministic).

Scale notes: the distributed round's only all-to-all is ONE sort keyed
(host, url_hash) — collocating both the dedup key and the politeness key;
per-key groupbys are avoided entirely (Ray's groupby costs ~1 ms/key), and
hot hosts are skew-safe because sort ranges split them while the
boundary-host top-k forwarding keeps selection exact. The hash→warc_ts
metadata is served by disk-backed row-group range reads over the bucketed
pages layout (state/rangeindex.WarcIndex, process-local caches) — no
O(corpus) dict on the driver or in any broadcast.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.urls import path_of
from ..sources.pages import PagesCorpus, bucket_of
from ..stages.fetch import FetchExtract
from ..stages.frontier import (
    FRONTIER_SCHEMA,
    candidates_from_urls,
    expand_links_ts,
    make_robots_seen_filter_arrow,
    pre_dedup,
    pre_dedup_arrow,
    select_topk_vectorized,
    warc_index_for,
)
from ..stages.seen import SeenSet


def _to_frontier_table(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url_hash": pa.array(df["url_hash"], pa.string()),
            "canon_url": pa.array(df["canon_url"], pa.string()),
            "host": pa.array(df["host"], pa.string()),
            "depth": pa.array(df["depth"].astype("int64"), pa.int32()),
            "warc_ts": pa.array(df["warc_ts"].astype("int64"), pa.int64()),
        },
        schema=FRONTIER_SCHEMA,
    )


def _write_empty(path_dir: str, schema: pa.Schema) -> None:
    os.makedirs(path_dir, exist_ok=True)
    pq.write_table(schema.empty_table(), os.path.join(path_dir, "empty.parquet"))


def _count_rows(path_dir: str) -> int:
    return pads.dataset(path_dir, format="parquet").count_rows()


def _dispatch_fetch_refs(
    fetch_actors, selected: pd.DataFrame, num_buckets: int, batch_size: int
) -> list:
    """Route selected rows to the persistent FetchExtract actors by pages
    bucket (``actor[bucket % n]`` — each actor's bucket cache stays hot) and
    return the UNRESOLVED result refs, so callers can overlap the fetch
    with other work (the round-fixup path injects them into the next
    round's execution)."""
    n_act = len(fetch_actors)
    groups: dict[int, list[int]] = {}
    for pos, h in enumerate(selected["url_hash"]):
        b = bucket_of(bytes.fromhex(h), num_buckets)
        groups.setdefault(b % n_act, []).append(pos)
    futures = []
    for a_idx, poss in sorted(groups.items()):
        sub = selected.iloc[poss]
        # one call per (caller, actor) up to batch_size: callers are already
        # many (map tasks), so further 3-way splitting only multiplied tiny
        # actor calls (measured: per-actor rate dropped 2.5x at 30 actors)
        chunk = max(64, min(max(2048, batch_size), len(sub)))
        for start in range(0, len(sub), chunk):
            futures.append(
                fetch_actors[a_idx].__call__.remote(sub.iloc[start : start + chunk])
            )
    return futures


def _dispatch_fetch(
    fetch_actors, selected: pd.DataFrame, num_buckets: int, batch_size: int
) -> pa.Table:
    futures = _dispatch_fetch_refs(fetch_actors, selected, num_buckets, batch_size)
    tables = [t for t in ray.get(futures) if t.num_rows > 0]
    if not tables:
        return _EXTRACTED_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def _flags_schema() -> pa.Schema:
    return pa.schema(
        list(FRONTIER_SCHEMA)
        + [
            ("status", pa.string()),
            ("selected", pa.bool_()),
            ("hrank", pa.int64()),
            ("pass2", pa.bool_()),
            ("fix", pa.bool_()),
        ]
    )


_EXTRACTED_SCHEMA = pa.schema(
    [
        ("url_hash", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("warc_ts", pa.int64()),
        ("hrank", pa.int32()),
        ("fetch_status", pa.string()),
        ("text", pa.string()),
        ("n_chars", pa.int32()),
        ("links", pa.list_(pa.string())),
        ("link_hashes", pa.list_(pa.string())),
        ("link_hosts", pa.list_(pa.string())),
        ("link_warcts", pa.list_(pa.int64())),
        ("n_links", pa.int32()),
        ("lang_pred", pa.string()),
        ("n_tokens", pa.int32()),
        ("alpha_ratio", pa.float64()),
        ("stopword_ratio", pa.float64()),
        ("simhash", pa.int64()),
        ("fp64", pa.int64()),
    ]
)


def _passthrough_table(rest: pd.DataFrame) -> pa.Table:
    """Non-fetched candidates as ledger rows of the round output (hrank -1,
    ``fetch_status`` ∈ {deferred, robots, seen}). Both physical paths write
    these, so every round's ``extracted`` dir is the COMPLETE record of the
    round — the fused next-round expansion reads deferred rows back from it
    instead of a materialized frontier table."""
    kind = ["deferred" if s == "ok" else s for s in rest["status"]]
    return _ledger_table(rest, kind)


def _pass2_placeholder_table(fwd: pd.DataFrame) -> pa.Table:
    """Boundary-forwarded rows as PLACEHOLDER ledger rows
    (``fetch_status`` = ``pass2-<status>``): the fused single-execution
    round emits them into the round output so the driver's metadata-sized
    fixup pass can read them back; their authoritative fate is the fixup's
    own ``pass2-fix.parquet`` rows. Every consumer ignores them: expansion
    reads hit/deferred, lineage reads hrank >= 0, metrics subtract them."""
    kind = [f"pass2-{s}" for s in fwd["status"]]
    return _ledger_table(fwd, kind)


def _ledger_table(rest: pd.DataFrame, kind: list[str]) -> pa.Table:
    n = len(rest)
    return pa.Table.from_pydict(
        {
            "url_hash": pa.array(rest["url_hash"], pa.string()),
            "canon_url": pa.array(rest["canon_url"], pa.string()),
            "host": pa.array(rest["host"], pa.string()),
            "depth": pa.array(rest["depth"].astype("int64"), pa.int32()),
            "warc_ts": pa.array(rest["warc_ts"].astype("int64"), pa.int64()),
            "hrank": pa.array([-1] * n, pa.int32()),
            "fetch_status": pa.array(kind, pa.string()),
            "text": pa.array([""] * n, pa.string()),
            "n_chars": pa.array([0] * n, pa.int32()),
            "links": pa.array([[]] * n, pa.list_(pa.string())),
            "link_hashes": pa.array([[]] * n, pa.list_(pa.string())),
            "link_hosts": pa.array([[]] * n, pa.list_(pa.string())),
            "link_warcts": pa.array([[]] * n, pa.list_(pa.int64())),
            "n_links": pa.array([0] * n, pa.int32()),
            "lang_pred": pa.array(["und"] * n, pa.string()),
            "n_tokens": pa.array([0] * n, pa.int32()),
            "alpha_ratio": pa.array([0.0] * n, pa.float64()),
            "stopword_ratio": pa.array([0.0] * n, pa.float64()),
            "simhash": pa.array([0] * n, pa.int64()),
            "fp64": pa.array([0] * n, pa.int64()),
        }
    )


# columns a fused frontier expansion needs from the previous round's output
_EXPAND_COLUMNS = [
    "url_hash", "canon_url", "host", "depth", "warc_ts",
    "fetch_status", "links", "link_hashes", "link_hosts", "link_warcts",
]


def _expand_round_output(batch: pd.DataFrame) -> pa.Table:
    """Spec steps 8-9 as a batch kernel over the PREVIOUS round's output:
    deferred ledger rows pass through as candidates, hit rows expand their
    (pre-canonicalized, warc_ts-resolved) outlinks at depth+1."""
    hits = batch[batch["fetch_status"] == "hit"]
    new = expand_links_ts(
        hits["links"], hits["link_hashes"], hits["link_hosts"],
        hits["link_warcts"], hits["depth"],
    )
    deferred_t = _to_frontier_table(batch[batch["fetch_status"] == "deferred"])
    return pa.concat_tables([deferred_t, new])


def _expand_round_output_arrow(t: pa.Table) -> pa.Table:
    """Zero-copy Arrow twin of :func:`_expand_round_output` for the
    distributed path (the pandas loop was a 1.5 s single-task prologue in
    every heavy round): ``list_flatten`` + ``list_parent_indices`` explode
    the outlink lists in row-major order — exactly the python loop's
    extend order, so outputs are row-identical."""
    st = t["fetch_status"]
    deferred = t.filter(pc.equal(st, "deferred"))
    hits = t.filter(pc.equal(st, "hit"))
    deferred_t = deferred.select(
        ["url_hash", "canon_url", "host", "depth", "warc_ts"]
    ).cast(FRONTIER_SCHEMA)
    links = hits["links"].combine_chunks()
    parent = pc.list_parent_indices(links)
    new = pa.Table.from_pydict(
        {
            "url_hash": pc.list_flatten(hits["link_hashes"].combine_chunks()),
            "canon_url": pc.list_flatten(links),
            "host": pc.list_flatten(hits["link_hosts"].combine_chunks()),
            "depth": pc.cast(
                pc.add(pc.take(hits["depth"].combine_chunks(), parent), 1),
                pa.int32(),
            ),
            "warc_ts": pc.cast(
                pc.list_flatten(hits["link_warcts"].combine_chunks()), pa.int64()
            ),
        },
        schema=FRONTIER_SCHEMA,
    )
    return pa.concat_tables([deferred_t, new])


@dataclass
class CrawlResult:
    run_dir: str
    rounds: int
    metrics: list[dict] = field(default_factory=list)

    def _round_dirs(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.run_dir)):
            if name.startswith("round-") and name != "round-0000":
                if os.path.exists(os.path.join(self.run_dir, name, "_COMPLETE")):
                    out.append(os.path.join(self.run_dir, name))
        return out

    def extracted_dataset(self, columns: list[str] | None = None) -> rd.Dataset:
        """All rounds' extracted rows as one Dataset (lazy, streaming).

        Round outputs also ledger deferred/robots/seen rows (hrank == -1,
        distributed path); fetched rows have hrank >= 0 — filtered at the
        read via predicate pushdown."""
        files = []
        for d in self._round_dirs():
            sub = os.path.join(d, "extracted")
            files.extend(
                os.path.join(sub, f) for f in sorted(os.listdir(sub)) if f.endswith(".parquet")
            )
        return rd.read_parquet(files, columns=columns, filter=pc.field("hrank") >= 0)

    def collect_extracted(self) -> pa.Table:
        """Driver-side table of fetched rows (test scale only)."""
        parts = [
            pads.dataset(os.path.join(d, "extracted"), format="parquet")
            for d in self._round_dirs()
        ]
        return pads.dataset(parts).to_table(filter=pads.field("hrank") >= 0)

    def order_dataset(self) -> rd.Dataset:
        """The crawl-order ledger as a Dataset: every round's fetched rows
        get their round number attached at the read, then ONE distributed
        sort by (round, hrank, depth, warc_ts desc, url_hash) — the
        at-scale variant of ``assemble_order`` (driver-side, test-scale
        only). Consume with ``iter_batches`` or ``write_parquet``; row
        order is the crawl order."""
        parts = []
        for d in self._round_dirs():
            k = int(os.path.basename(d).split("-")[1])

            def tag(t: pa.Table, _k=k) -> pa.Table:
                return t.append_column(
                    "round", pa.array([_k] * t.num_rows, pa.int32())
                )

            parts.append(
                rd.read_parquet(
                    os.path.join(d, "extracted"),
                    columns=["url_hash", "depth", "warc_ts", "hrank"],
                    filter=pc.field("hrank") >= 0,
                ).map_batches(tag, batch_format="pyarrow")
            )
        if not parts:
            return rd.from_arrow(
                pa.Table.from_pydict({"url_hash": pa.array([], pa.string())})
            )
        out = parts[0]
        for ds in parts[1:]:
            out = out.union(ds)
        return out.sort(
            ["round", "hrank", "depth", "warc_ts", "url_hash"],
            descending=[False, False, False, True, False],
        ).select_columns(["url_hash"])

    def assemble_order(self) -> list[str]:
        """Global crawl-order ledger: per round, sort by (hrank, priority)
        (spec step 7). Driver-side at test scale; ``order_dataset`` is the
        distributed variant (tested equal)."""
        order: list[str] = []
        for d in self._round_dirs():
            t = pads.dataset(os.path.join(d, "extracted"), format="parquet").to_table(
                columns=["url_hash", "depth", "warc_ts", "hrank"],
                filter=pads.field("hrank") >= 0,
            )
            rows = sorted(
                zip(
                    t["hrank"].to_pylist(),
                    t["depth"].to_pylist(),
                    (-ts for ts in t["warc_ts"].to_pylist()),
                    t["url_hash"].to_pylist(),
                ),
            )
            order.extend(r[3] for r in rows)
        return order

    def seen_digests(self) -> set[bytes]:
        from ..state.cuckoo import SeenShard

        dirs = self._round_dirs()
        if not dirs:
            return set()
        seen_dir = os.path.join(dirs[-1], "seen")
        out: set[bytes] = set()
        for name in os.listdir(seen_dir):
            with open(os.path.join(seen_dir, name), "rb") as f:
                out |= SeenShard.from_bytes(f.read()).exact
        return out


class CrawlEngine:
    def __init__(
        self,
        corpus: PagesCorpus,
        run_dir: str,
        num_shards: int = 8,
        fetch_concurrency: int = 4,
        max_rounds: int = 64,
        batch_size: int = 512,
        driver_threshold: int = 20_000,
        budget_scale: float = 1.0,
    ):
        self.corpus = corpus
        self.run_dir = run_dir
        self.num_shards = num_shards
        self.fetch_concurrency = fetch_concurrency
        self.max_rounds = max_rounds
        self.batch_size = batch_size
        self.driver_threshold = driver_threshold
        # select-stage batch size (the boundary-forwarding unit): the env
        # override exists so tests can stress many-batch boundary/fixup
        # paths that a 65536-row batch never exercises at test scale
        self.select_batch = int(os.environ.get("LLMSR_SELECT_BATCH", "65536"))

        pol = pq.read_table(corpus.politeness_path)
        # budget_scale models provisioning a higher per-host crawl rate (the
        # reference analog: more SLURM tasks per site); 1.0 = the politeness
        # table as-is (what the oracle-equality tests use)
        self.budgets = {
            h.as_py(): max(1, int(m.as_py() * budget_scale))
            for h, m in zip(pol["host"], pol["max_per_round"])
        }
        self.robots = {
            h.as_py(): list(r.as_py())
            for h, r in zip(pol["host"], pol["robots_disallow"])
            if len(r) > 0
        }
        # warc_ts metadata is served by disk-backed range reads over the
        # bucketed pages layout — no O(corpus) driver dict, no broadcast
        # (round-1 liability; VERDICT r01 item 5)
        self.warc_index = warc_index_for(corpus.pages_dir, corpus.num_buckets)
        self._seen: SeenSet | None = None
        self._fetch_actors: list | None = None
        # unresolved fixup of the most recent distributed round: its
        # boundary-host fetch refs overlap the NEXT round's execution
        self._pending: dict | None = None

    def _ensure_actors(self) -> tuple[SeenSet, list]:
        if self._seen is None:
            self._seen = SeenSet(self.num_shards)
            # fractional reservation: fetch and the control-plane executions
            # ALTERNATE within a round, so full-CPU actors would starve the
            # sort/select/expand tasks (at 32 CPUs, 30 actors left 2 slots —
            # measured 0.44 scaling efficiency; phases interleave fine when
            # the pool reserves half and the OS schedules the busy phase)
            cls = ray.remote(num_cpus=0.5)(FetchExtract)
            nb = self.corpus.num_buckets
            # cache_cap counts ROW GROUPS and must cover the actor's bucket
            # slice at the CORPUS's actual row-groups-per-bucket — a fixed
            # ×4 headroom silently thrashed once buckets grew past 4 row
            # groups (measured 5.4x: 101 s vs 19 s for the same 20k lookups
            # on a 600k-page corpus at the old cap). An LRU one notch below
            # the cyclic working set is a cliff, not a discount. At 10^10
            # scale the equivalent knob is NUM_BUCKETS growing with the
            # corpus so a slice stays memory-sized.
            from ..sources.pages import PAGE_RG_ROWS

            rgs_per_bucket = -(-self.corpus.n_pages // (nb * PAGE_RG_ROWS))
            cap = (-(-nb // max(1, self.fetch_concurrency)) + 2) * max(
                4, rgs_per_bucket + 1
            )
            # LLMSR_FETCH_CACHE_RGS bounds per-actor cache MEMORY when the
            # corpus outgrows this host (the slice-sized cap above is the
            # throughput-optimal working set, but at 1.8M pages × few
            # actors it exceeds RAM — the preload OOM-killed a 16-CPU leg).
            # Under an explicit cap the engine trades cross-round row-group
            # re-decompression (width-scaled work, same per URL at every
            # pool size) for bounded memory — the real-cluster equivalent
            # is NUM_BUCKETS growing with the corpus.
            cap_env = os.environ.get("LLMSR_FETCH_CACHE_RGS")
            if cap_env:
                cap = min(cap, int(cap_env))
            cap_rgs_unclamped = cap
            # memory-fit check (VERDICT r4: a 2M-page leg OOM-killed mid-run
            # because the slice-sized preload exceeded host RAM): estimate
            # the decoded slice from the on-disk layout and CLAMP the cache
            # to a budget share of MemAvailable instead of letting the
            # preload OOM. With corpus-derived NUM_BUCKETS the slice stays
            # memory-sized and this clamp never engages; it is the safety
            # net for corpora generated under an older fixed-bucket layout.
            self._cache_covers_slice = True
            try:
                disk = 0
                for b in range(nb):
                    p = self.corpus.bucket_path(b)
                    if os.path.exists(p):
                        disk += os.path.getsize(p)
                # snappy parquet → in-heap decoded arrow tables + python
                # cache structures: ×5 measured envelope (×3 under-estimated
                # on the 1.8M-page corpus — an actor died mid-preload)
                decoded = disk * 5
                rg_bytes = max(1, decoded // max(1, self.corpus.n_pages // PAGE_RG_ROWS))
                avail_kb = 0
                with open("/proc/meminfo") as f:
                    for line in f:
                        if line.startswith("MemAvailable"):
                            avail_kb = int(line.split()[1])
                            break
                # quarter of MemAvailable across the pool: the other three
                # quarters cover Ray's object store (reserved lazily, ~40%
                # of RAM), execution blocks and worker heaps — a /2 budget
                # measured as still-OOM on the 1.8M-page corpus
                budget = (avail_kb * 1024) // (4 * max(1, self.fetch_concurrency))
                if cap * rg_bytes > budget:
                    cap = max(8, budget // rg_bytes)
                    self._cache_covers_slice = False
                    print(
                        f"[crawl] fetch cache CLAMPED to {cap} row groups/actor "
                        f"(slice would be ~{cap_rgs_unclamped * rg_bytes >> 20} MiB "
                        f"vs a {budget >> 20} MiB budget) — bounded-memory mode, "
                        "no preload; expect cross-round re-decompression"
                    )
            except OSError:
                pass
            self._fetch_actors = [
                cls.remote(
                    pages_dir=self.corpus.pages_dir,
                    num_buckets=nb,
                    budgets=self.budgets,
                    cache_cap=cap,
                )
                for _ in range(self.fetch_concurrency)
            ]
        return self._seen, self._fetch_actors

    def shutdown(self) -> None:
        """Release the actor pools (their CPU reservations would starve any
        other Ray work in the session)."""
        self._resolve_pending()  # pending fixup refs die with the actors
        if self._fetch_actors:
            for a in self._fetch_actors:
                ray.kill(a)
        if self._seen is not None:
            for a in self._seen.actors:
                ray.kill(a)
        self._seen = None
        self._fetch_actors = None

    def prepare(self, preload: bool = True) -> None:
        """Warm the actor pools (process spawn + imports + optional bucket
        preload). A long-lived cluster has warm workers; calling this before
        timing excludes one-time session setup from throughput numbers."""
        seen, fetch_actors = self._ensure_actors()
        # a clamped (below-slice) cache must not preload: it would only
        # churn the LRU, and the slice-sized read is exactly what OOMs
        preload = preload and getattr(self, "_cache_covers_slice", True)
        futures = [a.size.remote() for a in seen.actors]
        n_act = len(fetch_actors)
        for i, a in enumerate(fetch_actors):
            owned = (
                [b for b in range(self.corpus.num_buckets) if b % n_act == i]
                if preload
                else None
            )
            futures.append(a.ping.remote(owned))
        # also warm the Ray Data worker pool: the session's FIRST streaming
        # execution otherwise pays worker spawn + imports (~4-5 s) inside
        # round 1's flags phase — a long-lived cluster has warm workers
        (
            rd.range(2048, override_num_blocks=8)
            .map_batches(lambda b: b, batch_format="pyarrow")
            .sort("id")
            .count()
        )
        ray.get(futures)

    # -- round-state paths -------------------------------------------------

    def _round_dir(self, k: int) -> str:
        return os.path.join(self.run_dir, f"round-{k:04d}")

    def _last_complete_round(self) -> int:
        last = -1
        if not os.path.isdir(self.run_dir):
            return last
        for name in os.listdir(self.run_dir):
            if name.startswith("round-"):
                # a stale "round-0000.tmp" from a crash inside _init_seeds
                # must not wedge every subsequent resume (ADVICE r01)
                suffix = name.split("-", 1)[1]
                if not suffix.isdigit():
                    continue
                if os.path.exists(os.path.join(self.run_dir, name, "_COMPLETE")):
                    last = max(last, int(suffix))
        return last

    # -- main loop ---------------------------------------------------------

    def run(self, resume: bool = True) -> CrawlResult:
        # smaller blocks for the crawl's control-plane stream (metadata-thin
        # rows): the default 128 MB target coalesced a whole round's
        # expand/pre_dedup into 1-2 tasks and gave the sort only ~3 output
        # partitions — i.e. 3 select_finalize tasks each running 4-5
        # SERIAL dispatch waves into the fetch pool (measured r3@16cpu:
        # select wall 27-54 s at 7 s CPU). 16 MB ⇒ ~12-20 blocks per heavy
        # round: parallel prologue, balanced sort partitions, and enough
        # concurrent dispatchers to keep the actor pool saturated. Restored
        # after the run so suite queries keep the default geometry.
        from ray.data import DataContext

        ctx = DataContext.get_current()
        saved_tmbs = ctx.target_max_block_size
        ctx.target_max_block_size = 16 << 20
        try:
            return self._run_inner(resume)
        finally:
            ctx.target_max_block_size = saved_tmbs

    def _run_inner(self, resume: bool = True) -> CrawlResult:
        done_marker = os.path.join(self.run_dir, "DONE.json")
        if not resume:
            shutil.rmtree(self.run_dir, ignore_errors=True)
        elif os.path.exists(done_marker):
            info = json.load(open(done_marker))
            return CrawlResult(self.run_dir, info["rounds"], info["metrics"])

        seen, fetch_actors = self._ensure_actors()

        # warm the actor pools (process spawn + imports) while seeding
        warmups = [a.size.remote() for a in seen.actors]

        last = self._last_complete_round() if resume else -1
        if last <= 0:
            seen.clear()  # reused engine/actors must start this run clean
        if last < 0:
            self._init_seeds()
            last = 0
        elif last > 0:
            seen.restore_from(os.path.join(self._round_dir(last), "seen"))
        ray.get(warmups)

        # the frontier is VIRTUAL after round 1: round k's candidates are the
        # previous round's deferred ledger rows ∪ its hits' outlinks, fused
        # into round k's flags execution (no frontier table is ever written
        # or read — it was each round's widest table). Loop control uses the
        # ``next_candidates`` scalar each round computes from (deferred,
        # Σ n_links) at seal time.
        prev_m: dict | None = None
        if last > 0:
            prev_m = json.load(open(os.path.join(self._round_dir(last), "metrics.json")))
        rnd = last
        finished = False
        while rnd < self.max_rounds:
            rnd += 1
            if rnd == 1:
                src = ("seeds", os.path.join(self._round_dir(0), "frontier_next"))
                n_candidates = _count_rows(src[1])
            else:
                n_candidates = int(prev_m["next_candidates"])
                src = (
                    "extracted",
                    os.path.join(self._round_dir(rnd - 1), "extracted"),
                    int(prev_m["unique"]),
                )
            if self._pending is not None and n_candidates <= self.driver_threshold:
                # the count is PARTIAL while a fixup fetch is in flight; a
                # distributed round self-corrects (it injects + resolves),
                # but the driver path / loop exit need the true count now
                prev_m = self._resolve_pending()
                n_candidates = int(prev_m["next_candidates"])
                src = (
                    "extracted",
                    os.path.join(self._round_dir(rnd - 1), "extracted"),
                    int(prev_m["unique"]),
                )
            if n_candidates == 0:
                rnd -= 1
                finished = True
                break
            if n_candidates <= self.driver_threshold:
                m = self._round_driver(rnd, src, n_candidates, seen, fetch_actors)
            else:
                m = self._round_distributed(rnd, src, n_candidates, seen, fetch_actors)
            if m["selected"] == 0:
                finished = True
                break
            prev_m = m

        # a trailing unresolved fixup (last round distributed, loop ended on
        # selected==0 / max_rounds / zero candidates) seals synchronously
        self._resolve_pending()

        # metrics re-assembled from the sealed round dirs so a resumed run
        # reports the full history, not just its own rounds
        metrics = []
        for name in sorted(os.listdir(self.run_dir)):
            mp = os.path.join(self.run_dir, name, "metrics.json")
            if name.startswith("round-") and os.path.exists(mp):
                metrics.append(json.load(open(mp)))

        if finished:
            # DONE == frontier exhausted; a max_rounds cap leaves the run
            # resumable (the kill-and-resume contract, SURVEY.md M4)
            with open(done_marker + ".tmp", "w") as f:
                json.dump({"rounds": rnd, "metrics": metrics}, f)
            os.replace(done_marker + ".tmp", done_marker)
        return CrawlResult(self.run_dir, rnd, metrics)

    def _init_seeds(self) -> None:
        d0 = self._round_dir(0)
        tmp = d0 + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "frontier_next"), exist_ok=True)
        seeds = pq.read_table(self.corpus.seeds_path)
        table = candidates_from_urls(seeds["url"].to_pylist(), 0, self.warc_index)
        pq.write_table(table, os.path.join(tmp, "frontier_next", "part-0.parquet"))
        open(os.path.join(tmp, "_COMPLETE"), "w").close()
        shutil.rmtree(d0, ignore_errors=True)
        os.rename(tmp, d0)

    def _budgets_ref(self):
        if getattr(self, "_budgets_obj_ref", None) is None:
            self._budgets_obj_ref = ray.put(self.budgets)
        return self._budgets_obj_ref

    # -- fetch dispatch (shared by both paths) ------------------------------

    def _dispatch_fetch(self, fetch_actors, selected: pd.DataFrame) -> pa.Table:
        return _dispatch_fetch(
            fetch_actors, selected, self.corpus.num_buckets, self.batch_size
        )

    # -- driver fast path ---------------------------------------------------

    def _round_driver(self, rnd, src, n_candidates, seen: SeenSet, fetch_actors) -> dict:
        t_start = time.time()
        rdir = self._round_dir(rnd)
        shutil.rmtree(rdir, ignore_errors=True)
        os.makedirs(rdir, exist_ok=True)

        if src[0] == "seeds":
            fr = pads.dataset(src[1], format="parquet").to_table().to_pandas()
        else:
            # fused expansion: previous round's output IS the frontier source
            prev = pads.dataset(src[1], format="parquet").to_table(
                columns=_EXPAND_COLUMNS
            )
            fr = _expand_round_output(prev.to_pandas()).to_pandas()
        # spec step 1: exact dedup keep-min-depth
        cand = pre_dedup(fr).reset_index(drop=True)
        # spec steps 2-3: seen + robots
        digests = [bytes.fromhex(h) for h in cand["url_hash"]]
        seen_mask = seen.contains_many(digests)
        status, blocked = [], []
        for i, (host, canon) in enumerate(zip(cand["host"], cand["canon_url"])):
            if seen_mask[i]:
                status.append("seen")
                continue
            prefixes = self.robots.get(host)
            if prefixes and any(path_of(canon).startswith(p) for p in prefixes):
                status.append("robots")
                blocked.append(digests[i])
            else:
                status.append("ok")
        if blocked:
            seen.add_many(blocked)
        cand["status"] = status
        # spec steps 4+7: vectorized per-host top-k (no per-group apply)
        flags = select_topk_vectorized(cand, self.budgets)
        os.makedirs(os.path.join(rdir, "flags"), exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(flags, preserve_index=False),
            os.path.join(rdir, "flags", "part-0.parquet"),
        )

        m = self._metrics_from_flags(rnd, n_candidates, flags)
        m["path"] = "driver"
        selected = flags[flags["selected"]].sort_values("url_hash")

        # spec step 5: mark selected seen, then fetch via persistent actors;
        # non-selected candidates become passthrough ledger rows so the round
        # output is complete (the fused next round reads deferred back here)
        tables = []
        if len(selected):
            seen.add_many([bytes.fromhex(h) for h in selected["url_hash"]])
            tables.append(self._dispatch_fetch(fetch_actors, selected))
        rest = flags[~flags["selected"]]
        if len(rest):
            tables.append(_passthrough_table(rest))
        extracted = (
            pa.concat_tables(tables) if tables else _EXTRACTED_SCHEMA.empty_table()
        )
        os.makedirs(os.path.join(rdir, "extracted"), exist_ok=True)
        pq.write_table(extracted, os.path.join(rdir, "extracted", "part-0.parquet"))

        # spec steps 8-9 are FUSED into the next round; only the candidate
        # count is needed now (Σ n_links over hits + deferred passthroughs)
        n_new = int(pc.sum(extracted["n_links"]).as_py() or 0)
        m["new_candidates"] = n_new
        m["next_candidates"] = n_new + m["deferred"]

        seen.snapshot_to(os.path.join(rdir, "seen"))
        m["secs"] = round(time.time() - t_start, 3)
        self._seal(rdir, m)
        return m

    # -- distributed path ---------------------------------------------------

    def _round_distributed(self, rnd, src, n_candidates, seen: SeenSet, fetch_actors) -> dict:
        """Distributed round, no per-key groupby anywhere (Ray's groupby
        aggregate/map_groups costs ~1 ms per distinct key — measured 197 s
        for a 243k-key dedup — so high-cardinality grouping is replaced by
        ONE global sort + vectorized per-batch passes):

          previous round's output ─expand (deferred ∪ hits' outlinks,
          FUSED: no frontier table is ever written/read)─ ─pre_dedup─▶
          robots+seen status (shard actors, big batches) ─▶ sort(host,
          url_hash, depth) ─▶ per-batch vectorized dedup + per-host top-k;
          each batch's first/last (boundary) hosts forward only their
          batch-local top-k to a driver-side fixup pass (exact: global
          top-k ⊆ union of batch-local top-k — the same argument that makes
          hot-host salting exact, so range-split hot hosts are handled
          inherently) ─▶ flags ledger ─▶ mark-seen + FetchExtract actors /
          passthrough ─▶ round out.

        The round output carries every unique candidate with
        ``fetch_status`` ∈ {hit, miss, deferred, robots, seen} (plus
        superseded ``pass2-*`` placeholder rows every consumer ignores);
        the next round's candidates and metrics derive from it — the round
        runs ONE Ray Data execution (flags fused into fetch; round 3 had
        already fused the frontier, 3 → 2 → 1). The boundary fixup became
        a driver-side metadata pass AFTER the execution: placeholder rows
        read back (bounded by (k + dup copies of 2 edge hashes) × batches),
        exact re-selection, direct actor fetch, one extra parquet file.
        Measured motivation (round 4 probes, 690k-URL corpus): the
        separate flags execution scaled at 0.33 efficiency (22.5 s at 32
        CPUs vs 29.8 s at 8 — the width-independent F in t = W/n + F) and
        wrote+re-read the full candidate table between the two executions.
        Fusing removes the intermediate parquet roundtrip, one execution's
        fixed cost, and lets selection stream straight into fetch."""
        t_start = time.time()
        rdir = self._round_dir(rnd)
        shutil.rmtree(rdir, ignore_errors=True)
        os.makedirs(rdir, exist_ok=True)
        extracted_dir = os.path.join(rdir, "extracted")

        robots_seen = make_robots_seen_filter_arrow(
            seen.actors, self.num_shards, self.robots
        )
        budgets_ref = self._budgets_ref()
        actors = seen.actors
        nsh = self.num_shards
        nb = self.corpus.num_buckets
        bsz = self.batch_size

        def select_finalize(df: pd.DataFrame) -> pa.Table:
            """Vectorized dedup+selection for hosts fully inside this batch,
            FUSED with the fetch dispatch (one stage, no intermediate flags
            table): boundary hosts forward their batch-local top-k as
            ``pass2-*`` placeholder rows. The batch's first/last url_hash
            ("edge" hashes) may have duplicate rows straddling the batch
            boundary — ALL their rows are forwarded too, so the fixup pass
            owns their dedup + fate and no url_hash can be both finalized
            here and fetched there (ADVICE r01; exactness: duplicates are
            ADJACENT under the (host, url_hash, depth) sort, so they can
            only straddle one boundary, and both sides of it are edges).
            Selection correctness: a row outside its batch-local top-k has
            ≥ k higher-priority ok-rows in this batch alone, so it is
            outside the global top-k too — finalizing it as deferred is
            exact; global top-k ⊆ union of forwarded batch-local top-k."""
            budgets = ray.get(budgets_ref)
            first, last = df["host"].iloc[0], df["host"].iloc[-1]
            edge_hashes = (df["url_hash"].iloc[0], df["url_hash"].iloc[-1])
            boundary = df["host"].isin((first, last))
            parts = []
            inner = df[~boundary]
            if len(inner):
                g = inner.drop_duplicates("url_hash", keep="first")  # sorted (hash, depth)
                parts.append(select_topk_vectorized(g, budgets))
            fwd = None
            b = df[boundary]
            if len(b):
                b = b.drop_duplicates("url_hash", keep="first")
                marked = select_topk_vectorized(b, budgets)
                fwd_mask = marked["selected"] | marked["url_hash"].isin(edge_hashes)
                fwd = marked[fwd_mask]
                parts.append(marked[~fwd_mask])  # final: deferred / seen / robots

            tables = []
            if fwd is not None and len(fwd):
                tables.append(_pass2_placeholder_table(fwd))
            main = (
                pd.concat(parts, ignore_index=True)
                if parts
                else df.iloc[0:0]
            )
            sel = main[main["selected"]] if len(main) else main
            rest = main[~main["selected"]] if len(main) else main
            if len(sel):
                routes: dict[int, list[bytes]] = {}
                for h in sel["url_hash"]:
                    d = bytes.fromhex(h)
                    routes.setdefault(d[0] % nsh, []).append(d)
                ray.get([actors[s].add_many.remote(ds) for s, ds in routes.items()])
                tables.append(_dispatch_fetch(fetch_actors, sel, nb, bsz))
            if len(rest):
                tables.append(_passthrough_table(rest))
            if not tables:
                return _EXTRACTED_SCHEMA.empty_table()
            return pa.concat_tables(tables)

        # pre_dedup + robots/seen run on zero-copy Arrow batches (no pandas
        # block conversion on the raw frontier — the round's widest data);
        # select_finalize needs pandas (grouped cumsum) and runs post-sort.
        # The sort is a BARRIER: every robots/seen status is decided before
        # any select_finalize batch marks a selected hash seen, so the fused
        # stage cannot leak same-round seen-marks into status decisions.
        # Control-plane stages run over METADATA-sized rows (no html):
        # capping their block count matters more than parallelism — at 32
        # CPUs the un-capped flags+next phases ran 2x SLOWER than at 8
        # (more sort partitions, more tiny output files, which the next
        # round then re-reads as more tiny blocks). Blocks stay row-bounded
        # (65536), so the cap never risks memory at scale — a 10^10-URL
        # round simply gets more blocks from the row bound.
        ctrl_blocks = max(4, min(32, -(-n_candidates // 65536)))

        pending_prev = self._pending  # previous round's fixup, still fetching
        t_phase = time.time()
        if src[0] == "seeds":
            cands = rd.read_parquet(src[1], override_num_blocks=ctrl_blocks)
        else:
            # FUSED expansion: the previous round's output is the candidate
            # source — deferred ledger rows pass through, hit rows expand
            # their outlinks. Rows carry outlink lists (~KBs/row, no html):
            # bound read blocks at 16384 rows instead of the thin-row 65536.
            prev_unique = src[2]
            link_blocks = max(4, min(32, -(-prev_unique // 16384)))
            cands = rd.read_parquet(
                src[1], columns=_EXPAND_COLUMNS, override_num_blocks=link_blocks
            ).map_batches(
                _expand_round_output_arrow, batch_format="pyarrow", batch_size=65536
            )
            if pending_prev is not None:
                # the previous round's boundary-host fetch refs feed this
                # round's expansion DIRECTLY (no parquet roundtrip) — the
                # fetch overlaps this execution instead of serializing
                # between rounds. NOTE ``from_arrow_refs`` eagerly fetches
                # block metadata (measured: construction blocks on pending
                # refs), so the refs ride INSIDE map tasks instead: one
                # index row per ref; the task ray.gets its table and
                # expands it, and the streaming executor interleaves those
                # waits with the main execution's work.
                inj_refs = list(pending_prev["refs"])
                if (
                    pending_prev["rest_tab"] is not None
                    and pending_prev["rest_tab"].num_rows
                ):
                    inj_refs.append(ray.put(pending_prev["rest_tab"]))
                if inj_refs:

                    def load_expand(batch: pd.DataFrame, _refs=inj_refs) -> pa.Table:
                        tabs = [ray.get(_refs[int(i)]) for i in batch["i"]]
                        return _expand_round_output_arrow(
                            pa.concat_tables(tabs).select(_EXPAND_COLUMNS)
                        )

                    inj = rd.from_items(
                        [{"i": j} for j in range(len(inj_refs))],
                        override_num_blocks=len(inj_refs),
                    ).map_batches(load_expand, batch_format="pandas")
                    cands = cands.union(inj)
        pipe = (
            cands
            .map_batches(pre_dedup_arrow, batch_format="pyarrow", batch_size=65536)
            .map_batches(robots_seen, batch_format="pyarrow", batch_size=65536)
            .sort(["host", "url_hash", "depth"])
            .map_batches(
                select_finalize, batch_format="pandas", batch_size=self.select_batch
            )
        )
        pipe.write_parquet(extracted_dir)
        if os.environ.get("LLMSR_ROUND_STATS"):
            try:  # per-operator wall/cpu breakdown (diagnostic only)
                with open(os.path.join(rdir, "stats.txt"), "w") as f:
                    f.write(pipe.stats())
            except Exception:
                pass
        if not os.path.isdir(extracted_dir):  # zero-row write emits nothing
            _write_empty(extracted_dir, _EXTRACTED_SCHEMA)
        secs_exec = round(time.time() - t_phase, 3)

        # the execution consumed the previous round's fixup refs — finishing
        # it now is (near-)instant: write its authoritative fixtab, seal it,
        # and take the TRUE candidate count for this round's metrics
        if pending_prev is not None:
            prev_sealed = self._resolve_pending()
            n_candidates = int(prev_sealed["next_candidates"])

        # driver fixup: exact selection for boundary hosts, from the
        # placeholder rows the execution emitted (metadata-sized by
        # construction). Sort before dedup so the min-depth copy wins
        # deterministically regardless of parquet file-discovery order;
        # fetch goes straight to the persistent actors (no second
        # execution — the set is boundary-top-k-sized).
        t_phase = time.time()
        _P2 = ["pass2-ok", "pass2-robots", "pass2-seen"]
        ph = pads.dataset(extracted_dir, format="parquet").to_table(
            columns=["url_hash", "canon_url", "host", "depth", "warc_ts", "fetch_status"],
            filter=pads.field("fetch_status").isin(_P2),
        ).to_pandas()
        t_fix_read = round(time.time() - t_phase, 3)
        t_fix_fetch = 0.0
        n_pass2 = len(ph)
        n_fix_sel = 0
        fix_refs: list = []
        rest_tab: pa.Table | None = None
        fix_counts = {"seen": 0, "robots": 0, "deferred": 0}
        n_fix_rows = 0
        if n_pass2:
            ph["status"] = ph["fetch_status"].str.slice(6)
            ph = ph.sort_values(["host", "url_hash", "depth"], kind="stable")
            ph = ph.drop_duplicates("url_hash", keep="first")
            fixup = select_topk_vectorized(ph, ray.get(budgets_ref))
            n_fix_rows = len(fixup)
            sel = fixup[fixup["selected"]]
            n_fix_sel = len(sel)
            if len(sel):
                t_f = time.time()
                # seen-marks are synchronous (the NEXT round's status filter
                # must observe them) but the fetch itself is dispatched
                # WITHOUT waiting: the refs overlap the next round's
                # execution (_resolve_pending finishes the bookkeeping)
                seen.add_many([bytes.fromhex(h) for h in sel["url_hash"]])
                fix_refs = _dispatch_fetch_refs(
                    fetch_actors, sel, nb, bsz
                )
                t_fix_fetch = round(time.time() - t_f, 3)
            rest = fixup[~fixup["selected"]]
            if len(rest):
                rest_tab = _passthrough_table(rest)
                for s_, c_ in rest["status"].value_counts().items():
                    key = "deferred" if s_ == "ok" else str(s_)
                    fix_counts[key] = fix_counts.get(key, 0) + int(c_)
        secs_fixup = round(time.time() - t_phase, 3)
        t_phase = time.time()

        # metrics + next-round candidate count from ONE thin column scan of
        # the round output (fetch_status + the n_links scalar — vectorized,
        # no list columns touched; spec steps 8-9 are fused into the next
        # round's flags execution). pass2-* placeholders are superseded
        # duplicates of the fixup file's rows — subtracted from `unique`,
        # absent from every status count (their n_links is 0).
        out = pads.dataset(extracted_dir, format="parquet").to_table(
            columns=["fetch_status", "n_links"]
        )
        st = out["fetch_status"]
        counts = {
            k.as_py(): v.as_py()
            for k, v in zip(*pc.value_counts(st).flatten())
        }
        n_placeholder = sum(counts.get(k, 0) for k in _P2)
        n_sel = counts.get("hit", 0) + counts.get("miss", 0)
        n_new = int(pc.sum(out["n_links"]).as_py() or 0)
        m = {
            "round": rnd,
            "candidates": int(n_candidates),
            "unique": out.num_rows - n_placeholder + n_fix_rows,
            "seen_dropped": counts.get("seen", 0) + fix_counts["seen"],
            "robots": counts.get("robots", 0) + fix_counts["robots"],
            "selected": int(n_sel) + int(n_fix_sel),
            "deferred": counts.get("deferred", 0) + fix_counts["deferred"],
            "new_candidates": n_new,
            "next_candidates": n_new
            + counts.get("deferred", 0)
            + fix_counts["deferred"],
            "path": "distributed",
            "secs_exec": secs_exec,
            "secs_fixup": secs_fixup,
            "secs_fix_read": t_fix_read,
            "secs_fix_fetch": t_fix_fetch,
            "n_pass2": int(n_pass2),
            "n_fix_sel": int(n_fix_sel),
            "secs_scan": round(time.time() - t_phase, 3),
        }
        t_phase = time.time()
        seen.snapshot_to(os.path.join(rdir, "seen"))
        m["secs_snapshot"] = round(time.time() - t_phase, 3)
        m["secs"] = round(time.time() - t_start, 3)
        if n_pass2:
            # seal deferred: the fixup fetch is still in flight. The next
            # distributed round injects the refs into its execution and
            # calls _resolve_pending (instant by then); a driver round, the
            # loop exit, or shutdown() resolves synchronously instead. An
            # unsealed round replays from the previous sealed one on resume
            # (idempotent: seen adds are set-inserts, fetch deterministic).
            self._pending = {
                "rdir": rdir,
                "extracted_dir": extracted_dir,
                "refs": fix_refs,
                "rest_tab": rest_tab,
                "m": m,
            }
        else:
            self._seal(rdir, m)
        return m

    def _resolve_pending(self) -> dict | None:
        """Finish the most recent distributed round's fixup: wait for its
        boundary-host fetch refs (already consumed — i.e. free — when the
        next round's execution ran), write the authoritative pass2-fix
        rows into its round dir, fold their outlink count into the round
        metrics, and seal."""
        p = self._pending
        if p is None:
            return None
        t0 = time.time()
        tabs = [t for t in ray.get(list(p["refs"])) if t.num_rows] if p["refs"] else []
        if p["rest_tab"] is not None and p["rest_tab"].num_rows:
            tabs.append(p["rest_tab"])
        fixtab = pa.concat_tables(tabs) if tabs else _EXTRACTED_SCHEMA.empty_table()
        pq.write_table(fixtab, os.path.join(p["extracted_dir"], "pass2-fix.parquet"))
        m = p["m"]
        n_links = (
            int(pc.sum(fixtab["n_links"]).as_py() or 0) if fixtab.num_rows else 0
        )
        m["new_candidates"] += n_links
        m["next_candidates"] += n_links
        m["secs_fix_resolve"] = round(time.time() - t0, 3)
        self._seal(p["rdir"], m)
        self._pending = None
        return m

    # -- shared helpers -----------------------------------------------------

    @staticmethod
    def _metrics_from_flags(rnd: int, n_candidates: int, flags: pd.DataFrame) -> dict:
        status = flags["status"]
        n_sel = int(flags["selected"].sum())
        return {
            "round": rnd,
            "candidates": int(n_candidates),
            "unique": int(len(flags)),
            "seen_dropped": int((status == "seen").sum()),
            "robots": int((status == "robots").sum()),
            "selected": n_sel,
            "deferred": int((status == "ok").sum()) - n_sel,
        }

    @staticmethod
    def _seal(rdir: str, metrics: dict) -> None:
        try:  # driver RSS per round: catches driver-heap bloat regressions
            with open("/proc/self/statm") as f:
                metrics["driver_rss_mb"] = int(f.read().split()[1]) * 4096 // (1 << 20)
        except OSError:
            pass
        with open(os.path.join(rdir, "metrics.json"), "w") as f:
            json.dump(metrics, f)
        open(os.path.join(rdir, "_COMPLETE"), "w").close()
