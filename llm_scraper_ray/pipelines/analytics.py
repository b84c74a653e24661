"""Windowed / ranked event analytics — three operator shapes Ray Data has
no primitive for (SURVEY.md §2.7 top-k, §2.9 streaming windows), each built
on the engine's proven sort + vectorized-batch + metadata-sized-edge-fixup
pattern (see ``queries.q_events_lag`` / ``q_session_windows``):

  - ``events_topk_per_user``: per-GROUP top-k (``row_number() OVER
    (PARTITION BY user ORDER BY value DESC) <= K``). One global
    (user, value DESC, id) sort; every batch finalizes rows whose user run
    starts inside it (local rank == global rank there) and prunes local
    rank >= K immediately (global rank can only be larger). Only each
    batch's FIRST user needs its earlier-batch row count — a 1-row capped
    tail per batch, so the driver fixup is O(#batches · K) rows. No
    per-key groupby (1 ms/key at web-scale user cardinality is the known
    failure mode).
  - ``events_sliding``: hopping-window aggregate (1 h windows every
    15 min) — each event expands to exactly WINDOW/HOP window starts
    INSIDE its batch (vectorized repeat), partials pre-agg per
    (type, window) before the small groupby; the shuffle carries one row
    per non-empty (type, window) per batch, never the ×4 event stream.
  - ``events_window_count``: a RANGE-frame self-join (per event, how many
    same-user events in the preceding hour, strictly before it) —
    searchsorted over run-shifted keys per batch; heads whose window can
    cross the batch split + a window-deep tail context set are the only
    edge rows.

All three are SQL-oracled (QUALIFY / UNNEST-expansion / range self-join).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

TOPK_K = 3
SLIDE_SIZE_S = 3600
SLIDE_HOP_S = 900
WINDOW_US = 3600 * 1_000_000
RJOIN_W_US = 24 * 3600 * 1_000_000  # range-join lookback window


def _read_events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# per-group top-k


def q_events_topk_per_user(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Top-K events per user by value (tie → event_id ASC): the per-group
    top-k operator without a per-key groupby. Batches partition the sorted
    stream, so a row's global rank differs from its in-batch rank only when
    its user's run started in an EARLIER batch — i.e. only for each batch's
    first user. Everything else finalizes distributed; local rank >= K is
    pruned in-batch (the global rank is never smaller). Tail counts are
    capped at K+1: once a user's earlier-row total reaches K every later
    candidate drops, so the cap preserves the decision while keeping edge
    rows O(1) each."""
    K = TOPK_K

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("value", pa.float64()),
            ("event_id", pa.int64()),
            ("rank", pa.int64()),  # final 1-based rank (kind 0 only)
            ("lrank", pa.int64()),  # in-batch rank (kind 1), tail count (kind 2)
            ("kind", pa.int8()),  # 0 interior-final, 1 head candidate, 2 tail
        ]
    )

    def rank_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        lrank = np.arange(n, dtype=np.int64) - starts[run_id]
        first = run_id == 0
        keep = lrank < K
        fin = keep & ~first
        head = keep & first
        parts = []
        if fin.any():
            parts.append(
                pa.Table.from_pydict(
                    {
                        "user_id": pa.array(u[fin], pa.int64()),
                        "value": pa.array(v[fin], pa.float64()),
                        "event_id": pa.array(e[fin], pa.int64()),
                        "rank": pa.array(lrank[fin] + 1, pa.int64()),
                        "lrank": pa.array(lrank[fin], pa.int64()),
                        "kind": pa.array(np.zeros(int(fin.sum()), np.int8), pa.int8()),
                    },
                    schema=schema,
                )
            )
        if head.any():
            parts.append(
                pa.Table.from_pydict(
                    {
                        "user_id": pa.array(u[head], pa.int64()),
                        "value": pa.array(v[head], pa.float64()),
                        "event_id": pa.array(e[head], pa.int64()),
                        "rank": pa.array(np.zeros(int(head.sum()), np.int64), pa.int64()),
                        "lrank": pa.array(lrank[head], pa.int64()),
                        "kind": pa.array(np.ones(int(head.sum()), np.int8), pa.int8()),
                    },
                    schema=schema,
                )
            )
        # tail: the last user's in-batch row count, capped at K+1 (ordering
        # key = the batch's LAST row, so every later batch's head sorts
        # after it and the head's own batch tail never precedes it)
        cnt = min(int(n - starts[-1]), K + 1)
        parts.append(
            pa.Table.from_pydict(
                {
                    "user_id": pa.array([int(u[-1])], pa.int64()),
                    "value": pa.array([float(v[-1])], pa.float64()),
                    "event_id": pa.array([int(e[-1])], pa.int64()),
                    "rank": pa.array([0], pa.int64()),
                    "lrank": pa.array([cnt], pa.int64()),
                    "kind": pa.array([2], pa.int8()),
                },
                schema=schema,
            )
        )
        return pa.concat_tables(parts)

    rows = (
        _read_events(sf_dir, ["user_id", "value", "event_id"])
        .sort(["user_id", "value", "event_id"], descending=[False, True, False])
        .map_batches(rank_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    cols = ["user_id", "rank", "event_id", "value"]
    interior = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(cols),
        batch_format="pyarrow",
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    out_parts = [interior.to_pandas()]
    if len(edges):
        # stream order = the global sort key; a head precedes an equal-key
        # tail (1-row batches emit both for the same event — its own tail
        # must not count toward its own offset)
        edges = edges.sort_values(
            ["user_id", "value", "event_id", "kind"],
            ascending=[True, False, True, True],
            kind="stable",
        ).reset_index(drop=True)
        tc = np.where(edges["kind"] == 2, edges["lrank"], 0)
        edges["_tc"] = tc
        before = edges.groupby("user_id")["_tc"].cumsum() - edges["_tc"]
        heads = edges[edges["kind"] == 1].copy()
        grank = before[heads.index].to_numpy() + heads["lrank"].to_numpy()
        heads = heads[grank < K]
        heads["rank"] = grank[grank < K] + 1
        out_parts.append(heads[cols])
    out = pd.concat(out_parts, ignore_index=True)
    return out.sort_values(["user_id", "rank"]).reset_index(drop=True)


SQL_EVENTS_TOPK = f"""
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS rank, event_id, value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
QUALIFY row_number() OVER w <= {TOPK_K}
ORDER BY user_id, rank
"""


# ---------------------------------------------------------------------------
# hopping (sliding) windows


def q_events_sliding(sf_dir: str) -> pd.DataFrame:
    """Hopping-window aggregate: 1-hour windows starting every 15 min, so
    each event lands in exactly SIZE/HOP = 4 windows. The ×4 expansion AND
    the per-(type, window) partial aggregation happen inside one batch pass
    — the shuffle moves pre-summed partials, not the expanded event
    stream."""
    nhop = SLIDE_SIZE_S // SLIDE_HOP_S

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.Table.from_pydict(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start": pa.array([], pa.int64()),
                    "part_n": pa.array([], pa.int64()),
                    "part_sum": pa.array([], pa.float64()),
                }
            )
        es = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000).to_numpy()
        base = (es // SLIDE_HOP_S) * SLIDE_HOP_S
        off = np.repeat(np.arange(nhop, dtype=np.int64) * SLIDE_HOP_S, n)
        ws = np.tile(base, nhop) - off
        df = pd.DataFrame(
            {
                "event_type": np.tile(t["event_type"].to_numpy(zero_copy_only=False), nhop),
                "window_start": ws,
                "value": np.tile(
                    t["value"].to_numpy(zero_copy_only=False).astype(np.float64), nhop
                ),
            }
        )
        part = df.groupby(["event_type", "window_start"], as_index=False).agg(
            part_n=("value", "size"), part_sum=("value", "sum")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        _read_events(sf_dir, ["event_type", "ts", "value"])
        .map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("part_n", alias_name="n_events"),
            Sum("part_sum", alias_name="sum_value"),
        )
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return (
        out.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    )


SQL_EVENTS_SLIDING = f"""
SELECT event_type,
       ((epoch_us(ts) // 1000000 // {SLIDE_HOP_S}) - i.i) * {SLIDE_HOP_S} AS window_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events CROSS JOIN (SELECT unnest(range({SLIDE_SIZE_S // SLIDE_HOP_S})) AS i) i
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


# ---------------------------------------------------------------------------
# preceding-window range count (RANGE-frame / range-self-join shape)


def q_events_window_count(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Per event: how many of the SAME user's events happened in the
    preceding hour, strictly before it (ts earlier, or equal ts with a
    smaller event_id — exactly the sort order). One (user, ts, event_id)
    sort; per batch the count is ``idx - searchsorted(ts, ts - 1h)``
    within the row's user run, vectorized across runs by shifting each
    run onto a disjoint key interval. The window only looks BACKWARD, so
    the cross-batch dependency is confined to each batch's first user:
    heads = first-run rows whose window reaches the batch split; context
    = the last user's rows within one window of the batch end (each row
    emitted at most once). Edge volume is O(#batches · per-user events
    per window) — bounded by the window, not the corpus; a hot user
    hammering one window is the documented skew caveat."""

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("n_prev_hour", pa.int64()),
            ("kind", pa.int8()),  # 0 final, 1 head (partial), 2 context
            # batch key: first row's FULL stream-order key (user, ts, event).
            # ts alone is not monotonic across batches — it resets at every
            # user boundary — so batch order needs the user component too.
            ("bk_u", pa.int64()),
            ("bk_ts", pa.int64()),
            ("bk_e", pa.int64()),
        ]
    )

    def cnt_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        tmin, tmax = int(ts.min()), int(ts.max())
        span = (tmax - tmin) + WINDOW_US + 2
        nruns = int(run_id[-1]) + 1
        idx = np.arange(n, dtype=np.int64)
        if nruns * span < 2**62:
            shifted = run_id.astype(np.int64) * span + (ts - tmin)
            lo = np.searchsorted(shifted, shifted - WINDOW_US, side="left")
        else:  # pathological ts span: per-run fallback, same arithmetic
            lo = np.empty(n, dtype=np.int64)
            for r in range(nruns):
                s = starts[r]
                t_end = starts[r + 1] if r + 1 < nruns else n
                seg = ts[s:t_end]
                lo[s:t_end] = s + np.searchsorted(seg, seg - WINDOW_US, side="left")
        nprev = idx - lo
        head = (run_id == 0) & (ts - WINDOW_US <= ts[0])
        ctx = (run_id == nruns - 1) & (ts >= ts[-1] - WINDOW_US)
        kind = np.zeros(n, dtype=np.int8)
        kind[head] = 1
        base = pa.Table.from_pydict(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "n_prev_hour": pa.array(nprev, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
                "bk_u": pa.array(np.full(n, u[0]), pa.int64()),
                "bk_ts": pa.array(np.full(n, ts[0]), pa.int64()),
                "bk_e": pa.array(np.full(n, e[0]), pa.int64()),
            },
            schema=schema,
        )
        if not ctx.any():
            return base
        ci = np.flatnonzero(ctx)
        ctx_t = pa.Table.from_pydict(
            {
                "event_id": pa.array(e[ci], pa.int64()),
                "user_id": pa.array(u[ci], pa.int64()),
                "ts_us": pa.array(ts[ci], pa.int64()),
                "n_prev_hour": pa.array(np.zeros(len(ci), np.int64), pa.int64()),
                "kind": pa.array(np.full(len(ci), 2, np.int8), pa.int8()),
                "bk_u": pa.array(np.full(len(ci), u[0]), pa.int64()),
                "bk_ts": pa.array(np.full(len(ci), ts[0]), pa.int64()),
                "bk_e": pa.array(np.full(len(ci), e[0]), pa.int64()),
            },
            schema=schema,
        )
        return pa.concat_tables([base, ctx_t])

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(cnt_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    cols = ["event_id", "user_id", "n_prev_hour"]
    interior = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(cols),
        batch_format="pyarrow",
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    parts = [interior.to_pandas()]
    heads = edges[edges["kind"] == 1]
    ctx = edges[edges["kind"] == 2]
    if len(heads):
        if len(ctx):
            # extra = earlier-batch context rows of the same user inside the
            # head's window. Context rows from the head's own (or a later)
            # batch are excluded by the strict batch-key comparison — every
            # earlier-batch row precedes the head in stream order, so no
            # (ts, event_id) tie-break against the head itself is needed.
            m = heads.merge(ctx, on="user_id", suffixes=("", "_c"))
            in_win = (m["ts_us_c"] >= m["ts_us"] - WINDOW_US) & (
                m["ts_us_c"] <= m["ts_us"]
            )
            earlier = (m["bk_u_c"] < m["bk_u"]) | (
                (m["bk_u_c"] == m["bk_u"])
                & (
                    (m["bk_ts_c"] < m["bk_ts"])
                    | ((m["bk_ts_c"] == m["bk_ts"]) & (m["bk_e_c"] < m["bk_e"]))
                )
            )
            extra = (
                m[in_win & earlier]
                .groupby("event_id", as_index=False)
                .size()
                .set_index("event_id")["size"]
            )
            heads = heads.copy()
            heads["n_prev_hour"] = (
                heads["n_prev_hour"]
                + heads["event_id"].map(extra).fillna(0).astype(np.int64)
            )
        parts.append(heads[cols])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_WINDOW_COUNT = """
SELECT e.event_id, e.user_id, count(p.event_id) AS n_prev_hour
FROM events e LEFT JOIN events p
  ON p.user_id = e.user_id
 AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts <= e.ts
 AND (p.ts < e.ts OR p.event_id < e.event_id)
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# range (interval) join: clicks ⋈ same-user purchases in a preceding window


def q_events_range_join(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """A true RANGE JOIN (equality key + interval predicate), the custom-op
    shape Ray Data has no primitive for: every click pairs with each of the
    SAME user's purchases in the strictly-preceding 24 h
    (``c.ts - W <= p.ts < c.ts``). Strictness makes every matched purchase
    precede its click in the (user, ts, event_id) stream order, so ONE
    tagged sort bounds the cross-batch dependency exactly as in
    ``q_events_window_count``: per batch, each click's purchase range is two
    ``searchsorted`` calls over the run's purchase-ts subsequence (runs
    shifted onto disjoint key intervals → one vectorized call), and pairs
    materialize with a ragged-arange repeat. Only each batch's FIRST user's
    clicks can reach earlier batches (head probes); the context set is the
    last user's purchases within one window of the batch end — edge volume
    is O(#batches · purchases-per-window), bounded by the window, not the
    corpus. The driver fixup merges probes against strictly-earlier-batch
    context (full batch sort key comparison — ts alone resets per user)."""
    W = RJOIN_W_US

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("click_id", pa.int64()),
            ("purchase_id", pa.int64()),
            ("gap_s", pa.int64()),
            ("ts_us", pa.int64()),  # probe/context rows: own event ts
            ("kind", pa.int8()),  # 0 final pair, 1 head probe, 2 context
            ("bk_u", pa.int64()),
            ("bk_ts", pa.int64()),
            ("bk_e", pa.int64()),
        ]
    )

    def join_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        is_c = t["event_type"].to_numpy(zero_copy_only=False) == "click"
        is_p = t["event_type"].to_numpy(zero_copy_only=False) == "purchase"
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        run_id = np.cumsum(new) - 1
        nruns = int(run_id[-1]) + 1
        # shift each run's ts onto a disjoint interval so one searchsorted
        # over the purchase subsequence covers every run at once
        tmin, tmax = int(ts.min()), int(ts.max())
        span = (tmax - tmin) + W + 2
        p_idx = np.flatnonzero(is_p)
        c_idx = np.flatnonzero(is_c)
        parts = []
        if len(p_idx) and len(c_idx):
            if nruns * span < 2**62:
                key = run_id.astype(np.int64) * span + (ts - tmin)
                pk = key[p_idx]
                ck = key[c_idx]
                lo = np.searchsorted(pk, ck - W, side="left")
                hi = np.searchsorted(pk, ck, side="left")
            else:  # pathological ts span: per-run fallback, same arithmetic
                lo = np.empty(len(c_idx), dtype=np.int64)
                hi = np.empty(len(c_idx), dtype=np.int64)
                p_run = run_id[p_idx]
                c_run = run_id[c_idx]
                for r in range(nruns):
                    cm = c_run == r
                    if not cm.any():
                        continue
                    ps = np.flatnonzero(p_run == r)
                    seg = ts[p_idx[ps]] if len(ps) else np.empty(0, np.int64)
                    base = int(ps[0]) if len(ps) else 0
                    ct = ts[c_idx[cm]]
                    lo[cm] = base + np.searchsorted(seg, ct - W, side="left")
                    hi[cm] = base + np.searchsorted(seg, ct, side="left")
            cnt = hi - lo
            has = cnt > 0
            if has.any():
                reps = cnt[has]
                # ragged arange: for click j, purchase indices lo[j]..hi[j]-1
                offs = np.repeat(np.cumsum(reps) - reps, reps)
                pj = np.repeat(lo[has], reps) + (np.arange(int(reps.sum())) - offs)
                src = p_idx[pj]
                dst = np.repeat(c_idx[has], reps)
                m = len(src)
                parts.append(
                    pa.Table.from_pydict(
                        {
                            "user_id": pa.array(u[dst], pa.int64()),
                            "click_id": pa.array(e[dst], pa.int64()),
                            "purchase_id": pa.array(e[src], pa.int64()),
                            "gap_s": pa.array(
                                (ts[dst] - ts[src]) // 1_000_000, pa.int64()
                            ),
                            "ts_us": pa.array(np.zeros(m, np.int64), pa.int64()),
                            "kind": pa.array(np.zeros(m, np.int8), pa.int8()),
                            "bk_u": pa.array(np.full(m, u[0]), pa.int64()),
                            "bk_ts": pa.array(np.full(m, ts[0]), pa.int64()),
                            "bk_e": pa.array(np.full(m, e[0]), pa.int64()),
                        },
                        schema=schema,
                    )
                )
        # head probes: first run's clicks whose window reaches the split;
        # context: last run's purchases within one window of the batch end
        head = is_c & (run_id == 0) & (ts - W <= ts[0])
        ctx = is_p & (run_id == nruns - 1) & (ts >= ts[-1] - W)
        for mask, knd in ((head, 1), (ctx, 2)):
            if not mask.any():
                continue
            mi = np.flatnonzero(mask)
            m = len(mi)
            parts.append(
                pa.Table.from_pydict(
                    {
                        "user_id": pa.array(u[mi], pa.int64()),
                        "click_id": pa.array(
                            e[mi] if knd == 1 else np.zeros(m, np.int64), pa.int64()
                        ),
                        "purchase_id": pa.array(
                            e[mi] if knd == 2 else np.zeros(m, np.int64), pa.int64()
                        ),
                        "gap_s": pa.array(np.zeros(m, np.int64), pa.int64()),
                        "ts_us": pa.array(ts[mi], pa.int64()),
                        "kind": pa.array(np.full(m, knd, np.int8), pa.int8()),
                        "bk_u": pa.array(np.full(m, u[0]), pa.int64()),
                        "bk_ts": pa.array(np.full(m, ts[0]), pa.int64()),
                        "bk_e": pa.array(np.full(m, e[0]), pa.int64()),
                    },
                    schema=schema,
                )
            )
        if not parts:
            return schema.empty_table()
        return pa.concat_tables(parts)

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(join_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    cols = ["user_id", "click_id", "purchase_id", "gap_s"]
    interior = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(cols),
        batch_format="pyarrow",
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    parts = [interior.to_pandas()]
    heads = edges[edges["kind"] == 1]
    ctx = edges[edges["kind"] == 2]
    if len(heads) and len(ctx):
        m = heads.merge(ctx, on="user_id", suffixes=("", "_c"))
        # in-window AND the purchase's batch strictly precedes the click's
        # (same-batch pairs were already emitted in-batch)
        in_win = (m["ts_us_c"] >= m["ts_us"] - W) & (m["ts_us_c"] < m["ts_us"])
        earlier = (m["bk_u_c"] < m["bk_u"]) | (
            (m["bk_u_c"] == m["bk_u"])
            & (
                (m["bk_ts_c"] < m["bk_ts"])
                | ((m["bk_ts_c"] == m["bk_ts"]) & (m["bk_e_c"] < m["bk_e"]))
            )
        )
        x = m[in_win & earlier]
        if len(x):
            extra = pd.DataFrame(
                {
                    "user_id": x["user_id"],
                    "click_id": x["click_id"],
                    "purchase_id": x["purchase_id_c"],
                    "gap_s": (x["ts_us"] - x["ts_us_c"]) // 1_000_000,
                }
            )
            parts.append(extra[cols])
    out = pd.concat(parts, ignore_index=True)
    return (
        out.sort_values(["click_id", "purchase_id"])
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols})
    )


SQL_EVENTS_RANGE_JOIN = f"""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       (epoch_us(c.ts) - epoch_us(p.ts)) // 1000000 AS gap_s
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(c.ts) - {RJOIN_W_US}
 AND p.ts < c.ts
ORDER BY click_id, purchase_id
"""


# ---------------------------------------------------------------------------
# funnel analysis: per-user ordered-subsequence stage via composable
# segment state machines (distributed scan over a keyed sort)

FUNNEL_TYPES = ("signup", "click", "purchase")


def q_events_funnel(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Per-user funnel stage: the deepest prefix of signup → click →
    purchase that occurs as an ORDERED subsequence of the user's event
    stream (stream order = (ts, event_id); greedy earliest-match is optimal
    for subsequence existence, so engine and SQL-EXISTS agree). One
    (user, ts, event_id) sort; each batch evaluates every user run as a
    STATE-MACHINE SEGMENT, vectorized across runs: "first event of type T
    at-or-after position p in this run" is one searchsorted over the
    type's run-shifted position array, chained three times. A segment's
    effect is the 4-vector g[s] = stage reached given carry-in stage s —
    segments COMPOSE (g_ab = g_b ∘ g_a), so interior runs finalize as
    g[0] in-batch and only each batch's edge runs (first/last user) emit
    their g-vector; the driver folds O(#batches) vectors per boundary
    user in batch order. The monoid-scan shape ``doc_token_bins`` uses for
    prefix sums, generalized to non-commutative state."""

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("funnel_stage", pa.int64()),  # final (kind 0); unused for edges
            ("g0", pa.int64()),
            ("g1", pa.int64()),
            ("g2", pa.int64()),
            ("kind", pa.int8()),  # 0 interior-final, 1 edge segment
            ("bk_u", pa.int64()),
            ("bk_ts", pa.int64()),
            ("bk_e", pa.int64()),
        ]
    )

    def seg_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        nruns = len(starts)
        MISS = np.int64(2 * n + 2)

        # run-shifted position keys per funnel type (positions < n, so
        # run_id * (n+1) intervals are disjoint)
        span = np.int64(n + 1)
        keys = {}
        for ty in FUNNEL_TYPES:
            m = et == ty
            keys[ty] = run_id[m].astype(np.int64) * span + np.flatnonzero(m)

        def first_at_or_after(ty: str, run: np.ndarray, pos: np.ndarray) -> np.ndarray:
            """Per probe: smallest position of type ty in `run` that is
            >= pos, else MISS (positions are batch-local)."""
            k = keys[ty]
            out = np.full(len(run), MISS, dtype=np.int64)
            if len(k) == 0:
                return out
            q = run.astype(np.int64) * span + pos
            j = np.searchsorted(k, q, side="left")
            hit = (j < len(k)) & (k[np.minimum(j, len(k) - 1)] < (run + 1) * span)
            if hit.any():
                out[hit] = k[j[hit]] - run[hit].astype(np.int64) * span
            return out

        runs = np.arange(nruns, dtype=np.int64)
        rs = starts.astype(np.int64)
        # carry-in 0: signup -> click -> purchase, each strictly after
        i1 = first_at_or_after("signup", runs, rs)
        i2 = first_at_or_after("click", runs, np.minimum(i1 + 1, MISS))
        i3 = first_at_or_after("purchase", runs, np.minimum(i2 + 1, MISS))
        g0 = np.where(i3 < MISS, 3, np.where(i2 < MISS, 2, np.where(i1 < MISS, 1, 0)))
        # carry-in 1 (signup already achieved before this segment)
        j2 = first_at_or_after("click", runs, rs)
        j3 = first_at_or_after("purchase", runs, np.minimum(j2 + 1, MISS))
        g1 = np.where(j3 < MISS, 3, np.where(j2 < MISS, 2, 1))
        # carry-in 2
        k3 = first_at_or_after("purchase", runs, rs)
        g2 = np.where(k3 < MISS, 3, 2)

        edge = (runs == 0) | (runs == nruns - 1)
        ue = u[rs]
        parts = []
        interior = ~edge
        if interior.any():
            m = int(interior.sum())
            parts.append(
                pa.Table.from_pydict(
                    {
                        "user_id": pa.array(ue[interior], pa.int64()),
                        "funnel_stage": pa.array(g0[interior], pa.int64()),
                        "g0": pa.array(np.zeros(m, np.int64), pa.int64()),
                        "g1": pa.array(np.zeros(m, np.int64), pa.int64()),
                        "g2": pa.array(np.zeros(m, np.int64), pa.int64()),
                        "kind": pa.array(np.zeros(m, np.int8), pa.int8()),
                        "bk_u": pa.array(np.full(m, u[0]), pa.int64()),
                        "bk_ts": pa.array(np.full(m, ts[0]), pa.int64()),
                        "bk_e": pa.array(np.full(m, e[0]), pa.int64()),
                    },
                    schema=schema,
                )
            )
        em = int(edge.sum())
        parts.append(
            pa.Table.from_pydict(
                {
                    "user_id": pa.array(ue[edge], pa.int64()),
                    "funnel_stage": pa.array(np.zeros(em, np.int64), pa.int64()),
                    "g0": pa.array(g0[edge], pa.int64()),
                    "g1": pa.array(g1[edge], pa.int64()),
                    "g2": pa.array(g2[edge], pa.int64()),
                    "kind": pa.array(np.ones(em, np.int8), pa.int8()),
                    "bk_u": pa.array(np.full(em, u[0]), pa.int64()),
                    "bk_ts": pa.array(np.full(em, ts[0]), pa.int64()),
                    "bk_e": pa.array(np.full(em, e[0]), pa.int64()),
                },
                schema=schema,
            )
        )
        return pa.concat_tables(parts)

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(seg_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    cols = ["user_id", "funnel_stage"]
    interior = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(cols),
        batch_format="pyarrow",
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)), batch_format="pyarrow"
    ).to_pandas()
    parts = [interior.to_pandas()]
    if len(edges):
        edges = edges.sort_values(
            ["user_id", "bk_u", "bk_ts", "bk_e"], kind="stable"
        )
        fold_rows = []
        for uid, g in edges.groupby("user_id", sort=False):
            st = 0
            for g0v, g1v, g2v in zip(g["g0"], g["g1"], g["g2"]):
                st = (int(g0v), int(g1v), int(g2v), 3)[st]
            fold_rows.append({"user_id": int(uid), "funnel_stage": st})
        parts.append(pd.DataFrame(fold_rows, columns=cols))
    out = pd.concat(parts, ignore_index=True)
    return (
        out.sort_values("user_id")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols})
    )


SQL_EVENTS_FUNNEL = """
SELECT u.user_id,
  CASE
    WHEN EXISTS (
      SELECT 1 FROM events s, events c, events p
      WHERE s.user_id = u.user_id AND c.user_id = u.user_id AND p.user_id = u.user_id
        AND s.event_type = 'signup' AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND (c.ts > s.ts OR (c.ts = s.ts AND c.event_id > s.event_id))
        AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
    ) THEN 3
    WHEN EXISTS (
      SELECT 1 FROM events s, events c
      WHERE s.user_id = u.user_id AND c.user_id = u.user_id
        AND s.event_type = 'signup' AND c.event_type = 'click'
        AND (c.ts > s.ts OR (c.ts = s.ts AND c.event_id > s.event_id))
    ) THEN 2
    WHEN EXISTS (
      SELECT 1 FROM events s
      WHERE s.user_id = u.user_id AND s.event_type = 'signup'
    ) THEN 1
    ELSE 0
  END AS funnel_stage
FROM (SELECT DISTINCT user_id FROM events) u
ORDER BY u.user_id
"""


# ---------------------------------------------------------------------------
# distinct counting: exact (bucketed, no driver key sets) + HLL sketch

NDIST_NB = 64
HLL_P = 12
HLL_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants) — the HLL and
    bucket hash. uint64 wraparound is the point; numpy warns, we don't."""
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def q_events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact per-group COUNT(DISTINCT): distinct users per event type with
    NO driver-side key set and NO per-user groupby key. Per batch: local
    (type, user) dedup + a stable user-hash bucket; shuffle groups by
    BUCKET ONLY (NDIST_NB keys — flat cost at any user cardinality), so
    every surviving copy of a user co-locates and the in-bucket pandas
    dedup yields per-(bucket, type) distinct partials; the driver sums a
    NB × #types table. The same shape Ray's own Count(distinct) can't do
    without a per-key shuffle."""

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "user_id": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        df["bucket"] = (
            _splitmix64(df["user_id"].to_numpy()) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            df[["bucket", "event_type", "user_id"]], preserve_index=False
        )

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        out = d.groupby("event_type", as_index=False).agg(part_nd=("user_id", "size"))
        return out

    parts = (
        _read_events(sf_dir, ["event_type", "user_id"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("event_type", as_index=False).agg(n_users=("part_nd", "sum"))
    return out.sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_distinct_hll(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-user estimate per event type — the mergeable
    sketch pattern: each batch folds its rows into per-type register arrays
    (m=4096, splitmix64 hash, vectorized leading-zero rank via exact
    float64 log2 on the 52-bit tail) and emits ONE row per (type, batch)
    holding the 4 KiB register bytes; the driver elementwise-max-merges
    O(#batches · #types) sketches — metadata-sized at any corpus scale —
    and applies the standard bias + linear-counting corrections. Rows-only
    by design (an estimate has no SQL twin); pytest bounds the error
    against the oracled exact query."""

    def sketch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"event_type": pa.array([], pa.string()), "regs": pa.array([], pa.binary())}
            )
        et = t["event_type"].to_numpy(zero_copy_only=False)
        h = _splitmix64(t["user_id"].to_numpy(zero_copy_only=False))
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        w = (h << np.uint64(HLL_P)) >> np.uint64(HLL_P)  # low 52 bits
        # rank = leading-zero count within the 52-bit field + 1;
        # w < 2^52 fits float64's mantissa, so floor(log2) is exact
        rank = np.where(
            w == 0,
            np.int64(64 - HLL_P + 1),
            (64 - HLL_P) - np.floor(np.log2(np.maximum(w, 1).astype(np.float64))).astype(np.int64),
        ).astype(np.uint8)
        types = []
        regs = []
        for ty in np.unique(et):
            m = et == ty
            r = np.zeros(HLL_M, dtype=np.uint8)
            np.maximum.at(r, idx[m], rank[m])
            types.append(str(ty))
            regs.append(r.tobytes())
        return pa.Table.from_pydict(
            {"event_type": pa.array(types, pa.string()), "regs": pa.array(regs, pa.binary())}
        )

    parts = (
        _read_events(sf_dir, ["event_type", "user_id"])
        .map_batches(sketch, batch_format="pyarrow")
        .to_pandas()
    )
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    rows = []
    for ty, g in parts.groupby("event_type", sort=True):
        merged = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["regs"]:
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        est = alpha * HLL_M * HLL_M / np.sum(np.power(2.0, -merged.astype(np.float64)))
        zeros = int((merged == 0).sum())
        if est <= 2.5 * HLL_M and zeros > 0:  # linear-counting small range
            est = HLL_M * np.log(HLL_M / zeros)
        rows.append({"event_type": ty, "n_users_est": int(round(est))})
    return pd.DataFrame(rows, columns=["event_type", "n_users_est"])


# ---------------------------------------------------------------------------
# GROUP BY ROLLUP (hierarchical subtotals from ONE finest-level shuffle)


def q_orders_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP(o_orderpriority, o_orderstatus) over orders: count + revenue
    at every prefix level. One shuffle at the FINEST grain (per-batch
    pandas partials → small groupby — the hierarchy's coarser levels are
    pure arithmetic over that metadata-sized aggregate, computed
    driver-side), never three scans. NULL group labels are spelled 'ALL'
    on both sides to keep the hash compare representation-stable."""
    import ray.data as _rd

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_numpy(zero_copy_only=False),
                "o_orderstatus": t["o_orderstatus"].to_numpy(zero_copy_only=False),
                "o_totalprice": t["o_totalprice"].to_numpy(zero_copy_only=False),
            }
        )
        p = df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(
            part_n=("o_totalprice", "size"), part_rev=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    fine = (
        _rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(
            Sum("part_n", alias_name="n_orders"),
            Sum("part_rev", alias_name="revenue"),
        )
        .to_pandas()
    )
    lv1 = fine.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum")
    )
    lv1["o_orderstatus"] = "ALL"
    lv0 = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "n_orders": [fine["n_orders"].sum()],
            "revenue": [fine["revenue"].sum()],
        }
    )
    cols = ["o_orderpriority", "o_orderstatus", "n_orders", "revenue"]
    out = pd.concat([fine[cols], lv1[cols], lv0[cols]], ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values(["o_orderpriority", "o_orderstatus"]).reset_index(drop=True)


SQL_ORDERS_ROLLUP = """
SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority, o_orderstatus
"""


# ---------------------------------------------------------------------------
# per-group exact quantiles (grouped value-count fold)


QTYPE_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_event_value_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact per-GROUP quantiles of event value: quantize to integer cents
    (values are 2-dp by contract, so the cast is lossless), fold
    (type, cents) value counts — per-batch pandas partials, then ONE small
    groupby whose cardinality is #types × cents-domain, NOT #rows — and
    invert each group's discrete CDF at ceil(q·n) on the driver (the
    ``doc_length_quantiles`` machinery, partitioned). The driver table is
    value-domain-sized, never corpus-sized."""

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "event_type": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                    "part_c": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": np.rint(
                    t["value"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        p = df.groupby(["event_type", "cents"], as_index=False).agg(
            part_c=("cents", "size")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    vc = (
        _read_events(sf_dir, ["event_type", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("part_c", alias_name="c"))
        .to_pandas()
    )
    vc = vc.sort_values(["event_type", "cents"], kind="stable")
    rows = []
    for etype, g in vc.groupby("event_type", sort=True):
        cum = g["c"].cumsum().to_numpy()
        n = int(cum[-1])
        cents = g["cents"].to_numpy()
        for q in QTYPE_QS:
            k = int(np.ceil(q * n))
            rows.append(
                {
                    "event_type": etype,
                    "q": q,
                    "value": round(float(cents[np.searchsorted(cum, k)]) / 100, 2),
                }
            )
    return pd.DataFrame(rows, columns=["event_type", "q", "value"])


SQL_EVENT_VALUE_QUANTILES = """
WITH vc AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v, count(*) AS c
  FROM events GROUP BY event_type, v
), cum AS (
  SELECT event_type, v,
         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cc,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM vc
), qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99))
SELECT event_type, q, round(min(v) / 100.0, 2) AS value
FROM cum, qs WHERE cc >= ceil(q * n)
GROUP BY event_type, q ORDER BY event_type, q
"""


# ---------------------------------------------------------------------------
# GROUP BY CUBE (all four marginal levels from the same finest shuffle)


def q_orders_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE(o_orderpriority, o_orderstatus) over orders: count + revenue at
    ALL four grouping levels. Like ``q_orders_rollup``, the corpus is
    shuffled ONCE at the finest grain (per-batch pandas partials → small
    groupby); the three coarser levels — including the by-status marginal
    ROLLUP lacks — are arithmetic over that metadata-sized aggregate."""
    import ray.data as _rd

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_numpy(zero_copy_only=False),
                "o_orderstatus": t["o_orderstatus"].to_numpy(zero_copy_only=False),
                "o_totalprice": t["o_totalprice"].to_numpy(zero_copy_only=False),
            }
        )
        p = df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(
            part_n=("o_totalprice", "size"), part_rev=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    fine = (
        _rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(
            Sum("part_n", alias_name="n_orders"),
            Sum("part_rev", alias_name="revenue"),
        )
        .to_pandas()
    )
    by_prio = fine.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum")
    )
    by_prio["o_orderstatus"] = "ALL"
    by_stat = fine.groupby("o_orderstatus", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum")
    )
    by_stat["o_orderpriority"] = "ALL"
    total = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "n_orders": [fine["n_orders"].sum()],
            "revenue": [fine["revenue"].sum()],
        }
    )
    cols = ["o_orderpriority", "o_orderstatus", "n_orders", "revenue"]
    out = pd.concat(
        [fine[cols], by_prio[cols], by_stat[cols], total[cols]], ignore_index=True
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values(["o_orderpriority", "o_orderstatus"]).reset_index(drop=True)


SQL_ORDERS_CUBE = """
SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority, o_orderstatus
"""


# ---------------------------------------------------------------------------
# cohort retention (the events_distinct_users machinery, two-level)


_WEEK_US = 7 * 86_400 * 1_000_000


def q_events_retention(sf_dir: str) -> pd.DataFrame:
    """Weekly cohort retention: users grouped by their FIRST event's epoch
    week; for each (cohort_week, week_offset), the number of distinct users
    active offset weeks later. Per-batch (user, week) dedup partials shuffle
    to stable user-hash buckets (a user is whole within one bucket, so the
    per-bucket cohort min and distinct-user counts are exact and disjoint);
    the driver sums O(NB · #weeks²) count partials — metadata-sized at any
    user cardinality. Weeks are pure integer arithmetic (epoch_us div
    week_us), so the SQL twin cannot drift."""

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "wk": pa.array([], pa.int64()),
                }
            )
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "wk": us // _WEEK_US,
            }
        ).drop_duplicates()
        df["bucket"] = (
            _splitmix64(df["user_id"].to_numpy()) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            df[["bucket", "user_id", "wk"]], preserve_index=False
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype="int64")
                    for c in ("cohort_week", "week_offset", "part_users")
                }
            )
        uw = g[["user_id", "wk"]].drop_duplicates()
        coh = uw.groupby("user_id")["wk"].transform("min")
        per = pd.DataFrame(
            {"cohort_week": coh, "week_offset": uw["wk"] - coh}
        ).groupby(["cohort_week", "week_offset"], as_index=False).agg(
            part_users=("week_offset", "size")
        )
        return per.astype("int64")

    parts = (
        _read_events(sf_dir, ["user_id", "ts"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("cohort_week", "week_offset", "n_users")}
        )
    out = parts.groupby(["cohort_week", "week_offset"], as_index=False).agg(
        n_users=("part_users", "sum")
    )
    return (
        out.astype("int64")
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )


SQL_EVENTS_RETENTION = f"""
WITH uw AS (
  SELECT user_id, CAST(epoch_us(ts) // {_WEEK_US} AS BIGINT) AS wk
  FROM events GROUP BY user_id, wk
), coh AS (
  SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id
)
SELECT c.cw AS cohort_week, u.wk - c.cw AS week_offset,
       count(DISTINCT u.user_id) AS n_users
FROM uw u JOIN coh c USING (user_id)
GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# per-type z-score outliers (two-pass: mergeable moments, then a scan)


Z_THRESHOLD = 3.0


def q_events_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-event-type z-score outlier counts: pass 1 folds mergeable moment
    partials (n, Σv, Σv²) per type — a #types-sized aggregate; pass 2
    re-scans with the tiny per-type (mean, std) table closed over (no
    corpus-sized state, no join shuffle) and folds outlier-count/max-|z|
    partials. The z values are float; both sides round max_absz to 4 and
    the |z| > 3 predicate uses the raw float (diff vs DuckDB's stable
    stddev is ~1e-12 relative — far from the threshold at any realistic
    value distribution)."""

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "v": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        df["v2"] = df["v"] * df["v"]
        p = df.groupby("event_type", as_index=False).agg(
            part_n=("v", "size"), part_s=("v", "sum"), part_s2=("v2", "sum")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    mom = (
        _read_events(sf_dir, ["event_type", "value"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("part_n", alias_name="n"),
            Sum("part_s", alias_name="s"),
            Sum("part_s2", alias_name="s2"),
        )
        .to_pandas()
    )
    mean = (mom["s"] / mom["n"]).to_numpy()
    var = np.maximum(mom["s2"].to_numpy() / mom["n"].to_numpy() - mean * mean, 0.0)
    stats = {
        ty: (m, float(np.sqrt(v)))
        for ty, m, v in zip(mom["event_type"], mean, var)
    }

    def flag(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "v": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        # Series.map(dict) is the vectorized (hash-join) form; the stats
        # dict is #event_types-sized
        m = df["event_type"].map({k: v[0] for k, v in stats.items()}).to_numpy()
        sd = df["event_type"].map({k: v[1] for k, v in stats.items()}).to_numpy()
        df["absz"] = np.abs(df["v"].to_numpy() - m) / np.where(sd > 0, sd, 1.0)
        p = df.groupby("event_type", as_index=False).agg(
            part_out=("absz", lambda s: int((s > Z_THRESHOLD).sum())),
            part_max=("absz", "max"),
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    from ray.data.aggregate import Max

    out = (
        _read_events(sf_dir, ["event_type", "value"])
        .map_batches(flag, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("part_out", alias_name="n_outliers"),
            Max("part_max", alias_name="max_absz"),
        )
        .to_pandas()
    )
    out = out.merge(mom[["event_type", "n"]], on="event_type")
    out["n"] = out["n"].astype(np.int64)
    out["n_outliers"] = out["n_outliers"].astype(np.int64)
    out["max_absz"] = out["max_absz"].round(4)
    return (
        out[["event_type", "n", "n_outliers", "max_absz"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


SQL_EVENTS_OUTLIERS = f"""
WITH s AS (
  SELECT event_type, count(*) AS n, avg(value) AS m, stddev_pop(value) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_type, max(s.n) AS n,
       CAST(sum(CASE WHEN abs(e.value - s.m) / (CASE WHEN s.sd > 0 THEN s.sd ELSE 1 END)
                > {Z_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(abs(e.value - s.m) /
                 (CASE WHEN s.sd > 0 THEN s.sd ELSE 1 END)), 4) AS max_absz
FROM events e JOIN s USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


# ---------------------------------------------------------------------------
# windowed COUNT DISTINCT (tumbling windows × the bucketed-distinct pattern)


_HOUR_US = 3_600 * 1_000_000


def q_events_hourly_users(sf_dir: str) -> pd.DataFrame:
    """Distinct active users per tumbling 1-hour window: the
    ``events_hourly`` window floor composed with the
    ``events_distinct_users`` stable-user-hash bucket shuffle. A user is
    whole within one bucket, so per-(bucket, hour) distinct counts are
    disjoint and the driver folds a metadata-sized (NB × #hours) partial
    table — no hour ever needs a corpus-wide user set."""

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "hour_us": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "hour_us": (pc.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US)
                * _HOUR_US,
            }
        ).drop_duplicates()
        df["bucket"] = (
            _splitmix64(df["user_id"].to_numpy()) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            df[["bucket", "user_id", "hour_us"]], preserve_index=False
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("hour_us", "part_users")}
            )
        uniq = g[["user_id", "hour_us"]].drop_duplicates()
        return (
            uniq.groupby("hour_us", as_index=False)
            .agg(part_users=("user_id", "size"))
            .astype("int64")
        )

    parts = (
        _read_events(sf_dir, ["user_id", "ts"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("hour_us", "n_users")}
        )
    out = parts.groupby("hour_us", as_index=False).agg(n_users=("part_users", "sum"))
    return out.astype("int64").sort_values("hour_us").reset_index(drop=True)


SQL_EVENTS_HOURLY_USERS = f"""
SELECT CAST(epoch_us(ts) // {_HOUR_US} AS BIGINT) * {_HOUR_US} AS hour_us,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY hour_us ORDER BY hour_us
"""


# ---------------------------------------------------------------------------
# global ranking / NTILE (distributed row_number over a total order)


NTILE_K = 10


def q_orders_ntile(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Global rank + decile per order over the (o_totalprice, o_orderkey)
    total order — ``row_number()`` / ``ntile()`` with an empty OVER
    partition, the one window shape that inherently needs a GLOBAL prefix
    sum. Same distributed-scan machinery as ``doc_token_bins``: one sort,
    per-batch local positions tagged with the batch's FULL first-row sort
    key (price bit-view + orderkey — a partial key misorders batches when
    the leading column repeats, the events_window_count lesson), an
    O(#batches) summary the driver prefix-sums, and a vectorized offset-add
    pass. NTILE sizes follow SQL semantics (first n%k tiles get one extra
    row) as pure integer arithmetic on the global rank."""

    def scan_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        bk1 = price.view(np.int64)  # order-preserving bit view (prices > 0)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "o_orderkey": t["o_orderkey"],
                "local_pos": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "bk1": pa.array(np.full(n, bk1[0] if n else 0, np.int64)),
                "bk2": pa.array(np.full(n, okey[0] if n else 0, np.int64)),
            }
        )

    rows = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        .sort(["o_totalprice", "o_orderkey"])
        .map_batches(scan_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        # downstream batches may coalesce scan batches → group by the key
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("bk1", "bk2", "total")}
            )
        s = df.groupby(["bk1", "bk2"], as_index=False)["local_pos"].max()
        return s.rename(columns={"local_pos": "total"}).astype("int64")

    summary = (
        rows.map_batches(summarize, batch_format="pandas", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["bk1", "bk2"])
        .reset_index(drop=True)
    )
    offs = summary["total"].cumsum().shift(fill_value=0)
    offsets = {
        (int(a), int(b)): int(o)
        for a, b, o in zip(summary["bk1"], summary["bk2"], offs)
    }
    n_total = int(summary["total"].sum())
    q, rem = divmod(n_total, NTILE_K)

    def assign(t: pa.Table) -> pa.Table:
        bk1 = t["bk1"].to_numpy(zero_copy_only=False)
        bk2 = t["bk2"].to_numpy(zero_copy_only=False)
        off = np.fromiter(
            (offsets[(int(a), int(b))] for a, b in zip(bk1, bk2)),
            dtype=np.int64,
            count=len(bk1),
        )
        rnk = off + t["local_pos"].to_numpy(zero_copy_only=False)
        fat = rem * (q + 1)  # rows in the first n%k (larger) tiles
        tile = np.where(
            rnk <= fat,
            (rnk - 1) // (q + 1) + 1 if q + 1 > 0 else 1,
            rem + (np.maximum(rnk - fat - 1, 0) // max(q, 1)) + 1,
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "o_orderkey": t["o_orderkey"],
                "rnk": pa.array(rnk, pa.int64()),
                "tile": pa.array(tile, pa.int64()),
            }
        )

    out = rows.map_batches(assign, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_ORDERS_NTILE = f"""
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
       ntile({NTILE_K}) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# bounded ROWS-frame moving average (ROWS BETWEEN K PRECEDING AND CURRENT ROW)

MAVG_K = 3  # preceding rows in the frame (frame size = K + 1)


def q_events_moving_avg(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Per-user moving average over a bounded ROWS frame
    (``avg(value) OVER (PARTITION BY user ORDER BY ts, id ROWS BETWEEN 3
    PRECEDING AND CURRENT ROW)``) — the row-count-frame window shape
    (``events_lag`` is a 1-row frame, ``events_window_count`` a time-RANGE
    frame). One (user, ts, event_id) sort; per batch the frame sum is two
    prefix-sum gathers (``c0[i+1] - c0[max(run_start, i - K)]``), exact in
    integer cents. A row's frame can cross the batch split only when it is
    one of the FIRST run's first K rows, so pending heads and the last
    run's K-row tail context are the only edge rows — O(#batches · K) to
    the driver, independent of corpus size. Multi-batch runs resolve
    because every same-user context row of ANY earlier batch precedes the
    head in stream order; the head takes the last ``K - lidx`` of them."""
    K = MAVG_K

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("cents", pa.int64()),  # row value (context rows)
            ("w_n", pa.int64()),  # frame row count (local for heads)
            ("w_sum", pa.int64()),  # frame cents sum (local for heads)
            ("lidx", pa.int64()),  # in-run index (heads: K - lidx missing)
            ("kind", pa.int8()),  # 0 final, 1 head (partial), 2 context
            # first row's FULL stream-order key = the batch's order
            ("bk_u", pa.int64()),
            ("bk_ts", pa.int64()),
            ("bk_e", pa.int64()),
        ]
    )

    def mavg_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        idx = np.arange(n, dtype=np.int64)
        lidx = idx - starts[run_id]
        c0 = np.concatenate([[0], np.cumsum(cents)])
        lo = np.maximum(starts[run_id], idx - K)
        w_sum = c0[idx + 1] - c0[lo]
        w_n = idx - lo + 1
        kind = np.zeros(n, dtype=np.int8)
        kind[(run_id == 0) & (lidx < K)] = 1  # frame may reach the split
        base = pa.Table.from_pydict(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "w_n": pa.array(w_n, pa.int64()),
                "w_sum": pa.array(w_sum, pa.int64()),
                "lidx": pa.array(lidx, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
                "bk_u": pa.array(np.full(n, u[0]), pa.int64()),
                "bk_ts": pa.array(np.full(n, ts[0]), pa.int64()),
                "bk_e": pa.array(np.full(n, e[0]), pa.int64()),
            },
            schema=schema,
        )
        ci = np.arange(max(int(starts[-1]), n - K), n, dtype=np.int64)
        ctx_t = pa.Table.from_pydict(
            {
                "event_id": pa.array(e[ci], pa.int64()),
                "user_id": pa.array(u[ci], pa.int64()),
                "ts_us": pa.array(ts[ci], pa.int64()),
                "cents": pa.array(cents[ci], pa.int64()),
                "w_n": pa.array(np.zeros(len(ci), np.int64), pa.int64()),
                "w_sum": pa.array(np.zeros(len(ci), np.int64), pa.int64()),
                "lidx": pa.array(np.zeros(len(ci), np.int64), pa.int64()),
                "kind": pa.array(np.full(len(ci), 2, np.int8), pa.int8()),
                "bk_u": pa.array(np.full(len(ci), u[0]), pa.int64()),
                "bk_ts": pa.array(np.full(len(ci), ts[0]), pa.int64()),
                "bk_e": pa.array(np.full(len(ci), e[0]), pa.int64()),
            },
            schema=schema,
        )
        return pa.concat_tables([base, ctx_t])

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(mavg_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 0))
        avg = pc.round(
            pc.divide(
                pc.cast(t["w_sum"], pa.float64()),
                pc.multiply(pc.cast(t["w_n"], pa.float64()), pa.scalar(100.0)),
            ),
            ndigits=6,
        )
        return pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "w_n": t["w_n"],
                "w_avg": avg,
            }
        )

    interior = rows.map_batches(finalize, batch_format="pyarrow")
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    parts = [interior.to_pandas()]
    heads = edges[edges["kind"] == 1]
    ctx = edges[edges["kind"] == 2]
    if len(heads):
        # same-user context in global stream order (batch key, then intra-
        # batch (ts, event_id)); a head's missing predecessors are the last
        # K - lidx context rows of strictly-earlier batches
        ctx = ctx.sort_values(
            ["user_id", "bk_u", "bk_ts", "bk_e", "ts_us", "event_id"], kind="stable"
        )
        by_user: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for uid, g in ctx.groupby("user_id", sort=False):
            bk = (
                g["bk_u"].to_numpy(),
                g["bk_ts"].to_numpy(),
                g["bk_e"].to_numpy(),
            )
            by_user[int(uid)] = (bk, g["cents"].to_numpy())
        out_rows = []
        for h in heads.itertuples(index=False):
            w_sum, w_n = int(h.w_sum), int(h.w_n)
            got = by_user.get(int(h.user_id))
            if got is not None:
                (bu, bt, be), cent = got
                earlier = (bu < h.bk_u) | (
                    (bu == h.bk_u)
                    & ((bt < h.bk_ts) | ((bt == h.bk_ts) & (be < h.bk_e)))
                )
                pred = cent[earlier]
                need = K - int(h.lidx)
                take = pred[len(pred) - min(need, len(pred)) :]
                w_sum += int(take.sum())
                w_n += len(take)
            out_rows.append(
                {
                    "event_id": int(h.event_id),
                    "user_id": int(h.user_id),
                    "w_n": w_n,
                    "w_avg": round(w_sum / (w_n * 100.0), 6),
                }
            )
        parts.append(pd.DataFrame(out_rows, columns=["event_id", "user_id", "w_n", "w_avg"]))
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_MOVING_AVG = f"""
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS w_n,
       round(sum(CAST(round(value * 100) AS BIGINT)) OVER w
             / (count(*) OVER w * 100.0), 6) AS w_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {MAVG_K} PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# TPC-H-Q13-shaped customer distribution (count-of-counts / degree histogram)

Q13_NB = 64
Q13_EXCLUDED = ("1-URGENT", "2-HIGH")  # Q13's "special requests" analog


def q_orders_cust_distribution(sf_dir: str) -> pd.DataFrame:
    """How many customers placed N qualifying orders, for every N — the
    count-of-counts (degree-distribution) shape: a LEFT join whose zero bin
    must survive, then a second aggregation over the first's VALUES. No
    per-custkey groupby (1 ms/key at web-scale cardinality): per-batch
    pandas partial counts shuffle by a stable custkey-hash bucket
    (Q13_NB keys, flat at any cardinality); a custkey is whole within its
    bucket, so in-bucket sums are exact per-customer totals and fold
    straight into per-bucket histogram partials. The driver sums an
    O(NB x #bins) table. The zero bin is total customers minus customers
    seen in qualifying orders (orders->customer FK holds by generator
    contract, verified 0 orphans)."""

    def partials(t: pa.Table) -> pa.Table:
        m = pc.invert(pc.is_in(t["o_orderpriority"], value_set=pa.array(Q13_EXCLUDED)))
        t = t.filter(m)
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.int64()),
                    "c_key": pa.array([], pa.int64()),
                    "part_c": pa.array([], pa.int64()),
                }
            )
        df = (
            pd.DataFrame({"c_key": t["o_custkey"].to_numpy(zero_copy_only=False)})
            .groupby("c_key", as_index=False)
            .agg(part_c=("c_key", "size"))
        )
        df["bucket"] = (
            _splitmix64(df["c_key"].to_numpy()) % np.uint64(Q13_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            df[["bucket", "c_key", "part_c"]], preserve_index=False
        )

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("c_key")["part_c"].sum()
        h = per_cust.value_counts()
        return pd.DataFrame(
            {"c_count": h.index.to_numpy(np.int64), "part_n": h.to_numpy(np.int64)}
        )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    )
    hist = (
        orders.map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = hist.groupby("c_count", as_index=False).agg(n_custs=("part_n", "sum"))
    n_customers = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).count()
    zero = int(n_customers) - int(out["n_custs"].sum())
    if zero > 0:
        out = pd.concat(
            [pd.DataFrame([{"c_count": 0, "n_custs": zero}]), out], ignore_index=True
        )
    return out.sort_values("c_count").reset_index(drop=True)


SQL_ORDERS_CUST_DISTRIBUTION = f"""
WITH co AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON o_custkey = c_custkey
   AND o_orderpriority NOT IN ('{Q13_EXCLUDED[0]}', '{Q13_EXCLUDED[1]}')
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS n_custs FROM co GROUP BY c_count ORDER BY c_count
"""


# ---------------------------------------------------------------------------
# equi-width value histogram (mergeable bin-count partials)

HIST_WIDTH_CENTS = 2500  # $25 bins


def q_events_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Equi-width histogram of event value per type — the mergeable
    fixed-bin summary every profiling pass needs. Bin assignment is exact
    integer arithmetic (lossless cents // width), appended in-batch; the
    only shuffle is a groupby whose key cardinality is #types x #bins —
    bounded by the VALUE DOMAIN, not the corpus — and Ray map-combines the
    per-block partials internally. Bin sums stay in integer cents until
    the final metadata-sized table."""

    def binify(t: pa.Table) -> pa.Table:
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        return pa.Table.from_pydict(
            {
                "event_type": t["event_type"],
                "bin": pa.array(cents // HIST_WIDTH_CENTS, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    from ray.data.aggregate import Count as _Count

    out = (
        _read_events(sf_dir, ["event_type", "value"])
        .map_batches(binify, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(_Count(alias_name="n_events"), Sum("cents", alias_name="sc"))
        .to_pandas()
    )
    out["bin_lo"] = (out["bin"] * HIST_WIDTH_CENTS / 100.0).round(2)
    out["sum_value"] = (out["sc"] / 100.0).round(2)
    out = out[["event_type", "bin", "bin_lo", "n_events", "sum_value"]]
    return out.sort_values(["event_type", "bin"]).reset_index(drop=True)


SQL_EVENTS_VALUE_HISTOGRAM = f"""
SELECT event_type,
       CAST(round(value * 100) AS BIGINT) // {HIST_WIDTH_CENTS} AS bin,
       round(bin * {HIST_WIDTH_CENTS} / 100.0, 2) AS bin_lo,
       count(*) AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
FROM events
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


# ---------------------------------------------------------------------------
# PIVOT: per-user event-type counts as columns (wide conditional aggregation)

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT the event stream to one row per user with a count column per
    event type plus total count and purchase revenue — the wide
    conditional-aggregation shape (``count(*) FILTER (WHERE ...)``).
    The type vocabulary is fixed and small, so each batch folds to an
    n_users-per-batch x (#types + 2) partial frame; partials shuffle by
    stable user-hash bucket (a user is whole within its bucket — exact
    in-bucket sums, no per-user groupby key). Output is one row per user:
    corpus-sized but streamed, never a driver pivot."""

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": np.rint(
                    t["value"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        agg = df.groupby("user_id").agg(n_total=("cents", "size"))
        for ty in PIVOT_TYPES:
            m = df["event_type"] == ty
            agg[f"n_{ty}"] = df[m].groupby("user_id").size()
        agg["purchase_cents"] = (
            df[df["event_type"] == "purchase"].groupby("user_id")["cents"].sum()
        )
        agg = agg.fillna(0).astype(np.int64).reset_index()
        agg["bucket"] = (
            _splitmix64(agg["user_id"].to_numpy()) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns=["bucket"]).groupby("user_id", as_index=False).sum()
        return out

    out = (
        _read_events(sf_dir, ["user_id", "event_type", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["purchase_value"] = (out["purchase_cents"] / 100.0).round(2)
    cols = ["user_id", "n_total"] + [f"n_{ty}" for ty in PIVOT_TYPES] + ["purchase_value"]
    return out[cols].sort_values("user_id").reset_index(drop=True)


SQL_EVENTS_PIVOT = """
SELECT user_id,
       count(*) AS n_total,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'error') AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'view') AS n_view,
       round(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                      FILTER (event_type = 'purchase'), 0) / 100.0, 2)
         AS purchase_value
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Markov transition matrix (lag pair-counts, type-domain-sized result)


def q_events_transitions(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Per-user event-type TRANSITION counts (the Markov / clickstream
    matrix): ``lag(event_type) OVER (PARTITION BY user ORDER BY ts, id)``
    folded to (from_type, to_type) counts. One sort; every in-run adjacent
    pair counts inside its batch into a #types² partial table, so the
    shuffle carries domain-sized partials, never the event stream. The only
    cross-batch pairs are each batch seam's (tail row → next head row) when
    the user run straddles it — exactly one head and one tail row per
    batch, resolved by a driver zip over O(#batches) rows ordered by the
    full first-row sort key."""

    schema = pa.schema(
        [
            ("from_type", pa.string()),
            ("to_type", pa.string()),
            ("part_n", pa.int64()),
            ("kind", pa.int8()),  # 0 partial counts, 1 head, 2 tail
            ("user_id", pa.int64()),
            ("bk_u", pa.int64()),
            ("bk_ts", pa.int64()),
            ("bk_e", pa.int64()),
        ]
    )

    def trans_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        same = np.zeros(n, dtype=bool)
        same[1:] = u[1:] == u[:-1]
        frm = et[:-1][same[1:]]
        to = et[1:][same[1:]]
        parts = (
            pd.DataFrame({"from_type": frm, "to_type": to})
            .groupby(["from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "part_n"})
        )
        parts["kind"] = np.int8(0)
        parts["user_id"] = np.int64(0)
        edge = pd.DataFrame(
            {
                "from_type": ["", ""],
                "to_type": [str(et[0]), str(et[-1])],
                "part_n": [0, 0],
                "kind": np.array([1, 2], np.int8),
                "user_id": [int(u[0]), int(u[-1])],
            }
        )
        out = pd.concat([parts, edge], ignore_index=True)
        out["bk_u"], out["bk_ts"], out["bk_e"] = int(u[0]), int(ts[0]), int(e[0])
        return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(trans_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    counts = (
        rows.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 0)).select(
                ["from_type", "to_type", "part_n"]
            ),
            batch_format="pyarrow",
        )
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    if len(edges):
        edges = edges.sort_values(
            ["bk_u", "bk_ts", "bk_e", "kind"], kind="stable"
        ).reset_index(drop=True)
        tails = edges[edges["kind"] == 2].reset_index(drop=True)
        heads = edges[edges["kind"] == 1].reset_index(drop=True)
        # stream order pairs batch i's tail with batch i+1's head
        seam = pd.DataFrame(
            {
                "from_type": tails["to_type"].to_numpy()[:-1],
                "to_type": heads["to_type"].to_numpy()[1:],
                "same": tails["user_id"].to_numpy()[:-1]
                == heads["user_id"].to_numpy()[1:],
            }
        )
        seam = (
            seam[seam["same"]]
            .groupby(["from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        if len(seam):
            counts = (
                pd.concat([counts, seam], ignore_index=True)
                .groupby(["from_type", "to_type"], as_index=False)["n"]
                .sum()
            )
    return counts.sort_values(["from_type", "to_type"]).reset_index(drop=True)


SQL_EVENTS_TRANSITIONS = """
WITH lagged AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type, count(*) AS n
FROM lagged WHERE prev IS NOT NULL
GROUP BY prev, event_type ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# set algebra on derived key sets (INTERSECT / EXCEPT without key shuffles)


def q_events_user_sets(sf_dir: str) -> pd.DataFrame:
    """§2.8 set operations on DERIVED key sets, distributed: the click-user
    set vs the purchase-user set (intersect / both excepts / neither),
    computed without ever materializing a key set. Per batch: distinct
    users with OR-able (clicked, purchased) flags; one stable user-hash
    bucket shuffle (a user is whole within its bucket) folds flags exactly;
    per-bucket combination counts sum to a 4-row driver table."""

    def partials(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "c": (et == "click").astype(np.int64),
                "p": (et == "purchase").astype(np.int64),
            }
        )
        agg = df.groupby("user_id", as_index=False).agg(c=("c", "max"), p=("p", "max"))
        agg["bucket"] = (
            _splitmix64(agg["user_id"].to_numpy()) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("user_id").agg(c=("c", "max"), p=("p", "max"))
        return pd.DataFrame(
            {
                "setop": [
                    "click_and_purchase",
                    "click_only",
                    "purchase_only",
                    "neither",
                ],
                "part_n": [
                    int(((f["c"] == 1) & (f["p"] == 1)).sum()),
                    int(((f["c"] == 1) & (f["p"] == 0)).sum()),
                    int(((f["c"] == 0) & (f["p"] == 1)).sum()),
                    int(((f["c"] == 0) & (f["p"] == 0)).sum()),
                ],
            }
        )

    parts = (
        _read_events(sf_dir, ["user_id", "event_type"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("setop", as_index=False).agg(n_users=("part_n", "sum"))
    return out.sort_values("setop").reset_index(drop=True)


SQL_EVENTS_USER_SETS = """
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id
)
SELECT setop, n_users FROM (
  SELECT 'click_and_purchase' AS setop,
         count(*) FILTER (c = 1 AND p = 1) AS n_users FROM f
  UNION ALL SELECT 'click_only', count(*) FILTER (c = 1 AND p = 0) FROM f
  UNION ALL SELECT 'purchase_only', count(*) FILTER (c = 0 AND p = 1) FROM f
  UNION ALL SELECT 'neither', count(*) FILTER (c = 0 AND p = 0) FROM f
) ORDER BY setop
"""


# ---------------------------------------------------------------------------
# grouped Pearson correlation from exact integer moment partials


def q_lineitem_corr(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag correlation between quantity and (dollar-rounded)
    extended price — the grouped COVARIANCE/CORRELATION shape: six
    mergeable integer moments (n, Σx, Σy, Σx², Σy², Σxy) fold exactly
    through a #groups-keyed aggregate; the closed-form correlation is one
    identical float expression on both sides of the oracle. Dollar (not
    cent) quantization keeps Σy² inside int64 at 10^8-row scale."""

    def moments(t: pa.Table) -> pa.Table:
        x = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        y = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("l_returnflag", as_index=False).sum(), preserve_index=False
        )

    agg = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        .map_batches(moments, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    n = agg["n"].astype(np.float64)
    sx = agg["sx"].astype(np.float64)
    sy = agg["sy"].astype(np.float64)
    num = n * agg["sxy"].astype(np.float64) - sx * sy
    den = np.sqrt(n * agg["sxx"].astype(np.float64) - sx * sx) * np.sqrt(
        n * agg["syy"].astype(np.float64) - sy * sy
    )
    agg["corr_qty_price"] = (num / den).round(6)
    out = agg[["l_returnflag", "n", "corr_qty_price"]]
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_LINEITEM_CORR = """
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_extendedprice) AS BIGINT)
             * CAST(round(l_extendedprice) AS BIGINT)) AS syy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS corr_qty_price
FROM m ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# sweep-line interval counting (orders open per month)


def _month_idx(ts_col: pa.ChunkedArray) -> np.ndarray:
    """Timestamp column → integer month index (year*12 + month - 1)."""
    y = pc.year(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
    m = pc.month(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return y * 12 + m - 1


def q_orders_open_by_month(sf_dir: str) -> pd.DataFrame:
    """How many orders are OPEN (placed, not yet fully shipped) in every
    month — the sweep-line / interval-stabbing shape: each order spans
    [orderdate month, last-shipment month]; the answer is the running sum
    of +1/-1 boundary deltas. An order's span needs max(l_shipdate) — a
    web-scale-cardinality aggregate — so orders rows and per-batch
    lineitem max-partials UNION into ONE orderkey-hash bucket shuffle
    (tagged rows, the crawl's ledger trick); spans assemble in-bucket and
    collapse immediately to month-domain delta partials. The driver folds
    O(NB × #months) deltas and takes one cumulative sum over the month
    domain — never order-sized data."""
    from .neardup import NUM_BUCKETS

    def li_part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "m": _month_idx(t["l_shipdate"]),
            }
        )
        p = df.groupby("k", as_index=False)["m"].max()
        p["kind"] = np.int64(1)
        p["bucket"] = (
            _splitmix64(p["k"].to_numpy()) % np.uint64(NUM_BUCKETS)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            p[["bucket", "k", "m", "kind"]], preserve_index=False
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(
                    (_splitmix64(k) % np.uint64(NUM_BUCKETS)).astype(np.int64),
                    pa.int64(),
                ),
                "k": pa.array(k, pa.int64()),
                "m": pa.array(_month_idx(t["o_orderdate"]), pa.int64()),
                "kind": pa.array(np.zeros(len(k), np.int64), pa.int64()),
            }
        )

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 0]
        li = g[g["kind"] == 1].groupby("k", as_index=False)["m"].max()
        j = o.merge(li, on="k", suffixes=("_s", "_e"))
        if len(j) == 0:
            return pd.DataFrame(
                {"m": pd.Series([], dtype="int64"), "d": pd.Series([], dtype="int64")}
            )
        # the synthetic tables ship some lineitems before the order month —
        # an order is open at least its order month (clamped both sides)
        end = np.maximum(j["m_e"].to_numpy(), j["m_s"].to_numpy())
        deltas = pd.DataFrame(
            {
                "m": np.concatenate([j["m_s"].to_numpy(), end + 1]),
                "d": np.concatenate(
                    [np.ones(len(j), np.int64), -np.ones(len(j), np.int64)]
                ),
            }
        )
        return deltas.groupby("m", as_index=False)["d"].sum()

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_part, batch_format="pyarrow")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    ).map_batches(ord_rows, batch_format="pyarrow")
    parts = (
        li.union(orders)
        .groupby("bucket")
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()
    )
    d = parts.groupby("m")["d"].sum().sort_index()
    lo, hi = int(d.index.min()), int(d.index.max()) - 1  # last delta is end+1
    dom = np.arange(lo, hi + 1, dtype=np.int64)
    full = d.reindex(dom, fill_value=0)
    n_open = full.cumsum().astype(np.int64)
    return pd.DataFrame(
        {
            "month": [f"{m // 12:04d}-{m % 12 + 1:02d}" for m in dom],
            "n_open": n_open.to_numpy(),
        }
    )


SQL_ORDERS_OPEN_BY_MONTH = """
WITH span AS (
  SELECT o_orderkey,
         CAST(date_part('year', o_orderdate) * 12
              + date_part('month', o_orderdate) - 1 AS BIGINT) AS sm,
         greatest(CAST(max(date_part('year', l_shipdate) * 12
              + date_part('month', l_shipdate) - 1) AS BIGINT),
           CAST(date_part('year', o_orderdate) * 12
                + date_part('month', o_orderdate) - 1 AS BIGINT)) AS em
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, sm
), bounds AS (SELECT min(sm) AS lo, max(em) AS hi FROM span),
months AS (SELECT unnest(range(lo, hi + 1)) AS m FROM bounds)
SELECT printf('%04d-%02d', m // 12, m % 12 + 1) AS month,
       count(s.o_orderkey) AS n_open
FROM months LEFT JOIN span s ON s.sm <= m AND m <= s.em
GROUP BY m ORDER BY m
"""


# ---------------------------------------------------------------------------
# ordered string aggregation (string_agg DISTINCT ... ORDER BY)


def q_nation_segments(sf_dir: str) -> pd.DataFrame:
    """Per nation: customer count + the comma-joined SORTED DISTINCT market
    segments — the order-sensitive string-aggregation shape. Per batch the
    fact table folds to (nationkey, segment) count partials (domain-sized:
    #nations × #segments); one tiny groupby later the driver assembles the
    deterministic ordered strings and maps nation names from the
    broadcast-sized dimension. The fact table never shuffles raw rows."""

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "nk": t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
            }
        )
        p = df.groupby(["nk", "seg"], as_index=False).agg(part_n=("seg", "size"))
        return pa.Table.from_pandas(p, preserve_index=False)

    pairs = (
        rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_nationkey", "c_mktsegment"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["nk", "seg"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    pairs = pairs.merge(nation, left_on="nk", right_on="n_nationkey")
    rows = []
    for name, g in pairs.groupby("n_name", sort=True):
        segs = sorted(g["seg"].unique())
        rows.append(
            {
                "n_name": name,
                "n_custs": int(g["n"].sum()),
                "segments": ",".join(segs),
            }
        )
    return pd.DataFrame(rows, columns=["n_name", "n_custs", "segments"])


SQL_NATION_SEGMENTS = """
SELECT n_name, count(*) AS n_custs,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
FROM customer JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# FULL OUTER JOIN of two derived aggregates (period-over-period delta)

_W1_END_US = 1704672000000000  # 2024-01-08
_W4_START_US = 1705881600000000  # 2024-01-22


def q_users_week_delta(sf_dir: str) -> pd.DataFrame:
    """Week-1 click spend vs week-4 purchase spend per user — FULL OUTER
    JOIN semantics (users active in EITHER period survive; the absent side
    is null→0). Both sides' per-user cent partials ride ONE tagged union
    through ONE user-hash bucket shuffle (the crawl's ledger trick); the
    outer merge happens in-bucket where each user is whole, so no key set
    or null-side scan ever reaches the driver. (Ray's ``Dataset.join``
    full_outer breaks on empty hash partitions — 0-column blocks — at
    tiny scale, so the combine deliberately uses the bucket machinery the
    engine already trusts; the inner/semi/anti join paths elsewhere keep
    using ``Dataset.join``.)"""
    part_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("c", pa.int64()),
            ("side", pa.int64()),
            ("bucket", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        frames = []
        for side, keep in (
            (0, pc.and_(pc.equal(t["event_type"], "click"), pc.less(ts, _W1_END_US))),
            (
                1,
                pc.and_(
                    pc.equal(t["event_type"], "purchase"),
                    pc.greater_equal(ts, _W4_START_US),
                ),
            ),
        ):
            s = t.filter(keep)
            if s.num_rows == 0:
                continue
            df = pd.DataFrame(
                {
                    "user_id": s["user_id"].to_numpy(zero_copy_only=False),
                    "c": np.rint(
                        s["value"].to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64),
                }
            )
            p = df.groupby("user_id", as_index=False)["c"].sum()
            p["side"] = np.int64(side)
            frames.append(p)
        if not frames:
            return part_schema.empty_table()
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (
            _splitmix64(out["user_id"].to_numpy()) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).cast(part_schema)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s1 = g[g["side"] == 0].groupby("user_id", as_index=False)["c"].sum()
        s2 = g[g["side"] == 1].groupby("user_id", as_index=False)["c"].sum()
        m = s1.merge(s2, on="user_id", how="outer", suffixes=("1", "2"))
        m["c1"] = m.get("c1", pd.Series(dtype="float64")).fillna(0).astype("int64")
        m["c2"] = m.get("c2", pd.Series(dtype="float64")).fillna(0).astype("int64")
        return m[["user_id", "c1", "c2"]].astype("int64")

    joined = (
        _read_events(sf_dir, ["user_id", "event_type", "ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "user_id": joined["user_id"].astype(np.int64),
            "w1_click_value": (joined["c1"] / 100.0).round(2),
            "w4_purchase_value": (joined["c2"] / 100.0).round(2),
            "delta": ((joined["c2"] - joined["c1"]) / 100.0).round(2),
        }
    )
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USERS_WEEK_DELTA = """
WITH h1 AS (
  SELECT user_id, sum(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-08'
  GROUP BY user_id
), h2 AS (
  SELECT user_id, sum(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-22'
  GROUP BY user_id
)
SELECT coalesce(h1.user_id, h2.user_id) AS user_id,
       round(coalesce(h1.c, 0) / 100.0, 2) AS w1_click_value,
       round(coalesce(h2.c, 0) / 100.0, 2) AS w4_purchase_value,
       round((coalesce(h2.c, 0) - coalesce(h1.c, 0)) / 100.0, 2) AS delta
FROM h1 FULL OUTER JOIN h2 ON h1.user_id = h2.user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Pareto / ABC analysis (cumulative-share threshold over a ranked aggregate)

PARETO_PCT = 80  # integer percent — exact integer cross-multiplication


def q_orders_pareto(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """ABC / Pareto analysis: how many top customers cover 80% of total
    order revenue, and the revenue concentration at that cut. Composes the
    engine's two high-cardinality primitives: per-customer revenue folds
    exactly in custkey-hash buckets (no per-key groupby), then the ranked
    cumulative share is the distributed prefix-sum SCAN over the
    (revenue DESC, custkey) sort — per-batch local cumsums, O(#batches)
    driver offset merge, and an in-batch integer cross-multiplication
    threshold test (cum·100 ≥ PCT·total). The driver never sees the
    customer-level table, only O(#batches) summaries and the winner
    cell."""
    from .neardup import NUM_BUCKETS

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": t["o_custkey"].to_numpy(zero_copy_only=False),
                "c": np.rint(
                    t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        p = df.groupby("k", as_index=False)["c"].sum()
        p["bucket"] = (
            _splitmix64(p["k"].to_numpy()) % np.uint64(NUM_BUCKETS)
        ).astype(np.int64)
        return pa.Table.from_pandas(p[["bucket", "k", "c"]], preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["c"].sum()

    ranked = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .sort(["c", "k"], descending=[True, False])
    )

    def scan_batch(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        if len(c) == 0:
            return pa.Table.from_pydict(
                {
                    "bk_c": pa.array([], pa.int64()),
                    "bk_k": pa.array([], pa.int64()),
                    "local_cum": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pydict(
            {
                "bk_c": pa.array(np.full(len(c), c[0]), pa.int64()),
                "bk_k": pa.array(np.full(len(c), k[0]), pa.int64()),
                "local_cum": pa.array(np.cumsum(c), pa.int64()),
                "pos": pa.array(np.arange(1, len(c) + 1), pa.int64()),
            }
        )

    rows = ranked.map_batches(
        scan_batch, batch_format="pyarrow", batch_size=batch_size
    ).materialize()

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("bk_c", "bk_k", "tot", "cnt")}
            )
        s = df.groupby(["bk_c", "bk_k"], as_index=False).agg(
            tot=("local_cum", "max"), cnt=("pos", "max")
        )
        return s.astype("int64")

    summary = (
        rows.map_batches(summarize, batch_format="pandas", zero_copy_batch=True)
        .to_pandas()
        # stream order = the (c DESC, k ASC) sort key of each batch's first row
        .sort_values(["bk_c", "bk_k"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = int(summary["tot"].sum())
    coffs = summary["tot"].cumsum().shift(fill_value=0)
    poffs = summary["cnt"].cumsum().shift(fill_value=0)
    off = {
        (int(a), int(b)): (int(x), int(y))
        for a, b, x, y in zip(summary["bk_c"], summary["bk_k"], coffs, poffs)
    }

    def find_cut(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_pydict(
            {"n_customers": pa.array([], pa.int64()), "cum_cents": pa.array([], pa.int64())}
        )
        n = t.num_rows
        if n == 0:
            return empty
        # downstream batches COALESCE scan batches (the token_bins lesson):
        # resolve offsets per row from each row's own batch key
        bc = t["bk_c"].to_numpy(zero_copy_only=False)
        bk = t["bk_k"].to_numpy(zero_copy_only=False)
        lc = t["local_cum"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        coff = np.fromiter(
            (off[(int(a), int(b))][0] for a, b in zip(bc, bk)), np.int64, count=n
        )
        poff = np.fromiter(
            (off[(int(a), int(b))][1] for a, b in zip(bc, bk)), np.int64, count=n
        )
        cum = coff + lc
        # per-row predecessor cumulative: previous row of the SAME scan
        # batch, else that batch's exclusive offset
        same = np.zeros(n, dtype=bool)
        same[1:] = (bc[1:] == bc[:-1]) & (bk[1:] == bk[:-1])
        prev = np.where(same, np.r_[np.int64(0), cum[:-1]], coff)
        thr_hit = (cum * 100 >= PARETO_PCT * total) & (prev * 100 < PARETO_PCT * total)
        if not thr_hit.any():
            return empty
        i = int(np.argmax(thr_hit))
        return pa.Table.from_pydict(
            {
                "n_customers": pa.array([int(poff[i] + pos[i])], pa.int64()),
                "cum_cents": pa.array([int(cum[i])], pa.int64()),
            }
        )

    cut = rows.map_batches(find_cut, batch_format="pyarrow").to_pandas()
    cut = cut.sort_values("n_customers").head(1)
    n_at_cut = int(cut["n_customers"].iloc[0])
    cum_cents = int(cut["cum_cents"].iloc[0])
    return pd.DataFrame(
        {
            "n_customers": [n_at_cut],
            "total_customers": [int(summary["cnt"].sum())],
            "covered_value": [round(cum_cents / 100.0, 2)],
            "total_value": [round(total / 100.0, 2)],
            "covered_pct": [round(cum_cents * 100.0 / total, 4)],
        }
    )


SQL_ORDERS_PARETO = f"""
WITH per_cust AS (
  SELECT o_custkey AS k, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT k, c,
         sum(c) OVER (ORDER BY c DESC, k ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (ORDER BY c DESC, k) AS pos
  FROM per_cust
), tot AS (SELECT sum(c) AS total, count(*) AS n FROM per_cust),
cut AS (
  SELECT r.pos, r.cum FROM ranked r, tot
  WHERE r.cum * 100 >= {PARETO_PCT} * tot.total
  ORDER BY r.pos LIMIT 1
)
SELECT CAST(cut.pos AS BIGINT) AS n_customers,
       CAST(tot.n AS BIGINT) AS total_customers,
       round(cut.cum / 100.0, 2) AS covered_value,
       round(tot.total / 100.0, 2) AS total_value,
       round(cut.cum * 100.0 / tot.total, 4) AS covered_pct
FROM cut, tot
"""


# ---------------------------------------------------------------------------
# seasonal-baseline anomaly (hour-of-day profile, exact integer test)


def q_events_seasonal_anomaly(sf_dir: str) -> pd.DataFrame:
    """Cells (type, day, hour) whose event count exceeds 2× that type's
    hour-of-day MEAN across all days — the seasonal-baseline anomaly
    shape (daily periodicity, not the global z-score of
    ``events_outliers``). The whole computation lives in the
    (type × day × hour) cell domain: per-batch count partials, one
    domain-sized groupby, and an exact integer cross-multiplied
    threshold (count · n_days > 2 · hour-of-day total) — absent cells
    count as zero days in the mean by construction."""

    def partials(t: pa.Table) -> pa.Table:
        ts = t["ts"]
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "day": pc.strftime(ts, format="%Y-%m-%d").to_numpy(
                    zero_copy_only=False
                ),
                "hour": pc.hour(ts).to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        p = df.groupby(["event_type", "day", "hour"], as_index=False).agg(
            part_n=("hour", "size")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    cells = (
        _read_events(sf_dir, ["event_type", "ts"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day", "hour"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    n_days = cells["day"].nunique()
    hod = cells.groupby(["event_type", "hour"], as_index=False).agg(tot=("n", "sum"))
    m = cells.merge(hod, on=["event_type", "hour"])
    flag = m[m["n"] * n_days > 2 * m["tot"]]
    out = flag[["event_type", "day", "hour", "n"]].astype({"n": "int64"})
    return out.sort_values(["event_type", "day", "hour"]).reset_index(drop=True)


SQL_EVENTS_SEASONAL_ANOMALY = """
WITH cells AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(date_part('hour', ts) AS BIGINT) AS hour, count(*) AS n
  FROM events GROUP BY event_type, day, hour
), nd AS (SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days FROM events),
hod AS (SELECT event_type, hour, sum(n) AS tot FROM cells GROUP BY event_type, hour)
SELECT c.event_type, c.day, c.hour, c.n
FROM cells c JOIN hod ON hod.event_type = c.event_type AND hod.hour = c.hour, nd
WHERE c.n * nd.n_days > 2 * hod.tot
ORDER BY c.event_type, c.day, c.hour
"""


# ---------------------------------------------------------------------------
# journey trigram mining (sequence patterns, 2-row seam context)

JOURNEY_TOP_K = 25


def q_events_journeys(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Top user-journey TRIGRAMS (three consecutive same-user events, in
    (ts, event_id) order) — sequence-pattern mining, the 2-deep
    generalization of ``events_transitions``: in-batch windows fold to a
    #types³-bounded partial table; only windows whose last row sits at
    in-batch position 0 or 1 can span a batch seam, so each batch emits
    ≤2 pending head records plus its last-2-row tail context, and the
    driver reconstructs seam windows from the tail STREAM (concatenated
    tails in batch-key order handle runs sliced across 3+ one-row
    batches). O(#batches) edge rows."""

    schema = pa.schema(
        [
            ("t1", pa.string()),
            ("t2", pa.string()),
            ("t3", pa.string()),
            ("part_n", pa.int64()),
            ("kind", pa.int8()),  # 0 partials, 1 head-need, 2 tail context
            ("user_id", pa.int64()),
            ("lidx", pa.int64()),  # head: in-batch pos; tail: order within tail
            ("bk_u", pa.int64()),
            ("bk_ts", pa.int64()),
            ("bk_e", pa.int64()),
        ]
    )

    def tri_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        frames = []
        if n >= 3:
            ok = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
            parts = (
                pd.DataFrame(
                    {"t1": et[:-2][ok], "t2": et[1:-1][ok], "t3": et[2:][ok]}
                )
                .groupby(["t1", "t2", "t3"], as_index=False)
                .size()
                .rename(columns={"size": "part_n"})
            )
            parts["kind"] = np.int8(0)
            parts["user_id"] = np.int64(0)
            parts["lidx"] = np.int64(0)
            frames.append(parts)
        # pending heads: windows ending at rows 0 and 1 cross the seam.
        # row 0 carries only its own type (needs 2 context rows); row 1
        # carries (row0 type → t2) when same-user, else it cannot form a
        # cross-seam trigram through row 0 and is dropped.
        heads = [
            {
                "t1": "", "t2": "", "t3": str(et[0]), "part_n": 0,
                "kind": np.int8(1), "user_id": int(u[0]), "lidx": 0,
            }
        ]
        if n >= 2 and u[1] == u[0]:
            heads.append(
                {
                    "t1": "", "t2": str(et[0]), "t3": str(et[1]), "part_n": 0,
                    "kind": np.int8(1), "user_id": int(u[1]), "lidx": 1,
                }
            )
        frames.append(pd.DataFrame(heads))
        tail = []
        for k, i in enumerate(range(max(0, n - 2), n)):
            tail.append(
                {
                    "t1": "", "t2": "", "t3": str(et[i]), "part_n": 0,
                    "kind": np.int8(2), "user_id": int(u[i]), "lidx": k,
                }
            )
        frames.append(pd.DataFrame(tail))
        out = pd.concat(frames, ignore_index=True)
        out["bk_u"], out["bk_ts"], out["bk_e"] = int(u[0]), int(ts[0]), int(e[0])
        return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(tri_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    counts = (
        rows.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 0)).select(
                ["t1", "t2", "t3", "part_n"]
            ),
            batch_format="pyarrow",
        )
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    if len(edges):
        edges = edges.sort_values(
            ["bk_u", "bk_ts", "bk_e", "kind", "lidx"], kind="stable"
        ).reset_index(drop=True)
        # tail STREAM in true order; batch key marks which batch a row is in
        tails = edges[edges["kind"] == 2].reset_index(drop=True)
        heads = edges[edges["kind"] == 1]
        bkeys = list(
            dict.fromkeys(zip(tails["bk_u"], tails["bk_ts"], tails["bk_e"]))
        )
        bpos = {k: i for i, k in enumerate(bkeys)}
        # one forward pass: the last ≤2 stream rows BEFORE each batch
        last2: dict[int, list[tuple[int, str]]] = {}
        run: list[tuple[int, str]] = []
        t_bk = [bpos[k] for k in zip(tails["bk_u"], tails["bk_ts"], tails["bk_e"])]
        ti = 0
        for b in range(len(bkeys)):
            last2[b] = run.copy()
            while ti < len(tails) and t_bk[ti] == b:
                run.append((int(tails["user_id"][ti]), str(tails["t3"][ti])))
                ti += 1
            run = run[-2:]
        seam = []
        for h in heads.itertuples(index=False):
            hb = bpos.get((h.bk_u, h.bk_ts, h.bk_e))
            if hb is None or hb == 0:
                continue
            prev = last2[hb]
            if h.lidx == 0 and len(prev) == 2:
                (ua, ta), (ub, tb) = prev
                if ua == h.user_id and ub == h.user_id:
                    seam.append((ta, tb, h.t3))
            elif h.lidx == 1 and len(prev) >= 1:
                ub, tb = prev[-1]
                if ub == h.user_id:
                    seam.append((tb, h.t2, h.t3))
        if seam:
            sdf = (
                pd.DataFrame(seam, columns=["t1", "t2", "t3"])
                .groupby(["t1", "t2", "t3"], as_index=False)
                .size()
                .rename(columns={"size": "n"})
            )
            counts = (
                pd.concat([counts, sdf], ignore_index=True)
                .groupby(["t1", "t2", "t3"], as_index=False)["n"]
                .sum()
            )
    out = counts.sort_values(
        ["n", "t1", "t2", "t3"], ascending=[False, True, True, True], kind="stable"
    ).head(JOURNEY_TOP_K)
    return out.reset_index(drop=True).astype({"n": "int64"})


SQL_EVENTS_JOURNEYS = f"""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type, 1) OVER w AS p1, lag(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT p2 AS t1, p1 AS t2, event_type AS t3, count(*) AS n
FROM s WHERE p2 IS NOT NULL
GROUP BY t1, t2, event_type
ORDER BY n DESC, t1, t2, t3 LIMIT {JOURNEY_TOP_K}
"""


# ---------------------------------------------------------------------------
# time-series gap fill + LOCF (regularize a sparse monthly series)


def q_orders_monthly_locf(sf_dir: str) -> pd.DataFrame:
    """Regularize the monthly revenue series per order priority: fill
    calendar gaps and carry the last observed month's revenue forward
    (LOCF) — the time-series-regularization shape every downstream
    chart/model expects. The corpus folds to a (priority × month)
    domain-sized grid (per-batch integer cent partials, one small
    groupby); gap enumeration and the forward fill are vectorized over
    the tiny grid. Exact integer cents end-to-end."""

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "priority": t["o_orderpriority"].to_numpy(zero_copy_only=False),
                "m": _month_idx(t["o_orderdate"]),
                "cents": np.rint(
                    t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        p = df.groupby(["priority", "m"], as_index=False)["cents"].sum()
        return pa.Table.from_pandas(p, preserve_index=False)

    m = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["priority", "m"])
        .aggregate(Sum("cents", alias_name="rev"))
        .to_pandas()
    )
    lo, hi = int(m["m"].min()), int(m["m"].max())
    dom = np.arange(lo, hi + 1, dtype=np.int64)
    rows = []
    for prio, g in m.groupby("priority", sort=True):
        s = g.set_index("m")["rev"].reindex(dom)
        filled = s.isna().astype(np.int64)
        locf = s.ffill().fillna(0).astype(np.int64)
        rows.append(
            pd.DataFrame(
                {
                    "priority": prio,
                    "month": [f"{x // 12:04d}-{x % 12 + 1:02d}" for x in dom],
                    "rev_locf": (locf / 100.0).round(2),
                    "filled": filled.to_numpy(),
                }
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["priority", "month"]).reset_index(drop=True)


SQL_ORDERS_MONTHLY_LOCF = """
WITH m AS (
  SELECT o_orderpriority AS priority,
         CAST(date_part('year', o_orderdate) * 12
              + date_part('month', o_orderdate) - 1 AS BIGINT) AS idx,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY priority, idx
), b AS (SELECT min(idx) AS lo, max(idx) AS hi FROM m),
grid AS (
  SELECT p.priority, g.mi
  FROM (SELECT DISTINCT priority FROM m) p,
       (SELECT unnest(range((SELECT lo FROM b), (SELECT hi FROM b) + 1)) AS mi) g
), j AS (
  SELECT grid.priority, grid.mi, m.rev
  FROM grid LEFT JOIN m ON m.priority = grid.priority AND m.idx = grid.mi
)
SELECT priority, printf('%04d-%02d', mi // 12, mi % 12 + 1) AS month,
       round(coalesce(last_value(rev IGNORE NULLS)
               OVER (PARTITION BY priority ORDER BY mi
                     ROWS UNBOUNDED PRECEDING), 0) / 100.0, 2) AS rev_locf,
       CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS filled
FROM j ORDER BY priority, month
"""


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary terciles)

RFM_REF_US = 1706659200000000  # 2024-01-31: fixed recency reference


def q_events_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM customer segmentation: per user, Recency (days since last
    event vs a fixed reference), Frequency (event count) and Monetary
    (purchase cents) fold exactly in user-hash buckets; each metric's
    tercile thresholds come from the engine's discrete-quantile rule
    (value-count fold + ceil(q·n) CDF inversion — domain-sized, no user
    table on the driver); a second pass over the bucketed user Dataset
    bins every user and folds 27-cell segment counts. All arithmetic is
    exact integers; bin = 1 + (v > t1) + (v > t2) identically in SQL."""

    def partials(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "ts": pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False),
                "f": np.ones(t.num_rows, np.int64),
                "m": np.where(et == "purchase", cents, 0),
            }
        )
        p = df.groupby("user_id", as_index=False).agg(
            last_ts=("ts", "max"), f=("f", "sum"), m=("m", "sum")
        )
        p["bucket"] = (
            _splitmix64(p["user_id"].to_numpy()) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(p, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", as_index=False).agg(
            last_ts=("last_ts", "max"), f=("f", "sum"), m=("m", "sum")
        )
        s["r"] = (RFM_REF_US - s["last_ts"]) // 86_400_000_000
        return s[["user_id", "r", "f", "m"]].astype("int64")

    rfm = (
        _read_events(sf_dir, ["user_id", "event_type", "ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )

    def value_counts(t: pa.Table) -> pa.Table:
        frames = []
        for metric in ("r", "f", "m"):
            v = t[metric].to_numpy(zero_copy_only=False)
            vals, cnts = np.unique(v, return_counts=True)
            frames.append(
                pd.DataFrame({"metric": metric, "v": vals, "c": cnts})
            )
        return pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True), preserve_index=False
        )

    vc = (
        rfm.map_batches(value_counts, batch_format="pyarrow")
        .groupby(["metric", "v"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    n = int(vc.loc[vc["metric"] == "r", "c"].sum())
    th = {}
    for metric, g in vc.groupby("metric"):
        g = g.sort_values("v")
        cum = g["c"].cumsum().to_numpy()
        vals = g["v"].to_numpy()
        t1 = int(vals[np.searchsorted(cum, -(-n // 3))])
        t2 = int(vals[np.searchsorted(cum, -(-(2 * n) // 3))])
        th[metric] = (t1, t2)

    def binify(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                m: 1
                + (t[m].to_numpy(zero_copy_only=False) > th[m][0]).astype(np.int64)
                + (t[m].to_numpy(zero_copy_only=False) > th[m][1]).astype(np.int64)
                for m in ("r", "f", "m")
            }
        )
        p = (
            df.groupby(["r", "f", "m"], as_index=False)
            .size()
            .rename(columns={"r": "r_bin", "f": "f_bin", "m": "m_bin", "size": "part_n"})
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    out = (
        rfm.map_batches(binify, batch_format="pyarrow")
        .groupby(["r_bin", "f_bin", "m_bin"])
        .aggregate(Sum("part_n", alias_name="n_users"))
        .to_pandas()
    )
    return (
        out.sort_values(["r_bin", "f_bin", "m_bin"]).reset_index(drop=True)
        .astype("int64")
    )


SQL_EVENTS_RFM = f"""
WITH rfm AS (
  SELECT user_id,
         CAST(({RFM_REF_US} - max(epoch_us(ts))) // 86400000000 AS BIGINT) AS r,
         count(*) AS f,
         coalesce(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (event_type = 'purchase'), 0) AS m
  FROM events GROUP BY user_id
), nn AS (SELECT count(*) AS n FROM rfm),
ccr AS (SELECT r AS v, sum(count(*)) OVER (ORDER BY r) AS cc FROM rfm GROUP BY r),
ccf AS (SELECT f AS v, sum(count(*)) OVER (ORDER BY f) AS cc FROM rfm GROUP BY f),
ccm AS (SELECT m AS v, sum(count(*)) OVER (ORDER BY m) AS cc FROM rfm GROUP BY m),
tr AS (SELECT (SELECT min(v) FROM ccr, nn WHERE cc >= ceil(n / 3.0)) AS t1,
              (SELECT min(v) FROM ccr, nn WHERE cc >= ceil(2 * n / 3.0)) AS t2),
tf AS (SELECT (SELECT min(v) FROM ccf, nn WHERE cc >= ceil(n / 3.0)) AS t1,
              (SELECT min(v) FROM ccf, nn WHERE cc >= ceil(2 * n / 3.0)) AS t2),
tm AS (SELECT (SELECT min(v) FROM ccm, nn WHERE cc >= ceil(n / 3.0)) AS t1,
              (SELECT min(v) FROM ccm, nn WHERE cc >= ceil(2 * n / 3.0)) AS t2)
SELECT 1 + CAST(r > tr.t1 AS BIGINT) + CAST(r > tr.t2 AS BIGINT) AS r_bin,
       1 + CAST(f > tf.t1 AS BIGINT) + CAST(f > tf.t2 AS BIGINT) AS f_bin,
       1 + CAST(m > tm.t1 AS BIGINT) + CAST(m > tm.t2 AS BIGINT) AS m_bin,
       count(*) AS n_users
FROM rfm, tr, tf, tm
GROUP BY r_bin, f_bin, m_bin ORDER BY r_bin, f_bin, m_bin
"""


# ---------------------------------------------------------------------------
# diversified top-k (global ranking under a per-group quota)

DIV_TOPK = 10
DIV_PER_GROUP = 2


def q_orders_diversified_topk(sf_dir: str) -> pd.DataFrame:
    """Global top-K orders by price with AT MOST 2 per order priority —
    the diversified-ranking shape (search results, recommendations),
    where a plain global top-K would be swamped by one group. Any
    selected row is necessarily within its group's top-2, so the
    candidate set is per-batch per-group head(2) partials — the
    ``_topk_cut`` pattern generalized per group: the driver folds
    O(#batches · #groups · 2) rows, re-applies the quota, and takes the
    top-K. Ties break (price DESC, orderkey ASC) identically in SQL."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
        )
        return df.groupby("o_orderpriority", as_index=False).head(DIV_PER_GROUP)

    cand = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
        )
        .map_batches(partials, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
    )
    eligible = cand.groupby("o_orderpriority", as_index=False).head(DIV_PER_GROUP)
    top = eligible.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(DIV_TOPK)
    top = top.reset_index(drop=True)
    top["o_totalprice"] = top["o_totalprice"].round(2)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "o_orderkey", "o_orderpriority", "o_totalprice"]]


SQL_ORDERS_DIVERSIFIED_TOPK = f"""
WITH q AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
), eligible AS (SELECT * FROM q WHERE rn <= {DIV_PER_GROUP})
SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
         AS rank,
       o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
FROM eligible
ORDER BY o_totalprice DESC, o_orderkey LIMIT {DIV_TOPK}
"""


# ---------------------------------------------------------------------------
# debounce / throttle dedup (greedy chained keep-state)

DEBOUNCE_US = 12 * 3600 * 1_000_000


def q_events_debounce(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Throttle-dedup the stream: per user, keep an event only if MORE
    than 12 h passed since the last KEPT event (first event always kept)
    — the greedy chained-state semantics (rate limiting, notification
    dedup) that no window function expresses. The chain's structural
    anchor: any row whose RAW predecessor gap exceeds W is kept no
    matter the state (last_kept ≤ prev row's ts), so in-batch rows from
    the first anchor onward finalize locally via O(#keeps · log n)
    searchsorted jumps (#keeps ≤ span/W per run — never a per-row
    loop); only the first run's pre-anchor prefix is pending, and each
    batch reports its exit keep-state, so the driver chain is
    O(#batches + pending) rows."""

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("kind", pa.int8()),  # 0 kept-final, 1 pending, 2 exit state
            ("resolved", pa.int8()),  # exit state: 1 if final locally
            ("last_kept", pa.int64()),  # exit state payload
            ("bk_u", pa.int64()),
            ("bk_ts", pa.int64()),
            ("bk_e", pa.int64()),
        ]
    )

    def deb_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        gap_anchor = np.ones(n, dtype=bool)
        gap_anchor[1:] = (ts[1:] - ts[:-1]) > DEBOUNCE_US
        # an in-batch run start is an anchor; the batch's first row is NOT
        # (its run may continue from an earlier batch) unless its raw gap
        # can be shown large — it can't (no predecessor visible)
        anchor = new | gap_anchor
        anchor[0] = False
        first_anchor = int(np.argmax(anchor)) if anchor.any() else n
        rows = {k: [] for k in ("event_id", "user_id", "ts_us", "kind")}

        def emit(i: int, kind: int) -> None:
            rows["event_id"].append(int(e[i]))
            rows["user_id"].append(int(u[i]))
            rows["ts_us"].append(int(ts[i]))
            rows["kind"].append(kind)

        for i in range(first_anchor):  # pending prefix (≤ first anchor)
            emit(i, 1)
        # greedy straight through each run from its first anchor: any later
        # raw anchor (gap > W) is kept by the greedy automatically (the
        # state can never exceed the predecessor's ts), so one segment per
        # run suffices
        bounds = np.flatnonzero(new).tolist() + [n]
        exit_resolved, exit_last = 0, 0
        for bi in range(len(bounds) - 1):
            rs, re_ = bounds[bi], bounds[bi + 1]
            if bi == 0 and first_anchor >= re_:
                continue  # run fully pending (can only be the first run)
            s = rs if bi > 0 else max(rs, first_anchor)
            last = int(ts[s])
            emit(s, 0)
            i = s
            while True:
                j = int(np.searchsorted(ts[i + 1 : re_], last + DEBOUNCE_US + 1))
                i = i + 1 + j
                if i >= re_:
                    break
                emit(i, 0)
                last = int(ts[i])
            exit_resolved, exit_last = 1, last
        if first_anchor == n:
            exit_resolved = 0  # whole batch pending: exit state chains
        base = pd.DataFrame(rows)
        base["resolved"] = np.int8(0)
        base["last_kept"] = np.int64(0)
        state = pd.DataFrame(
            {
                "event_id": [int(e[-1])],
                "user_id": [int(u[-1])],
                "ts_us": [int(ts[-1])],
                "kind": [np.int8(2)],
                "resolved": [np.int8(exit_resolved)],
                "last_kept": [np.int64(exit_last)],
            }
        )
        out = pd.concat([base, state], ignore_index=True)
        out["bk_u"], out["bk_ts"], out["bk_e"] = int(u[0]), int(ts[0]), int(e[0])
        return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(deb_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    kept_interior = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["event_id", "user_id"]),
        batch_format="pyarrow",
    ).to_pandas()
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    kept_pending = []
    if len(edges):
        edges = edges.sort_values(
            ["bk_u", "bk_ts", "bk_e", "kind"], kind="stable"
        ).reset_index(drop=True)
        carry_user, carry_last = None, None
        for (bu, bt, be), g in edges.groupby(
            ["bk_u", "bk_ts", "bk_e"], sort=True
        ):
            pend = g[g["kind"] == 1]
            state = g[g["kind"] == 2].iloc[0]
            pend_last = None
            for p in pend.itertuples(index=False):
                if carry_user == p.user_id and carry_last is not None:
                    if p.ts_us > carry_last + DEBOUNCE_US:
                        kept_pending.append((int(p.event_id), int(p.user_id)))
                        carry_last = int(p.ts_us)
                else:
                    kept_pending.append((int(p.event_id), int(p.user_id)))
                    carry_user, carry_last = int(p.user_id), int(p.ts_us)
                pend_last = carry_last
            if state["resolved"] == 1:
                carry_user, carry_last = int(state["user_id"]), int(
                    state["last_kept"]
                )
            elif len(pend):
                carry_user = int(pend.iloc[-1]["user_id"])
                carry_last = pend_last
            # else: batch had no pending and unresolved exit — impossible
            # (unresolved means the whole batch was pending)
    parts = [kept_interior]
    if kept_pending:
        parts.append(pd.DataFrame(kept_pending, columns=["event_id", "user_id"]))
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_DEBOUNCE = f"""
WITH RECURSIVE o AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), deb(user_id, rn, t, kept_t, is_kept) AS (
  SELECT user_id, rn, t, t, 1 FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, o.t,
         CASE WHEN o.t > d.kept_t + {DEBOUNCE_US} THEN o.t ELSE d.kept_t END,
         CASE WHEN o.t > d.kept_t + {DEBOUNCE_US} THEN 1 ELSE 0 END
  FROM deb d JOIN o ON o.user_id = d.user_id AND o.rn = d.rn + 1
)
SELECT o.event_id, o.user_id
FROM o JOIN deb d ON d.user_id = o.user_id AND d.rn = o.rn
WHERE d.is_kept = 1 ORDER BY o.event_id
"""


# ---------------------------------------------------------------------------
# CDC / SCD-Type-1 upsert merge (change-stream materialization with deletes)


def q_events_cdc_upsert(sf_dir: str) -> pd.DataFrame:
    """MERGE INTO / CDC materialization: apply the events table as a keyed
    change stream over a base snapshot (customer) and emit the final state
    table — latest-wins per key with DELETE tombstones ('error' events
    remove the key outright, base row included; keys absent from the base
    surface as inserts). The operator class a warehouse MERGE or an
    Iceberg/Hudi upsert compaction runs at scale.

    Dataflow: base rows (sentinel ts = -1) and change rows ride ONE tagged
    union through ONE key-hash bucket shuffle; each key is whole in its
    bucket, so the latest-version pick, tombstone filter and
    insert-vs-update classification are all in-bucket vectorized passes —
    no driver key set, no per-key groupby (NDIST_NB buckets), nothing
    corpus-sized on the driver. At 100 TB the same plan holds: the change
    stream pre-dedups per batch (only each batch's latest version per key
    enters the shuffle), so shuffle mass is min(|changes|, |batches|·|keys|)."""
    base_schema = pa.schema(
        [
            ("k", pa.int64()),
            ("ts_us", pa.int64()),
            ("seq", pa.int64()),
            ("last_type", pa.string()),
            ("value", pa.float64()),
            ("is_base", pa.int64()),
            ("bucket", pa.int64()),
        ]
    )

    def base_rows(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        out = pa.Table.from_pydict(
            {
                "k": pa.array(k, pa.int64()),
                "ts_us": pa.array(np.full(n, -1, np.int64)),
                "seq": pa.array(np.full(n, -1, np.int64)),
                "last_type": pa.array(["none"] * n, pa.string()),
                "value": t["c_acctbal"],
                "is_base": pa.array(np.ones(n, np.int64)),
                "bucket": pa.array(
                    (_splitmix64(k) % np.uint64(NDIST_NB)).astype(np.int64)
                ),
            }
        )
        return out.cast(base_schema)

    def change_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                "ts_us": pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False),
                "seq": t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                "last_type": t["event_type"].to_pylist(),
                "value": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        # batch-local pre-dedup: only each batch's latest version per key
        # enters the shuffle (the CDC analogue of a pre-aggregation combiner)
        df = df.sort_values(["k", "ts_us", "seq"], kind="stable")
        df = df.drop_duplicates("k", keep="last")
        df["is_base"] = np.int64(0)
        df["bucket"] = (
            _splitmix64(df["k"].to_numpy(np.int64)) % np.uint64(NDIST_NB)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False).cast(base_schema)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "user_id": pd.Series([], dtype="int64"),
            "src": pd.Series([], dtype=object),
            "last_type": pd.Series([], dtype=object),
            "last_ts_us": pd.Series([], dtype="int64"),
            "value": pd.Series([], dtype="float64"),
        }
        if len(g) == 0:
            return pd.DataFrame(cols)
        in_base = set(g.loc[g["is_base"] == 1, "k"].tolist())
        g = g.sort_values(["k", "ts_us", "seq"], kind="stable")
        win = g.drop_duplicates("k", keep="last")
        win = win[win["last_type"] != "error"]  # tombstone: key removed
        if len(win) == 0:
            return pd.DataFrame(cols)
        src = np.where(
            win["is_base"].to_numpy(np.int64) == 1,
            "base",
            np.where(win["k"].isin(in_base).to_numpy(), "event", "insert"),
        )
        return pd.DataFrame(
            {
                "user_id": win["k"].to_numpy(np.int64),
                "src": src,
                "last_type": win["last_type"].to_numpy(object),
                "last_ts_us": win["ts_us"].to_numpy(np.int64),
                "value": win["value"].to_numpy(np.float64),
            }
        )

    base = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_acctbal"]
    ).map_batches(base_rows, batch_format="pyarrow")
    changes = _read_events(
        sf_dir, ["user_id", "ts", "event_id", "event_type", "value"]
    ).map_batches(change_rows, batch_format="pyarrow")
    out = (
        base.union(changes)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


SQL_EVENTS_CDC_UPSERT = """
WITH ch AS (
  SELECT user_id AS k, epoch_us(ts) AS ts_us, event_id AS seq,
         event_type, value
  FROM events
), latest AS (
  SELECT k, ts_us, event_type, value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY k ORDER BY ts_us DESC, seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
), base AS (
  SELECT c_custkey AS k, c_acctbal AS value FROM customer
)
SELECT coalesce(b.k, l.k) AS user_id,
       CASE WHEN l.k IS NULL THEN 'base'
            WHEN b.k IS NULL THEN 'insert'
            ELSE 'event' END AS src,
       coalesce(l.event_type, 'none') AS last_type,
       CAST(coalesce(l.ts_us, -1) AS BIGINT) AS last_ts_us,
       coalesce(l.value, b.value) AS value
FROM base b FULL OUTER JOIN latest l ON l.k = b.k
WHERE l.event_type IS NULL OR l.event_type <> 'error'
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Skyline (multi-dimensional Pareto frontier)


def _skyline_fold(P: np.ndarray, keys: np.ndarray, chunk: int = 2048):
    """Exact skyline of points P (n×d int64, every dim oriented MAXIMIZE):
    rows not strictly dominated (another row ≥ in all dims, > in one).
    Chunked: test each chunk against the accumulated skyline, prune
    chunk-internal dominated rows pairwise (c² on a bounded chunk), then
    evict accumulated rows the chunk dominates. Identical duplicate tuples
    never dominate each other, so every tied orderkey survives — matching
    the NOT-EXISTS strict-dominance oracle. Associative + idempotent:
    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), which is what makes
    the per-batch partials mergeable (tree-reduce at cluster scale; the
    driver fold here is over skyline-sized partials only)."""
    S = P[:0]
    SK = keys[:0]
    for lo in range(0, len(P), chunk):
        C, CK = P[lo : lo + chunk], keys[lo : lo + chunk]
        if len(S):
            dom = (
                (S[None, :, :] >= C[:, None, :]).all(2)
                & (S[None, :, :] != C[:, None, :]).any(2)
            ).any(1)
            C, CK = C[~dom], CK[~dom]
        if len(C):
            dom_in = (
                (C[None, :, :] >= C[:, None, :]).all(2)
                & (C[None, :, :] != C[:, None, :]).any(2)
            ).any(1)
            C, CK = C[~dom_in], CK[~dom_in]
        if len(S) and len(C):
            dom_s = (
                (C[None, :, :] >= S[:, None, :]).all(2)
                & (C[None, :, :] != S[:, None, :]).any(2)
            ).any(1)
            S, SK = S[~dom_s], SK[~dom_s]
        S = np.concatenate([S, C])
        SK = np.concatenate([SK, CK])
    return S, SK


def q_orders_skyline(sf_dir: str) -> pd.DataFrame:
    """Skyline / Pareto-frontier operator (the multi-criteria shortlist a
    recommender or procurement pipeline runs): orders not strictly
    dominated on (total price MAX, order date MIN, priority rank MIN).
    No SQL primitive exists; the oracle is the defining NOT-EXISTS
    strict-dominance anti-join.

    Dataflow: one pruned-column scan; each batch emits its LOCAL skyline —
    a point dominated inside its batch is dominated globally, so the cut
    is lossless (the same provable-cut argument as the per-bucket top-K
    family) — and local skylines of random partitions are tiny
    (O(log^(d-1) n) expected), so the driver fold is metadata-sized and
    the partials are mergeable/associative for a tree reduce at 100 TB.
    All three dims are exact integers (cents / epoch days / rank digit):
    dominance can never float-drift from the oracle."""

    def partials(t: pa.Table) -> pa.Table:
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        day = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
        prio = np.array(
            [int(s[0]) for s in t["o_orderpriority"].to_pylist()], np.int64
        )
        P = np.stack([cents, -day, -prio], axis=1)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        S, SK = _skyline_fold(P, keys)
        return pa.Table.from_pydict(
            {
                "o_orderkey": pa.array(SK, pa.int64()),
                "cents": pa.array(S[:, 0], pa.int64()),
                "day": pa.array(-S[:, 1], pa.int64()),
                "prio": pa.array(-S[:, 2], pa.int64()),
            }
        )

    parts = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("o_orderkey", "cents", "day", "prio")}
        )
    P = np.stack(
        [
            parts["cents"].to_numpy(np.int64),
            -parts["day"].to_numpy(np.int64),
            -parts["prio"].to_numpy(np.int64),
        ],
        axis=1,
    )
    S, SK = _skyline_fold(P, parts["o_orderkey"].to_numpy(np.int64))
    out = pd.DataFrame(
        {"o_orderkey": SK, "cents": S[:, 0], "day": -S[:, 1], "prio": -S[:, 2]}
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_ORDERS_SKYLINE = """
WITH pts AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio
  FROM orders)
SELECT p.o_orderkey, p.cents, p.day, p.prio
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.cents >= p.cents AND q.day <= p.day AND q.prio <= p.prio
    AND (q.cents > p.cents OR q.day < p.day OR q.prio < p.prio))
ORDER BY p.o_orderkey
"""


# ---------------------------------------------------------------------------
# per-user hourly rate limit (quota keep-first-N)

RATE_LIMIT_N = 3  # events kept per (user, day)


def q_events_rate_limit(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Per-user daily quota: keep the first RATE_LIMIT_N events of every
    (user, day) — the bot-rate cap / ingestion throttle a collection
    pipeline applies before anything downstream pays for a hot user (the
    window binds at test scale: ~850 user-days exceed it at sf0.01). The
    within-(user, day) rank is a distributed grouped scan
    (pipelines/scan.grouped_rank): ONE (user, ts, event_id) sort — day is
    monotone in ts within a user, so the quota groups are contiguous under
    it — O(#batches) carry chain, never O(#groups) state. Identity-only
    output (event ids + integer day), nothing floats."""
    from .scan import grouped_rank

    def hourly(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        return pa.Table.from_pydict(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": ts_us,
                "day": pc.divide(ts_us, 86_400_000_000),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    ).map_batches(hourly, batch_format="pyarrow")
    ranked = grouped_rank(
        ds, ["user_id", "ts_us", "event_id"], ["user_id", "day"], batch_size
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["grank"] <= RATE_LIMIT_N]
        return out.rename(columns={"grank": "rnk"})[
            ["event_id", "user_id", "day", "rnk"]
        ]

    out = ranked.map_batches(keep, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                c: pd.Series([], dtype="int64")
                for c in ("event_id", "user_id", "day", "rnk")
            }
        )
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_RATE_LIMIT = f"""
SELECT event_id, user_id,
       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       CAST(row_number() OVER (
           PARTITION BY user_id, epoch_us(ts) // 86400000000
           ORDER BY ts, event_id) AS BIGINT) AS rnk
FROM events
QUALIFY rnk <= {RATE_LIMIT_N}
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# TPC-H Q21-style decorrelated multi-EXISTS self-join
# (reference analogue: the per-order "which fetch attempt failed alone"
# audit the scraper's retry analysis runs; here the classic shape: per
# supplier, count orders where it was the ONLY supplier with a returned
# line and the order had other suppliers at all.)


def q_lineitem_lone_return_supplier(sf_dir: str) -> pd.DataFrame:
    """Q21 shape: EXISTS(another supplier in the order) AND NOT EXISTS
    (another supplier with a returned line) — two correlated subqueries
    decorrelated into ONE orderkey-co-located grouped pass (a correlated
    self-join pair at 100 TB would be two extra full-fact shuffles).

    Dataflow: per-batch pre-dedup to distinct (orderkey, suppkey,
    any-returned) rows — the combiner that bounds shuffle mass at ~4
    lines/order; one orderkey-hash bucket shuffle (NB keys, never
    per-order groupby state); per bucket a vectorized orderkey fold emits
    supplier partial counts; the driver folds supplier partials only
    (suppliers are a bounded dimension). All decided quantities are exact
    integers."""
    NB = 64

    def distinct_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ok": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "r": (
                    pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
                ).astype(np.int64),
            }
        )
        g = df.groupby(["ok", "sk"], sort=False, as_index=False)["r"].max()
        g["bucket"] = g["ok"] % NB
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"s_suppkey": pd.Series([], dtype="int64"),
                 "numwait": pd.Series([], dtype="int64")}
            )
        # cross-batch OR per (orderkey, suppkey), then per-order facts
        p = g.groupby(["ok", "sk"], sort=False, as_index=False)["r"].max()
        per = p.groupby("ok", sort=False).agg(
            ns=("sk", "size"), nr=("r", "sum"),
        )
        rsup = p[p["r"] == 1].drop_duplicates("ok", keep="first").set_index("ok")["sk"]
        hit = per[(per["ns"] >= 2) & (per["nr"] == 1)]
        lone = rsup.loc[hit.index]
        out = lone.value_counts().rename_axis("s_suppkey").reset_index(name="numwait")
        return out.astype("int64")

    parts = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_returnflag"],
        )
        .map_batches(distinct_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "numwait": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("s_suppkey", as_index=False)["numwait"].sum()
    return out.sort_values("s_suppkey").reset_index(drop=True).astype("int64")


SQL_LINEITEM_LONE_RETURN = """
WITH per AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS nr,
         min(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS lone
  FROM lineitem GROUP BY l_orderkey)
SELECT lone AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM per WHERE ns >= 2 AND nr = 1
GROUP BY lone ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# keyed snapshot diff (data-versioning regression check)

DIFF_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("k", pa.int64()),
        ("side", pa.int8()),
        ("st", pa.string()),
        ("cents", pa.int64()),
        ("day", pa.int64()),
        ("pr", pa.string()),
    ]
)


def q_orders_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Keyed diff of two table snapshots — the regression check a data
    platform runs between pipeline versions: classify every key as
    added / removed / changed (unchanged rows are silent). The snapshots
    are derived deterministically from the orders table (old drops keys
    ≡13 mod 97; new drops keys ≡7 mod 89 and bumps price by $1 on keys
    ≡0 mod 31) but are READ AND TRANSFORMED AS TWO INDEPENDENT STREAMS —
    the dataflow is a genuine two-snapshot merge.

    Dataflow: tag each side, ONE key-hash bucket shuffle, per-bucket
    vectorized pivot + field compare (the tagged-union bucket merge —
    Ray's full_outer join breaks on empty hash partitions, see
    CLAUDE.md). Payloads compare on exact integers (cents, epoch days)
    and dimension strings; the $1 bump is applied to cents AFTER
    rounding on both sides so no float path decides anything."""
    NB = 64

    def snap(side: int):
        def rows(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy(zero_copy_only=False)
            cents = np.rint(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            day = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
            if side == 0:
                keep = (k % 97) != 13
            else:
                keep = (k % 89) != 7
                cents = cents + np.where(k % 31 == 0, 100, 0)
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array(k[keep] % NB, pa.int64()),
                    "k": pa.array(k[keep], pa.int64()),
                    "side": pa.array(np.full(int(keep.sum()), side, np.int8)),
                    "st": pc.array_filter(t["o_orderstatus"], pa.array(keep)),
                    "cents": pa.array(cents[keep], pa.int64()),
                    "day": pa.array(day[keep], pa.int64()),
                    "pr": pc.array_filter(t["o_orderpriority"], pa.array(keep)),
                },
                schema=DIFF_SCHEMA,
            )

        return rows

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"o_orderkey": pd.Series([], dtype="int64"),
                 "change": pd.Series([], dtype=object)}
            )
        o = g[g["side"] == 0].set_index("k")
        n = g[g["side"] == 1].set_index("k")
        added = n.index.difference(o.index)
        removed = o.index.difference(n.index)
        both = o.index.intersection(n.index)
        ob, nb = o.loc[both], n.loc[both]
        diff = (
            (ob["st"].to_numpy(object) != nb["st"].to_numpy(object))
            | (ob["cents"].to_numpy(np.int64) != nb["cents"].to_numpy(np.int64))
            | (ob["day"].to_numpy(np.int64) != nb["day"].to_numpy(np.int64))
            | (ob["pr"].to_numpy(object) != nb["pr"].to_numpy(object))
        )
        ks = np.concatenate(
            [added.to_numpy(np.int64), removed.to_numpy(np.int64),
             both.to_numpy(np.int64)[diff]]
        )
        ch = np.concatenate(
            [np.full(len(added), "added", object),
             np.full(len(removed), "removed", object),
             np.full(int(diff.sum()), "changed", object)]
        )
        return pd.DataFrame({"o_orderkey": ks, "change": ch})

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    old = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=cols).map_batches(
        snap(0), batch_format="pyarrow"
    )
    new = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=cols).map_batches(
        snap(1), batch_format="pyarrow"
    )
    out = (
        old.union(new).groupby("bucket").map_groups(classify, batch_format="pandas").to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {"o_orderkey": pd.Series([], dtype="int64"),
             "change": pd.Series([], dtype=object)}
        )
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_ORDERS_SNAPSHOT_DIFF = """
WITH o AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         o_orderpriority AS pr
  FROM orders WHERE o_orderkey % 97 <> 13),
n AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 31 = 0 THEN 100 ELSE 0 END AS cents,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
         o_orderpriority AS pr
  FROM orders WHERE o_orderkey % 89 <> 7)
SELECT coalesce(o.k, n.k) AS o_orderkey,
       CASE WHEN o.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM o FULL OUTER JOIN n ON o.k = n.k
WHERE o.k IS NULL OR n.k IS NULL
   OR o.st <> n.st OR o.cents <> n.cents OR o.day <> n.day OR o.pr <> n.pr
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# dataset profiler (per-column audit: counts, nulls, exact distinct, min/max)

_PROFILE_COLS = ["event_id", "user_id", "day", "event_type", "etype_ok"]
_PROFILE_INT = {0: True, 1: True, 2: True, 3: False, 4: False}


def q_events_profile(sf_dir: str) -> pd.DataFrame:
    """Per-column dataset profile — the schema-drift / data-quality audit a
    pipeline runs before training ingestion: row count, null count, EXACT
    distinct count, min and max for each profiled column (ints compare
    numerically, strings lexicographically; min/max emit as strings so one
    result schema covers both). `etype_ok` nulls out the 'error' event
    type (the dirty-value→NULL normalization), so the null path is
    exercised, not degenerate.

    Dataflow: per batch, values fold to per-(column, value) COUNTS (the
    combiner — shuffle mass is per-batch-distinct, never the raw stream);
    one value-hash bucket shuffle; a value lands in exactly one bucket, so
    per-bucket distinct/min/max/count partials are exact and mergeable;
    the driver folds #buckets × #columns constant-size partials. Exact
    distinct on a unique key column inherently costs the full shuffle —
    `events_distinct_hll` is the sketch alternative when approximate
    suffices."""
    NB = 64

    def tagged(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy()
        et = t["event_type"].to_pylist()
        cols = {
            0: t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            1: t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            2: ts_us // 86_400_000_000,
            3: np.array(et, object),
            4: np.array([None if s == "error" else s for s in et], object),
        }
        frames = []
        n = t.num_rows
        for cid, arr in cols.items():
            if _PROFILE_INT[cid]:
                vi, counts = np.unique(arr, return_counts=True)
                frames.append(
                    pd.DataFrame(
                        {
                            "bucket": (vi % NB).astype(np.int64),
                            "cid": np.int64(cid),
                            "v": vi.astype(str),
                            "vi": vi,
                            "cnt": counts.astype(np.int64),
                            "nulls": np.int64(0),
                        }
                    )
                )
            else:
                s = pd.Series(arr, dtype=object)
                n_null = int(s.isna().sum())
                vc = s.dropna().value_counts()
                from ..functions.analysis import _feat_hash

                b = np.fromiter(
                    ((_feat_hash(v) & 0x7FFFFFFFFFFFFFFF) % NB for v in vc.index),
                    np.int64,
                    count=len(vc),
                )
                f = pd.DataFrame(
                    {
                        "bucket": b,
                        "cid": np.int64(cid),
                        "v": vc.index.to_numpy(object),
                        "vi": np.int64(0),
                        "cnt": vc.to_numpy(np.int64),
                        "nulls": np.int64(0),
                    }
                )
                if n_null:
                    # null-count rides one metadata row (bucket 0, cnt 0)
                    f = pd.concat(
                        [f, pd.DataFrame(
                            {"bucket": [0], "cid": [np.int64(cid)], "v": [""],
                             "vi": [np.int64(0)], "cnt": [np.int64(0)],
                             "nulls": [np.int64(n_null)]}
                        )],
                        ignore_index=True,
                    )
                frames.append(f)
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cid, sub in g.groupby("cid", sort=False):
            vals = sub[sub["cnt"] > 0]
            # same value from different batches: one distinct, summed count
            per_v = vals.groupby("v", sort=False).agg(
                cnt=("cnt", "sum"), vi=("vi", "first")
            )
            if _PROFILE_INT[int(cid)]:
                mn = mx = None
                if len(per_v):
                    mn, mx = int(per_v["vi"].min()), int(per_v["vi"].max())
                rows.append((int(cid), int(per_v["cnt"].sum()), int(sub["nulls"].sum()),
                             len(per_v), str(mn), str(mx), mn if mn is not None else 0,
                             mx if mx is not None else 0, len(per_v) > 0))
            else:
                mn_s = per_v.index.min() if len(per_v) else ""
                mx_s = per_v.index.max() if len(per_v) else ""
                rows.append((int(cid), int(per_v["cnt"].sum()), int(sub["nulls"].sum()),
                             len(per_v), mn_s, mx_s, 0, 0, len(per_v) > 0))
        return pd.DataFrame(
            rows, columns=["cid", "n", "n_null", "nd", "mn_s", "mx_s", "mn_i", "mx_i", "has"]
        )

    parts = (
        _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(tagged, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_partials, batch_format="pandas")
        .to_pandas()
    )
    out_rows = []
    for cid in range(len(_PROFILE_COLS)):
        sub = parts[(parts["cid"] == cid)]
        live = sub[sub["has"]]
        n_null = int(sub["n_null"].sum())
        n = int(sub["n"].sum()) + n_null  # count(*) includes nulls
        nd = int(sub["nd"].sum())
        if _PROFILE_INT[cid]:
            mn_s = str(int(live["mn_i"].min())) if len(live) else ""
            mx_s = str(int(live["mx_i"].max())) if len(live) else ""
        else:
            mn_s = live["mn_s"].min() if len(live) else ""
            mx_s = live["mx_s"].max() if len(live) else ""
        out_rows.append((_PROFILE_COLS[cid], n, n_null, nd, mn_s, mx_s))
    return pd.DataFrame(
        out_rows, columns=["col", "n", "n_null", "n_distinct", "min_s", "max_s"]
    ).astype({"n": "int64", "n_null": "int64", "n_distinct": "int64"})


SQL_EVENTS_PROFILE = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         event_type,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS etype_ok
  FROM events)
SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS VARCHAR) AS min_s, CAST(max(event_id) AS VARCHAR) AS max_s
FROM e
UNION ALL
SELECT 'user_id', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(user_id) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR) FROM e
UNION ALL
SELECT 'day', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(day) AS BIGINT),
       CAST(count(DISTINCT day) AS BIGINT),
       CAST(min(day) AS VARCHAR), CAST(max(day) AS VARCHAR) FROM e
UNION ALL
SELECT 'event_type', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(event_type) AS BIGINT),
       CAST(count(DISTINCT event_type) AS BIGINT),
       min(event_type), max(event_type) FROM e
UNION ALL
SELECT 'etype_ok', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(etype_ok) AS BIGINT),
       CAST(count(DISTINCT etype_ok) AS BIGINT),
       coalesce(min(etype_ok), ''), coalesce(max(etype_ok), '') FROM e
ORDER BY col
"""


# ---------------------------------------------------------------------------
# last-touch attribution (two-table strict-asof + channel revenue credit)

ATTR_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 channel partial, 1 head order, 2 tail touch
        ("channel", pa.string()),
        ("n", pa.int64()),
        ("cents", pa.int64()),
        ("u", pa.int64()),
        ("id", pa.int64()),
        ("ts_i", pa.int64()),
        ("tag", pa.int8()),
    ]
)


def q_events_attribution(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Last-touch marketing attribution: every PURCHASE event (the
    conversion) is credited to the same user's most recent NON-purchase
    event STRICTLY BEFORE it ('direct' when none) — revenue and
    conversion counts per channel. (Orders and events are time-disjoint
    in this corpus — 1997-2001 vs 2024 — so the conversion stream is the
    purchase events themselves, the standard in-stream attribution
    shape.) A strict as-of between two ROLES of one stream + aggregate:
    resolved conversions fold to per-batch (channel, n, cents) PARTIALS —
    the shuffle never carries conversion rows, only constant-size
    partials + the O(#batches) edge set.

    ONE scan tags rows, ONE (user, ts, tag, id) sort; tag 0 (conversion)
    sorts before tag 1 (touch) at equal ts, which encodes the strict-<
    semantics positionally. Only each batch's FIRST user's unresolved
    conversions need cross-batch context (the documented full-sort-key
    edge fixup); tails carry the batch's last touch. Oracle: rank-1 row
    over a strict-inequality LEFT JOIN."""

    def tag_rows(t: pa.Table) -> pa.Table:
        is_conv = pc.equal(t["event_type"], "purchase")
        conv_np = is_conv.to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "u": t["user_id"],
                "ts_i": pc.cast(t["ts"], pa.int64()),
                "tag": pa.array(np.where(conv_np, 0, 1).astype(np.int8)),
                "id": t["event_id"],
                "cents": pa.array(
                    np.where(
                        conv_np, np.rint(val * 100).astype(np.int64), 0
                    )
                ),
                "channel": pc.if_else(
                    is_conv, pa.scalar("", pa.string()), t["event_type"]
                ),
            }
        )

    def resolve(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return ATTR_SCHEMA.empty_table()
        u = t["u"].to_numpy(zero_copy_only=False)
        tag = t["tag"].to_numpy(zero_copy_only=False)
        ts_i = t["ts_i"].to_numpy(zero_copy_only=False)
        oid = t["id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        ch = np.array(t["channel"].to_pylist(), object)
        is_touch = tag == 1
        idx = np.arange(n)
        last_touch = np.maximum.accumulate(np.where(is_touch, idx, -1))
        valid = last_touch >= 0
        same = np.zeros(n, dtype=bool)
        same[valid] = u[last_touch[valid]] == u[valid]
        ok = valid & same & ~is_touch
        is_order = ~is_touch
        head = is_order & ~ok & (u == u[0])  # may resolve from an earlier batch
        final = is_order & ~head
        chan = np.where(ok, ch[np.maximum(last_touch, 0)], "direct")
        parts = pd.DataFrame(
            {"channel": chan[final], "cents": cents[final]}
        ).groupby("channel", as_index=False).agg(n=("cents", "size"), cents=("cents", "sum"))
        out = {
            "kind": np.zeros(len(parts), np.int8),
            "channel": parts["channel"].to_numpy(object),
            "n": parts["n"].to_numpy(np.int64),
            "cents": parts["cents"].to_numpy(np.int64),
            "u": np.zeros(len(parts), np.int64),
            "id": np.zeros(len(parts), np.int64),
            "ts_i": np.zeros(len(parts), np.int64),
            "tag": np.zeros(len(parts), np.int8),
        }
        frames = [pd.DataFrame(out)]
        if head.any():
            frames.append(
                pd.DataFrame(
                    {
                        "kind": np.int8(1), "channel": "",
                        "n": np.int64(1), "cents": cents[head],
                        "u": u[head], "id": oid[head], "ts_i": ts_i[head],
                        "tag": np.int8(0),
                    }
                )
            )
        touches = np.flatnonzero(is_touch)
        if touches.size:
            r = touches[-1]
            frames.append(
                pd.DataFrame(
                    {
                        "kind": [np.int8(2)], "channel": [ch[r]],
                        "n": [np.int64(0)], "cents": [np.int64(0)],
                        "u": [u[r]], "id": [oid[r]], "ts_i": [ts_i[r]],
                        "tag": [np.int8(1)],
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False).cast(ATTR_SCHEMA)

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
        .map_batches(tag_rows, batch_format="pyarrow")
        .sort(["u", "ts_i", "tag", "id"])
        .map_batches(resolve, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
    )
    if len(rows) == 0 or "kind" not in rows.columns:  # all-empty-block quirk
        return pd.DataFrame(
            {"channel": pd.Series([], dtype=object),
             "n_orders": pd.Series([], dtype="int64"),
             "revenue_cents": pd.Series([], dtype="int64")}
        )
    agg: dict[str, list[int]] = {}

    def credit(channel: str, n: int, cents: int) -> None:
        cur = agg.setdefault(channel, [0, 0])
        cur[0] += n
        cur[1] += cents
    for _, r in rows[rows["kind"] == 0].iterrows():
        credit(r["channel"], int(r["n"]), int(r["cents"]))
    edges = rows[rows["kind"] != 0]
    if len(edges):
        # stream order: full sort key (u, ts_i, tag, id); tails (tag 1)
        # sort after a head at equal ts → strict-before preserved
        edges = edges.sort_values(["u", "ts_i", "tag", "id"], kind="stable")
        is_tail = edges["kind"] == 2
        last_u = edges["u"].where(is_tail).ffill()
        last_ch = edges["channel"].where(is_tail).ffill()
        heads = edges[edges["kind"] == 1]
        same = (last_u[heads.index] == heads["u"]).to_numpy()
        chans = np.where(same, last_ch[heads.index].to_numpy(object), "direct")
        for chn, cents in zip(chans, heads["cents"].to_numpy(np.int64)):
            credit(str(chn), 1, int(cents))
    out = pd.DataFrame(
        [(k, v[0], v[1]) for k, v in agg.items()],
        columns=["channel", "n_orders", "revenue_cents"],
    ).astype({"n_orders": "int64", "revenue_cents": "int64"})
    return out.sort_values("channel").reset_index(drop=True)


SQL_EVENTS_ATTRIBUTION = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT c.event_id, c.cents, e.event_type,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM c LEFT JOIN events e
    ON e.user_id = c.user_id AND e.event_type <> 'purchase'
   AND e.ts < c.ts)
SELECT coalesce(event_type, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM t WHERE rn = 1
GROUP BY channel ORDER BY channel
"""


# ---------------------------------------------------------------------------
# value band self-join (non-equi distance join via neighbor-bucket blocking)

BAND_CENTS = 50  # |value diff| <= 50 cents, same calendar day


def q_events_band_join(sf_dir: str) -> pd.DataFrame:
    """Band (distance) self-join — pairs of same-day events whose values
    differ by ≤ BAND_CENTS (the correlated-metric / near-identical-price
    pair detector). A non-equi join Ray Data lacks: blocking by
    (day, value // BAND) with each row ALSO ghost-emitted to the next
    band — any qualifying pair either shares a band (counted home×home
    there) or spans adjacent bands (counted ghost×home in the upper one),
    and bands two apart cannot qualify, so the enumeration is exact with
    2× row expansion and no all-pairs pass. Pair counts pre-aggregate per
    (group, day) before the small per-day rollup. Exact integer cents."""
    NB = 256

    def rows(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy()
        day = ts_us // 86_400_000_000
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        band = c // BAND_CENTS
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        home = pd.DataFrame(
            {"day": day, "band": band, "c": c, "eid": eid, "ghost": np.int8(0)}
        )
        ghost = pd.DataFrame(
            {"day": day, "band": band + 1, "c": c, "eid": eid, "ghost": np.int8(1)}
        )
        df = pd.concat([home, ghost], ignore_index=True)
        df["bucket"] = ((df["day"] * 1_000_003 + df["band"]) % NB).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        res = []
        for (day, _band), sub in g.groupby(["day", "band"], sort=False):
            h = sub[sub["ghost"] == 0]
            gh = sub[sub["ghost"] == 1]
            n = 0
            if len(h) > 1:
                cs = np.sort(h["c"].to_numpy(np.int64))
                # within-band: diff <= BAND always? band width == BAND means
                # max in-band diff is BAND-1 < BAND — all home pairs qualify
                n += len(cs) * (len(cs) - 1) // 2
            if len(h) and len(gh):
                hc = np.sort(h["c"].to_numpy(np.int64))
                for v in gh["c"].to_numpy(np.int64):
                    lo = np.searchsorted(hc, v - BAND_CENTS, side="left")
                    hi = np.searchsorted(hc, v + BAND_CENTS, side="right")
                    n += int(hi - lo)
            if n:
                res.append((int(day), n))
        if not res:
            return pd.DataFrame(
                {"day": pd.Series([], dtype="int64"),
                 "n_pairs": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(res, columns=["day", "n_pairs"]).astype("int64")

    parts = (
        _read_events(sf_dir, ["event_id", "ts", "value"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {"day": pd.Series([], dtype="int64"),
             "n_pairs": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("day", as_index=False)["n_pairs"].sum()
    return out.sort_values("day").reset_index(drop=True).astype("int64")


SQL_EVENTS_BAND_JOIN = f"""
WITH e AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events)
SELECT a.day, CAST(count(*) AS BIGINT) AS n_pairs
FROM e a JOIN e b
  ON a.day = b.day AND a.event_id < b.event_id
 AND abs(a.c - b.c) <= {BAND_CENTS}
GROUP BY a.day ORDER BY a.day
"""


# ---------------------------------------------------------------------------
# Q17-class small-quantity revenue: per-part threshold from the part's OWN
# aggregate, decided in exact integers

SMALLQTY_BRAND = "Brand#13"


def q_lineitem_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by refusing orders whose
    quantity is below 20% of the part's own average order quantity, over one
    brand (reference: the promotion/brand-slice analyses in
    query_analysis.py). The correlated subquery (each row compared against
    an aggregate of its OWN group) is the shape that forces a fact-fact
    self-join in SQL; here both the aggregate and the row filter happen
    inside ONE partkey-hash bucket after ONE shuffle.

    Exactness: ``qty < 0.2 * avg(qty)`` is decided as
    ``5*qty*cnt < sum_qty`` — all int64 (quantities are integral), so no
    float boundary can flip a row between engines. The brand filter rides
    the same shuffle as tagged part rows (qty == -1 marker): no broadcast
    of the part dim, scale-safe when part is fact-sized.

    Output: one row (total_cents, n_small, avg_yearly); avg_yearly is the
    single float division total_cents/700.0 (Q17's /7.0 over dollars),
    bit-identical across engines."""
    NB = 64

    def li_rows(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(k % NB, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "q": pa.array(q, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def part_rows(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["p_brand"], SMALLQTY_BRAND)
        k = pc.filter(t["p_partkey"], mask).to_numpy(zero_copy_only=False)
        n = len(k)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(k % NB, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "q": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"total_cents": pd.Series([], dtype="int64"),
                 "n_small": pd.Series([], dtype="int64")}
            )
        keep_k = g.loc[g["q"].to_numpy() == -1, "k"].unique()
        li = g[g["q"].to_numpy() != -1]
        li = li[li["k"].isin(keep_k)]
        if len(li) == 0:
            return pd.DataFrame({"total_cents": [0], "n_small": [0]}).astype("int64")
        ag = li.groupby("k")["q"].agg(sumq="sum", cnt="size")
        sumq = ag["sumq"].reindex(li["k"]).to_numpy(np.int64)
        cnt = ag["cnt"].reindex(li["k"]).to_numpy(np.int64)
        small = 5 * li["q"].to_numpy(np.int64) * cnt < sumq
        return pd.DataFrame(
            {"total_cents": [int(li["cents"].to_numpy(np.int64)[small].sum())],
             "n_small": [int(small.sum())]}
        ).astype("int64")

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(li_rows, batch_format="pyarrow")
    pt = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    ).map_batches(part_rows, batch_format="pyarrow")
    parts = (
        li.union(pt).groupby("bucket").map_groups(fold, batch_format="pandas")
    ).to_pandas()
    total = int(parts["total_cents"].sum()) if len(parts) else 0
    n = int(parts["n_small"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {"total_cents": pd.Series([total], dtype="int64"),
         "n_small": pd.Series([n], dtype="int64"),
         "avg_yearly": [round(total / 700.0, 6)]}
    )


SQL_LINEITEM_SMALL_QTY = f"""
WITH li AS (
  SELECT l_partkey AS k, CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{SMALLQTY_BRAND}'),
ag AS (
  SELECT k, CAST(sum(q) AS BIGINT) AS sumq, count(*) AS cnt
  FROM li GROUP BY k)
SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_small,
       round(CAST(coalesce(sum(cents), 0) AS BIGINT) / 700.0, 6) AS avg_yearly
FROM li JOIN ag USING (k)
WHERE 5 * li.q * ag.cnt < ag.sumq
"""


# ---------------------------------------------------------------------------
# argmin join: cheapest supplier per part (TPC-H Q2's min-supplycost shape
# over the lineitem fact, dims attached in the contract-bound epilogue)


def q_part_cheapest_supplier(sf_dir: str) -> pd.DataFrame:
    """Per-part argmin join — TPC-H Q2's 'supplier with minimum supply
    cost' shape re-based on lineitem (this corpus has no partsupp): for
    every part, the supplier of its cheapest lineitem (exact integer cents;
    ties break to the smallest suppkey), decorated with supplier + nation
    names.

    Dataflow: per-batch PARTIAL argmin per partkey (lexsort + first-of-run
    — the mergeable cut: a batch's non-minimal rows can never win
    globally), then ONE partkey-hash bucket shuffle and the same vectorized
    argmin per bucket. Supplier/nation are metadata-sized dims merged in
    the pandas epilogue (the result is already part-cardinality there)."""
    NB = 64

    def partial(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((s, cents, k))
        ks = k[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        idx = order[first]
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(k[idx] % NB, pa.int64()),
                "k": pa.array(k[idx], pa.int64()),
                "s": pa.array(s[idx], pa.int64()),
                "cents": pa.array(cents[idx], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("k", "s", "cents")}
            )
        k = g["k"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((s, c, k))
        ks = k[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        idx = order[first]
        return pd.DataFrame({"k": k[idx], "s": s[idx], "cents": c[idx]})

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    import pyarrow.parquet as _pq

    sup = _pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).to_pandas()
    nat = _pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = out.merge(sup, left_on="s", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    out = out.rename(columns={"k": "p_partkey", "cents": "min_cents"})[
        ["p_partkey", "s_suppkey", "s_name", "n_name", "min_cents"]
    ]
    return out.sort_values("p_partkey").reset_index(drop=True)


SQL_PART_CHEAPEST_SUPPLIER = """
WITH c AS (
  SELECT l_partkey AS k, l_suppkey AS s,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
m AS (SELECT k, min(cents) AS mc FROM c GROUP BY k),
w AS (
  SELECT c.k AS k, min(c.s) AS s
  FROM c JOIN m ON c.k = m.k AND c.cents = m.mc
  GROUP BY c.k)
SELECT w.k AS p_partkey, w.s AS s_suppkey, s_name, n_name, m.mc AS min_cents
FROM w JOIN m ON w.k = m.k
  JOIN supplier ON s_suppkey = w.s
  JOIN nation ON n_nationkey = s_nationkey
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# partition checksum audit: order-independent mergeable (count, sum, xor)
# fingerprint per partition — the copy/export verification an ingest runs

CKS_MOD = 2147483647  # 2^31 - 1: keeps every intermediate far inside int64


def q_orders_partition_checksum(sf_dir: str) -> pd.DataFrame:
    """Per-partition content checksum — the audit a pipeline runs to verify
    a copied/exported table without re-reading it row-by-row: for each
    order month, row count + an order-independent (sum mod M, xor) hash of
    the row payload. Sum and xor are commutative/associative, so per-batch
    partials merge in any order — the mergeable-sketch shape.

    The row hash is plain BIGINT arithmetic reproducible in SQL
    (multiply-add mod 2^31-1 over orderkey, price cents, epoch day and the
    status code point); every intermediate is bounded < 2^53 so neither
    engine overflows or wraps. Unicode code points come from the numpy
    UCS4 view (vectorized, no Python loop)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        day = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
        stc = (
            t["o_orderstatus"]
            .to_numpy(zero_copy_only=False)
            .astype("U1")
            .view(np.uint32)
            .astype(np.int64)
        )
        h = ((k % 4294967296) * 1000003 + cents * 31 + day * 7 + stc) % CKS_MOD
        m = _month_idx(t["o_orderdate"])
        df = pd.DataFrame({"m": m, "h": h})
        agg = df.groupby("m")["h"].agg(
            n="size",
            s=lambda x: int(x.to_numpy(np.int64).sum() % CKS_MOD),
            x=lambda x: int(np.bitwise_xor.reduce(x.to_numpy(np.int64))),
        )
        return agg.reset_index()

    parts = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("m").agg(
        n_rows=("n", "sum"),
        sum_hash=("s", lambda x: int(x.to_numpy(np.int64).sum() % CKS_MOD)),
        xor_hash=("x", lambda x: int(np.bitwise_xor.reduce(x.to_numpy(np.int64)))),
    )
    agg = agg.reset_index().sort_values("m")
    return pd.DataFrame(
        {
            "month": [f"{m // 12:04d}-{m % 12 + 1:02d}" for m in agg["m"]],
            "n_rows": agg["n_rows"].to_numpy(np.int64),
            "sum_hash": agg["sum_hash"].to_numpy(np.int64),
            "xor_hash": agg["xor_hash"].to_numpy(np.int64),
        }
    )


SQL_ORDERS_PARTITION_CHECKSUM = f"""
WITH r AS (
  SELECT printf('%04d-%02d',
                CAST(date_part('year', o_orderdate) AS BIGINT),
                CAST(date_part('month', o_orderdate) AS BIGINT)) AS month,
         ((o_orderkey % 4294967296) * 1000003
          + CAST(round(o_totalprice * 100) AS BIGINT) * 31
          + CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) * 7
          + ascii(o_orderstatus)) % {CKS_MOD} AS h
  FROM orders)
SELECT month, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(h) % {CKS_MOD} AS BIGINT) AS sum_hash,
       CAST(bit_xor(h) AS BIGINT) AS xor_hash
FROM r GROUP BY month ORDER BY month
"""


# ---------------------------------------------------------------------------
# one-pass multi-scenario evaluation: K parameter settings over ONE data scan

SCN_N = 8  # scenarios: pct = 5+k on orders with cents >= 10M + 5M*k


def q_orders_discount_scenarios(sf_dir: str) -> pd.DataFrame:
    """What-if parameter sweep — evaluate K discount policies in ONE pass
    over the fact table (the shape a tuning job wants: never K scans).
    Scenario k discounts orders at/above a cents threshold by an integer
    percent; the per-batch kernel compares rows × scenarios vectorized
    (outer broadcast) and emits K partial rows; the driver folds K rows per
    batch. All decided quantities are integer cents (`cents * pct // 100`
    floor division — identical in numpy and DuckDB for non-negatives)."""
    pcts = np.arange(5, 5 + SCN_N, dtype=np.int64)
    thr = (10_000_000 + 5_000_000 * np.arange(SCN_N, dtype=np.int64))

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        hit = cents[:, None] >= thr[None, :]  # rows × K
        disc = (cents[:, None] * pcts[None, :]) // 100
        return pd.DataFrame(
            {
                "scenario": np.arange(SCN_N, dtype=np.int64),
                "n_affected": hit.sum(axis=0).astype(np.int64),
                "discount_cents": np.where(hit, disc, 0).sum(axis=0).astype(np.int64),
                "gross_cents": np.full(SCN_N, int(cents.sum()), np.int64),
            }
        )

    parts = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = (
        parts.groupby("scenario", as_index=False)[
            ["n_affected", "discount_cents", "gross_cents"]
        ].sum()
    ).sort_values("scenario")
    return pd.DataFrame(
        {
            "scenario": agg["scenario"].to_numpy(np.int64),
            "pct": pcts,
            "threshold_cents": thr,
            "n_affected": agg["n_affected"].to_numpy(np.int64),
            "discount_cents": agg["discount_cents"].to_numpy(np.int64),
            "net_cents": (
                agg["gross_cents"].to_numpy(np.int64)
                - agg["discount_cents"].to_numpy(np.int64)
            ),
        }
    )


SQL_ORDERS_DISCOUNT_SCENARIOS = f"""
WITH s AS (
  SELECT k AS scenario, 5 + k AS pct,
         10000000 + 5000000 * k AS threshold_cents
  FROM (SELECT unnest(range(0, {SCN_N})) AS k)),
o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
SELECT s.scenario, CAST(s.pct AS BIGINT) AS pct,
       CAST(s.threshold_cents AS BIGINT) AS threshold_cents,
       CAST(sum(CASE WHEN o.cents >= s.threshold_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_affected,
       CAST(sum(CASE WHEN o.cents >= s.threshold_cents
                     THEN (o.cents * s.pct) // 100 ELSE 0 END)
            AS BIGINT) AS discount_cents,
       CAST(sum(o.cents) - sum(CASE WHEN o.cents >= s.threshold_cents
                                    THEN (o.cents * s.pct) // 100 ELSE 0 END)
            AS BIGINT) AS net_cents
FROM s CROSS JOIN o
GROUP BY s.scenario, s.pct, s.threshold_cents
ORDER BY s.scenario
"""


# ---------------------------------------------------------------------------
# sorted-neighborhood entity-resolution blocking: rank-window candidate
# pairs + exact edit-distance verify

SNM_SPAN = 64   # ranks per block (neighbor-bucket blocking over the rank axis)
SNM_WIN = 5     # sliding window: pair ranks differ by < SNM_WIN
SNM_MAXLEV = 2  # verified pairs: levenshtein(name_a, name_b) <= 2


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, same definition as DuckDB's levenshtein()."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def q_part_name_snm_pairs(sf_dir: str) -> pd.DataFrame:
    """Sorted-neighborhood method (SNM) — the classic entity-resolution
    blocking plan: sort records by a fuzzy key (part name), slide a
    w-record window down the GLOBAL rank order, verify only in-window pairs
    with exact edit distance. Complements the set-similarity planners
    (minhash / PPJoin): SNM catches near-dups those miss when token sets
    disagree but the sort key collates them adjacently.

    Dataflow: ONE (p_name, p_partkey) sort; global ranks via the
    distributed prefix-sum scan (per-batch local positions + O(#batches)
    offset merge, FULL first-row sort key as the batch key); each row then
    lands in rank-block ``(rn-1)//SPAN`` and GHOSTS into the previous block
    when within WIN-1 of its start — so every in-window pair co-locates in
    the lower rank's home block, emitted exactly once. Rank-blocks shuffle
    under block%NB; edit distance verifies only the O(n·w) candidates."""
    NB = 64

    def scan_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = t["p_name"].to_numpy(zero_copy_only=False)
        keys = t["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "k": t["p_partkey"],
                "name": t["p_name"],
                "local_pos": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "bk1": pa.array([str(names[0]) if n else ""] * n, pa.string()),
                "bk2": pa.array(np.full(n, keys[0] if n else 0, np.int64)),
            }
        )

    rows = (
        rd.read_parquet(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
        )
        .sort(["p_name", "p_partkey"])
        .map_batches(scan_batch, batch_format="pyarrow")
        .materialize()
    )

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"bk1": pd.Series([], dtype=object),
                 "bk2": pd.Series([], dtype="int64"),
                 "total": pd.Series([], dtype="int64")}
            )
        s = df.groupby(["bk1", "bk2"], as_index=False)["local_pos"].max()
        return s.rename(columns={"local_pos": "total"})

    summary = (
        rows.map_batches(summarize, batch_format="pandas", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["bk1", "bk2"])
        .reset_index(drop=True)
    )
    offs = summary["total"].cumsum().shift(fill_value=0)
    offsets = {
        (str(a), int(b)): int(o)
        for a, b, o in zip(summary["bk1"], summary["bk2"], offs)
    }

    def block_rows(t: pa.Table) -> pd.DataFrame:
        bk1 = t["bk1"].to_numpy(zero_copy_only=False)
        bk2 = t["bk2"].to_numpy(zero_copy_only=False)
        off = np.fromiter(
            (offsets[(str(a), int(b))] for a, b in zip(bk1, bk2)),
            dtype=np.int64,
            count=len(bk1),
        )
        rn = off + t["local_pos"].to_numpy(zero_copy_only=False)
        blk = (rn - 1) // SNM_SPAN
        k = t["k"].to_numpy(zero_copy_only=False)
        nm = t["name"].to_numpy(zero_copy_only=False)
        ghost = ((rn - 1) % SNM_SPAN < SNM_WIN - 1) & (blk >= 1)
        frames = [pd.DataFrame({"blk": blk, "rn": rn, "k": k, "name": nm})]
        if ghost.any():
            frames.append(
                pd.DataFrame(
                    {"blk": blk[ghost] - 1, "rn": rn[ghost],
                     "k": k[ghost], "name": nm[ghost]}
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = out["blk"] % NB
        return out

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"pa_key": pd.Series([], dtype="int64"),
                 "pb_key": pd.Series([], dtype="int64"),
                 "lev": pd.Series([], dtype="int64")}
            )
        g = g.drop_duplicates(["blk", "rn"]).sort_values(["blk", "rn"])
        blk = g["blk"].to_numpy(np.int64)
        rn = g["rn"].to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        nm = g["name"].to_numpy(object)
        res_a, res_b, res_l = [], [], []
        for d in range(1, SNM_WIN):
            if d >= len(g):
                break
            a, b = slice(None, -d), slice(d, None)
            ok = (
                (blk[a] == blk[b])
                & (rn[b] - rn[a] == d)
                & ((rn[a] - 1) // SNM_SPAN == blk[a])  # a is a HOME row
            )
            for i in np.flatnonzero(ok):
                lv = _levenshtein(str(nm[i]), str(nm[i + d]))
                if lv <= SNM_MAXLEV:
                    res_a.append(k[i])
                    res_b.append(k[i + d])
                    res_l.append(lv)
        return pd.DataFrame(
            {"pa_key": pd.Series(res_a, dtype="int64"),
             "pb_key": pd.Series(res_b, dtype="int64"),
             "lev": pd.Series(res_l, dtype="int64")}
        )

    out = (
        rows.map_batches(block_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {"pa_key": pd.Series([], dtype="int64"),
             "pb_key": pd.Series([], dtype="int64"),
             "lev": pd.Series([], dtype="int64")}
        )
    return out.sort_values(["pa_key", "pb_key"]).reset_index(drop=True)


SQL_PART_NAME_SNM = f"""
WITH r AS (
  SELECT p_partkey, p_name,
         row_number() OVER (ORDER BY p_name, p_partkey) AS rn
  FROM part)
SELECT a.p_partkey AS pa_key, b.p_partkey AS pb_key,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
FROM r a JOIN r b
  ON b.rn > a.rn AND b.rn < a.rn + {SNM_WIN}
 AND levenshtein(a.p_name, b.p_name) <= {SNM_MAXLEV}
ORDER BY pa_key, pb_key
"""


# ---------------------------------------------------------------------------
# grouped mode: most frequent category per group (deterministic tie-break)


def q_customer_mode_segment(sf_dir: str) -> pd.DataFrame:
    """Per-nation MODE of the market segment (ties break to the
    lexicographically smallest segment) — the grouped-argmax-over-counts
    shape. (group, category) cardinality is the product of two small
    domains, so per-batch partial counts collapse the fact stream to a
    metadata-sized fold; the argmax is a vectorized sort + first-of-run."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "nk": t["c_nationkey"].to_numpy(zero_copy_only=False),
                "seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby(["nk", "seg"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    parts = (
        rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_nationkey", "c_mktsegment"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cnt = parts.groupby(["nk", "seg"], as_index=False)["cnt"].sum()
    cnt = cnt.sort_values(["nk", "cnt", "seg"], ascending=[True, False, True])
    mode = cnt.drop_duplicates("nk")
    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    out = mode.merge(nat, left_on="nk", right_on="n_nationkey")
    return (
        out.rename(columns={"seg": "mode_segment", "cnt": "n_customers"})[
            ["n_name", "mode_segment", "n_customers"]
        ]
        .astype({"n_customers": "int64"})
        .sort_values("n_name")
        .reset_index(drop=True)
    )


SQL_CUSTOMER_MODE_SEGMENT = """
WITH c AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS cnt
  FROM customer GROUP BY c_nationkey, c_mktsegment),
m AS (
  SELECT c_nationkey, c_mktsegment, cnt,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cnt DESC, c_mktsegment) AS rk
  FROM c)
SELECT n_name, c_mktsegment AS mode_segment, CAST(cnt AS BIGINT) AS n_customers
FROM m JOIN nation ON n_nationkey = c_nationkey
WHERE rk = 1 ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# ordered time-window funnel: view -> click -> purchase, each step within W
# of the previous step's FIRST qualifying event

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_W_US = 8 * 3600 * 1_000_000  # 8 h per step


def q_events_funnel_windowed(sf_dir: str) -> pd.DataFrame:
    """Classic ordered conversion funnel — per user: first 'view', then the
    first 'click' STRICTLY after it within W, then the first 'purchase'
    strictly after that within W; report users reaching each step. The
    correlated "first event after a per-user anchor" is the shape that
    needs per-user sequence locality: ONE user-hash bucket shuffle
    co-locates each user's events, then every step is a vectorized
    groupby-min per bucket (anchors broadcast back via index alignment —
    never a Python loop over users).

    Timestamps decide in exact epoch-microsecond integers (no float
    boundary); step windows anchor on the PREVIOUS step's time (not the
    funnel start), matching the product-analytics convention."""
    NB = 64

    def rows(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.is_in(et, value_set=pa.array(FUNNEL_STEPS))
        u = pc.filter(t["user_id"], keep).to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.filter(t["ts"], keep), pa.int64()).to_numpy()
        step = pc.index_in(
            pc.filter(et, keep), value_set=pa.array(FUNNEL_STEPS)
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(u % NB, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "step": pa.array(step, pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"step": pd.Series([], dtype="int64"),
                 "n_users": pd.Series([], dtype="int64")}
            )
        counts = np.zeros(len(FUNNEL_STEPS), np.int64)
        anchor = (
            g[g["step"] == 0].groupby("u")["t"].min()
        )  # first 'view' per user
        counts[0] = len(anchor)
        for s in range(1, len(FUNNEL_STEPS)):
            ev = g[g["step"] == s]
            lo = anchor.reindex(ev["u"]).to_numpy()
            t = ev["t"].to_numpy(np.int64)
            ok = ~np.isnan(lo) & (t > lo) & (t <= lo + FUNNEL_W_US)
            nxt = ev[ok].groupby("u")["t"].min()
            counts[s] = len(nxt)
            anchor = nxt
        return pd.DataFrame(
            {"step": np.arange(len(FUNNEL_STEPS), dtype=np.int64),
             "n_users": counts}
        )

    parts = (
        _read_events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("step", as_index=False)["n_users"].sum()
    out = pd.DataFrame(
        {"step_name": list(FUNNEL_STEPS),
         "step": np.arange(len(FUNNEL_STEPS), dtype=np.int64)}
    ).merge(agg, on="step", how="left")
    out["n_users"] = out["n_users"].fillna(0).astype("int64")
    return out[["step", "step_name", "n_users"]]


SQL_EVENTS_FUNNEL_WINDOWED = f"""
WITH a AS (
  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
b AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t1
  FROM events e JOIN a USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}'
    AND epoch_us(e.ts) > a.t0 AND epoch_us(e.ts) <= a.t0 + {FUNNEL_W_US}
  GROUP BY e.user_id),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN b USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}'
    AND epoch_us(e.ts) > b.t1 AND epoch_us(e.ts) <= b.t1 + {FUNNEL_W_US}
  GROUP BY e.user_id)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS step, '{FUNNEL_STEPS[0]}' AS step_name,
         (SELECT count(*) FROM a) AS n_users
  UNION ALL
  SELECT 1, '{FUNNEL_STEPS[1]}', (SELECT count(*) FROM b)
  UNION ALL
  SELECT 2, '{FUNNEL_STEPS[2]}', (SELECT count(*) FROM c)
) ORDER BY step
"""


# ---------------------------------------------------------------------------
# SCD2 reconstruction: collapse each user's consecutive same-state runs into
# validity intervals [valid_from, valid_to)


def q_events_scd_intervals(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension (type 2) reconstruction from an event
    stream: per user, consecutive runs of the same event_type (ordered by
    ts, event_id) collapse to one row with [valid_from, valid_to) in epoch
    microseconds — valid_to is the NEXT run's start, -1 for the open
    current run. The gaps-and-islands run-collapse, per-user-local, so ONE
    user-hash bucket shuffle + a vectorized per-bucket pass (lexsort +
    run-boundary diff; no per-user loop)."""
    NB = 64

    def rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(u % NB, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "t": pa.array(pc.cast(t["ts"], pa.int64()).to_numpy(), pa.int64()),
                "eid": t["event_id"],
                "et": t["event_type"],
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "user_id": "int64", "state": object,
            "valid_from": "int64", "valid_to": "int64", "n_events": "int64",
        }
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=d) for c, d in cols.items()}
            )
        order = np.lexsort(
            (g["eid"].to_numpy(np.int64), g["t"].to_numpy(np.int64),
             g["u"].to_numpy(np.int64))
        )
        u = g["u"].to_numpy(np.int64)[order]
        t = g["t"].to_numpy(np.int64)[order]
        et = g["et"].to_numpy(object)[order]
        n = len(u)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], n]
        run_u = u[starts]
        vfrom = t[starts]
        # next run's start within the same user, else -1 (open interval)
        vto = np.full(len(starts), -1, np.int64)
        same_user = run_u[1:] == run_u[:-1]
        vto[:-1][same_user] = vfrom[1:][same_user]
        return pd.DataFrame(
            {
                "user_id": run_u,
                "state": et[starts],
                "valid_from": vfrom,
                "valid_to": vto,
                "n_events": (ends - starts).astype(np.int64),
            }
        )

    out = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "valid_from"]).reset_index(drop=True)


SQL_EVENTS_SCD = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT *, CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY rn)
                      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM e),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY rn) AS grp FROM m),
r AS (
  SELECT user_id, grp, min(event_type) AS state, min(t) AS valid_from,
         count(*) AS n_events
  FROM g GROUP BY user_id, grp)
SELECT user_id, state, valid_from,
       coalesce(lead(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY valid_from), -1) AS valid_to,
       CAST(n_events AS BIGINT) AS n_events
FROM r ORDER BY user_id, valid_from
"""


# ---------------------------------------------------------------------------
# 3-way golden-record merge: field-wise majority vote across three derived
# snapshots (the snapshot_diff tagged-union merge, extended to N sides)

GOLDEN_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("k", pa.int64()),
        ("side", pa.int8()),
        ("cents", pa.int64()),
        ("st", pa.string()),
        ("day", pa.int64()),
    ]
)


def q_orders_golden_record(sf_dir: str) -> pd.DataFrame:
    """Golden-record conflict resolution — three independently-corrupted
    snapshots of the same table (deterministic per-key corruption rules)
    merge into one record per key by FIELD-WISE majority vote (2-of-3; the
    all-distinct fallback takes the minimum). The multi-source
    reconciliation an ingest runs when three crawls disagree. Same
    tagged-union bucket merge as ``q_orders_snapshot_diff`` (Ray's
    full_outer join breaks on empty hash partitions) with a 3-way
    vectorized pivot; only keys where ANY field had a disagreement are
    emitted (the golden-but-boring majority rows stay silent).

    Corruptions: side A bumps cents +100 on k%11==0; side B rewrites
    status to 'X' on k%13==0; side C bumps day +1 on k%17==0 AND cents
    +100 on k%23==0 — so cents flips majority when 11|k and 23|k."""
    NB = 64

    def snap(side: int):
        def rows(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy(zero_copy_only=False)
            cents = np.rint(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            day = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
            st = t["o_orderstatus"].to_numpy(zero_copy_only=False).astype(object)
            if side == 0:
                cents = cents + np.where(k % 11 == 0, 100, 0)
            elif side == 1:
                st = np.where(k % 13 == 0, "X", st)
            else:
                day = day + np.where(k % 17 == 0, 1, 0)
                cents = cents + np.where(k % 23 == 0, 100, 0)
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array(k % NB, pa.int64()),
                    "k": pa.array(k, pa.int64()),
                    "side": pa.array(np.full(len(k), side, np.int8)),
                    "cents": pa.array(cents, pa.int64()),
                    "st": pa.array(st, pa.string()),
                    "day": pa.array(day, pa.int64()),
                },
                schema=GOLDEN_SCHEMA,
            )

        return rows

    def _maj(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
        out = np.where(
            (a == b) | (a == c), a, np.where(b == c, b, np.minimum(np.minimum(a, b), c))
        )
        return out

    def _maj_obj(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
        mn = np.minimum(np.minimum(a, b), c)
        return np.where((a == b) | (a == c), a, np.where(b == c, b, mn))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "o_orderkey": "int64", "g_cents": "int64", "g_st": object,
            "g_day": "int64", "n_conflicts": "int64",
        }
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        p = g.pivot(index="k", columns="side", values=["cents", "st", "day"])
        c0, c1, c2 = (p[("cents", s)].to_numpy(np.int64) for s in (0, 1, 2))
        s0, s1, s2 = (p[("st", s)].to_numpy(object) for s in (0, 1, 2))
        d0, d1, d2 = (p[("day", s)].to_numpy(np.int64) for s in (0, 1, 2))
        gc = _maj(c0, c1, c2)
        gs = _maj_obj(s0, s1, s2)
        gd = _maj(d0, d1, d2)
        conf = (
            ((c0 != c1) | (c1 != c2)).astype(np.int64)
            + ((s0 != s1) | (s1 != s2)).astype(np.int64)
            + ((d0 != d1) | (d1 != d2)).astype(np.int64)
        )
        keep = conf > 0
        return pd.DataFrame(
            {
                "o_orderkey": p.index.to_numpy(np.int64)[keep],
                "g_cents": gc[keep],
                "g_st": gs[keep],
                "g_day": gd[keep],
                "n_conflicts": conf[keep],
            }
        )

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"]
    sides = [
        rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=cols)
        .map_batches(snap(s), batch_format="pyarrow")
        for s in range(3)
    ]
    out = (
        sides[0]
        .union(sides[1], sides[2])
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "g_cents": pd.Series([], dtype="int64"),
                "g_st": pd.Series([], dtype=object),
                "g_day": pd.Series([], dtype="int64"),
                "n_conflicts": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_ORDERS_GOLDEN_RECORD = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus AS st,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day
  FROM orders),
a AS (SELECT k, cents + CASE WHEN k % 11 = 0 THEN 100 ELSE 0 END AS cents,
             st, day FROM base),
b AS (SELECT k, cents, CASE WHEN k % 13 = 0 THEN 'X' ELSE st END AS st,
             day FROM base),
c AS (SELECT k, cents + CASE WHEN k % 23 = 0 THEN 100 ELSE 0 END AS cents,
             st, day + CASE WHEN k % 17 = 0 THEN 1 ELSE 0 END AS day
      FROM base),
j AS (
  SELECT a.k, a.cents AS c0, b.cents AS c1, c.cents AS c2,
         a.st AS s0, b.st AS s1, c.st AS s2,
         a.day AS d0, b.day AS d1, c.day AS d2
  FROM a JOIN b ON a.k = b.k JOIN c ON a.k = c.k)
SELECT k AS o_orderkey,
       CASE WHEN c0 = c1 OR c0 = c2 THEN c0 WHEN c1 = c2 THEN c1
            ELSE least(c0, c1, c2) END AS g_cents,
       CASE WHEN s0 = s1 OR s0 = s2 THEN s0 WHEN s1 = s2 THEN s1
            ELSE least(s0, s1, s2) END AS g_st,
       CASE WHEN d0 = d1 OR d0 = d2 THEN d0 WHEN d1 = d2 THEN d1
            ELSE least(d0, d1, d2) END AS g_day,
       CAST((CASE WHEN c0 <> c1 OR c1 <> c2 THEN 1 ELSE 0 END)
          + (CASE WHEN s0 <> s1 OR s1 <> s2 THEN 1 ELSE 0 END)
          + (CASE WHEN d0 <> d1 OR d1 <> d2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conflicts
FROM j
WHERE c0 <> c1 OR c1 <> c2 OR s0 <> s1 OR s1 <> s2 OR d0 <> d1 OR d1 <> d2
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# incremental view maintenance: base aggregate + CDC delta partials ==
# full recompute (the oracle PROVES the incremental merge)

IVM_INS_MOD = 101  # keys k%101==0 arrive as inserts (absent from base)
IVM_UPD_MOD = 31   # keys k%31==0 get a +100-cents update after base load


def q_orders_view_maintenance(sf_dir: str) -> pd.DataFrame:
    """Incremental materialized-view maintenance — the per-month
    (count, sum) view is built from a BASE snapshot plus a CDC delta
    stream, never rescanning base: base rows (k%101 != 0, original price)
    aggregate once; the delta contributes insert partials (k%101 == 0
    rows at their current price) and update partials (+100 cents on base
    keys with k%31 == 0, a delete+insert that nets to a pure delta). The
    oracle recomputes the view from the CURRENT table — equality proves
    delta-merge == recompute, the IVM contract. Both passes are plain
    map_batches partial aggregations; the month-domain fold is
    metadata-sized."""

    def base_partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = (k % IVM_INS_MOD) != 0
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)[keep]
        m = _month_idx(t["o_orderdate"])[keep]
        df = pd.DataFrame({"m": m, "n": 1, "c": cents})
        return df.groupby("m", as_index=False).agg(n=("n", "sum"), c=("c", "sum"))

    def delta_partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        m = _month_idx(t["o_orderdate"])
        ins = (k % IVM_INS_MOD) == 0
        upd = ~ins & ((k % IVM_UPD_MOD) == 0)
        # inserts land at their CURRENT price (incl. the update when 31|k)
        ins_c = cents[ins] + np.where(k[ins] % IVM_UPD_MOD == 0, 100, 0)
        frames = [
            pd.DataFrame({"m": m[ins], "n": 1, "c": ins_c}),
            pd.DataFrame(
                {"m": m[upd], "n": 0, "c": np.full(int(upd.sum()), 100, np.int64)}
            ),
        ]
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("m", as_index=False).agg(n=("n", "sum"), c=("c", "sum"))

    cols = ["o_orderkey", "o_totalprice", "o_orderdate"]
    base = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=cols
    ).map_batches(base_partial, batch_format="pyarrow")
    delta = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=cols
    ).map_batches(delta_partial, batch_format="pyarrow")
    parts = base.union(delta).to_pandas()
    agg = parts.groupby("m", as_index=False).agg(
        n_orders=("n", "sum"), sum_cents=("c", "sum")
    ).sort_values("m")
    return pd.DataFrame(
        {
            "month": [f"{m // 12:04d}-{m % 12 + 1:02d}" for m in agg["m"]],
            "n_orders": agg["n_orders"].to_numpy(np.int64),
            "sum_cents": agg["sum_cents"].to_numpy(np.int64),
        }
    )


SQL_ORDERS_VIEW_MAINTENANCE = f"""
WITH cur AS (
  SELECT printf('%04d-%02d',
                CAST(date_part('year', o_orderdate) AS BIGINT),
                CAST(date_part('month', o_orderdate) AS BIGINT)) AS month,
         CAST(round(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % {IVM_UPD_MOD} = 0 THEN 100 ELSE 0 END AS cents
  FROM orders)
SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM cur GROUP BY month ORDER BY month
"""


# ---------------------------------------------------------------------------
# sequence-pattern match over per-user event streams (MATCH_RECOGNIZE class)

PATTERN_RE = "s[cv]{2,}p"  # signup, >=2 clicks/views, purchase — no errors between
_TYPE_INITIAL = {"click": "c", "error": "e", "purchase": "p",
                 "signup": "s", "view": "v"}


def q_events_pattern_match(sf_dir: str) -> pd.DataFrame:
    """Event-sequence pattern matching (SQL MATCH_RECOGNIZE's core): per
    user, the full (ts, event_id)-ordered event-type sequence collapses to
    an initial-letter string; users whose string contains the regex
    pattern are reported. Pattern semantics live in RE2-compatible syntax
    so DuckDB's regexp_matches and Python's re agree. ONE user-hash bucket
    shuffle co-locates each user's events; the per-bucket pass is a
    lexsort + pandas grouped string concat + one vectorized str.contains —
    no Python loop over users."""
    NB = 64

    def rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ini = pc.index_in(
            t["event_type"], value_set=pa.array(sorted(_TYPE_INITIAL))
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(u % NB, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "t": pa.array(pc.cast(t["ts"], pa.int64()).to_numpy(), pa.int64()),
                "eid": t["event_id"],
                "ini": pa.array(ini, pa.int64()),
            }
        )

    initials = np.array(
        [_TYPE_INITIAL[k] for k in sorted(_TYPE_INITIAL)], dtype=object
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
        order = np.lexsort(
            (g["eid"].to_numpy(np.int64), g["t"].to_numpy(np.int64),
             g["u"].to_numpy(np.int64))
        )
        u = g["u"].to_numpy(np.int64)[order]
        ch = initials[g["ini"].to_numpy(np.int64)[order]]
        df = pd.DataFrame({"u": u, "ch": ch})
        seq = df.groupby("u")["ch"].agg("".join)
        hit = seq[seq.str.contains(PATTERN_RE, regex=True)]
        return pd.DataFrame({"user_id": hit.index.to_numpy(np.int64)})

    out = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
    return out.sort_values("user_id").reset_index(drop=True)


SQL_EVENTS_PATTERN_MATCH = f"""
WITH s AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
                      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                      WHEN 'view' THEN 'v' END, ''
                    ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id)
SELECT user_id FROM s WHERE regexp_matches(seq, '{PATTERN_RE}')
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# per-dimension embedding feature stats (exact quantized moments)

DIMSTATS_QSCALE = 1048576.0  # 2^20: exact float32→int, same as the kNN eval


def q_embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension feature profile of the embedding column — the
    feature-quality audit run before training a probe: count, exact sum /
    sum-of-squares of the 2^20-quantized values, and mean/variance derived
    by a PINNED float64 op sequence both engines share (the
    embedding_knn_eval exactness pattern: integers decide, floats only
    decorate). Per-batch work is one matrix fold (d-length partials);
    the driver merges #batches × d rows."""

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t["embedding"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(arr), -1).astype(np.float64)
        q = np.floor(mat * DIMSTATS_QSCALE).astype(np.int64)
        return pd.DataFrame(
            {
                "dim": np.arange(q.shape[1], dtype=np.int64),
                "n": np.full(q.shape[1], q.shape[0], np.int64),
                "s": q.sum(axis=0),
                "ss": (q * q).sum(axis=0),
            }
        )

    parts = (
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    agg = parts.groupby("dim", as_index=False)[["n", "s", "ss"]].sum()
    n64 = agg["n"].to_numpy(np.int64).astype(np.float64)
    s64 = agg["s"].to_numpy(np.int64).astype(np.float64)
    ss64 = agg["ss"].to_numpy(np.int64).astype(np.float64)
    mean = s64 / n64
    var = (ss64 - (s64 * s64) / n64) / n64  # pinned op order, see SQL
    return pd.DataFrame(
        {
            "dim": agg["dim"].to_numpy(np.int64),
            "n": agg["n"].to_numpy(np.int64),
            "sum_q": agg["s"].to_numpy(np.int64),
            "sumsq_q": agg["ss"].to_numpy(np.int64),
            "mean_q": np.round(mean, 6),
            "var_q": np.round(var, 6),
        }
    ).sort_values("dim").reset_index(drop=True)


def q_embedding_pca(sf_dir: str, batch_size: int = 2048) -> pd.DataFrame:
    """PCA spectrum of the embedding table from an EXACT mergeable Gram
    sketch — the dimensionality audit run before projecting features:
    per batch one d×d integer Gram fold over the 2^20-quantized vectors
    (order-independent: integer addition commutes, so the distributed
    merge is exact, not approximately associative float), the driver sums
    #batches matrices, centers with the exact integer means
    (n·G − s·sᵀ, python-object ints past int64 bounds), and ONE d×d
    float64 eigendecomposition on the metadata-sized result. Emitted per
    component: eigenvalue of the scaled covariance and explained-variance
    ratio (6dp), anchored by the exact integer trace. Oracle: the
    sequential direct formulation (one numpy matmul over all rows —
    ``oracle_analysis.persist_expected_embedding_pca``); the integer
    sketch guarantees both sides present the IDENTICAL matrix to the
    same eigensolver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t["embedding"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(arr), -1).astype(np.float64)
        q = np.floor(mat * DIMSTATS_QSCALE).astype(np.int64)
        g = q.T @ q  # d×d int64 — exact (|q|<2^21 ⇒ n·q² < 2^63 to ~2^20 rows/batch)
        return pd.DataFrame(
            {
                "n": pd.Series([q.shape[0]], dtype="int64"),
                "maxq": pd.Series([int(np.abs(q).max())], dtype="int64"),
                "s_blob": pd.Series([q.sum(axis=0).tobytes()], dtype=object),
                "g_blob": pd.Series([np.ascontiguousarray(g).tobytes()], dtype=object),
            }
        )

    parts = (
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
    )
    n = int(parts["n"].sum())
    maxq = int(parts["maxq"].max())
    gs = [np.frombuffer(b, np.int64) for b in parts["g_blob"]]
    d = int(np.sqrt(len(gs[0])))
    # loud overflow guard (the twap pattern): every partial Gram entry is
    # bounded by batch_rows·maxq², and the driver fold by n·maxq²
    if n * maxq * maxq >= 2**63:
        raise OverflowError(
            "embedding_pca: integer Gram bound exceeds int64 "
            f"(n={n}, max|q|={maxq}); shard the fold or drop the quant scale"
        )
    gram = np.sum(gs, axis=0).reshape(d, d)
    svec = np.sum([np.frombuffer(b, np.int64) for b in parts["s_blob"]], axis=0)
    # centered scatter n·G − s·sᵀ in python ints (s·sᵀ can pass int64),
    # then ONE scale to float64: cov = scatter / (n² · QSCALE²)
    gi = gram.astype(object)
    si = svec.astype(object)
    scatter = gi * n - si[:, None] * si[None, :]
    cov = (scatter / (float(n) * n * DIMSTATS_QSCALE * DIMSTATS_QSCALE)).astype(
        np.float64
    )
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    tot = float(evals.sum())
    return pd.DataFrame(
        {
            "comp": np.arange(d, dtype=np.int64),
            "eigval": np.round(evals, 9),
            "evr": np.round(evals / tot, 6),
            "trace_scatter": pd.Series([str(int(scatter.trace()))] * d, dtype=object),
        }
    )


SQL_EMBEDDING_DIM_STATS = f"""
WITH x AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {DIMSTATS_QSCALE})
              AS BIGINT) AS q
  FROM embeddings),
a AS (
  SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS sum_q,
         CAST(sum(q * q) AS BIGINT) AS sumsq_q
  FROM x GROUP BY dim)
SELECT dim, n, sum_q, sumsq_q,
       round(CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_q,
       round((CAST(sumsq_q AS DOUBLE)
              - (CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE))
                / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS var_q
FROM a ORDER BY dim
"""


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering layout: multidimensional sort + per-file
# min/max pruning statistics — the lakehouse data-layout operator

ZORD_FILE_ROWS = 256
ZORD_PRICE_STEP = 200_000  # cents per price bucket (<=255 after clamp)
ZORD_DAY_STEP = 10         # days per day bucket


def _morton16(pb: np.ndarray, db: np.ndarray) -> np.ndarray:
    """Interleave two 8-bit bucket ids (price on odd bits) → 16-bit Morton
    code. Same closed-form shift/mask sum the generated SQL uses."""
    z = np.zeros(len(pb), np.int64)
    for i in range(8):
        z |= ((pb >> i) & 1) << (2 * i + 1)
        z |= ((db >> i) & 1) << (2 * i)
    return z


def _morton16_sql(pb: str, db: str) -> str:
    terms = []
    for i in range(8):
        terms.append(f"((({pb} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({db} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def q_orders_zorder_layout(sf_dir: str) -> pd.DataFrame:
    """Z-order clustering layout — the Delta/Iceberg OPTIMIZE ZORDER shape:
    bucket two dimensions (price cents, days since the table's min date),
    interleave the bucket bits into a Morton code, sort by it, cut into
    fixed-size files, and report each file's per-dimension min/max — the
    statistics a reader prunes on. Good layouts show tight boxes on BOTH
    dimensions; the oracle reproduces the exact same file cuts via a
    window row_number over the identical integer code.

    Dataflow: one tiny min-date aggregate (two-pass, both distributed),
    one (z, key) sort, global file ids via the prefix-sum scan machinery
    (FULL first-row sort key as batch key), per-batch partial min/max per
    file merged in a metadata-sized fold."""

    def code(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        day = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
        return pa.Table.from_pydict(
            {
                "k": pa.array(k, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "day": pa.array(day, pa.int64()),
            }
        )

    base = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    ).map_batches(code, batch_format="pyarrow")
    day_min = int(base.min("day"))

    def zrow(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        pb = np.minimum(cents // ZORD_PRICE_STEP, 255)
        db = np.minimum((day - day_min) // ZORD_DAY_STEP, 255)
        return pa.Table.from_pydict(
            {
                "k": t["k"],
                "pb": pa.array(pb, pa.int64()),
                "db": pa.array(db, pa.int64()),
                "z": pa.array(_morton16(pb, db), pa.int64()),
            }
        )

    def scan_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = t["z"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "pb": t["pb"],
                "db": t["db"],
                "local_pos": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "bk1": pa.array(np.full(n, z[0] if n else 0, np.int64)),
                "bk2": pa.array(np.full(n, k[0] if n else 0, np.int64)),
            }
        )

    rows = (
        base.map_batches(zrow, batch_format="pyarrow")
        .sort(["z", "k"])
        .map_batches(scan_batch, batch_format="pyarrow")
        .materialize()
    )

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("bk1", "bk2", "total")}
            )
        s = df.groupby(["bk1", "bk2"], as_index=False)["local_pos"].max()
        return s.rename(columns={"local_pos": "total"}).astype("int64")

    summary = (
        rows.map_batches(summarize, batch_format="pandas", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["bk1", "bk2"])
        .reset_index(drop=True)
    )
    offs = summary["total"].cumsum().shift(fill_value=0)
    offsets = {
        (int(a), int(b)): int(o)
        for a, b, o in zip(summary["bk1"], summary["bk2"], offs)
    }

    def filestats(t: pa.Table) -> pd.DataFrame:
        bk1 = t["bk1"].to_numpy(zero_copy_only=False)
        bk2 = t["bk2"].to_numpy(zero_copy_only=False)
        off = np.fromiter(
            (offsets[(int(a), int(b))] for a, b in zip(bk1, bk2)),
            dtype=np.int64,
            count=len(bk1),
        )
        rn = off + t["local_pos"].to_numpy(zero_copy_only=False)
        fid = (rn - 1) // ZORD_FILE_ROWS
        df = pd.DataFrame(
            {
                "file_id": fid,
                "pb": t["pb"].to_numpy(zero_copy_only=False),
                "db": t["db"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("file_id", as_index=False).agg(
            n_rows=("pb", "size"),
            pb_min=("pb", "min"), pb_max=("pb", "max"),
            db_min=("db", "min"), db_max=("db", "max"),
        )

    parts = rows.map_batches(filestats, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("file_id", as_index=False).agg(
        n_rows=("n_rows", "sum"),
        pb_min=("pb_min", "min"), pb_max=("pb_max", "max"),
        db_min=("db_min", "min"), db_max=("db_max", "max"),
    )
    return (
        agg.sort_values("file_id").reset_index(drop=True).astype("int64")
    )


def _sql_orders_zorder() -> str:
    z = _morton16_sql("pb", "db")
    return f"""
WITH b AS (
  SELECT o_orderkey AS k,
         least(CAST(round(o_totalprice * 100) AS BIGINT) // {ZORD_PRICE_STEP},
               255) AS pb,
         least((CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
                - (SELECT min(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT))
                   FROM orders)) // {ZORD_DAY_STEP}, 255) AS db
  FROM orders),
r AS (
  SELECT pb, db, k, {z} AS z FROM b),
f AS (
  SELECT pb, db,
         (row_number() OVER (ORDER BY z, k) - 1) // {ZORD_FILE_ROWS} AS file_id
  FROM r)
SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       min(pb) AS pb_min, max(pb) AS pb_max,
       min(db) AS db_min, max(db) AS db_max
FROM f GROUP BY file_id ORDER BY file_id
"""


SQL_ORDERS_ZORDER = _sql_orders_zorder()


# ---------------------------------------------------------------------------
# non-linear running scan: clamped running balance via the min-scan identity

CLAMP_POS = "purchase"  # +cents
CLAMP_NEG = "error"     # -cents


def q_events_running_clamp(sf_dir: str) -> pd.DataFrame:
    """Clamped running balance — the inventory/credit shape
    ``b_n = max(0, b_{n-1} + d_n)`` that naive SQL cannot express without
    recursion: purchases add value cents, errors subtract, balance floors
    at zero. Solved CLOSED-FORM by the min-scan identity
    ``b_n = S_n - min(0, min_{j<=n} S_j)`` (S = plain running sum), which
    turns the non-linear recurrence into two vectorized prefix scans —
    pandas grouped cumsum + cummin per user-hash bucket on the engine
    side, two window functions in the oracle. Exact integer cents."""
    NB = 64

    def rows(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.is_in(et, value_set=pa.array([CLAMP_POS, CLAMP_NEG]))
        u = pc.filter(t["user_id"], keep).to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.filter(t["ts"], keep), pa.int64()).to_numpy()
        eid = pc.filter(t["event_id"], keep).to_numpy(zero_copy_only=False)
        val = pc.filter(t["value"], keep).to_numpy(zero_copy_only=False)
        cents = np.rint(val * 100).astype(np.int64)
        sign = np.where(
            pc.filter(et, keep).to_numpy(zero_copy_only=False) == CLAMP_POS, 1, -1
        )
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(u % NB, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "eid": pa.array(eid, pa.int64()),
                "d": pa.array(cents * sign, pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("event_id", "user_id", "balance_cents")}
            )
        order = np.lexsort(
            (g["eid"].to_numpy(np.int64), g["t"].to_numpy(np.int64),
             g["u"].to_numpy(np.int64))
        )
        g = g.iloc[order]
        s = g.groupby("u")["d"].cumsum()
        runmin = s.groupby(g["u"]).cummin()
        bal = s.to_numpy(np.int64) - np.minimum(0, runmin.to_numpy(np.int64))
        return pd.DataFrame(
            {
                "event_id": g["eid"].to_numpy(np.int64),
                "user_id": g["u"].to_numpy(np.int64),
                "balance_cents": bal,
            }
        )

    out = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENTS_RUNNING_CLAMP = f"""
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT)
           * CASE WHEN event_type = '{CLAMP_POS}' THEN 1 ELSE -1 END AS d
  FROM events WHERE event_type IN ('{CLAMP_POS}', '{CLAMP_NEG}')),
s1 AS (
  SELECT event_id, user_id, ts,
         sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS run_sum
  FROM e),
s2 AS (
  SELECT event_id, user_id, run_sum,
         min(run_sum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_min
  FROM s1)
SELECT event_id, user_id,
       CAST(run_sum - least(0, run_min) AS BIGINT) AS balance_cents
FROM s2 ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# robust dispersion: exact median absolute deviation (two selection passes)


def q_events_value_mad(sf_dir: str) -> pd.DataFrame:
    """EXACT median absolute deviation of event values — two chained
    distributed selections (`tpch.exact_kth`, iterative histogram
    refinement): median of cents, then median of |cents − median|. The
    deviation stream is derived by one vectorized map over the SAME
    materialized cents dataset (no re-read of the source). Every decided
    quantity is an int64 order statistic, so the result is engine-exact at
    any scale; ~4-8 constant-partial executions total, no sort, no
    shuffle."""
    from .tpch import cents_span, exact_kth

    ev = _read_events(sf_dir, ["value"])

    def cents_col(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"cents": pa.array(np.floor(v * 100.0).astype(np.int64), pa.int64())}
        )

    cents = ev.map_batches(cents_col, batch_format="pyarrow").materialize()
    n, lo, hi = cents_span(cents)
    k = (n + 1) // 2  # 1-based rank of quantile_disc(0.5)
    med = exact_kth(cents, k, lo, hi)

    def dev_col(t: pa.Table, med=med) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"cents": pa.array(np.abs(c - med), pa.int64())}
        )

    dev = cents.map_batches(dev_col, batch_format="pyarrow").materialize()
    _, dlo, dhi = cents_span(dev)
    mad = exact_kth(dev, k, dlo, dhi)
    return pd.DataFrame(
        {
            "n": pd.Series([n], dtype="int64"),
            "median_cents": pd.Series([med], dtype="int64"),
            "mad_cents": pd.Series([mad], dtype="int64"),
        }
    )


SQL_EVENTS_VALUE_MAD = """
WITH c AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
m AS (SELECT quantile_disc(cents, 0.5) AS med,
             CAST(count(*) AS BIGINT) AS n FROM c)
SELECT m.n AS n,
       CAST(m.med AS BIGINT) AS median_cents,
       CAST(quantile_disc(abs(c.cents - m.med), 0.5) AS BIGINT) AS mad_cents
FROM c, m GROUP BY m.n, m.med
"""


# ---------------------------------------------------------------------------
# ROC-AUC: exact integer Mann-Whitney rank statistic


AUC_POS_TYPE = "purchase"


def q_events_auc(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Exact ROC-AUC of `value` as a score for the binary label
    `event_type == 'purchase'` — the Mann-Whitney U statistic with full tie
    handling, kept in INTEGER arithmetic end-to-end (the r04 lesson: a
    DECIDED quantity must never be a cross-engine float). Emits
    u2 = 2·U = 2·(# neg<pos pairs) + (# tied pos-neg pairs) as BIGINT; the
    float AUC = u2 / (2·p·n) is the single division both engines perform
    identically.

    Dataflow: one global (cents, event_id) sort, then every batch emits ONE
    summary row — its within-batch pair contributions (vectorized run-length
    arithmetic) plus its edge-value tallies. Cross-batch strict pairs fold
    from a #batches-row prefix scan; tie groups that straddle batch
    boundaries are reconstructed exactly from the edge tallies (a value
    spanning two batches is necessarily the last value of one and the first
    of the next, so edge tallies see every batch that holds it). The
    documented edge-fixup rule applies: the batch key is the FULL first-row
    sort tuple (cents, event_id), and the merge tolerates block coalescing/
    splitting because it only ever combines adjacent same-value tallies."""
    ev = _read_events(sf_dir, ["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        pos = pc.equal(t["event_type"], AUC_POS_TYPE)
        return pa.Table.from_pydict(
            {
                "cents": pa.array(np.floor(v * 100.0).astype(np.int64), pa.int64()),
                "event_id": t["event_id"],
                "pos": pa.array(pos.to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cents"].to_numpy()
        p = df["pos"].to_numpy()
        # value runs (c is sorted within the batch)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        pos_v = np.add.reduceat(p, starts)
        cnt_v = np.diff(np.append(starts, len(c)))
        neg_v = cnt_v - pos_v
        cum_neg_below = np.concatenate(([0], np.cumsum(neg_v)[:-1]))
        local2u = int((2 * cum_neg_below * pos_v + pos_v * neg_v).sum())
        return pd.DataFrame(
            {
                "bkey_cents": [int(c[0])],
                "bkey_id": [int(df["event_id"].iloc[0])],
                "n_pos": [int(p.sum())],
                "n_neg": [int(len(p) - p.sum())],
                "local2u": [local2u],
                "fv": [int(c[0])],
                "fv_pos": [int(pos_v[0])],
                "fv_neg": [int(neg_v[0])],
                "lv": [int(c[-1])],
                "lv_pos": [int(pos_v[-1])],
                "lv_neg": [int(neg_v[-1])],
            }
        )

    s = (
        ev.map_batches(prep, batch_format="pyarrow")
        .sort(["cents", "event_id"])
        .map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .to_pandas()
        .sort_values(["bkey_cents", "bkey_id"], kind="stable")
        .reset_index(drop=True)
    )
    p_tot = int(s["n_pos"].sum())
    n_tot = int(s["n_neg"].sum())
    # cross-batch: every (neg in earlier batch, pos in later batch) pair
    # counted as strict (2) — same-value cross pairs corrected below
    prefix_neg = np.concatenate(([0], np.cumsum(s["n_neg"].to_numpy())[:-1]))
    total2u = int(s["local2u"].sum()) + int(2 * (prefix_neg * s["n_pos"].to_numpy()).sum())
    # straddling tie groups: per batch, per edge value v → (p_b(v), n_b(v));
    # a batch whose rows are all one value contributes a single tally
    recs: dict[int, list[tuple[int, int]]] = {}
    for r in s.itertuples(index=False):
        if r.fv == r.lv:
            recs.setdefault(r.fv, []).append((r.fv_pos, r.fv_neg))
        else:
            recs.setdefault(r.fv, []).append((r.fv_pos, r.fv_neg))
            recs.setdefault(r.lv, []).append((r.lv_pos, r.lv_neg))
    for v, tallies in recs.items():
        if len(tallies) < 2:
            continue  # value confined to one batch: handled locally
        P = sum(t[0] for t in tallies)
        N = sum(t[1] for t in tallies)
        within = sum(t[0] * t[1] for t in tallies)
        counted = 0
        cum_n = 0
        for tp, tn in tallies:  # batch order == value order (sorted merge)
            counted += cum_n * tp
            cum_n += tn
        # desired: every cross-batch tied pair contributes 1; the strict
        # cross term above gave 2 per (neg-earlier, pos-later) pair and 0
        # per (pos-earlier, neg-later) pair
        total2u += (P * N - within) - 2 * counted
    auc = total2u / (2 * p_tot * n_tot) if p_tot and n_tot else 0.0
    return pd.DataFrame(
        {
            "n_pos": pd.Series([p_tot], dtype="int64"),
            "n_neg": pd.Series([n_tot], dtype="int64"),
            "u2": pd.Series([total2u], dtype="int64"),
            "auc": pd.Series([auc], dtype="float64"),
        }
    )


SQL_EVENTS_AUC = f"""
WITH s AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = '{AUC_POS_TYPE}' THEN 1 ELSE 0 END AS pos
  FROM events),
r AS (
  SELECT pos,
         RANK() OVER (ORDER BY cents) AS rk,
         COUNT(*) OVER (PARTITION BY cents) AS tc
  FROM s),
t AS (
  SELECT CAST(count(*) FILTER (pos = 1) AS BIGINT) AS n_pos,
         CAST(count(*) FILTER (pos = 0) AS BIGINT) AS n_neg,
         CAST(sum(2 * rk + tc - 1) FILTER (pos = 1) AS BIGINT) AS rank2_pos
  FROM r)
SELECT n_pos, n_neg,
       CAST(rank2_pos - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CAST(rank2_pos - n_pos * (n_pos + 1) AS DOUBLE)
         / (2 * n_pos * n_neg) AS auc
FROM t
"""


# ---------------------------------------------------------------------------
# time-weighted average (integral of the per-user value step function)


def q_events_twap(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Per-user TIME-WEIGHTED average value — the irregular-time-series
    integral Σ cᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first), exact in int64
    (cents × µs; numerator ≤ max_cents · user_span_µs per user). One
    (user, ts, event_id) sort; consecutive-pair contributions are
    vectorized within batches, and the ONLY cross-batch information is
    each batch's first/last row — consecutive rows split by a block seam
    are reconstructed by merging adjacent edge rows in full-sort-key
    order (the documented edge-fixup rule; tolerant of coalescing and
    splitting because every split row-pair lives on exactly one seam).
    Per-user partial sums shuffle to stable user-hash buckets (a user is
    whole within its bucket — no per-user groupby at driver or engine
    key-cardinality cost); the driver merges #batches edge rows plus
    NB bucket outputs. The float twap is the single terminal division."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        c = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        same = u[1:] == u[:-1]
        contrib = np.where(same, c[:-1] * (t[1:] - t[:-1]), 0)
        # per-user within-batch partials (batch-local pandas groupby —
        # bounded by the batch's own user count, not global cardinality)
        g = pd.DataFrame(
            {"user_id": u, "num": np.concatenate((contrib, [0])), "t": t, "cabs": np.abs(c)}
        ).groupby("user_id", sort=False)
        part = g.agg(
            num=("num", "sum"),
            tmin=("t", "min"),
            tmax=("t", "max"),
            n=("t", "size"),
            cmax=("cabs", "max"),
        ).reset_index()
        part["kind"] = "part"
        eid = df["event_id"].to_numpy()
        edge = pd.DataFrame(
            {
                "user_id": [int(u[0])],
                "num": [0],
                "tmin": [int(t[0])],
                "tmax": [int(t[-1])],
                "n": [0],
                "cmax": [0],
                "kind": ["edge"],
                "last_user": [int(u[-1])],
                "last_t": [int(t[-1])],
                "last_c": [int(c[-1])],
                "bkey_ts": [int(t[0])],
                "bkey_id": [int(eid[0])],
            }
        )
        part["last_user"] = 0
        part["last_t"] = 0
        part["last_c"] = 0
        part["bkey_ts"] = 0
        part["bkey_id"] = 0
        return pd.concat([part, edge], ignore_index=True)

    rows = (
        _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .materialize()  # two consumers (partials + edges): execute once
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", sort=False).agg(
            num=("num", "sum"),
            tmin=("tmin", "min"),
            tmax=("tmax", "max"),
            n=("n", "sum"),
            cmax=("cmax", "max"),
        )
        return s.reset_index()

    parts = (
        rows.map_batches(
            lambda df: df[df["kind"] == "part"].assign(
                bucket=lambda d: (
                    _splitmix64(d["user_id"].to_numpy()) % np.uint64(NDIST_NB)
                ).astype(np.int64)
            ),
            batch_format="pandas",
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    per_user = parts.groupby("user_id").agg(
        num=("num", "sum"),
        tmin=("tmin", "min"),
        tmax=("tmax", "max"),
        n=("n", "sum"),
        cmax=("cmax", "max"),
    )
    # loud overflow guard (silent int64 wrap would drift vs the oracle's
    # HUGEINT-sums-then-BIGINT-cast-errors behavior): every intermediate
    # partial sum of a user's numerator is bounded by Σ|cᵢ|·Δtᵢ ≤
    # max|c| · (tmax − tmin), so this bound certifies the whole fold
    bad = per_user[
        per_user["cmax"].astype(object) * (per_user["tmax"] - per_user["tmin"]).astype(object)
        >= 2**63
    ]
    if len(bad):
        raise OverflowError(
            "events_twap: int64 numerator bound exceeded for users "
            f"{bad.index.tolist()[:5]} (max_cents × span_µs ≥ 2^63); "
            "re-run with a coarser time unit or a python-int fold"
        )

    edges = (
        rows.map_batches(lambda df: df[df["kind"] == "edge"], batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "bkey_ts", "bkey_id"], kind="stable")
        .reset_index(drop=True)
    )
    # seam contributions: consecutive batches in sort order whose last/first
    # rows share a user (each split consecutive-row pair lives on one seam)
    for i in range(len(edges) - 1):
        lu = int(edges["last_user"].iloc[i])
        if lu == int(edges["user_id"].iloc[i + 1]):
            dt = int(edges["bkey_ts"].iloc[i + 1]) - int(edges["last_t"].iloc[i])
            per_user.loc[lu, "num"] += int(edges["last_c"].iloc[i]) * dt

    out = per_user.reset_index()
    out = out[out["n"] >= 2]
    out["twap_den"] = out["tmax"] - out["tmin"]
    out = out[out["twap_den"] > 0]
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype("int64").to_numpy(),
            "twap_num": out["num"].astype("int64").to_numpy(),
            "twap_den": out["twap_den"].astype("int64").to_numpy(),
            "twap_cents": (out["num"].to_numpy() / out["twap_den"].to_numpy()).astype(
                "float64"
            ),
        }
    ).sort_values("user_id").reset_index(drop=True)


SQL_EVENTS_TWAP = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(floor(value * 100) AS BIGINT) AS c, event_id
  FROM events),
p AS (
  SELECT user_id, c, t,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS t2
  FROM e),
a AS (
  SELECT user_id,
         CAST(sum(c * (t2 - t)) AS BIGINT) AS twap_num,
         CAST(max(t) - min(t) AS BIGINT) AS twap_den,
         count(*) AS n
  FROM p GROUP BY 1)
SELECT user_id, twap_num, twap_den,
       CAST(twap_num AS DOUBLE) / twap_den AS twap_cents
FROM a WHERE n >= 2 AND twap_den > 0 ORDER BY user_id
"""
