"""Distributed graph analytics over edge Datasets (engine additions beyond
the reference's operator set — the iterative-propagation class, like the
contracting connected components in ``pipelines/curation.py``).

``pagerank``: weighted PageRank with uniform dangling-mass redistribution,
expressed as K bucket-grouped relaxation rounds lazily chained into ONE
streaming execution (the CC dataflow generalized from min-fold to weighted
sum-fold):

  - state rows live in ``node % NUM_BUCKETS`` buckets: the node roster
    (rank + out-weight), the out-edges of nodes in this bucket, the in-mass
    messages addressed to nodes in this bucket, and the dangling-mass
    partials every bucket replicates to every bucket (NB² scalar rows per
    round — metadata-sized).
  - each round folds incoming mass → new ranks → emits next round's
    messages, entirely inside one ``groupby(bucket).map_groups`` pass; no
    rank vector, adjacency, or mass total ever materializes on the driver.
  - at web scale the seeding ``map_batches`` runs over an edge Dataset of
    any size; the per-round shuffle moves O(E) message rows hashed NB ways
    (reference scope: the KG built by ``KG.py`` is a terminal artifact; PR
    over it is an engine addition per the training-data brief).

Determinism: ranks are float64; distributed partial-sum order differs from
the sequential oracle's only at ~1e-15, and both sides round to
``PR_ROUND`` decimals (margin ≥ 1e8×) before the driver hash compare.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .neardup import NUM_BUCKETS

DAMPING = 0.85
# PR_ITERATIONS is a SPEC constant, not a convergence budget: the sequential
# oracle (oracle_triplets.sequential_pagerank) runs the identical 10 power
# iterations, so "N rounds of PageRank" is the operator's exact semantics —
# unlike CC / k-core, where fixed rounds approximate a fixpoint and the
# engine carries sentinel-based non-convergence detection.
PR_ITERATIONS = 10
PR_ROUND = 6

# state row kinds
_K_NODE = 0  # roster: node, w=out-weight, val=rank
_K_EDGE = 1  # out-edge: node=src, dst, w=weight (lives in src's bucket)
_K_MSG = 2  # in-mass message: node=dst, val=mass
_K_DANG = 3  # dangling-mass partial: val (replicated to every bucket)

_COLS = ("bucket", "node", "dst", "kind", "w", "val")


def _pr_frame(
    bucket: np.ndarray, node: np.ndarray, dst: np.ndarray, kind: int,
    w: np.ndarray, val: np.ndarray,
) -> pd.DataFrame:
    n = len(node)
    return pd.DataFrame(
        {
            "bucket": bucket.astype(np.int64),
            "node": node.astype(np.int64),
            "dst": dst.astype(np.int64),
            "kind": np.full(n, kind, dtype=np.int64),
            "w": w.astype(np.float64),
            "val": val.astype(np.float64),
        }
    )


def _pr_empty() -> pd.DataFrame:
    return pd.DataFrame(
        {
            c: pd.Series([], dtype="float64" if c in ("w", "val") else "int64")
            for c in _COLS
        }
    )


def _seed_state(edges: pd.DataFrame) -> pd.DataFrame:
    """One edge batch (src, dst, weight) → roster/edge seed rows. Node
    roster rows are emitted per endpoint occurrence with val=0 (the first
    round folds them by max — ranks are seeded in-round, see ``_pr_step``);
    out-weights are emitted as per-edge partials folded by sum."""
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    w = edges["weight"].to_numpy(np.float64)
    z = np.zeros
    return pd.concat(
        [
            _pr_frame(src % NUM_BUCKETS, src, z(src.size, np.int64), _K_NODE,
                      w, z(src.size)),
            _pr_frame(dst % NUM_BUCKETS, dst, z(dst.size, np.int64), _K_NODE,
                      z(dst.size), z(dst.size)),
            _pr_frame(src % NUM_BUCKETS, src, dst, _K_EDGE, w, z(src.size)),
        ],
        ignore_index=True,
    )


def _fold_roster(g: pd.DataFrame) -> pd.DataFrame:
    """Collapse per-endpoint roster partials to one row per node
    (w = Σ out-edge weights); runs as the first bucket-grouped round."""
    if len(g) == 0:
        return _pr_empty()
    roster = g[g["kind"] == _K_NODE]
    agg = roster.groupby("node", as_index=False).agg(w=("w", "sum"))
    out = _pr_frame(
        agg["node"].to_numpy() % NUM_BUCKETS, agg["node"].to_numpy(),
        np.zeros(len(agg), np.int64), _K_NODE, agg["w"].to_numpy(),
        np.zeros(len(agg)),
    )
    return pd.concat([out, g[g["kind"] == _K_EDGE]], ignore_index=True)


def _make_pr_step(n_nodes: int, first: bool):
    d = DAMPING

    def _pr_step(g: pd.DataFrame) -> pd.DataFrame:
        """One PageRank round inside one bucket: fold incoming mass → new
        ranks → emit next round's messages. The bucket holds every roster
        row, out-edge, in-message, and dangling partial it needs, so the
        round is join-free."""
        if len(g) == 0:
            return _pr_empty()
        roster = g[g["kind"] == _K_NODE]
        nodes = roster["node"].to_numpy(np.int64)
        wdeg = roster["w"].to_numpy(np.float64)
        if first:
            rank = np.full(nodes.size, 1.0 / n_nodes)
        else:
            msgs = g[g["kind"] == _K_MSG]
            inmass = pd.Series(np.zeros(nodes.size), index=nodes)
            if len(msgs):
                inmass = inmass.add(msgs.groupby("node")["val"].sum(), fill_value=0.0)
                inmass = inmass.reindex(nodes).fillna(0.0)
            dang = float(g.loc[g["kind"] == _K_DANG, "val"].sum())
            rank = (1.0 - d) / n_nodes + d * (
                inmass.to_numpy(np.float64) + dang / n_nodes
            )
        out = [
            _pr_frame(nodes % NUM_BUCKETS, nodes, np.zeros(nodes.size, np.int64),
                      _K_NODE, wdeg, rank),
            g[g["kind"] == _K_EDGE],
        ]
        edges = g[g["kind"] == _K_EDGE]
        if len(edges):
            lut = pd.Series(rank / np.where(wdeg > 0, wdeg, 1.0), index=nodes)
            src = edges["node"].to_numpy(np.int64)
            dst = edges["dst"].to_numpy(np.int64)
            mass = lut.reindex(src).to_numpy(np.float64) * edges["w"].to_numpy(
                np.float64
            )
            out.append(
                _pr_frame(dst % NUM_BUCKETS, dst, np.zeros(dst.size, np.int64),
                          _K_MSG, np.zeros(dst.size), mass)
            )
        d_partial = float(rank[wdeg == 0.0].sum())
        if d_partial > 0.0:
            buckets = np.arange(NUM_BUCKETS, dtype=np.int64)
            out.append(
                _pr_frame(buckets, np.full(NUM_BUCKETS, -1, np.int64),
                          np.zeros(NUM_BUCKETS, np.int64), _K_DANG,
                          np.zeros(NUM_BUCKETS),
                          np.full(NUM_BUCKETS, d_partial))
            )
        return pd.concat(out, ignore_index=True)

    return _pr_step


def _pr_final(g: pd.DataFrame) -> pd.DataFrame:
    if len(g) == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "pagerank": pd.Series([], dtype="float64")}
        )
    roster = g[g["kind"] == _K_NODE]
    return pd.DataFrame(
        {"node": roster["node"].astype("int64"),
         "pagerank": roster["val"].round(PR_ROUND)}
    )


def pagerank(
    edges: rd.Dataset, n_nodes: int, iterations: int = PR_ITERATIONS
) -> pd.DataFrame:
    """Weighted-edge Dataset (src, dst, weight) → (node, pagerank) for every
    endpoint. ``n_nodes`` is the distinct-node count (a metadata-sized
    scalar the caller owns). All rounds chain lazily — ONE streaming
    execution of K+2 NB-key bucket groupbys; the result is node-table-sized
    by construction."""
    state = edges.map_batches(_seed_state, batch_format="pandas")
    state = state.groupby("bucket").map_groups(_fold_roster, batch_format="pandas")
    # round 0 seeds rank=1/N and emits its messages; rounds 1..K each fold
    # the previous round's mass — K rank updates total.
    for i in range(iterations + 1):
        state = state.groupby("bucket").map_groups(
            _make_pr_step(n_nodes, first=(i == 0)), batch_format="pandas"
        )
    out = (
        state.groupby("bucket")
        .map_groups(_pr_final, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "pagerank": pd.Series([], dtype="float64")}
        )
    return out


# ---------------------------------------------------------------------------
# triangle counting (wedge-check join — the enumeration class, vs the
# iterative-propagation class above)

_T_EDGE = 0  # (a, b) canonical edge, a < b
_T_WEDGE = 1  # (a, b) candidate closing pair, c = center (min vertex)

_TRI_COLS = ("bucket", "kind", "a", "b", "c")


def _tri_frame(
    bucket: np.ndarray, kind: int, a: np.ndarray, b: np.ndarray, c: np.ndarray
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": bucket.astype(np.int64),
            "kind": np.full(len(a), kind, dtype=np.int64),
            "a": a.astype(np.int64),
            "b": b.astype(np.int64),
            "c": c.astype(np.int64),
        }
    )


def _tri_empty(cols=_TRI_COLS) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})


def _pair_bucket(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Stable bucket for an (a, b) vertex pair: splitmix-style uint64 mix so
    the wedge-check join's keys spread evenly even on skewed adjacency."""
    h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(np.uint64)
    h ^= h >> np.uint64(31)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    return ((h & np.uint64(0x7FFFFFFFFFFFFFFF)) % np.uint64(NUM_BUCKETS)).astype(
        np.int64
    )


def _tri_seed(edges: pd.DataFrame) -> pd.DataFrame:
    """Edge batch (a, b), a < b distinct → adjacency rows keyed by the MIN
    endpoint (each triangle is counted once, centered at its smallest
    vertex, so only min-endpoint adjacency is ever materialized)."""
    a = edges["a"].to_numpy(np.int64)
    b = edges["b"].to_numpy(np.int64)
    return _tri_frame(a % NUM_BUCKETS, _T_EDGE, a, b, np.zeros(a.size, np.int64))


def _tri_wedges(g: pd.DataFrame) -> pd.DataFrame:
    """Per center vertex: emit every neighbor pair (u < w) as a wedge row
    keyed by the pair's bucket, and re-key the edges themselves to their own
    pair bucket for the closing check. Wedge mass is Σ C(deg_>v, 2) — the
    min-vertex centering is the standard skew bound (a hot vertex only
    centers wedges over HIGHER-numbered neighbors)."""
    if len(g) == 0:
        return _tri_empty()
    g = g.sort_values(["a", "b"], kind="stable")
    a = g["a"].to_numpy(np.int64)
    b = g["b"].to_numpy(np.int64)
    out = [_tri_frame(_pair_bucket(a, b), _T_EDGE, a, b, np.zeros(a.size, np.int64))]
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    ends = np.r_[starts[1:], a.size]
    for s, e in zip(starts, ends):
        nb = b[s:e]
        if nb.size < 2:
            continue
        iu, iw = np.triu_indices(nb.size, 1)
        u, w = nb[iu], nb[iw]
        out.append(
            _tri_frame(_pair_bucket(u, w), _T_WEDGE, u, w,
                       np.full(u.size, a[s], np.int64))
        )
    return pd.concat(out, ignore_index=True)


def _tri_close(g: pd.DataFrame) -> pd.DataFrame:
    """Close wedges against co-bucketed edges: each (u, w) wedge whose pair
    is an edge is one triangle {center, u, w}; emit per-vertex count
    partials pre-summed inside the bucket (3 increments per triangle)."""
    if len(g) == 0:
        return _tri_empty(("bucket", "node", "part"))
    ek = g[g["kind"] == _T_EDGE][["a", "b"]]
    wk = g[g["kind"] == _T_WEDGE]
    hit = wk.merge(ek, on=["a", "b"], how="inner")
    if len(hit) == 0:
        return _tri_empty(("bucket", "node", "part"))
    nodes = np.concatenate(
        [hit["a"].to_numpy(np.int64), hit["b"].to_numpy(np.int64),
         hit["c"].to_numpy(np.int64)]
    )
    p = (
        pd.DataFrame({"node": nodes})
        .groupby("node", as_index=False)
        .size()
        .rename(columns={"size": "part"})
    )
    p["bucket"] = p["node"] % NUM_BUCKETS
    return p[["bucket", "node", "part"]].astype("int64")


def _tri_fold(g: pd.DataFrame) -> pd.DataFrame:
    if len(g) == 0:
        return _tri_empty(("node", "n_triangles"))
    return (
        g.groupby("node", as_index=False)
        .agg(n_triangles=("part", "sum"))
        .astype("int64")
    )


def triangle_counts(edges: rd.Dataset) -> pd.DataFrame:
    """Canonical undirected edge Dataset (a, b with a < b, distinct, no
    self-loops) → (node, n_triangles) for every vertex in ≥1 triangle.
    Three lazily-chained NB-key bucket groupbys in ONE streaming execution:
    min-endpoint adjacency → wedge emission keyed by closing-pair hash →
    in-bucket wedge⋈edge closing join → per-vertex count fold. No adjacency
    list, wedge set, or edge set ever materializes on the driver."""
    state = edges.map_batches(_tri_seed, batch_format="pandas")
    state = state.groupby("bucket").map_groups(_tri_wedges, batch_format="pandas")
    state = state.groupby("bucket").map_groups(_tri_close, batch_format="pandas")
    out = (
        state.groupby("bucket")
        .map_groups(_tri_fold, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return _tri_empty(("node", "n_triangles"))
    return out[["node", "n_triangles"]]


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling — the deletion-cascade class, vs
# propagation (CC/PageRank) and enumeration (triangles))

KCORE_ROUNDS = 8

_C_ADJ = 0  # adjacency copy: (node, peer), lives in node's bucket
_C_KILL = 1  # kill notice: drop edge (node, peer) — peer was peeled

_KC_COLS = ("bucket", "node", "peer", "kind")


def _kc_frame(node: np.ndarray, peer: np.ndarray, kind: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": (node % NUM_BUCKETS).astype(np.int64),
            "node": node.astype(np.int64),
            "peer": peer.astype(np.int64),
            "kind": np.full(len(node), kind, dtype=np.int64),
        }
    )


def _kc_empty() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in _KC_COLS})


def _kc_seed(edges: pd.DataFrame) -> pd.DataFrame:
    """Canonical (a, b) edge batch → both directed adjacency copies, each
    in its own node's bucket (a node's full degree is visible in-bucket)."""
    a = edges["a"].to_numpy(np.int64)
    b = edges["b"].to_numpy(np.int64)
    return pd.concat(
        [_kc_frame(a, b, _C_ADJ), _kc_frame(b, a, _C_ADJ)], ignore_index=True
    )


def _make_kc_step(k: int):
    def _kc_step(g: pd.DataFrame) -> pd.DataFrame:
        """One peeling round inside one bucket: apply inbound kill notices,
        then peel LOCALLY to a fixpoint (a bucket sees every incident edge
        of its nodes, so local degrees are exact); emit kill notices only
        for surviving out-of-bucket peers of removed edges. Global rounds
        are only needed for cross-bucket cascades."""
        if len(g) == 0:
            return _kc_empty()
        adj = g[g["kind"] == _C_ADJ]
        kills = g[g["kind"] == _C_KILL]
        if len(kills):
            adj = adj.merge(
                kills[["node", "peer"]].drop_duplicates(),
                on=["node", "peer"],
                how="left",
                indicator=True,
            )
            adj = adj[adj["_merge"] == "left_only"].drop(columns=["_merge"])
        out_kills = []
        while True:
            if len(adj) == 0:
                break
            deg = adj.groupby("node")["peer"].size()
            dead = set(deg.index[deg < k])
            if not dead:
                break
            dead_rows = adj[adj["node"].isin(dead)]
            # peers outside this bucket learn of the removal via notices
            ext = dead_rows[
                (dead_rows["peer"] % NUM_BUCKETS) != dead_rows["bucket"]
            ]
            if len(ext):
                out_kills.append(
                    _kc_frame(
                        ext["peer"].to_numpy(np.int64),
                        ext["node"].to_numpy(np.int64),
                        _C_KILL,
                    )
                )
            adj = adj[~adj["node"].isin(dead) & ~adj["peer"].isin(dead)]
        return pd.concat([adj] + out_kills, ignore_index=True) if out_kills else (
            adj.reset_index(drop=True) if len(adj) else _kc_empty()
        )

    return _kc_step


def _kc_final(g: pd.DataFrame) -> pd.DataFrame:
    """Surviving adjacency rows → distinct alive nodes, plus the
    convergence canary: a leftover kill notice that still matches a
    surviving adjacency row means the cascade budget was too small — emit
    a sentinel (node = -1) so the caller raises instead of silently
    returning a superset of the k-core (node ids are non-negative)."""
    if len(g) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64")})
    adj = g[g["kind"] == _C_ADJ]
    kills = g[g["kind"] == _C_KILL]
    out = pd.DataFrame({"node": adj["node"].unique().astype(np.int64)})
    if len(kills) and len(adj):
        hit = kills[["node", "peer"]].drop_duplicates().merge(
            adj[["node", "peer"]], on=["node", "peer"], how="inner"
        )
        if len(hit):
            out = pd.concat(
                [out, pd.DataFrame({"node": [-1]})], ignore_index=True
            ).astype("int64")
    return out


def kcore(edges: rd.Dataset, k: int, rounds: int = KCORE_ROUNDS) -> pd.DataFrame:
    """Canonical undirected edge Dataset (a < b, distinct, no self-loops) →
    the distinct nodes of the k-core (the maximal subgraph where every
    vertex keeps degree ≥ k after iterative peeling). Each round is one
    NB-key bucket groupby that peels to a LOCAL fixpoint and exchanges
    only cross-bucket kill notices (O(cut edges removed) rows — never
    adjacency, degrees, or node sets on the driver); all rounds chain
    lazily into ONE streaming execution. ``rounds`` bounds cross-bucket
    cascade depth; an unapplied kill notice in the final state RAISES
    (sentinel check) instead of silently returning a k-core superset."""
    state = edges.map_batches(_kc_seed, batch_format="pandas")
    for _ in range(rounds):
        state = state.groupby("bucket").map_groups(
            _make_kc_step(k), batch_format="pandas"
        )
    out = (
        state.groupby("bucket").map_groups(_kc_final, batch_format="pandas").to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64")})
    if (out["node"] < 0).any():
        raise RuntimeError(
            f"kcore: peel cascade did not converge in {rounds} rounds "
            f"(unapplied kill notices remain) — raise the round budget for "
            f"this graph's cross-bucket cascade depth"
        )
    return out


# ---------------------------------------------------------------------------
# multi-source BFS depths (the min-plus propagation class — CC's min-fold
# with an additive hop cost, and k-core's local-fixpoint acceleration)

BFS_ROUNDS = 8
BFS_SEED_MOD = 8  # seeds = nodes with hash % BFS_SEED_MOD == 0 (spec constant)

_F_ADJ = 0  # adjacency copy: (node, peer), lives in node's bucket
_F_DIST = 1  # best-known depth: (node, d)
_F_MSG = 2  # candidate depth: (node, d) — addressed to node's bucket

_BFS_COLS = ("bucket", "node", "peer", "kind", "d")
_BFS_INF = np.int64(2**62)


def _bfs_frame(node: np.ndarray, peer: np.ndarray, kind: int, d: np.ndarray) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "bucket": (node % NUM_BUCKETS).astype(np.int64),
            "node": node.astype(np.int64),
            "peer": peer.astype(np.int64),
            "kind": np.full(len(node), kind, dtype=np.int64),
            "d": d.astype(np.int64),
        }
    )


def _bfs_empty() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in _BFS_COLS})


def _bfs_seed(edges: pd.DataFrame) -> pd.DataFrame:
    """Canonical (a, b) edge batch → both directed adjacency copies (a
    node's full neighborhood is visible in its bucket) + depth-0 MSG rows
    for the batch's seed nodes (hash % BFS_SEED_MOD == 0). Seeds travel
    as MESSAGES, not DIST rows: the first step's frontier is "nodes whose
    best depth improved vs their DIST rows", so a seed pre-installed as
    DIST would never enter the frontier and propagation would not start.
    Duplicates across batches collapse under the in-bucket min fold."""
    a = edges["a"].to_numpy(np.int64)
    b = edges["b"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    seeds = nodes[nodes % BFS_SEED_MOD == 0]
    z = np.zeros(len(a), dtype=np.int64)
    parts = [
        _bfs_frame(a, b, _F_ADJ, z),
        _bfs_frame(b, a, _F_ADJ, z),
    ]
    if len(seeds):
        zs = np.zeros(len(seeds), dtype=np.int64)
        parts.append(_bfs_frame(seeds, zs, _F_MSG, zs))
    return pd.concat(parts, ignore_index=True)


def _bfs_step(g: pd.DataFrame) -> pd.DataFrame:
    """One global round inside one bucket: fold DIST rows and inbound MSG
    candidates to each node's best depth, then relax to a LOCAL fixpoint
    (the bucket sees every incident edge of its nodes, so in-bucket
    neighbors improve immediately); out-of-bucket neighbors get one
    min-deduped MSG each. Global rounds are only spent on cross-bucket
    hops — the k-core local-fixpoint trick applied to min-plus."""
    if len(g) == 0:
        return _bfs_empty()
    adj = g[g["kind"] == _F_ADJ]
    known = g[g["kind"] != _F_ADJ]
    if len(known) == 0:
        return adj.reset_index(drop=True)
    prev = known[known["kind"] == _F_DIST].groupby("node")["d"].min()
    best = known.groupby("node")["d"].min()  # DIST ∪ MSG fold
    # frontier: nodes whose depth just improved (new node or smaller d)
    old = prev.reindex(best.index, fill_value=_BFS_INF)
    frontier = best[best < old]
    out_msgs: dict[int, int] = {}
    my_bucket = int(g["bucket"].iloc[0])
    an = adj["node"].to_numpy(np.int64)
    ap = adj["peer"].to_numpy(np.int64)
    bestd = best.to_dict()
    while len(frontier):
        # neighbors of the frontier at depth d+1
        m = np.isin(an, frontier.index.to_numpy())
        if not m.any():
            break
        src = an[m]
        dst = ap[m]
        cand = pd.DataFrame(
            {"node": dst, "d": frontier.reindex(src).to_numpy() + 1}
        ).groupby("node")["d"].min()
        improved = {}
        for node, d in cand.items():
            node = int(node)
            d = int(d)
            if node % NUM_BUCKETS == my_bucket:
                if d < bestd.get(node, _BFS_INF):
                    bestd[node] = d
                    improved[node] = d
            else:
                if d < out_msgs.get(node, _BFS_INF):
                    out_msgs[node] = d
        frontier = pd.Series(improved, dtype="int64")
    parts = [adj]
    if bestd:
        nodes = np.fromiter(bestd.keys(), dtype=np.int64, count=len(bestd))
        ds = np.fromiter(bestd.values(), dtype=np.int64, count=len(bestd))
        parts.append(_bfs_frame(nodes, np.zeros(len(nodes), np.int64), _F_DIST, ds))
    if out_msgs:
        nodes = np.fromiter(out_msgs.keys(), dtype=np.int64, count=len(out_msgs))
        ds = np.fromiter(out_msgs.values(), dtype=np.int64, count=len(out_msgs))
        parts.append(_bfs_frame(nodes, np.zeros(len(nodes), np.int64), _F_MSG, ds))
    return pd.concat(parts, ignore_index=True)


def _bfs_final(g: pd.DataFrame) -> pd.DataFrame:
    """Fold to (node, depth) — plus the convergence canary: a leftover MSG
    that still improves a node's depth means the cross-bucket hop budget
    was too small; emit a sentinel (node = -1) so the caller raises
    instead of silently returning too-deep depths."""
    if len(g) == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "depth": pd.Series([], dtype="int64")}
        )
    dist = g[g["kind"] == _F_DIST].groupby("node", as_index=False)["d"].min()
    msgs = g[g["kind"] == _F_MSG]
    out = dist.rename(columns={"d": "depth"})
    if len(msgs):
        mb = msgs.groupby("node")["d"].min()
        db = dist.set_index("node")["d"].reindex(mb.index, fill_value=_BFS_INF)
        if (mb < db).any():
            out = pd.concat(
                [out, pd.DataFrame({"node": [-1], "depth": [-1]})], ignore_index=True
            ).astype("int64")
    return out.astype("int64")


def bfs_depths(edges: rd.Dataset, rounds: int = BFS_ROUNDS) -> pd.DataFrame:
    """Canonical undirected edge Dataset (a, b) → (node, depth): the exact
    shortest hop count from the nearest seed (hash % BFS_SEED_MOD == 0)
    for every reachable node. K bucket-grouped rounds, each relaxing to a
    local fixpoint and exchanging only cross-bucket depth messages
    (O(improved cut nodes) rows — no frontier, depth vector, or adjacency
    on the driver); all rounds chain lazily into ONE streaming execution.
    An unapplied improving message in the final state RAISES."""
    state = edges.map_batches(_bfs_seed, batch_format="pandas")
    for _ in range(rounds):
        state = state.groupby("bucket").map_groups(_bfs_step, batch_format="pandas")
    out = (
        state.groupby("bucket").map_groups(_bfs_final, batch_format="pandas").to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "depth": pd.Series([], dtype="int64")}
        )
    if (out["node"] < 0).any():
        raise RuntimeError(
            f"bfs_depths: propagation did not converge in {rounds} rounds "
            f"(an improving depth message remains unapplied) — raise the "
            f"round budget for this graph's cross-bucket hop diameter"
        )
    return out


# ---------------------------------------------------------------------------
# link prediction scores (per-EDGE common neighbors + neighbor Jaccard — the
# graph-similarity class, vs per-vertex enumeration in triangle_counts)


def edge_link_scores(edges: rd.Dataset) -> pd.DataFrame:
    """Canonical undirected edge Dataset (a, b with a < b, distinct, no
    self-loops) → per edge: endpoint degrees and the common-neighbor count
    (= triangles THROUGH the edge). Reuses the min-vertex wedge emission
    (`_tri_seed`/`_tri_wedges` — each triangle closes exactly once), but the
    close step credits the triangle's three EDGES (pair-hash-bucketed
    partials) instead of its vertices; degrees fold in node buckets from
    the both-direction adjacency. Nothing quadratic reaches the driver —
    the returned frame is edge-level (the operator's own output size)."""
    state = edges.map_batches(_tri_seed, batch_format="pandas")
    state = state.groupby("bucket").map_groups(_tri_wedges, batch_format="pandas")

    def close_edges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _tri_empty(("bucket", "a", "b", "part"))
        ek = g[g["kind"] == _T_EDGE][["a", "b"]]
        wk = g[g["kind"] == _T_WEDGE]
        hit = wk.merge(ek, on=["a", "b"], how="inner")
        if len(hit) == 0:
            return _tri_empty(("bucket", "a", "b", "part"))
        u = hit["a"].to_numpy(np.int64)
        w = hit["b"].to_numpy(np.int64)
        c = hit["c"].to_numpy(np.int64)
        ea = np.concatenate([np.minimum(c, u), np.minimum(c, w), u])
        eb = np.concatenate([np.maximum(c, u), np.maximum(c, w), w])
        p = (
            pd.DataFrame({"a": ea, "b": eb})
            .groupby(["a", "b"], as_index=False)
            .size()
            .rename(columns={"size": "part"})
        )
        p["bucket"] = _pair_bucket(p["a"].to_numpy(np.int64), p["b"].to_numpy(np.int64))
        return p[["bucket", "a", "b", "part"]].astype("int64")

    def fold_edges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _tri_empty(("a", "b", "n_common"))
        return (
            g.groupby(["a", "b"], as_index=False)
            .agg(n_common=("part", "sum"))
            .astype("int64")
        )

    common = (
        state.groupby("bucket")
        .map_groups(close_edges, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold_edges, batch_format="pandas")
        .to_pandas()
    )

    def deg_seed(e: pd.DataFrame) -> pd.DataFrame:
        a = e["a"].to_numpy(np.int64)
        b = e["b"].to_numpy(np.int64)
        n = np.concatenate([a, b])
        p = pd.DataFrame({"node": n}).groupby("node", as_index=False).size()
        p = p.rename(columns={"size": "part"})
        p["bucket"] = p["node"] % NUM_BUCKETS
        return p[["bucket", "node", "part"]].astype("int64")

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _tri_empty(("node", "d"))
        return g.groupby("node", as_index=False).agg(d=("part", "sum")).astype("int64")

    deg = (
        edges.map_batches(deg_seed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(deg_fold, batch_format="pandas")
        .to_pandas()
        .set_index("node")["d"]
    )

    out = edges.to_pandas()
    out["deg_a"] = out["a"].map(deg).astype("int64")
    out["deg_b"] = out["b"].map(deg).astype("int64")
    if len(common):
        out = out.merge(common, on=["a", "b"], how="left")
        out["n_common"] = out["n_common"].fillna(0).astype("int64")
    else:
        out["n_common"] = np.int64(0)
    return out
