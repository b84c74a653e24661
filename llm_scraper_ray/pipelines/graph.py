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
