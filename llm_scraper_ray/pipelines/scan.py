"""Distributed grouped prefix-rank (partitioned ``row_number()``) over a
sorted metadata-thin stream — the shared scan core behind the sampling /
quota / mixing operators.

Shape (the doc_token_bins / orders_ntile family, generalized to GROUPED
partitions): ONE sort co-locates the partition key and the order key; each
batch computes LOCAL within-group ranks and tags every row with the batch's
FULL first-row sort key (the events_window_count lesson: a partial key
misorders batches whenever the leading column repeats across a boundary).
Because groups are CONTIGUOUS under the sort, only a batch's FIRST group can
receive carry from earlier batches and only its LAST group can pass carry
forward — so the driver chain needs exactly one (first-group, last-group,
two counts) record per scan batch, O(#batches) driver state, never
O(#groups): a 10^10-row table with 10^8 partitions still ships only its
batch-count summary. Pass 2 adds each batch's carry to its first-group rows,
vectorized.

Coalesce/split safety (the doc_token_bins lesson): every per-batch scalar
rides the rows as a constant column keyed by the batch key, the summary pass
re-groups by that key, and the driver groups AGAIN — correct whether Ray
coalesces several scan blocks into one downstream batch or splits one across
two.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["grouped_rank"]


def grouped_rank(
    ds: rd.Dataset,
    sort_cols: list[str],
    group_cols: list[str],
    batch_size: int = 65536,
) -> rd.Dataset:
    """Return a materialized Dataset = ``ds`` rows (sorted by ``sort_cols``)
    plus an int64 ``grank`` column: the 1-based ``row_number() OVER
    (PARTITION BY group_cols ORDER BY sort_cols)``. ``group_cols`` must be a
    prefix-compatible subset of ``sort_cols`` (groups contiguous under the
    sort); pass a constant column for a global (un-partitioned) row number.
    """
    nbk = len(sort_cols)
    bks = [f"_bk{i}" for i in range(nbk)]

    def scan_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        if len(df) == 0:
            df["grank"] = pd.Series([], dtype="int64")
            for c in bks + ["_lcnt"]:
                df[c] = pd.Series([], dtype="int64")
            df["_in_first"] = pd.Series([], dtype="bool")
            df["_in_last"] = pd.Series([], dtype="bool")
            return df
        df["grank"] = (df.groupby(group_cols, sort=False).cumcount() + 1).astype(
            "int64"
        )
        for i, c in enumerate(sort_cols):
            df[bks[i]] = df[c].iloc[0]
        first_mask = np.logical_and.reduce(
            [(df[c] == df[c].iloc[0]).to_numpy() for c in group_cols]
        )
        last_mask = np.logical_and.reduce(
            [(df[c] == df[c].iloc[-1]).to_numpy() for c in group_cols]
        )
        df["_in_first"] = first_mask
        df["_in_last"] = last_mask
        df["_lcnt"] = np.int64(last_mask.sum())
        return df

    rows = (
        ds.sort(sort_cols)
        .map_batches(scan_batch, batch_format="pandas", batch_size=batch_size)
        .materialize()
    )

    gfirst = [f"_gf_{c}" for c in group_cols]
    glast = [f"_gl_{c}" for c in group_cols]

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        cols = bks + gfirst + glast + ["_lcnt"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="object") for c in cols})
        out = []
        for _, g in df.groupby(bks, sort=False):
            rec = {b: g[b].iloc[0] for b in bks}
            f = g[g["_in_first"]]
            l = g[g["_in_last"]]
            for c in group_cols:
                rec[f"_gf_{c}"] = f[c].iloc[0] if len(f) else None
                rec[f"_gl_{c}"] = l[c].iloc[0] if len(l) else None
            rec["_lcnt"] = int(g["_lcnt"].iloc[0])
            out.append(rec)
        return pd.DataFrame(out)

    summary = (
        rows.map_batches(summarize, batch_format="pandas", zero_copy_batch=True)
        .to_pandas()
    )
    # a split scan block yields duplicate bk rows with identical constants —
    # re-group, then chain in global sort order
    summary = (
        summary.groupby(bks, as_index=False, sort=False).first()
        .sort_values(bks, kind="stable")
        .reset_index(drop=True)
    )
    carries: dict[tuple, int] = {}
    open_grp: tuple | None = None
    open_cnt = 0
    # (not itertuples: it positional-renames underscore-leading columns)
    for d in summary.to_dict("records"):
        bk = tuple(d[b] for b in bks)
        fg = tuple(d[f"_gf_{c}"] for c in group_cols)
        lg = tuple(d[f"_gl_{c}"] for c in group_cols)
        c_in = open_cnt if fg == open_grp else 0
        carries[bk] = c_in
        open_cnt = (c_in + int(d["_lcnt"])) if lg == fg else int(d["_lcnt"])
        open_grp = lg

    def apply_carry(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.drop(columns=bks + ["_in_first", "_in_last", "_lcnt"])
        # resolve per row, not per call: downstream blocks may mix batches
        add = np.zeros(len(df), dtype=np.int64)
        in_first = df["_in_first"].to_numpy()
        bkvals = [df[b].to_numpy() for b in bks]
        grp_keys = pd.Series(list(zip(*bkvals))).map(carries).to_numpy()
        add[in_first] = grp_keys[in_first]
        df = df.drop(columns=bks + ["_in_first", "_in_last", "_lcnt"])
        df["grank"] = df["grank"].to_numpy() + add
        return df

    return rows.map_batches(apply_carry, batch_format="pandas")
