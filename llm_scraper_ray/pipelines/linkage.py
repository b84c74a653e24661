"""Record-linkage and data-quality operator classes:

  - ``customer_name_ed1_pairs``: bounded edit-distance (≤1) self-join via
    FastSS deletion neighborhoods (Bocek et al., "Fast Similarity Search in
    Large Dictionaries", 2007) — each string emits its full form plus every
    single-deletion variant keyed by a 63-bit hash; candidates meet
    IN-BUCKET (bucket = variant-hash % NB) and verify with an O(L) check.
    For a true ED-1 pair the shared witness variant is unique (substitution
    pairs share exactly the deletion at the differing position;
    insert/delete pairs share the shorter string itself), so within-group
    dedup yields each pair exactly once — no cross-bucket pair shuffle.
    The quadratic all-pairs scan this replaces is the reference-era shape
    (cf. the in-batch vocabulary fuzzy join, `queries.q_part_name_fuzzy_join`).
  - ``events_activity_bitmap``: per-user day-of-month activity bitmap — an
    OR-able integer aggregate (the roaring-bitmap shape at word size).
    Per-batch pandas OR partials collapse each batch to ≤ its distinct
    users; partials bucket by user-hash (user whole within bucket) and
    finish in ONE NB-key groupby — never a per-user groupby (the 1 ms/key
    trap at web-scale user cardinality).
  - ``referential_integrity_audit``: the dbt-tests shape — orphan foreign
    keys (hash-partitioned left_anti joins on per-batch-distinct key
    partials), unreferenced dimension rows, duplicate-key counts (rows
    minus in-bucket distinct), and null/empty field counts, folded into one
    (check_name, n_bad) report.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

NB = 64


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _hash63(s: pd.Series) -> np.ndarray:
    return (
        pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64) >> np.uint64(1)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# FastSS ED<=1 self-join


def _ed1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check in O(L) (not a full DP)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # len(b) == len(a) + 1: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def q_customer_name_ed1_pairs(sf_dir: str) -> pd.DataFrame:
    """All customer-name pairs within edit distance 1, via deletion
    neighborhoods: no O(N²) scan, no driver-side name set. Variant rows
    (hash(variant), kind, name) bucket by hash; each in-bucket variant
    group pairs full-vs-deletion (insert/delete candidates) and
    deletion-vs-deletion (substitution candidates), verifies with the O(L)
    check, and emits each surviving pair once (witness uniqueness — see
    module docstring)."""

    def variants(t: pa.Table) -> pa.Table:
        names = pc.unique(t["c_name"]).to_pylist()
        vs, kinds, owners = [], [], []
        for n in names:
            vs.append(n)
            kinds.append(0)  # full form
            owners.append(n)
            seen = set()
            for i in range(len(n)):
                d = n[:i] + n[i + 1 :]
                if d in seen:  # repeated-char deletions collapse
                    continue
                seen.add(d)
                vs.append(d)
                kinds.append(1)  # deletion variant
                owners.append(n)
        df = pd.DataFrame({"v": vs, "kind": kinds, "name": owners})
        df["vkey"] = _hash63(df["v"])
        df["bucket"] = (df["vkey"] % NB).astype(np.int64)
        return pa.Table.from_pandas(
            df[["vkey", "bucket", "kind", "name"]], preserve_index=False
        )

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        g = g.drop_duplicates(["vkey", "kind", "name"])
        for _, grp in g.groupby("vkey"):
            if len(grp) < 2:
                continue
            full = sorted(grp.loc[grp["kind"] == 0, "name"])
            dels = sorted(grp.loc[grp["kind"] == 1, "name"].unique())
            # insert/delete: full form of the shorter == deletion of the longer
            for a in full:
                for b in dels:
                    if a != b and _ed1(a, b):
                        x, y = min(a, b), max(a, b)
                        out_a.append(x)
                        out_b.append(y)
            # substitution: two deletions at the same position
            for i, a in enumerate(dels):
                for b in dels[i + 1 :]:
                    if len(a) == len(b) and _ed1(a, b):
                        out_a.append(a)
                        out_b.append(b)
        df = pd.DataFrame({"name_a": out_a, "name_b": out_b}).drop_duplicates()
        return df

    out = (
        _read(sf_dir, "customer", ["c_name"])
        .map_batches(variants, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair_up, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in ("name_a", "name_b")}
        )
    return (
        out.drop_duplicates()
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )


SQL_CUSTOMER_NAME_ED1 = """
WITH n AS (SELECT DISTINCT c_name FROM customer)
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM n a JOIN n b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY name_a, name_b
"""


# ---------------------------------------------------------------------------
# per-user activity bitmap (OR-able integer aggregate)


def q_events_activity_bitmap(sf_dir: str) -> pd.DataFrame:
    """Per-user day-of-month activity bitmap: mask = OR(1 << (day-1)),
    n_active_days = popcount(mask). OR partials collapse per batch, bucket
    by user hash (user whole within its bucket), and finish in one NB-key
    groupby — the mergeable-bitmap aggregation shape."""

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = (
            us.astype("datetime64[us]").astype("datetime64[D]")
            - us.astype("datetime64[us]").astype("datetime64[M]")
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "bit": np.int64(1) << day,
            }
        )
        p = df.groupby("user_id", as_index=False).agg(
            mask=("bit", lambda s: np.bitwise_or.reduce(s.to_numpy(np.int64)))
        )
        p["bucket"] = (
            pd.util.hash_pandas_object(p["user_id"], index=False).to_numpy(np.uint64)
            % NB
        ).astype(np.int64)
        return pa.Table.from_pandas(p, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False).agg(
            days_mask=("mask", lambda s: np.bitwise_or.reduce(s.to_numpy(np.int64)))
        )
        out["n_active_days"] = [int(m).bit_count() for m in out["days_mask"]]
        for c in ("user_id", "days_mask", "n_active_days"):
            out[c] = out[c].astype(np.int64)
        return out

    out = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


SQL_EVENTS_ACTIVITY_BITMAP = """
SELECT user_id,
       bit_or(1::BIGINT << (CAST(EXTRACT(day FROM ts) AS INT) - 1)) AS days_mask,
       CAST(bit_count(bit_or(1::BIGINT
            << (CAST(EXTRACT(day FROM ts) AS INT) - 1))) AS BIGINT)
         AS n_active_days
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# referential-integrity / data-quality audit


_AUDIT_CHECKS: list[tuple[str, tuple[str, str], tuple[str, str]]] = [
    # (check_name, (probe_table, probe_col), (ref_table, ref_col)):
    # count distinct probe keys with NO matching ref key
    ("lineitem_orphan_order", ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
    ("order_orphan_customer", ("orders", "o_custkey"), ("customer", "c_custkey")),
    ("lineitem_orphan_part", ("lineitem", "l_partkey"), ("part", "p_partkey")),
    ("lineitem_orphan_supplier", ("lineitem", "l_suppkey"), ("supplier", "s_suppkey")),
    ("customer_without_orders", ("customer", "c_custkey"), ("orders", "o_custkey")),
    ("part_never_ordered", ("part", "p_partkey"), ("lineitem", "l_partkey")),
    ("supplier_never_used", ("supplier", "s_suppkey"), ("lineitem", "l_suppkey")),
]

_AUDIT_MIX = np.uint64(0x9E3779B97F4A7C15)

# per-table role map derived from _AUDIT_CHECKS: each table is read ONCE
# (all needed columns), one map emits every (check, role) row the table
# feeds — 5 legs instead of 14 (each leg in a single execution pays a
# per-operator fixed cost; the 14-leg version measured 63 s at sf0.1
# where this one is ~8 s). cid 7 = the duplicate-orderkey check, whose
# rows carry per-batch multiplicity counts instead of a probe/ref tag.
_AUDIT_DUP_CID = len(_AUDIT_CHECKS)


def _audit_roles() -> dict[str, list[tuple[str, int, int]]]:
    roles: dict[str, list[tuple[str, int, int]]] = {}
    for i, (_, (pt, pcol), (rt, rcol)) in enumerate(_AUDIT_CHECKS):
        roles.setdefault(pt, []).append((pcol, i, 0))
        roles.setdefault(rt, []).append((rcol, i, 1))
    roles.setdefault("orders", []).append(("o_orderkey", _AUDIT_DUP_CID, 2))
    return roles


def q_referential_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """dbt-tests-shaped dataset audit: orphaned foreign keys, unreferenced
    dimension rows, duplicate primary keys, and empty payload fields, one
    (check_name, n_bad) row each. ALL key checks fuse into ONE tagged-union
    bucket merge (a (check, key) is whole within its hash bucket, so
    distinct-orphan counts are exact and additive across buckets) — not
    seven anti-joins; `Dataset.join` is also the documented empty-partition
    trap for sparse sides (CLAUDE.md). Each base table is read ONCE and
    emits all of its role rows from a single map; duplicate counts ride the
    same shuffle as multiplicity rows (is_ref=2, Σ(c−1) per key in-bucket);
    empties are per-batch predicate count partials."""
    roles = _audit_roles()

    def tagged(table_roles: list[tuple[str, int, int]]):
        def fn(t: pa.Table) -> pa.Table:
            cids, keys, tags, ns = [], [], [], []
            for col, cid, tag in table_roles:
                k = pc.cast(t[col], pa.int64()).to_numpy(zero_copy_only=False)
                if tag == 2:  # multiplicity role (duplicate-PK check)
                    u, c = np.unique(k, return_counts=True)
                else:
                    u = np.unique(k)
                    c = np.ones(len(u), np.int64)
                cids.append(np.full(len(u), cid, np.int64))
                keys.append(u)
                tags.append(np.full(len(u), tag, np.int64))
                ns.append(c.astype(np.int64))
            cid = np.concatenate(cids)
            key = np.concatenate(keys)
            b = (
                ((key.astype(np.uint64) + cid.astype(np.uint64)) * _AUDIT_MIX)
                % np.uint64(NB)
            ).astype(np.int64)
            return pa.Table.from_pydict(
                {
                    "cid": pa.array(cid, pa.int64()),
                    "key": pa.array(key, pa.int64()),
                    "is_ref": pa.array(np.concatenate(tags), pa.int64()),
                    "n": pa.array(np.concatenate(ns), pa.int64()),
                    "bucket": pa.array(b, pa.int64()),
                }
            )

        return fn

    legs = [
        _read(sf_dir, table, sorted({c for c, _, _ in tr})).map_batches(
            tagged(tr), batch_format="pyarrow"
        )
        for table, tr in roles.items()
    ]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, grp in g.groupby("cid"):
            if int(cid) == _AUDIT_DUP_CID:
                per = grp.groupby("key")["n"].sum()
                out.append((int(cid), int((per - 1).clip(lower=0).sum())))
            else:
                refs = set(grp.loc[grp["is_ref"] == 1, "key"])
                probe = set(grp.loc[grp["is_ref"] == 0, "key"])
                out.append((int(cid), len(probe - refs)))
        return pd.DataFrame(
            {
                "cid": pd.Series([c for c, _ in out], dtype="int64"),
                "n": pd.Series([n for _, n in out], dtype="int64"),
            }
        )

    parts = (
        legs[0]
        .union(*legs[1:])
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    per_cid = parts.groupby("cid")["n"].sum() if len(parts) else pd.Series(dtype="int64")
    checks: dict[str, int] = {
        name: int(per_cid.get(i, 0)) for i, (name, _, _) in enumerate(_AUDIT_CHECKS)
    }
    checks["orders_dup_orderkey"] = int(per_cid.get(_AUDIT_DUP_CID, 0))

    # empty payloads
    def empty_docs(t: pa.Table) -> pa.Table:
        n = pc.sum(
            pc.or_(pc.is_null(t["text"]), pc.equal(pc.utf8_length(t["text"]), 0))
        ).as_py() or 0
        return pa.Table.from_pydict({"n": pa.array([int(n)], pa.int64())})

    checks["document_empty_text"] = int(
        _read(sf_dir, "documents", ["text"])
        .map_batches(empty_docs, batch_format="pyarrow")
        .sum("n")
    )

    out = pd.DataFrame(
        {
            "check_name": list(checks.keys()),
            "n_bad": pd.Series(list(checks.values()), dtype="int64"),
        }
    )
    return out.sort_values("check_name").reset_index(drop=True)


SQL_REFERENTIAL_INTEGRITY = """
SELECT * FROM (
  SELECT 'lineitem_orphan_order' AS check_name,
         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_bad
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  UNION ALL
  SELECT 'order_orphan_customer',
         CAST(count(DISTINCT o_custkey) AS BIGINT)
  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
  UNION ALL
  SELECT 'lineitem_orphan_part',
         CAST(count(DISTINCT l_partkey) AS BIGINT)
  FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
  UNION ALL
  SELECT 'lineitem_orphan_supplier',
         CAST(count(DISTINCT l_suppkey) AS BIGINT)
  FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
  UNION ALL
  SELECT 'customer_without_orders', CAST(count(*) AS BIGINT)
  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  UNION ALL
  SELECT 'part_never_ordered', CAST(count(*) AS BIGINT)
  FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
  UNION ALL
  SELECT 'supplier_never_used', CAST(count(*) AS BIGINT)
  FROM supplier WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)
  UNION ALL
  SELECT 'orders_dup_orderkey',
         CAST(sum(c - 1) AS BIGINT)
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
  UNION ALL
  SELECT 'document_empty_text', CAST(count(*) AS BIGINT)
  FROM documents WHERE text IS NULL OR length(text) = 0
) ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit (forensic data-quality class)


def q_orders_benford(sf_dir: str) -> pd.DataFrame:
    """First-significant-digit distribution of order prices — the Benford
    forensic audit a data-quality pass runs over money columns. The digit
    is extracted by pure integer division (log10-free: 18 vectorized
    halving-by-10 passes — float log10 misreads exact powers of ten), each
    batch pre-folds its 9-bin counts into ONE packed row, and the driver
    sums #batches rows. Counts are exact integers; the per-digit share is
    the single terminal division both engines perform identically (the
    Benford expectation log10(1+1/d) is irrational and therefore NOT
    emitted — a consumer compares shares downstream)."""
    base = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        d = c[c > 0]
        for _ in range(18):
            d = np.where(d >= 10, d // 10, d)
        counts = np.bincount(d, minlength=10)[1:10].astype(np.int64)
        return pa.Table.from_pydict({"blob": pa.array([counts.tobytes()], pa.binary())})

    parts = base.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = np.zeros(9, np.int64)
    for b in parts["blob"]:
        total += np.frombuffer(b, np.int64)
    n = int(total.sum())
    return pd.DataFrame(
        {
            "digit": pd.Series(np.arange(1, 10), dtype="int64"),
            "n": pd.Series(total, dtype="int64"),
            "share": pd.Series(total / n, dtype="float64"),
        }
    )


SQL_ORDERS_BENFORD = """
WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE floor(o_totalprice * 100) > 0),
d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM c),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM d)
SELECT g.digit, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n,
       CAST(coalesce(cnt.n, 0) AS DOUBLE) / t.total AS share
FROM (SELECT unnest(generate_series(1, 9)) AS digit) g
LEFT JOIN (SELECT digit, count(*) AS n FROM d GROUP BY 1) cnt
  ON cnt.digit = g.digit, t
ORDER BY g.digit
"""
