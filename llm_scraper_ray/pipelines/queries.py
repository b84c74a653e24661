"""The query/operator surface: SURVEY.md §2 operators + training-data ops,
each as a Ray Data pipeline over the sf_dir Parquet tables with (where
SQL-expressible) a DuckDB oracle — the driver's correctness gate.

Conventions:
  - every computed column is named identically in the Ray pipeline and the
    oracle SQL (the driver hash-compares values after sorting columns);
  - float aggregates are rounded (2–4 dp) on BOTH sides so distributed
    summation order cannot flip the hash;
  - deterministic tiebreaks on every top-k (sort key includes the id);
  - small sides (dimension tables) are broadcast into ``map_batches`` —
    never shuffled; partial aggregation runs per batch before any groupby.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions import analysis as A

# ---------------------------------------------------------------------------
# helpers


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _small_table(sf_dir: str, table: str, columns: list[str]) -> pd.DataFrame:
    """Driver-side read of a dimension table (broadcast side)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns).to_pandas()


def _round(df: pd.DataFrame, cols: dict[str, int]) -> pd.DataFrame:
    for c, nd in cols.items():
        df[c] = df[c].round(nd)
    return df


def _topk_cut(
    ds: rd.Dataset,
    by: list[str],
    ascending: list[bool],
    k: int,
    round_cols: dict[str, int] | None = None,
) -> pd.DataFrame:
    """Distributed top-k epilogue: per-batch head(k) partials (each batch's
    global top-k members are within its local top-k), so the driver collects
    O(#blocks · k) candidate rows instead of the full aggregate output
    (O(distinct keys) — the at-scale driver-memory trap). Rounds BEFORE
    ranking so the cut key equals the SQL ORDER BY key."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if round_cols:
            df = _round(df.copy(), round_cols)
        return df.sort_values(by, ascending=ascending, kind="stable").head(k)

    cand = ds.map_batches(part, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(by, ascending=ascending, kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# relational operators (SURVEY.md §2.5-2.8 analogs on the TPC-H-ish tables)


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """A5 macro aggregates / A1-A2 groupby: TPC-H-Q1-shaped pricing summary.

    Arrow-native: vectorized filter + computed column via pyarrow.compute,
    then a direct ``groupby().aggregate()`` — Ray Data map-combines
    internally, so no hand-rolled partial stage (measured 40x slower with
    pandas pre-aggregation blocks)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("disc_price", disc).drop_columns(["l_shipdate", "l_discount"])

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["avg_price"] = out["sum_base_price"] / out["count_order"]
    return _round(
        out,
        {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4, "avg_price": 4},
    ).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       round(sum(l_extendedprice) / count(*), 4) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_customers(sf_dir: str) -> pd.DataFrame:
    """J1-shaped join + A4 top-k: revenue per customer; the customer
    dimension is joined driver-side after the aggregate (small side never
    shuffles; the aggregate output is one row per customer)."""
    cust = _small_table(sf_dir, "customer", ["c_custkey", "c_name"])
    agg = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="revenue"))
    )
    out = _topk_cut(
        agg, ["revenue", "o_custkey"], [False, True], 10, round_cols={"revenue": 2}
    ).rename(columns={"o_custkey": "c_custkey"})
    # dimension lookup only for the k winners
    out["c_name"] = out["c_custkey"].map(dict(zip(cust["c_custkey"], cust["c_name"])))
    return out[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


_SQL_TOP_CUSTOMERS = """
SELECT o_custkey AS c_custkey, max(c_name) AS c_name,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


def q_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Two-hop broadcast join (orders→customer→nation) inside map_batches
    (numpy take on a broadcast key array), then a direct groupby."""
    import numpy as np

    cust = _small_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _small_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    # broadcast as parallel Arrow arrays → the lookup is a vectorized
    # index_in + take, no per-row Python (VERDICT r01 item 5)
    keys_arr = pa.array(cust["c_custkey"], pa.int64())
    names_arr = pa.array([n2name[nk] for nk in cust["c_nationkey"]], pa.string())
    lookup_ref = ray.put((keys_arr, names_arr))

    def attach(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=keys)
        return batch.append_column("n_name", pc.take(names, idx)).drop_columns(
            ["o_custkey"]
        )

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    return _round(out, {"revenue": 2}).sort_values("n_name").reset_index(drop=True)


_SQL_REVENUE_BY_NATION = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def q_mktsegments(sf_dir: str) -> pd.DataFrame:
    """A1/O1: distinct + sort (the reference's URL-distinct/sorted-output)."""
    vals = _read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


_SQL_MKTSEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


def _dedup_col(col: str):
    """Per-batch distinct combiner: shrinks a join side's shuffle to one row
    per (batch, key) — exact for semi/anti joins (duplicate right keys never
    change their semantics), so no global distinct is ever needed."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.group_by(col).aggregate([])

    return fn


def q_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """A8/J4 anti-join, hash-partitioned end to end: customer ⟕̸ orders via
    ``Dataset.join(left_anti)`` — both sides shuffle by key, no driver-side
    key set (the round-2 broadcast was O(fact-table distinct))."""
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        _dedup_col("o_custkey"), batch_format="pyarrow"
    )
    out = (
        _read(sf_dir, "customer", ["c_custkey"])
        .join(orders, "left_anti", num_partitions=8, on=("c_custkey",), right_on=("o_custkey",))
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out[["c_custkey"]].sort_values("c_custkey").reset_index(drop=True)


_SQL_CUST_NO_ORDERS = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def q_parts_shipped_by_brand(sf_dir: str) -> pd.DataFrame:
    """J2 semi-join, hash-partitioned end to end: part ⋉ lineitem via
    ``Dataset.join(left_semi)`` (each part row emitted once regardless of
    duplicate lineitem keys), then a 25-key brand groupby — no driver-side
    distinct of the fact-table key (round-2's broadcast pattern)."""
    li = _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
        _dedup_col("l_partkey"), batch_format="pyarrow"
    )
    out = (
        _read(sf_dir, "part", ["p_partkey", "p_brand"])
        .join(li, "left_semi", num_partitions=8, on=("p_partkey",), right_on=("l_partkey",))
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_parts"))
        .to_pandas()
    )
    return out.sort_values("p_brand").reset_index(drop=True)


_SQL_PARTS_SHIPPED = """
SELECT p_brand, count(*) AS n_parts FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
GROUP BY p_brand ORDER BY p_brand
"""


_BLOOM_M = 1 << 17  # filter bits (16 KiB packed — broadcast-cheap)
_BLOOM_K = 4
_BLOOM_SEGMENT = "AUTOMOBILE"


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, _BLOOM_K) bit positions via double hashing of a splitmix64 mix."""
    x = keys.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h1 = x ^ (x >> np.uint64(31))
    h2 = (x * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    j = np.arange(_BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(_BLOOM_M)).astype(
        np.int64
    )


def q_orders_bloom_semijoin(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter-accelerated semi-join: revenue of orders whose customer
    is in the {seg} segment. The scale technique a 100-TB shuffle join
    needs when the build side is selective: (1) the filter is built
    DISTRIBUTED — per-batch customer partials are OR-able packed bitmaps,
    so the driver folds O(#batches × 16 KiB), never a key set; (2) the
    16 KiB filter broadcasts once (``ray.put``) and prunes the fact table
    in-batch BEFORE its shuffle — only candidates (true matches + bounded
    false positives) pay the exchange; (3) the hash-partitioned
    ``Dataset.join(left_semi)`` makes the result EXACT, so the oracle is a
    plain semi-join — the bloom can only prune, never change the answer.
    """.format(seg=_BLOOM_SEGMENT)

    def build(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_mktsegment"], _BLOOM_SEGMENT)
        keys = t["c_custkey"].filter(keep).to_numpy(zero_copy_only=False)
        bits = np.zeros(_BLOOM_M, dtype=bool)
        if keys.size:
            bits[_bloom_positions(keys).ravel()] = True
        return pa.Table.from_pydict({"bits": pa.array([np.packbits(bits).tobytes()])})

    parts = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(build, batch_format="pyarrow")
        .to_pandas()
    )
    bloom = np.zeros(_BLOOM_M // 8, dtype=np.uint8)
    for b in parts["bits"]:
        bloom |= np.frombuffer(b, dtype=np.uint8)
    bloom_ref = ray.put(np.unpackbits(bloom).astype(bool))

    def probe(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        hit = bits[_bloom_positions(keys)].all(axis=1)
        return t.filter(pa.array(hit))

    seg_cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], _BLOOM_SEGMENT)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
        .map_batches(probe, batch_format="pyarrow")
        .join(
            seg_cust, "left_semi", num_partitions=8,
            on=("o_custkey",), right_on=("c_custkey",),
        )
        .groupby("o_orderpriority")
        .aggregate(
            Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
        )
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return (
        _round(out, {"revenue": 2})
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


_SQL_ORDERS_BLOOM = f"""
SELECT o_orderpriority, round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{_BLOOM_SEGMENT}')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


_FUZZY_MAX_DIST = 3


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, DuckDB ``levenshtein`` twin (insert /
    delete / substitute, no transposition)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def q_part_name_fuzzy_join(sf_dir: str) -> pd.DataFrame:
    """FUZZY similarity self-join on part names (edit distance ≤ 3) — the
    E10 fuzzy kernels as a JOIN operator. Stage 1 reduces the corpus to
    its DISTINCT name vocabulary with a groupby (names are a vocabulary:
    cardinality is bounded by the generator's word sets, not the row
    count), so the quadratic stage runs over vocab × vocab, not
    rows × rows. Stage 2 broadcasts the vocab array once (``ray.put``)
    and each batch of names scores itself against the suffix of the
    vocabulary above it (length-difference pruning before the DP) —
    emitted pairs are (a < b) unique by construction. Oracle = DuckDB
    ``levenshtein`` (the DP is its exact twin, pytest-pinned)."""
    names = (
        _read(sf_dir, "part", ["p_name"])
        .groupby("p_name")
        .aggregate(Count(alias_name="n"))
    )
    vocab = sorted(names.to_pandas()["p_name"])  # vocabulary-sized
    vref = ray.put(vocab)
    vds = rd.from_pandas(pd.DataFrame({"name": vocab}))

    def pairs_batch(t: pa.Table) -> pa.Table:
        vv = ray.get(vref)
        pos = {n: i for i, n in enumerate(vv)}
        out_a, out_b, out_d = [], [], []
        for a in t["name"].to_pylist():
            i = pos[a]
            for b in vv[i + 1 :]:
                if abs(len(a) - len(b)) > _FUZZY_MAX_DIST:
                    continue
                d = _levenshtein(a, b)
                if d <= _FUZZY_MAX_DIST:
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(d)
        return pa.Table.from_pydict(
            {
                "name_a": pa.array(out_a, pa.string()),
                "name_b": pa.array(out_b, pa.string()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    out = vds.map_batches(pairs_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


_SQL_PART_NAME_FUZZY = f"""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


_Q3_CUTOFF_US = int(pd.Timestamp("1998-06-15").value // 1000)


def q_q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q3-shaped 3-way join: top-10 unshipped BUILDING orders by
    pending revenue. The whole chain is hash-partitioned Datasets: orders
    (date-filtered in-batch) ⋉ BUILDING customers via ``join(left_semi)``,
    lineitem pre-aggregated to per-(batch, orderkey) revenue PARTIALS
    before its shuffle (the shuffle moves partials, not line items), one
    inner ``Dataset.join`` on orderkey, a groupby whose Sum folds the
    partials, and the ``_topk_cut`` epilogue — the driver sees
    O(#blocks · 10) candidate rows, never the full per-order aggregate."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )

    def orders_filter(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.less(od, _Q3_CUTOFF_US)
        return pa.Table.from_pydict(
            {
                "o_orderkey": t["o_orderkey"].filter(keep),
                "o_custkey": t["o_custkey"].filter(keep),
                "od_us": od.filter(keep),
            }
        )

    bo = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(orders_filter, batch_format="pyarrow")
        .join(cust, "left_semi", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    )

    def li_partials(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64())
        keep = pc.greater(sd, _Q3_CUTOFF_US).to_numpy(zero_copy_only=False)
        if not keep.any():
            return pa.Table.from_pydict(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "part_rev": pa.array([], pa.float64()),
                }
            )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "rev": (
                    t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
                    * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
                ),
            }
        )
        p = df.groupby("l_orderkey", as_index=False).agg(part_rev=("rev", "sum"))
        return pa.Table.from_pandas(p, preserve_index=False)

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(li_partials, batch_format="pyarrow")

    agg = (
        li.join(bo, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
        .groupby("l_orderkey")
        .aggregate(
            Sum("part_rev", alias_name="revenue"),
            Min("od_us", alias_name="od_us"),
        )
    )
    top = _topk_cut(
        agg, ["revenue", "l_orderkey"], [False, True], 10, round_cols={"revenue": 2}
    )
    top["o_orderdate"] = (
        pd.to_datetime(top["od_us"], unit="us").dt.strftime("%Y-%m-%d")
    )
    return top[["l_orderkey", "revenue", "o_orderdate"]].reset_index(drop=True)


_SQL_Q3_SHIPPING = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-15'
  AND l.l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


_Q5_LO_US = int(pd.Timestamp("1996-01-01").value // 1000)
_Q5_HI_US = int(pd.Timestamp("1998-01-01").value // 1000)


def q_q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q5-shaped 4-fact multi-join: per (region, nation) revenue from
    lineitems where the CUSTOMER and the SUPPLIER share a nation, in a
    2-year order window. The two big tables meet in ONE hash-partitioned
    ``Dataset.join`` on orderkey: orders (date-filtered in-batch) joins
    customer by custkey to pick up c_nationkey; lineitem resolves
    l_suppkey → supplier nation through a BROADCAST dimension map
    (``ray.put`` once, read per actor — supplier is a dimension, not a
    fact-derived key set) and pre-aggregates per-(batch, orderkey, nation)
    revenue partials BEFORE its shuffle. The same-nation filter runs
    in-batch after the join; the final groupby folds partials over ≤25
    nation keys, and nation/region names attach driver-side."""
    supp = _small_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_ref = ray.put(
        pd.Series(
            supp["s_nationkey"].to_numpy(np.int64),
            index=supp["s_suppkey"].to_numpy(np.int64),
        )
    )
    nation = _small_table(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _small_table(sf_dir, "region", ["r_regionkey", "r_name"])
    names = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")

    def orders_filter(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(od, _Q5_LO_US), pc.less(od, _Q5_HI_US))
        return pa.Table.from_pydict(
            {
                "o_orderkey": t["o_orderkey"].filter(keep),
                "o_custkey": t["o_custkey"].filter(keep),
            }
        )

    oc = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(orders_filter, batch_format="pyarrow")
        .join(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
            "inner",
            num_partitions=8,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
    )

    def li_partials(t: pa.Table) -> pa.Table:
        lut = ray.get(supp_ref)
        snat = lut.reindex(t["l_suppkey"].to_numpy(zero_copy_only=False)).to_numpy(
            np.int64
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "s_nat": snat,
                "rev": t["l_extendedprice"].to_numpy(zero_copy_only=False)
                * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)),
            }
        )
        p = df.groupby(["l_orderkey", "s_nat"], as_index=False).agg(
            part_rev=("rev", "sum"), part_n=("rev", "size")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partials, batch_format="pyarrow")

    def same_nation(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["s_nat"], pc.cast(t["c_nationkey"], pa.int64()))
        return t.filter(keep).select(["s_nat", "part_rev", "part_n"])

    agg = (
        li.join(oc, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
        .map_batches(same_nation, batch_format="pyarrow")
        .groupby("s_nat")
        .aggregate(
            Sum("part_rev", alias_name="revenue"),
            Sum("part_n", alias_name="n_items"),
        )
        .to_pandas()
    )
    out = agg.merge(names, left_on="s_nat", right_on="n_nationkey")
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype(np.int64)
    return (
        out[["r_name", "n_name", "revenue", "n_items"]]
        .sort_values(
            ["r_name", "revenue", "n_name"], ascending=[True, False, True]
        )
        .reset_index(drop=True)
    )


_SQL_Q5_LOCAL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name ORDER BY r_name, revenue DESC, n_name
"""


def q_active_nations(sf_dir: str) -> pd.DataFrame:
    """S11/A3 union+distinct: nations having customers ∪ nations having
    suppliers, sorted — the reference's URL-set merge sink shape."""
    nation = _small_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put(n2name)

    def to_name(col):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            names = ray.get(ref)
            return pd.DataFrame({"n_name": [names.get(k) for k in batch[col]]}).dropna()

        return fn

    cust = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        to_name("c_nationkey"), batch_format="pandas"
    )
    supp = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        to_name("s_nationkey"), batch_format="pandas"
    )
    vals = cust.union(supp).unique("n_name")
    return pd.DataFrame({"n_name": sorted(vals)})


_SQL_ACTIVE_NATIONS = """
SELECT DISTINCT n_name FROM (
  SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier
) t JOIN nation ON k = n_nationkey
ORDER BY n_name
"""


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Streaming-shaped tumbling window (SURVEY.md §2.9 note): 1-hour event
    windows via vectorized epoch arithmetic, then a direct groupby."""

    def windowed(batch: pa.Table) -> pa.Table:
        epoch_s = pc.divide(pc.cast(batch["ts"], pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch_s, 3600), 3600)
        return batch.append_column("window_start", win).drop_columns(["ts"])

    out = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(windowed, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    return (
        _round(out, {"sum_value": 2})
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )


_SQL_EVENTS_HOURLY = """
SELECT event_type, (epoch_us(ts) // 1000000 // 3600) * 3600 AS window_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def q_session_windows(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """§2.9 session windows (gaps-and-islands): per-user sessions split at
    >30 min of inactivity; one row per session (start, event count, value
    sum). ONE range-partitioned sort by (user_id, ts), vectorized
    maximal-run sessionization per batch, then the engine's
    sort+boundary-fixup pattern: only the ≤2 EDGE segments per batch (its
    first and last runs — the only ones that can straddle a batch split)
    go to the driver merge; interior sessions finalize distributed. The
    driver never holds more than O(#batches) rows (a per-user
    ``map_groups`` would pay ~1 ms/key and unbounded key counts at scale;
    collecting all summaries would pay O(#sessions) driver memory)."""
    GAP_US = 30 * 60 * 1_000_000

    empty = pa.schema(
        [
            ("user_id", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
            ("n_events", pa.int64()),
            ("sum_value", pa.float64()),
            ("edge", pa.bool_()),
        ]
    )

    def sess_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return empty.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        new = np.ones(n, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > GAP_US)
        idx = np.flatnonzero(new)
        ends = np.append(idx[1:], n)
        # a batch's interior runs are bounded by real >GAP gaps (or user
        # changes) on BOTH sides inside this batch — final by construction;
        # only its first and last run can continue across the batch split
        edge = np.zeros(len(idx), dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(u[idx], pa.int64()),
                "start_us": pa.array(ts[idx], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
                "n_events": pa.array(ends - idx, pa.int64()),
                "sum_value": pa.array(np.add.reduceat(v, idx), pa.float64()),
                "edge": pa.array(edge, pa.bool_()),
            }
        )

    def finalize_interior(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t["edge"]))
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"],
                "session_start": t["start_us"],
                "n_events": t["n_events"],
                "sum_value": pc.round(t["sum_value"], 2),
            }
        )

    def edges_only(t: pa.Table) -> pa.Table:
        return t.filter(t["edge"])

    # segment summaries (≤ #sessions rows, output-sized) materialize in the
    # object store so the edge collect and the interior finalize don't
    # re-run the event sort
    segs = (
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .sort(["user_id", "ts"])
        .map_batches(sess_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    interior = segs.map_batches(finalize_interior, batch_format="pyarrow")
    edges = segs.map_batches(edges_only, batch_format="pyarrow").to_pandas()
    if len(edges) == 0:
        out = interior.to_pandas()
        if len(out) == 0:
            return pd.DataFrame(
                columns=["user_id", "session_start", "n_events", "sum_value"]
            )
        return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    # edge fixup (metadata-sized: ≤2 rows per batch): batches partition the
    # sorted stream, so per-user edge segments are time-disjoint and ordered
    # — adjacent ones merge when the inactivity gap across the split is
    # <= GAP (chains spanning many batches fold via cumsum). An interior
    # segment can never fall between two mergeable edges: the batch's first
    # run ends with a real >GAP gap before any interior run starts.
    edges = edges.sort_values(["user_id", "start_us"]).reset_index(drop=True)
    brk = (edges["user_id"] != edges["user_id"].shift()) | (
        (edges["start_us"] - edges["end_us"].shift()) > GAP_US
    )
    merged = edges.groupby(brk.cumsum(), as_index=False).agg(
        user_id=("user_id", "first"),
        session_start=("start_us", "min"),
        n_events=("n_events", "sum"),
        sum_value=("sum_value", "sum"),
    )
    merged["sum_value"] = merged["sum_value"].round(2)
    merged = merged[["user_id", "session_start", "n_events", "sum_value"]]
    out = pd.concat([interior.to_pandas(), merged], ignore_index=True)
    return (
        out.sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


_SQL_SESSION_WINDOWS = """
WITH lagged AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM lagged
), sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, epoch_us(min(ts)) AS session_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def q_events_lag(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """§2.9 windowed lag (the as-of/self-join shape): per event, the
    previous event's value for the same user — ``lag(value) OVER
    (PARTITION BY user_id ORDER BY ts, event_id)``. ONE range-partitioned
    sort; every row except each batch's FIRST finalizes distributed (its
    predecessor is in-batch); the fixup set is 2 metadata rows per batch
    (head = the row needing a predecessor, tail = the row providing one),
    merged on the driver with a vectorized forward-fill — O(#batches)
    driver memory, no per-key groupby."""

    def lag_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts": t["ts"],
            "value": t["value"],
        }
        if n == 0:
            return pa.Table.from_pydict(
                {**cols, "prev_value": pa.array([], pa.float64()),
                 "kind": pa.array([], pa.int8())}
            )
        u = t["user_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        prev = np.empty(n, dtype=np.float64)
        prev[0] = np.nan  # resolved by the edge fixup
        prev[1:] = np.where(u[1:] == u[:-1], v[:-1], np.nan)
        # kind: 0 interior (final), 1 head (needs predecessor), 2 tail copy
        # (provides its value to the next batch's head)
        kind = np.zeros(n, dtype=np.int8)
        kind[0] = 1
        tail = {k: c.slice(n - 1, 1) for k, c in cols.items()}
        out = pa.Table.from_pydict(
            {**cols, "prev_value": pa.array(prev, pa.float64()),
             "kind": pa.array(kind, pa.int8())}
        )
        tail_t = pa.Table.from_pydict(
            {**tail, "prev_value": pa.array([v[-1]], pa.float64()),
             "kind": pa.array([2], pa.int8())}
        )
        return pa.concat_tables([out, tail_t])

    rows = (
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .sort(["user_id", "ts", "event_id"])
        .map_batches(lag_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    interior = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)), batch_format="pyarrow"
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    cols = ["event_id", "user_id", "value", "prev_value"]
    if len(edges) == 0:
        out = interior.to_pandas()
        return (
            out[cols].sort_values("event_id").reset_index(drop=True)
            if len(out)
            else pd.DataFrame(columns=cols)
        )
    # heads sort BEFORE an equal-key tail (a 1-row batch emits both for the
    # same event: its head's predecessor lives in an earlier batch, so the
    # forward-fill at the head must not see the row's own tail copy)
    edges = edges.sort_values(
        ["user_id", "ts", "event_id", "kind"], kind="stable"
    ).reset_index(drop=True)
    is_tail = edges["kind"] == 2
    last_tail_u = edges["user_id"].where(is_tail).ffill()
    # tails carry their own value in prev_value
    last_tail_v = edges["prev_value"].where(is_tail).ffill()
    heads = edges[edges["kind"] == 1].copy()
    same_user = last_tail_u[heads.index] == heads["user_id"]
    heads["prev_value"] = np.where(same_user, last_tail_v[heads.index], np.nan)
    out = pd.concat([interior.to_pandas()[cols], heads[cols]], ignore_index=True)
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_EVENTS_LAG = """
SELECT event_id, user_id, value,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
FROM events ORDER BY event_id
"""


def q_events_asof_join(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """Distributed AS-OF JOIN (an operator Ray Data lacks — §2.5 custom
    join shapes): every 'click' event joined to the same user's most
    recent 'purchase' at-or-before its timestamp. Sort-merge formulation:
    both streams tagged and range-partitioned by ONE (user_id, ts) sort;
    each batch resolves its probes against in-batch refs with a vectorized
    last-ref forward scan. Cross-batch dependency is confined to the
    batch's FIRST user (user runs are contiguous under the sort), so the
    fixup set is the unresolved head probes plus one running-state tail
    row per batch — O(#batches + first-user-edge rows) on the driver,
    the proven events_lag/session_windows edge-merge pattern. (user_id,
    ts) is unique in the events table, so no tie-break rank is needed.

    Oracle: DuckDB's native ASOF LEFT JOIN."""

    def asof_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        schema = {
            "event_id": pa.int64(), "user_id": pa.int64(), "ts_i": pa.int64(),
            "value": pa.float64(), "prev_purchase_value": pa.float64(),
            "kind": pa.int8(),
        }
        if n == 0:
            return pa.Table.from_pydict({k: pa.array([], v) for k, v in schema.items()})
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        is_ref = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        idx = np.arange(n)
        last_ref = np.maximum.accumulate(np.where(is_ref, idx, -1))
        valid = last_ref >= 0
        same_user = np.zeros(n, dtype=bool)
        same_user[valid] = u[last_ref[valid]] == u[valid]
        prev = np.full(n, np.nan)
        ok = valid & same_user
        prev[ok] = v[last_ref[ok]]
        probe = ~is_ref
        # unresolved probes of the batch's first user: their ref may live in
        # an earlier batch → head fixup rows; other unresolved probes are
        # final NULLs (their user starts inside this batch)
        head = probe & ~ok & (u == u[0])
        kind = np.zeros(n, dtype=np.int8)
        kind[head] = 1
        keep = probe
        out = pa.Table.from_pydict(
            {
                "event_id": pa.array(eid[keep], pa.int64()),
                "user_id": pa.array(u[keep], pa.int64()),
                "ts_i": pa.array(ts[keep], pa.int64()),
                "value": pa.array(v[keep], pa.float64()),
                "prev_purchase_value": pa.array(prev[keep], pa.float64()),
                "kind": pa.array(kind[keep], pa.int8()),
            }
        )
        refs = np.flatnonzero(is_ref)
        if refs.size:  # running-state tail: the batch's last ref row
            r = refs[-1]
            tail = pa.Table.from_pydict(
                {
                    "event_id": pa.array([int(eid[r])], pa.int64()),
                    "user_id": pa.array([int(u[r])], pa.int64()),
                    "ts_i": pa.array([int(ts[r])], pa.int64()),
                    "value": pa.array([float(v[r])], pa.float64()),
                    "prev_purchase_value": pa.array([float(v[r])], pa.float64()),
                    "kind": pa.array([2], pa.int8()),
                }
            )
            out = pa.concat_tables([out, tail])
        return out

    rows = (
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
        .map_batches(
            lambda t: t.filter(
                pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
            ),
            batch_format="pyarrow",
        )
        .sort(["user_id", "ts"])
        .map_batches(asof_batch, batch_format="pyarrow", batch_size=batch_size)
        .materialize()
    )
    interior = rows.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)), batch_format="pyarrow"
    )
    edges = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    cols = ["event_id", "user_id", "value", "prev_purchase_value"]
    if len(edges):
        edges = edges.sort_values(["user_id", "ts_i"], kind="stable").reset_index(drop=True)
        is_tail = edges["kind"] == 2
        last_tail_u = edges["user_id"].where(is_tail).ffill()
        last_tail_v = edges["prev_purchase_value"].where(is_tail).ffill()
        heads = edges[edges["kind"] == 1].copy()
        same = last_tail_u[heads.index] == heads["user_id"]
        heads["prev_purchase_value"] = np.where(
            same, last_tail_v[heads.index], np.nan
        )
        out = pd.concat([interior.to_pandas()[cols], heads[cols]], ignore_index=True)
    else:
        out = interior.to_pandas()
        out = out[cols] if len(out) else pd.DataFrame(columns=cols)
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_EVENTS_ASOF = """
SELECT c.event_id, c.user_id, c.value, p.value AS prev_purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts <= c.ts
ORDER BY c.event_id
"""


def q_user_max_value(sf_dir: str) -> pd.DataFrame:
    """A4 max-aggregate + O4 top-k with deterministic tiebreak."""
    out = (
        _read(sf_dir, "events", ["user_id", "value"])
        .groupby("user_id")
        .aggregate(Max("value", alias_name="max_value"))
        .to_pandas()
    )
    out = _round(out, {"max_value": 4})
    return (
        out.sort_values(["max_value", "user_id"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )


_SQL_USER_MAX = """
SELECT user_id, round(max(value), 4) AS max_value
FROM events GROUP BY user_id
ORDER BY max_value DESC, user_id LIMIT 20
"""


def q_event_type_stats(sf_dir: str) -> pd.DataFrame:
    """A6/A7 counts + mean per group."""
    out = (
        _read(sf_dir, "events", ["event_type", "value"])
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Mean("value", alias_name="avg_value"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    out = _round(out, {"avg_value": 4, "min_value": 4, "max_value": 4})
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_EVENT_TYPE_STATS = """
SELECT event_type, count(*) AS n_events, round(avg(value), 4) AS avg_value,
       round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_top_orders_by_qty(sf_dir: str) -> pd.DataFrame:
    """O4 sort-desc-limit over a grouped sum (per-vertex edge-count shape);
    direct groupby — Ray combines map-side."""
    agg = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="total_qty"))
    )
    return _topk_cut(
        agg, ["total_qty", "l_orderkey"], [False, True], 10,
        round_cols={"total_qty": 2},
    )[["l_orderkey", "total_qty"]]


_SQL_TOP_ORDERS_QTY = """
SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
FROM lineitem GROUP BY l_orderkey
ORDER BY total_qty DESC, l_orderkey LIMIT 10
"""

# ---------------------------------------------------------------------------
# documents: text analysis, fingerprinting, dedup (training-data ops)


def q_doc_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: content-hash column per batch, then a direct
    groupby(hash) Min/Count — the J4/A2 groupby-first pattern. Returns the
    surviving doc per text plus its duplicate count."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        fp = [A.content_md5(t) for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"fp": pa.array(fp, pa.string()), "doc_id": batch["doc_id"]}
        )

    out = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(hash_batch, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
        .to_pandas()
    )
    return out[["doc_id", "n_copies"]].sort_values("doc_id").reset_index(drop=True)


_SQL_DOC_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY doc_id
"""


def q_doc_token_counts(sf_dir: str) -> pd.DataFrame:
    """Token counting (whitespace tokens) over the documents table."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": [A.count_tokens_ws(t) for t in batch["text"]],
            }
        )

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_DOC_TOKENS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents ORDER BY doc_id
"""


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality scoring: char length, punctuation ratio, alpha ratio (the
    SQL-expressible subset; the full feature vector incl. stopword ratio is
    q_doc_quality_full, rows-only)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, t in zip(batch["doc_id"], batch["text"]):
            # integer counts, not ratios: Python rounds half-even, DuckDB
            # half-away — exact .XXXX5 boundaries would hash-mismatch
            rows.append((d, len(t), len(A._PUNCT.findall(t)), sum(ch.isalpha() for ch in t)))
        return pd.DataFrame(rows, columns=["doc_id", "n_chars_m", "n_punct", "n_alpha"])

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_DOC_QUALITY = """
SELECT doc_id, length(text) AS n_chars_m,
       length(text) - length(regexp_replace(text, '[^[:alnum:][:space:]_]', '', 'g')) AS n_punct,
       length(text) - length(regexp_replace(text, '[[:alpha:]]', '', 'g')) AS n_alpha
FROM documents ORDER BY doc_id
"""


def q_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Document fingerprinting: md5 of the E9-normalized text (the
    SQL-checkable fingerprint; the rolling-hash variant is rows-only)."""
    from ..functions.textnorm import normalize_ws_lower

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fp": [A.content_md5(normalize_ws_lower(t)) for t in batch["text"]],
            }
        )

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_DOC_FINGERPRINT = """
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents ORDER BY doc_id
"""


def _lang_id_sql() -> str:
    """SQL twin of ``analysis.lang_id``, generated from the SAME stopword
    tables so the two can never drift: per-language hit counts over the
    ``[a-z']+`` word stream, winner = first language (en,es,de,fr order)
    reaching the max, 'und' when every count is zero (exactly the python
    kernel's ``hits > best_hits`` fold)."""
    from ..functions.analysis import _LANG_STOPWORDS

    langs = ("en", "es", "de", "fr")
    hit_cols = ",\n    ".join(
        "sum(CASE WHEN w IN ({}) THEN 1 ELSE 0 END) AS {}".format(
            ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(_LANG_STOPWORDS[lang])),
            lang,
        )
        for lang in langs
    )
    pick = " ".join(f"WHEN {lang} = mx THEN '{lang}'" for lang in langs)
    return f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z'']+')) AS w
  FROM documents
), hits AS (
  SELECT doc_id,
    {hit_cols}
  FROM words GROUP BY doc_id
), scored AS (
  SELECT d.doc_id,
         coalesce(h.en, 0) AS en, coalesce(h.es, 0) AS es,
         coalesce(h.de, 0) AS de, coalesce(h.fr, 0) AS fr,
         greatest(coalesce(h.en, 0), coalesce(h.es, 0),
                  coalesce(h.de, 0), coalesce(h.fr, 0)) AS mx
  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
)
SELECT doc_id,
       CASE WHEN mx = 0 THEN 'und' {pick} END AS lang_pred
FROM scored ORDER BY doc_id
"""


_SQL_DOC_LANG_ID = _lang_id_sql()


def q_doc_lang_id(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic (stopword hits); SQL-oracled via the
    generated stopword-hit twin (``_lang_id_sql``)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": [A.lang_id(t) for t in batch["text"]],
            }
        )

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_quality_full(sf_dir: str) -> pd.DataFrame:
    """Full quality feature vector (Gopher/C4-style heuristics) — rows-only."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = [A.quality_features(t) for t in batch["text"]]
        out = pd.DataFrame(rows).round(4)
        out.insert(0, "doc_id", list(batch["doc_id"]))
        # BPE-ish token count alongside the whitespace count (both are
        # standard budget signals for training-data curation)
        out["n_tokens_bpe"] = [A.count_tokens_bpe(t) for t in batch["text"]]
        return out

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_quality_full_sql(sf_dir: str) -> pd.DataFrame:
    """The SQL-expressible slice of the full quality vector as exact integer
    counts (every ratio's numerator/denominator; no float rounding mode to
    match across engines). ``doc_quality_full`` keeps the float ratios plus
    ``n_tokens_bpe``, which stays rows-only — RE2 cannot express the GPT-2
    pre-tokenizer's lookahead."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = [A.quality_counts(t) for t in batch["text"]]
        out = pd.DataFrame(rows).astype("int64")
        out.insert(0, "doc_id", list(batch["doc_id"]))
        return out

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_STOPS_EN_SQL = ", ".join(
    f"'{w}'"
    for w in "the of and to in a is that it was for on are with as be at by this have from or had not but what all were when we there".split()
)

_SQL_DOC_QUALITY_FULL = f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS w FROM documents
), wc AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(w) AS word FROM words)
  GROUP BY doc_id, word
), mw AS (
  SELECT doc_id, max(c) AS max_word_count FROM wc GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(length(d.text) AS BIGINT) AS n_chars,
  CAST(len(words.w) AS BIGINT) AS n_words,
  CAST(length(d.text) - length(regexp_replace(d.text, '[^[:alnum:][:space:]_]', '', 'g')) AS BIGINT) AS n_punct,
  CAST(length(d.text) - length(regexp_replace(d.text, '[[:alpha:]]', '', 'g')) AS BIGINT) AS n_alpha,
  CAST(len(list_filter(words.w, x -> list_contains([{_STOPS_EN_SQL}], x))) AS BIGINT) AS n_stop,
  CAST(coalesce(list_aggregate(list_transform(words.w, x -> length(x)), 'sum'), 0) AS BIGINT) AS sum_word_len,
  CAST(coalesce(mw.max_word_count, 0) AS BIGINT) AS max_word_count
FROM documents d
JOIN words ON d.doc_id = words.doc_id
LEFT JOIN mw ON d.doc_id = mw.doc_id
ORDER BY d.doc_id
"""

def q_doc_gopher_filter(sf_dir: str) -> pd.DataFrame:
    """Gopher-style quality-rule FILTER (the curation decision on top of the
    quality signals): per-doc rule bits + the keep verdict, as pure integer
    predicates (``analysis.gopher_rules``) so the SQL oracle is exact."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = [A.gopher_rules(A.quality_counts(t)) for t in batch["text"]]
        out = pd.DataFrame(rows).astype("int64")
        out.insert(0, "doc_id", list(batch["doc_id"]))
        return out

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_DOC_GOPHER = f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z'']+') AS w FROM documents
), wc AS (
  SELECT doc_id, max(c) AS max_word_count FROM (
    SELECT doc_id, word, count(*) AS c
    FROM (SELECT doc_id, unnest(w) AS word FROM words) GROUP BY doc_id, word
  ) GROUP BY doc_id
), counts AS (
  SELECT d.doc_id,
    length(d.text) AS n_chars,
    len(words.w) AS n_words,
    length(d.text) - length(regexp_replace(d.text, '[[:alpha:]]', '', 'g')) AS n_alpha,
    len(list_filter(words.w, x -> list_contains([{_STOPS_EN_SQL}], x))) AS n_stop,
    coalesce(list_aggregate(list_transform(words.w, x -> length(x)), 'sum'), 0) AS sum_word_len,
    coalesce(wc.max_word_count, 0) AS max_word_count
  FROM documents d
  JOIN words ON d.doc_id = words.doc_id
  LEFT JOIN wc ON d.doc_id = wc.doc_id
), rules AS (
  SELECT doc_id,
    CASE WHEN n_words BETWEEN 30 AND 90 THEN 1 ELSE 0 END AS r_words,
    CASE WHEN 3*n_words <= sum_word_len AND sum_word_len <= 8*n_words THEN 1 ELSE 0 END AS r_word_len,
    CASE WHEN 4*n_alpha >= 3*n_chars THEN 1 ELSE 0 END AS r_alpha,
    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop,
    CASE WHEN 5*max_word_count <= n_words THEN 1 ELSE 0 END AS r_rep
  FROM counts
)
SELECT doc_id, r_words, r_word_len, r_alpha, r_stop, r_rep,
       r_words * r_word_len * r_alpha * r_stop * r_rep AS keep
FROM rules ORDER BY doc_id
"""


def q_curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """The FLAGSHIP composed curation chain a real training-data run
    executes end-to-end: Gopher quality FILTER → fuzzy-dedup DROP
    (non-canonical connected-component members, computed corpus-wide
    before filtering — dedup-then-filter ordering) → per-source keep-K
    QUOTA → packed per-source stats. Everything distributed: the verdict
    kernel runs per batch, the dup drop set (dup-node-sized) anti-joins
    hash-partitioned, the quota + aggregation fold inside source-hash
    bucket groups. Output = one integer row per surviving source
    (count, doc_id checksum, token mass) — the whole chain hash-gated
    by ONE composed SQL oracle."""
    from .curation import QUOTA_K, _doc_clusters, _source_bucket, cc_drop_ids

    drop_ds = cc_drop_ids(_doc_clusters(sf_dir))

    def verdict(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [
            A.gopher_rules(A.quality_counts(t))["keep"] == 1 for t in batch["text"]
        ]
        toks = [A.count_tokens_ws(t) for t in batch["text"]]
        out = pd.DataFrame(
            {
                "doc_id": list(batch["doc_id"]),
                "source": list(batch["source"]),
                "n_tokens": toks,
            }
        )
        return out[pd.Series(keep, index=out.index)].reset_index(drop=True)

    kept = _read(sf_dir, "documents", ["doc_id", "text", "source"]).map_batches(
        verdict, batch_format="pandas"
    )
    if drop_ds.count():
        kept = kept.join(
            drop_ds, "left_anti", num_partitions=8, on=("doc_id",), right_on=("drop_id",)
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sbucket"] = _source_bucket(df["source"])
        return df

    def quota_agg(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype="object"),
                    "n_kept": pd.Series([], dtype="int64"),
                    "sum_doc_id": pd.Series([], dtype="int64"),
                    "sum_tokens": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["source", "doc_id"], kind="stable")
        q = g.groupby("source", sort=False).head(QUOTA_K)
        out = q.groupby("source", as_index=False).agg(
            n_kept=("doc_id", "size"),
            sum_doc_id=("doc_id", "sum"),
            sum_tokens=("n_tokens", "sum"),
        )
        return out

    out = (
        kept.map_batches(add_bucket, batch_format="pandas")
        .groupby("sbucket")
        .map_groups(quota_agg, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("source").reset_index(drop=True)


def _sql_curation_pipeline() -> str:
    from .curation import QUOTA_K
    from .neardup import NGRAM_PAIRS_CTE

    return f"""
WITH RECURSIVE {NGRAM_PAIRS_CTE},
cc_edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM cc_edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN cc_edges e ON r.b = e.a
),
dropset AS (
  SELECT a AS doc_id FROM reach GROUP BY a HAVING least(a, min(b)) <> a
),
gwc AS (
  SELECT doc_id, max(c) AS max_word_count FROM (
    SELECT doc_id, word, count(*) AS c
    FROM (SELECT doc_id, unnest(w) AS word FROM words) GROUP BY doc_id, word
  ) GROUP BY doc_id
),
gcounts AS (
  SELECT d.doc_id,
    length(d.text) AS n_chars,
    len(words.w) AS n_words,
    length(d.text) - length(regexp_replace(d.text, '[[:alpha:]]', '', 'g')) AS n_alpha,
    len(list_filter(words.w, x -> list_contains([{_STOPS_EN_SQL}], x))) AS n_stop,
    coalesce(list_aggregate(list_transform(words.w, x -> length(x)), 'sum'), 0) AS sum_word_len,
    coalesce(gwc.max_word_count, 0) AS max_word_count
  FROM documents d
  JOIN words ON d.doc_id = words.doc_id
  LEFT JOIN gwc ON d.doc_id = gwc.doc_id
),
keepers AS (
  SELECT d.doc_id, d.source,
         CASE WHEN trim(d.text) = '' THEN 0
              ELSE length(regexp_split_to_array(trim(d.text), '\\s+')) END AS n_tokens
  FROM documents d JOIN gcounts c ON d.doc_id = c.doc_id
  WHERE c.n_words BETWEEN 30 AND 90
    AND 3*c.n_words <= c.sum_word_len AND c.sum_word_len <= 8*c.n_words
    AND 4*c.n_alpha >= 3*c.n_chars
    AND c.n_stop >= 2
    AND 5*c.max_word_count <= c.n_words
    AND d.doc_id NOT IN (SELECT doc_id FROM dropset)
),
quota AS (
  SELECT * FROM keepers
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= {QUOTA_K}
)
SELECT source, count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM quota GROUP BY source ORDER BY source
"""


def _pii_text_sql(col: str) -> str:
    """The deterministic PII-bearing derivation of a document's text (the
    synthetic corpus has no real PII, so the redaction operator is exercised
    on an injected contact line — same derivation on BOTH sides)."""
    return (
        f"{col} || ' Contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) || '.'"
    )


def q_doc_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII redaction (emails → phones → IPv4, ``functions/pii.py``) over a
    deterministic contact-enriched derivation of each document. Output is
    per-kind redaction counts + md5 of the scrubbed text; the oracle SQL is
    GENERATED from the same pattern strings (cannot drift)."""
    from ..functions.pii import PII_PATTERNS

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].astype("int64")
        # vectorized injection + scrub (pandas str kernels, one pass per
        # pattern in scrub order — counts taken before each replacement,
        # mirroring scrub_pii / the generated SQL exactly)
        s = (
            batch["text"].astype(str)
            + " Contact user" + d.astype(str) + "@example.com or +1-555-"
            + (d % 10000).astype(str).str.zfill(4)
            + " at 10.0." + (d % 256).astype(str) + "." + (d % 100).astype(str) + "."
        )
        out = {"doc_id": d}
        for name, pat, repl in PII_PATTERNS:
            out[f"n_{name}"] = s.str.count(pat).astype("int64")
            s = s.str.replace(pat, repl, regex=True)
        out["scrub_fp"] = [A.content_md5(t) for t in s]
        return pd.DataFrame(out)

    out = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _pii_scrub_sql() -> str:
    from ..functions.pii import count_sql_expr, scrub_sql_expr

    t2 = _pii_text_sql("text")
    return f"""
WITH enriched AS (SELECT doc_id, {t2} AS t2 FROM documents)
SELECT doc_id,
       {count_sql_expr('t2', 'email')} AS n_email,
       {count_sql_expr('t2', 'phone')} AS n_phone,
       {count_sql_expr('t2', 'ipv4')} AS n_ipv4,
       md5({scrub_sql_expr('t2')}) AS scrub_fp
FROM enriched ORDER BY doc_id
"""


_SQL_DOC_PII_SCRUB = _pii_scrub_sql()


# ---------------------------------------------------------------------------
# near-duplicate detection (cross-document — beyond the reference's E10
# within-document dedup; SURVEY.md §2.8 notes the reference has none)

from .neardup import (  # noqa: E402  (distributed near-dup operators)
    SQL_NGRAM_CONTAINMENT as _SQL_NGRAM_CONTAINMENT,
    SQL_NGRAM_JACCARD as _SQL_NGRAM_JACCARD,
    minhash_lsh_dups as q_minhash_lsh_dups,
    neardup_eval as q_neardup_eval,
    scrub_empty_blocks as _scrub_empty_blocks,
    ngram_containment_pairs as q_ngram_containment_pairs,
    ngram_jaccard_pairs as q_ngram_jaccard_pairs,
    ngram_prefix_pairs as q_ngram_prefix_pairs,
    simhash_buckets as q_simhash_buckets,
)
from . import curation as _curation  # noqa: E402  (corpus-curation operators)
from . import tpch as _tpch  # noqa: E402  (TPC-H-shaped relational classes)
from . import linkage as _linkage  # noqa: E402  (record linkage / data quality)
from . import analytics as _analytics  # noqa: E402  (windowed/ranked event ops)

# ---------------------------------------------------------------------------
# similarity search over embeddings


def _emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy via the list
    child buffer (np.stack over to_pylist measured ~10x slower)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), -1).astype(np.float64)


_ANN_QUERIES = 5
_ANN_TOPK = 10


def q_embedding_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-k: the query matrix (first 5 vec_ids) is
    broadcast once (ray.put); each batch does one float64 matmul; per-batch
    top-k partials are merged on the driver (k × queries rows per batch).
    Ties broken by (sim desc, vec_id asc); sims rounded to 4dp on both sides."""
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    order = np.argsort(qt["vec_id"].to_numpy())[: _ANN_QUERIES]
    q_ids = qt["vec_id"].to_numpy()[order]
    q_mat = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
    )
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_norm))

    def topk_batch(batch: pa.Table) -> pa.Table:
        q_ids_, q_norm_ = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy()
        mat = _emb_matrix(batch["embedding"])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = q_norm_ @ mat.T  # (Q, n)
        out_q, out_n, out_s = [], [], []
        k = min(_ANN_TOPK + 1, sims.shape[1])
        # rank on ROUNDED sims (the global ranking and the SQL oracle both
        # rank 4dp-rounded values): keep every row whose rounded sim ties
        # the batch's k-th rounded sim, so a raw-sim loser that rounds into
        # the cut can't be dropped batch-locally (ADVICE r01)
        sims_r = np.round(sims, 4)
        for qi in range(sims.shape[0]):
            thr = np.partition(sims_r[qi], -k)[-k]
            idx = np.nonzero(sims_r[qi] >= thr)[0]
            for j in idx:
                if ids[j] == q_ids_[qi]:
                    continue  # exclude self
                out_q.append(int(q_ids_[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.Table.from_pydict(
            {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
        )

    partials = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(topk_batch, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    partials["sim"] = partials["sim"].round(4)
    out = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    out = out.groupby("query_id", as_index=False).head(_ANN_TOPK)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


_SQL_EMBEDDING_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT 5
), sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, e.embedding), 4) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_embedding_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid: per-batch partial (sum vector, count) via one
    numpy reduction — the mergeable-sketch pattern — then a tiny final merge.
    Output long-form (label, pos, centroid) so SQL can unnest-compare."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy()
        mat = _emb_matrix(batch["embedding"])
        out_label, out_pos, out_sum, out_n = [], [], [], []
        for lab in np.unique(labels):
            sel = mat[labels == lab]
            s = sel.sum(axis=0)
            for pos in range(len(s)):
                out_label.append(int(lab))
                out_pos.append(pos + 1)  # 1-based like SQL generate_subscripts
                out_sum.append(float(s[pos]))
                out_n.append(int(sel.shape[0]))
        return pa.Table.from_pydict(
            {"label": out_label, "pos": out_pos, "vsum": out_sum, "n": out_n}
        )

    out = (
        rd.read_parquet(emb_path, columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby(["label", "pos"])
        .aggregate(Sum("vsum", alias_name="vsum"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["centroid"] = (out["vsum"] / out["n"]).round(4)
    return (
        out[["label", "pos", "centroid"]]
        .sort_values(["label", "pos"])
        .reset_index(drop=True)
    )


_SQL_EMBEDDING_CENTROIDS = """
SELECT label, pos, round(avg(val), 4) AS centroid
FROM (SELECT label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings)
GROUP BY label, pos ORDER BY label, pos
"""

# ---------------------------------------------------------------------------
# crawl pipeline queries (the north-star core; pages corpus is synthesized
# deterministically from the sf_dir documents table — no SQL oracle exists
# for these, the sequential oracle crawler + pytest are their gate)

_CRAWL_CACHE: dict[str, object] = {}


def _crawl_for(sf_dir: str):
    from ..sources.pages import generate_corpus
    from .crawl import CrawlEngine

    key = os.path.normpath(sf_dir)
    hit = _CRAWL_CACHE.get(key)
    if hit is not None:
        return hit
    from .. import __version__
    from ..sources.pages import GEN_VERSION

    corpus = generate_corpus(sf_dir)
    # cache key includes code + generator versions: a DONE run from an older
    # engine must not be resumed as current results
    run_dir = os.path.join(
        os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache"),
        f"crawlrun-{os.path.basename(key)}-n{corpus.n_pages}-e{__version__}-g{GEN_VERSION}",
    )
    eng = CrawlEngine(corpus, run_dir, max_rounds=64)
    result = eng.run(resume=True)
    eng.shutdown()  # actor CPU reservations would starve later queries
    _CRAWL_CACHE[key] = (corpus, result)
    return corpus, result


def q_crawl_extracted(sf_dir: str) -> pd.DataFrame:
    """Full frontier crawl → extracted table (fetch+extract north star).
    Oracled: the driver compares against the sequential oracle crawler's
    persisted expected table (pipelines/oracle.py persist_expected)."""
    _, result = _crawl_for(sf_dir)
    t = result.collect_extracted()
    df = t.select(
        ["url_hash", "canon_url", "depth", "hrank", "fetch_status", "n_chars"]
    ).to_pandas()
    df = df.astype({"depth": "int64", "hrank": "int64", "n_chars": "int64"})
    return df.sort_values("url_hash").reset_index(drop=True)


def q_crawl_order(sf_dir: str) -> pd.DataFrame:
    """The deterministic crawl-order ledger."""
    _, result = _crawl_for(sf_dir)
    order = result.assemble_order()
    return pd.DataFrame({"ord": range(len(order)), "url_hash": order})


def q_crawl_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-round frontier metrics (candidates/dedup/seen/robots/selected)."""
    _, result = _crawl_for(sf_dir)
    df = pd.DataFrame(result.metrics)
    cols = [
        "round", "candidates", "unique", "seen_dropped", "robots",
        "selected", "deferred",
    ]
    return df[cols].astype("int64")


# ---------------------------------------------------------------------------
# extraction-operator queries over the pages corpus (E2/E6/E7/E10 on stored
# HTML; rows-only — kernels are golden-tested, these exercise distribution)

_PRODUCT_CONFIG = {
    "text_content": {
        "product_name": ["h1.h4"],
        "manufacturer": "a.c-button-link",
        "highlights": ["div.mb-200.pb-200"],
        "description": "div.body-copy-lg",
        "buttons": {"specifications": {"button.show-specs": "table"}},
    },
    "skip": {"div#unavailable": "currently unavailable"},
}


_EXTRACT_FIELDS_CACHE: dict[str, pd.DataFrame] = {}


def q_extract_fields(sf_dir: str) -> pd.DataFrame:
    """E2/E3/F9: config-driven selector extraction over stored pages HTML,
    then E10 fuzzy field dedup — the reference's scrape_website loop
    (scrape_eccomerce.py:66-157) as a stateful actor-pool map_batches.
    Cached per sf_dir (the truth-oracled product slice shares the run)."""
    key = os.path.normpath(sf_dir)
    if key in _EXTRACT_FIELDS_CACHE:
        return _EXTRACT_FIELDS_CACHE[key].copy()
    from ..functions.fields import extract_fields
    from ..functions.fuzzy import deduplicate_fields
    from ..sources.pages import generate_corpus

    corpus = generate_corpus(sf_dir)

    class FieldExtractor:
        """Actor: config parsed once per worker (S3 config-loader shape)."""

        def __init__(self, config: dict):
            self.config = config

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {
                "url_hash": [], "product_name": [], "manufacturer": [],
                "n_fields": [], "skipped": [],
            }
            for h, html in zip(batch["url_hash"], batch["html"]):
                fields = extract_fields(bytes(html.as_py()), self.config)
                fields = deduplicate_fields(fields)
                out["url_hash"].append(h.as_py().hex())
                out["product_name"].append(fields.get("product_name", ""))
                out["manufacturer"].append(fields.get("manufacturer", ""))
                out["n_fields"].append(len(fields))
                out["skipped"].append(len(fields) == 0)
            return pa.Table.from_pydict(out)

    out = (
        rd.read_parquet(corpus.pages_dir, columns=["url_hash", "html"])
        .map_batches(
            FieldExtractor,
            fn_constructor_kwargs={"config": _PRODUCT_CONFIG},
            concurrency=2,
            batch_size=256,
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = out.sort_values("url_hash").reset_index(drop=True)
    _EXTRACT_FIELDS_CACHE[key] = out
    return out.copy()


def q_extract_fields_product(sf_dir: str) -> pd.DataFrame:
    """The generator-truth-oracled slice of ``extract_fields``: the product
    fields the renderer embedded (generator-writes vs parser-reads — an
    independent oracle, ``sources/pages.persist_truth``). ``n_fields`` stays
    in the rows-only parent query (its value depends on fuzzy-dedup
    interactions the truth table does not model)."""
    out = q_extract_fields(sf_dir)
    return out[["url_hash", "product_name", "manufacturer", "skipped"]]


def q_sessionize_pages(sf_dir: str) -> pd.DataFrame:
    """E6+E7: heading extraction + the reference sessionizer fold over
    stored pages; emits one row per (page, section)."""
    from ..functions.fields import extract_headings, sessionize
    from ..sources.pages import generate_corpus

    corpus = generate_corpus(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        out = {"url_hash": [], "heading_path": [], "body": []}
        for h, html in zip(batch["url_hash"], batch["html"]):
            sections = sessionize(extract_headings(bytes(html.as_py())))
            hh = h.as_py().hex()
            for key, val in sections.items():
                out["url_hash"].append(hh)
                out["heading_path"].append(key)
                out["body"].append(val)
        return pa.Table.from_pydict(
            {k: pa.array(v, pa.string()) for k, v in out.items()}
        )

    out = (
        rd.read_parquet(corpus.pages_dir, columns=["url_hash", "html"])
        .map_batches(fn, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    return out.sort_values(["url_hash", "heading_path"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# E23 pattern extraction (price/time/number regexes, ``util/scraper/
# proxy.py:13-15``) + the oracled deterministic-sample variant of O2


def q_event_props_numbers(sf_dir: str) -> pd.DataFrame:
    """E23 NUMBER_RE: first numeric literal per event's props JSON."""
    from ..functions.textnorm import NUMBER_RE

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        nums = []
        for p in batch["props"]:
            m = NUMBER_RE.search(p)
            nums.append(m.group(0) if m else "")
        return pd.DataFrame({"event_id": batch["event_id"], "num": nums})

    out = _read(sf_dir, "events", ["event_id", "props"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_EVENT_PROPS_NUMBERS = r"""
SELECT event_id,
       regexp_extract(props, '-?\d{1,3}(?:,\d{3})*(?:\.\d+)?') AS num
FROM events ORDER BY event_id
"""


def q_order_price_strings(sf_dir: str) -> pd.DataFrame:
    """E23 PRICE_RE round-trip: render each order total as display copy,
    extract the price back with the reference's price pattern. Cents-based
    rendering on both sides (python rounds half-even, DuckDB half-away —
    integer cents sidestep the boundary)."""
    from ..functions.textnorm import extract_prices

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for x in batch["o_totalprice"]:
            cents = int(round(float(x) * 100))
            rendered = f"Order total: ${cents // 100:,}.{cents % 100:02d} (incl. tax)"
            prices = extract_prices(rendered)
            outs.append(prices[0] if prices else "")
        return pd.DataFrame({"o_orderkey": batch["o_orderkey"], "price_str": outs})

    out = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        fn, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


_SQL_ORDER_PRICE_STRINGS = """
WITH c AS (
  SELECT o_orderkey, cast(round(o_totalprice * 100) AS bigint) AS cents
  FROM orders
)
SELECT o_orderkey,
       '$' || format('{:,}', cents // 100) || '.' ||
       lpad(cast(cents % 100 AS varchar), 2, '0') AS price_str
FROM c ORDER BY o_orderkey
"""


def q_doc_sample_hash(sf_dir: str) -> pd.DataFrame:
    """O2, oracled variant: deterministic hash-ordered sample — order by
    md5(doc_id), take 50. A distributed sort + limit whose SQL twin is
    exact (the seeded `random_shuffle` sample stays as `doc_sample`,
    rows-only)."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keys = [hashlib.md5(str(d).encode()).hexdigest() for d in ids]
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.int64()), "sk": pa.array(keys, pa.string())}
        )

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("sk")
        .limit(50)
        .to_pandas()
    )
    return out[["doc_id", "sk"]].reset_index(drop=True)


_SQL_DOC_SAMPLE_HASH = """
SELECT doc_id, md5(cast(doc_id AS varchar)) AS sk
FROM documents ORDER BY sk LIMIT 50
"""


# ---------------------------------------------------------------------------
# registry


def all_queries():
    """Registration order matters: the driver checks the FIRST 50 entries.
    Round 5 rotates the window again (VERDICT r4 #1): slots 1-5 keep the
    crawl core + the two former red rows as regression canaries; slots 6-50
    are 45 queries that had never produced a CORRECTNESS row (events
    windowing / orders robust-stats / media / graph / vocab families).
    Everything green in CORRECTNESS_r04 moved below the window."""
    return {
        "crawl_extracted": q_crawl_extracted,
        "crawl_order": q_crawl_order,
        "crawl_metrics": q_crawl_metrics,
        "doc_quality_full_sql": q_doc_quality_full_sql,
        "embedding_knn_eval": q_embedding_knn_eval,
        "crawl_host_profile": q_crawl_host_profile,
        "events_window_count": _analytics.q_events_window_count,
        "events_topk_per_user": _analytics.q_events_topk_per_user,
        "events_sliding": _analytics.q_events_sliding,
        "events_retention": _analytics.q_events_retention,
        "events_outliers": _analytics.q_events_outliers,
        "events_hourly_users": _analytics.q_events_hourly_users,
        "events_moving_avg": _analytics.q_events_moving_avg,
        "events_pivot": _analytics.q_events_pivot,
        "events_transitions": _analytics.q_events_transitions,
        "events_user_sets": _analytics.q_events_user_sets,
        "events_chi_square": _curation.q_events_chi_square,
        "events_seasonal_anomaly": _analytics.q_events_seasonal_anomaly,
        "events_journeys": _analytics.q_events_journeys,
        "events_rfm_segments": _analytics.q_events_rfm_segments,
        "events_cdc_upsert": _analytics.q_events_cdc_upsert,
        "events_rate_limit": _analytics.q_events_rate_limit,
        "events_band_join": _analytics.q_events_band_join,
        "events_attribution": _analytics.q_events_attribution,
        "events_funnel_windowed": _analytics.q_events_funnel_windowed,
        "events_scd_intervals": _analytics.q_events_scd_intervals,
        "events_pattern_match": _analytics.q_events_pattern_match,
        "events_running_clamp": _analytics.q_events_running_clamp,
        "events_twap": _analytics.q_events_twap,
        "events_auc": _analytics.q_events_auc,
        "events_value_mad": _analytics.q_events_value_mad,
        "orders_cube": _analytics.q_orders_cube,
        "orders_rollup": _analytics.q_orders_rollup,
        "orders_pareto": _analytics.q_orders_pareto,
        "orders_monthly_locf": _analytics.q_orders_monthly_locf,
        "orders_diversified_topk": _analytics.q_orders_diversified_topk,
        "orders_skyline": _analytics.q_orders_skyline,
        "orders_snapshot_diff": _analytics.q_orders_snapshot_diff,
        "orders_golden_record": _analytics.q_orders_golden_record,
        "orders_view_maintenance": _analytics.q_orders_view_maintenance,
        "orders_exact_median": _tpch.q_orders_exact_median,
        "orders_winsorized_mean": _tpch.q_orders_winsorized_mean,
        "orders_median_by_priority": _tpch.q_orders_median_by_priority,
        "media_resize": q_media_resize,
        "media_frames": q_media_frames,
        "media_exact_dedup": q_media_exact_dedup,
        "media_phash_dups": q_media_phash_dups,
        "kg_bfs_depths": q_kg_bfs_depths,
        "vocab_heavy_hitters": _curation.q_vocab_heavy_hitters,
        "doc_bpe_encode": _curation.q_doc_bpe_encode,
        # --- end of the round-5 driver-checked window (50 entries) ---
        "extract_cascade": q_extract_cascade,
        "judge_panel": q_judge_panel,
        "triplet_validation_text": q_triplet_validation_text,
        "precision_recall_eval": q_precision_recall_eval,
        "image_analysis": q_image_analysis,
        "media_decode": q_media_decode,
        "search_discovery": q_search_discovery,
        "doc_sample_hash": q_doc_sample_hash,
        "embedding_dups_lsh": q_embedding_dups_lsh,
        "embedding_dedup_clusters": q_embedding_dedup_clusters,
        "kg_components": q_kg_components,
        "kg_pagerank": q_kg_pagerank,
        "kg_triangles": q_kg_triangles,
        "kg_kcore": q_kg_kcore,
        "doc_dedup_clusters": _curation.q_doc_dedup_clusters,
        "doc_dedup_corpus": _curation.q_doc_dedup_corpus,
        "doc_incremental_dedup": _curation.q_doc_incremental_dedup,
        "doc_dup_cluster_sizes": _curation.q_doc_dup_cluster_sizes,
        "vocab_bpe_train": _curation.q_vocab_bpe_train,
        "curation_pipeline": q_curation_pipeline,
        "doc_decontaminate": _curation.q_doc_decontaminate,
        "doc_repetition": _curation.q_doc_repetition,
        "doc_source_quota": _curation.q_doc_source_quota,
        "doc_token_bins": _curation.q_doc_token_bins,
        "doc_weighted_sample": _curation.q_doc_weighted_sample,
        "doc_length_quantiles": _curation.q_doc_length_quantiles,
        "doc_chunk": _curation.q_doc_chunk,
        "doc_export_splits": _curation.q_doc_export_splits,
        "vocab_top_terms": _curation.q_vocab_top_terms,
        "vocab_top_terms_by_source": _curation.q_vocab_top_terms_by_source,
        "vocab_bpe_pairs": _curation.q_vocab_bpe_pairs,
        "doc_percentile_in_source": _curation.q_doc_percentile_in_source,
        "source_divergence": _curation.q_source_divergence,
        "doc_unigram_scores": _curation.q_doc_unigram_scores,
        "doc_rarest_term": _curation.q_doc_rarest_term,
        "doc_tfidf_top_terms": _curation.q_doc_tfidf_top_terms,
        "doc_bigram_scores": _curation.q_doc_bigram_scores,
        "doc_search_terms": _curation.q_doc_search_terms,
        "doc_bm25_topk": _curation.q_doc_bm25_topk,
        "doc_dup_span_scrub": _curation.q_doc_dup_span_scrub,
        "doc_split_assign": _curation.q_doc_split_assign,
        "orders_ntile": _analytics.q_orders_ntile,
        "events_funnel": _analytics.q_events_funnel,
        "events_range_join": _analytics.q_events_range_join,
        "events_debounce": _analytics.q_events_debounce,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "revenue_by_nation": q_revenue_by_nation,
        "mktsegments": q_mktsegments,
        "customers_without_orders": q_customers_without_orders,
        "parts_shipped_by_brand": q_parts_shipped_by_brand,
        "orders_bloom_semijoin": q_orders_bloom_semijoin,
        "q3_shipping_priority": q_q3_shipping_priority,
        "q5_local_supplier_volume": q_q5_local_supplier_volume,
        "q18_large_orders": q_q18_large_orders,
        "part_name_fuzzy_join": q_part_name_fuzzy_join,
        "active_nations": q_active_nations,
        "events_hourly": q_events_hourly,
        "events_hourly_json": q_events_hourly_json,
        "events_hourly_csv": q_events_hourly_csv,
        "neardup_eval": q_neardup_eval,
        "session_windows": q_session_windows,
        "events_lag": q_events_lag,
        "events_asof_join": q_events_asof_join,
        "user_max_value": q_user_max_value,
        "event_type_stats": q_event_type_stats,
        "top_orders_by_qty": q_top_orders_by_qty,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_token_counts": q_doc_token_counts,
        "doc_quality": q_doc_quality,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_lang_id": q_doc_lang_id,
        "doc_lang_confusion": q_doc_lang_confusion,
        "doc_quality_full": q_doc_quality_full,
        "doc_gopher_filter": q_doc_gopher_filter,
        "doc_pii_scrub": q_doc_pii_scrub,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "ngram_containment_pairs": q_ngram_containment_pairs,
        "minhash_lsh_dups": q_minhash_lsh_dups,
        "simhash_buckets": q_simhash_buckets,
        "embedding_topk": q_embedding_topk,
        "embedding_hard_negatives": q_embedding_hard_negatives,
        "embedding_linear_probe": q_embedding_linear_probe,
        "embedding_centroids": q_embedding_centroids,
        "embedding_source_centroids": q_embedding_source_centroids,
        "extract_fields": q_extract_fields,
        "extract_fields_product": q_extract_fields_product,
        "sessionize_pages": q_sessionize_pages,
        "triplet_extraction": q_triplet_extraction,
        "triplets_dedup": q_triplets_dedup,
        "kg_nodes": q_kg_nodes,
        "kg_top_vertices": q_kg_top_vertices,
        "kg_export": q_kg_export,
        "media_features": q_media_features,
        "doc_sample": q_doc_sample,
        "embedding_dups": q_embedding_dups,
        "embedding_topk_lsh": q_embedding_topk_lsh,
        "embedding_topk_ivf": q_embedding_topk_ivf,
        "embedding_topk_pq": q_embedding_topk_pq,
        "event_props_numbers": q_event_props_numbers,
        "order_price_strings": q_order_price_strings,
        "events_distinct_users": _analytics.q_events_distinct_users,
        "events_distinct_hll": _analytics.q_events_distinct_hll,
        "orders_cust_distribution": _analytics.q_orders_cust_distribution,
        "events_value_histogram": _analytics.q_events_value_histogram,
        "lineitem_corr": _analytics.q_lineitem_corr,
        "orders_open_by_month": _analytics.q_orders_open_by_month,
        "nation_segments": _analytics.q_nation_segments,
        "users_week_delta": _analytics.q_users_week_delta,
        "event_value_quantiles": _analytics.q_event_value_quantiles_by_type,
        "doc_phrase_search": _curation.q_doc_phrase_search,
        "ngram_prefix_pairs": q_ngram_prefix_pairs,
        "word_cooccurrence": _curation.q_word_cooccurrence,
        "doc_split_leakage_safe": _curation.q_doc_split_leakage_safe,
        "doc_stratified_sample": _curation.q_doc_stratified_sample,
        "doc_mixture_order": _curation.q_doc_mixture_order,
        "lineitem_lone_return_supplier": _analytics.q_lineitem_lone_return_supplier,
        "events_profile": _analytics.q_events_profile,
        "lineitem_small_qty_revenue": _analytics.q_lineitem_small_qty_revenue,
        "part_cheapest_supplier": _analytics.q_part_cheapest_supplier,
        "orders_partition_checksum": _analytics.q_orders_partition_checksum,
        "orders_discount_scenarios": _analytics.q_orders_discount_scenarios,
        "part_name_snm_pairs": _analytics.q_part_name_snm_pairs,
        "customer_mode_segment": _analytics.q_customer_mode_segment,
        "embedding_dim_stats": _analytics.q_embedding_dim_stats,
        "doc_feature_hash": _curation.q_doc_feature_hash,
        "orders_zorder_layout": _analytics.q_orders_zorder_layout,
        "q7_nation_volume": _tpch.q_q7_nation_volume,
        "q8_market_share": _tpch.q_q8_market_share,
        "q9_product_profit": _tpch.q_q9_product_profit,
        "q10_returned_revenue": _tpch.q_q10_returned_revenue,
        "part_value_concentration": _tpch.q_part_value_concentration,
        "q12_priority_class": _tpch.q_q12_priority_class,
        "q14_promo_effect": _tpch.q_q14_promo_effect,
        "q15_top_supplier": _tpch.q_q15_top_supplier,
        "supplier_part_counts": _tpch.q_supplier_part_counts,
        "q19_disjunctive_revenue": _tpch.q_q19_disjunctive_revenue,
        "supplier_part_share": _tpch.q_supplier_part_share,
        "missed_opportunities": _tpch.q_missed_opportunities,
        "customer_name_ed1_pairs": _linkage.q_customer_name_ed1_pairs,
        "events_activity_bitmap": _linkage.q_events_activity_bitmap,
        "referential_integrity_audit": _linkage.q_referential_integrity_audit,
        "doc_ks_distance": _curation.q_doc_ks_distance,
        "events_hourly_ipc": q_events_hourly_ipc,
        "kg_link_scores": q_kg_link_scores,
        "orders_gini": _tpch.q_orders_gini,
        "orders_benford": _linkage.q_orders_benford,
        # whisper-shaped transcript proxy (M11 real kernel; VERDICT r4 #7)
        "media_audio_features": q_media_audio_features,
        # PCA spectrum from an exact mergeable integer Gram sketch
        "embedding_pca": _analytics.q_embedding_pca,
        # TPC-H Q4/Q6 shapes (decorrelated EXISTS max-join; exact filter-fold)
        "q4_order_priority": _tpch.q_q4_order_priority,
        "q6_forecast_revenue": _tpch.q_q6_forecast_revenue,
        # Gopher-class compression-ratio curation filter (zlib byte facts)
        "doc_compression_ratio": _curation.q_doc_compression_ratio,
    }


def _crawl_oracle_sqls() -> dict[str, str]:
    """Oracle SQL for the crawl core: trivial SELECTs over the sequential
    oracle crawler's PERSISTED expected tables (an independent
    implementation — pipelines/oracle.py), so engine-vs-oracle equality is
    driver-visible, not pytest-only. The compare scale is the driver's
    (sf0.01); check_queries overrides via LLMSR_ORACLE_SF_DIR."""
    from .oracle import persist_expected

    sf = os.environ.get("LLMSR_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    exp = persist_expected(sf)
    return {
        "crawl_extracted": (
            "SELECT url_hash, canon_url, depth, hrank, fetch_status, n_chars "
            f"FROM read_parquet('{exp}/extracted.parquet') ORDER BY url_hash"
        ),
        "crawl_order": (
            f"SELECT ord, url_hash FROM read_parquet('{exp}/order.parquet') "
            "ORDER BY ord"
        ),
        "crawl_metrics": (
            'SELECT "round", candidates, "unique", seen_dropped, robots, '
            f"selected, deferred FROM read_parquet('{exp}/metrics.parquet') "
            'ORDER BY "round"'
        ),
        # host re-derived from canon_url so the engine's carried host
        # column is cross-checked against the URL canonicalization
        "crawl_host_profile": (
            "SELECT split_part(canon_url, '/', 3) AS host, depth, "
            "CAST(count(*) AS BIGINT) AS n_pages, "
            "CAST(count(*) FILTER (fetch_status = 'hit') AS BIGINT) AS n_hits, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            f"FROM read_parquet('{exp}/extracted.parquet') "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
    }


def _truth_oracle_sqls() -> dict[str, str]:
    """Oracle SQL over the generator's PERSISTED ground-truth table
    (``sources/pages.persist_truth``): the renderer records what it embedded;
    the extraction pipeline must recover it. skipped = policy page OR
    unavailable product (both yield zero extracted fields — F9 semantics)."""
    from ..sources.pages import persist_truth

    sf = os.environ.get("LLMSR_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    root = persist_truth(sf)
    return {
        "extract_fields_product": f"""
SELECT url_hash,
       CASE WHEN is_product AND NOT unavailable THEN product_name ELSE '' END AS product_name,
       CASE WHEN is_product AND NOT unavailable THEN manufacturer ELSE '' END AS manufacturer,
       (NOT is_product) OR unavailable AS skipped
FROM read_parquet('{root}/fields.parquet') ORDER BY url_hash
""",
        "sessionize_pages": f"""
SELECT url_hash, heading_path, body
FROM read_parquet('{root}/sessions.parquet') ORDER BY url_hash, heading_path
""",
        "media_decode": f"""
SELECT media_id, kind, width, height, sample_rate, n_samples, sum_vals
FROM read_parquet('{_media_truth(sf)}') ORDER BY media_id
""",
    }


def _media_truth(sf: str) -> str:
    from ..sources.media import persist_media_truth

    return persist_media_truth(sf)


def _triplet_oracle_sqls() -> dict[str, str]:
    """Oracle SQL for the triplet/KG chain over the SEQUENTIAL oracle's
    persisted expected triplets (``pipelines/oracle_triplets.py`` — a plain
    per-document loop, the reference's own orchestration shape). The dedup /
    node / top-vertex queries are derived IN SQL from the raw expected rows,
    so the distributed groupbys are checked against an independent
    re-statement of their semantics (graph_key re-expressed with
    regexp_replace)."""
    from .oracle_triplets import (
        persist_expected_kcore,
        persist_expected_pagerank,
        persist_expected_triplets,
    )

    sf = os.environ.get("LLMSR_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = persist_expected_triplets(sf, _GATE)
    pr_path = persist_expected_pagerank(sf, _GATE)
    kc_path = persist_expected_kcore(sf, _GATE, _KCORE_K)
    key = "subj_type, subj_name, pred, obj_type, obj_name"
    gk = (
        lambda col: "regexp_replace(regexp_replace("
        f"{col}, '\\s+', '', 'g'), '[^a-zA-Z0-9_-]', '_', 'g')"
    )
    return {
        "triplet_extraction": (
            f"SELECT url_hash, {key}, weight, method "
            f"FROM read_parquet('{path}') ORDER BY {key}"
        ),
        "triplets_dedup": f"""
SELECT {key}, round(max(weight), 4) AS weight, count(*) AS n_sources,
       min(url_hash) AS first_url_hash
FROM read_parquet('{path}') GROUP BY {key} ORDER BY {key}
""",
        "kg_nodes": f"""
WITH dedup AS (
  SELECT subj_type, subj_name, obj_type, obj_name
  FROM read_parquet('{path}') GROUP BY {key}
), exploded AS (
  SELECT subj_type AS node_type, {gk('subj_name')} AS node_key,
         subj_name AS name FROM dedup
  UNION ALL
  SELECT obj_type, {gk('obj_name')}, obj_name FROM dedup
)
SELECT node_type, node_key, min(name) AS name
FROM exploded GROUP BY node_type, node_key ORDER BY node_type, node_key
""",
        "kg_top_vertices": f"""
WITH dedup AS (
  SELECT obj_type, obj_name FROM read_parquet('{path}') GROUP BY {key}
)
SELECT obj_type AS to_type, {gk('obj_name')} AS to_key,
       count(*) AS n_edges
FROM dedup GROUP BY to_type, to_key
ORDER BY n_edges DESC, to_key ASC LIMIT 10
""",
        "triplet_validation_text": f"""
SELECT method, count(*) AS n, round(avg(weight), 4) AS mean_weight,
       CAST(sum(CASE WHEN weight > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero
FROM read_parquet('{path}') GROUP BY method ORDER BY method
""",
        "kg_pagerank": (
            "SELECT node_type, node_key, pagerank "
            f"FROM read_parquet('{pr_path}') ORDER BY node_type, node_key"
        ),
        "kg_kcore": (
            "SELECT node_type, node_key, in_kcore "
            f"FROM read_parquet('{kc_path}') ORDER BY node_type, node_key"
        ),
        "kg_triangles": f"""
WITH dedup AS (
  SELECT subj_type, subj_name, obj_type, obj_name
  FROM read_parquet('{path}') GROUP BY {key}
), hashed AS (
  SELECT subj_type, {gk('subj_name')} AS subj_key,
         obj_type, {gk('obj_name')} AS obj_key FROM dedup
), he AS (
  SELECT
    CAST(md5_number_lower(subj_type || '|' || subj_key)
         % 9223372036854775808 AS BIGINT) AS a,
    CAST(md5_number_lower(obj_type || '|' || obj_key)
         % 9223372036854775808 AS BIGINT) AS b,
    subj_type, subj_key, obj_type, obj_key
  FROM hashed
), nodes AS (
  SELECT subj_type AS node_type, subj_key AS node_key, a AS h FROM he
  UNION
  SELECT obj_type, obj_key, b FROM he
), e0 AS (
  SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y FROM he WHERE a <> b
), tri AS (
  SELECT e1.x AS v1, e1.y AS v2, e2.y AS v3
  FROM e0 e1 JOIN e0 e2 ON e2.x = e1.y
  JOIN e0 e3 ON e3.x = e1.x AND e3.y = e2.y
), tn AS (
  SELECT v1 AS h FROM tri UNION ALL SELECT v2 FROM tri
  UNION ALL SELECT v3 FROM tri
), tc AS (SELECT h, count(*) AS c FROM tn GROUP BY h)
SELECT n.node_type, n.node_key, CAST(coalesce(tc.c, 0) AS BIGINT) AS n_triangles
FROM nodes n LEFT JOIN tc ON tc.h = n.h
ORDER BY node_type, node_key
""",
        "kg_link_scores": f"""
WITH dedup AS (
  SELECT subj_type, subj_name, obj_type, obj_name
  FROM read_parquet('{path}') GROUP BY {key}
), hashed AS (
  SELECT subj_type, {gk('subj_name')} AS subj_key,
         obj_type, {gk('obj_name')} AS obj_key FROM dedup
), he AS (
  SELECT
    CAST(md5_number_lower(subj_type || '|' || subj_key)
         % 9223372036854775808 AS BIGINT) AS a,
    CAST(md5_number_lower(obj_type || '|' || obj_key)
         % 9223372036854775808 AS BIGINT) AS b,
    subj_type, subj_key, obj_type, obj_key
  FROM hashed
), nodes AS (
  SELECT subj_type AS node_type, subj_key AS node_key, a AS h FROM he
  UNION
  SELECT obj_type, obj_key, b FROM he
), e0 AS (
  SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y FROM he WHERE a <> b
), adj AS (
  SELECT x AS n, y AS p FROM e0 UNION ALL SELECT y, x FROM e0
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY n
), cn AS (
  SELECT e.x, e.y, CAST(count(*) AS BIGINT) AS c
  FROM e0 e
  JOIN adj a1 ON a1.n = e.x
  JOIN adj a2 ON a2.n = e.y AND a2.p = a1.p
  GROUP BY e.x, e.y
)
SELECT na.node_type AS a_type, na.node_key AS a_key,
       nb.node_type AS b_type, nb.node_key AS b_key,
       da.d AS deg_a, db.d AS deg_b,
       CAST(coalesce(cn.c, 0) AS BIGINT) AS n_common,
       CAST(coalesce(cn.c, 0) AS DOUBLE)
         / (da.d + db.d - coalesce(cn.c, 0)) AS jaccard
FROM e0
JOIN nodes na ON na.h = e0.x
JOIN nodes nb ON nb.h = e0.y
JOIN deg da ON da.n = e0.x
JOIN deg db ON db.n = e0.y
LEFT JOIN cn ON cn.x = e0.x AND cn.y = e0.y
ORDER BY a_type, a_key, b_type, b_key
""",
        "kg_bfs_depths": f"""
WITH RECURSIVE dedup AS (
  SELECT subj_type, subj_name, obj_type, obj_name
  FROM read_parquet('{path}') GROUP BY {key}
), hashed AS (
  SELECT subj_type, {gk('subj_name')} AS subj_key,
         obj_type, {gk('obj_name')} AS obj_key FROM dedup
), he AS (
  SELECT
    CAST(md5_number_lower(subj_type || '|' || subj_key)
         % 9223372036854775808 AS BIGINT) AS a,
    CAST(md5_number_lower(obj_type || '|' || obj_key)
         % 9223372036854775808 AS BIGINT) AS b,
    subj_type, subj_key, obj_type, obj_key
  FROM hashed
), nodes AS (
  SELECT subj_type AS node_type, subj_key AS node_key, a AS h FROM he
  UNION
  SELECT obj_type, obj_key, b FROM he
), e0 AS (
  SELECT a, b FROM he WHERE a <> b
  UNION SELECT b, a FROM he WHERE a <> b
), walk(h, d) AS (
  SELECT DISTINCT a, 0 FROM e0 WHERE a % 8 = 0
  UNION
  SELECT e.b, w.d + 1 FROM walk w JOIN e0 e ON e.a = w.h WHERE w.d < 40
)
SELECT n.node_type, n.node_key, CAST(min(w.d) AS BIGINT) AS depth
FROM nodes n JOIN walk w ON w.h = n.h
GROUP BY n.node_type, n.node_key
ORDER BY node_type, node_key
""",
        "kg_components": f"""
WITH RECURSIVE dedup AS (
  SELECT subj_type, subj_name, obj_type, obj_name
  FROM read_parquet('{path}') GROUP BY {key}
), hashed AS (
  SELECT subj_type, {gk('subj_name')} AS subj_key,
         obj_type, {gk('obj_name')} AS obj_key FROM dedup
), he AS (
  SELECT
    CAST(md5_number_lower(subj_type || '|' || subj_key)
         % 9223372036854775808 AS BIGINT) AS a,
    CAST(md5_number_lower(obj_type || '|' || obj_key)
         % 9223372036854775808 AS BIGINT) AS b,
    subj_type, subj_key, obj_type, obj_key
  FROM hashed
), nodes AS (
  SELECT subj_type AS node_type, subj_key AS node_key, a AS h FROM he
  UNION
  SELECT obj_type, obj_key, b FROM he
), edges AS (
  SELECT a, b FROM he UNION SELECT b, a FROM he
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT n.node_type, n.node_key,
       least(n.h, coalesce(min(r.b), n.h)) AS component_id
FROM nodes n LEFT JOIN reach r ON r.a = n.h
GROUP BY n.node_type, n.node_key, n.h
ORDER BY node_type, node_key
""",
    }


def _analysis_oracle_sqls() -> dict[str, str]:
    """Oracle SQL over the sequential analysis oracles' persisted expected
    tables (``pipelines/oracle_analysis.py``: E8 cascade, M4 image-entity
    union, M9 macro P/R/F1, M6 judge panel — each a plain per-record loop,
    the reference's own orchestration shape)."""
    from .oracle_analysis import (
        persist_expected_cascade,
        persist_expected_discovery,
        persist_expected_embdups_lsh,
        persist_expected_fields,
        persist_expected_image_entities,
        persist_expected_judgments,
        persist_expected_media,
        persist_expected_bpe,
        persist_expected_bpe_encode,
        persist_expected_audio_features,
        persist_expected_compression,
        persist_expected_embedding_pca,
        persist_expected_media_frames,
        persist_expected_media_phash,
        persist_expected_media_resize,
        persist_expected_minhash,
        persist_expected_minhash_cands,
        persist_expected_pr_macro,
        persist_expected_simhash,
    )
    from .neardup import NGRAM_PAIRS_CTE as _NGRAM_PAIRS_CTE

    sf = os.environ.get("LLMSR_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return {
        "extract_fields": (
            "SELECT url_hash, product_name, manufacturer, n_fields, skipped FROM "
            f"read_parquet('{persist_expected_fields(sf, _PRODUCT_CONFIG)}') "
            "ORDER BY url_hash"
        ),
        "vocab_bpe_train": (
            'SELECT "round", "left", "right", "count" FROM '
            f"read_parquet('{persist_expected_bpe(sf, _curation.BPE_MERGES)}') "
            'ORDER BY "round"'
        ),
        "doc_bpe_encode": (
            "SELECT doc_id, n_tokens_bpe_trained, tok_crc FROM "
            f"read_parquet('{persist_expected_bpe_encode(sf, _curation.BPE_MERGES)}') "
            "ORDER BY doc_id"
        ),
        "media_resize": (
            "SELECT media_id, out_w, out_h, out_sum, out_crc FROM "
            f"read_parquet('{persist_expected_media_resize(sf)}') ORDER BY media_id"
        ),
        "media_phash_dups": (
            "SELECT doc_a, doc_b, hamming FROM "
            f"read_parquet('{persist_expected_media_phash(sf)}') "
            "ORDER BY doc_a, doc_b"
        ),
        "media_frames": (
            "SELECT media_id, frame_no, energy, zero_crossings FROM "
            f"read_parquet('{persist_expected_media_frames(sf)}') "
            "ORDER BY media_id, frame_no"
        ),
        "media_audio_features": (
            "SELECT media_id, n_frames, n_speech, n_segments, est_tokens FROM "
            f"read_parquet('{persist_expected_audio_features(sf)}') "
            "ORDER BY media_id"
        ),
        "embedding_pca": (
            "SELECT comp, eigval, evr, trace_scatter FROM "
            f"read_parquet('{persist_expected_embedding_pca(sf)}') ORDER BY comp"
        ),
        "doc_compression_ratio": (
            "SELECT doc_id, raw_bytes, comp_bytes, keep FROM "
            f"read_parquet('{persist_expected_compression(sf)}') ORDER BY doc_id"
        ),
        "neardup_eval": (
            f"""WITH RECURSIVE {_NGRAM_PAIRS_CTE},
cands AS (SELECT doc_a, doc_b FROM read_parquet('{persist_expected_minhash_cands(sf)}'))
SELECT (SELECT count(*) FROM pairs) AS n_exact,
       (SELECT count(*) FROM cands) AS n_cands,
       (SELECT count(*) FROM cands c JOIN pairs p USING (doc_a, doc_b)) AS n_hit"""
        ),
        "minhash_lsh_dups": (
            "SELECT doc_a, doc_b, jaccard FROM "
            f"read_parquet('{persist_expected_minhash(sf)}') ORDER BY doc_a, doc_b"
        ),
        "simhash_buckets": (
            "SELECT doc_a, doc_b, hamming FROM "
            f"read_parquet('{persist_expected_simhash(sf)}') ORDER BY doc_a, doc_b"
        ),
        "media_features": (
            "SELECT media_id, dim, e0, n_frames FROM "
            f"read_parquet('{persist_expected_media(sf)}') ORDER BY media_id"
        ),
        "search_discovery": (
            "SELECT host, query, url, rank, search_url FROM "
            f"read_parquet('{persist_expected_discovery(sf)}') "
            "ORDER BY host, query, rank"
        ),
        "embedding_dups_lsh": (
            "SELECT vec_a, vec_b, cos_sim FROM "
            f"read_parquet('{persist_expected_embdups_lsh(sf, _EMB_DUP_THRESHOLD)}') "
            "ORDER BY vec_a, vec_b"
        ),
        "extract_cascade": (
            "SELECT url_hash, product_name, n_fields, tier FROM "
            f"read_parquet('{persist_expected_cascade(sf, _PRODUCT_CONFIG)}') "
            "ORDER BY url_hash"
        ),
        "image_analysis": (
            "SELECT url_hash, entity FROM "
            f"read_parquet('{persist_expected_image_entities(sf)}') "
            "ORDER BY url_hash, entity"
        ),
        "precision_recall_eval": (
            "SELECT n_urls, macro_precision, macro_recall, macro_f1 FROM "
            f"read_parquet('{persist_expected_pr_macro(sf)}')"
        ),
        "judge_panel": (
            "SELECT claim, is_correct, confidence FROM "
            f"read_parquet('{persist_expected_judgments(sf, _GATE)}') "
            "ORDER BY claim"
        ),
    }


def all_oracle_sql():
    return {
        **_crawl_oracle_sqls(),
        **_truth_oracle_sqls(),
        **_triplet_oracle_sqls(),
        **_analysis_oracle_sqls(),
        "pricing_summary": _SQL_PRICING,
        "top_customers": _SQL_TOP_CUSTOMERS,
        "revenue_by_nation": _SQL_REVENUE_BY_NATION,
        "mktsegments": _SQL_MKTSEGMENTS,
        "customers_without_orders": _SQL_CUST_NO_ORDERS,
        "parts_shipped_by_brand": _SQL_PARTS_SHIPPED,
        "orders_bloom_semijoin": _SQL_ORDERS_BLOOM,
        "q3_shipping_priority": _SQL_Q3_SHIPPING,
        "q5_local_supplier_volume": _SQL_Q5_LOCAL,
        "q18_large_orders": _SQL_Q18_LARGE,
        "part_name_fuzzy_join": _SQL_PART_NAME_FUZZY,
        "active_nations": _SQL_ACTIVE_NATIONS,
        "events_hourly": _SQL_EVENTS_HOURLY,
        "events_hourly_json": _SQL_EVENTS_HOURLY,
        "events_hourly_csv": _SQL_EVENTS_HOURLY,
        "events_hourly_ipc": _SQL_EVENTS_HOURLY,
        "session_windows": _SQL_SESSION_WINDOWS,
        "events_lag": _SQL_EVENTS_LAG,
        "events_asof_join": _SQL_EVENTS_ASOF,
        "user_max_value": _SQL_USER_MAX,
        "event_type_stats": _SQL_EVENT_TYPE_STATS,
        "top_orders_by_qty": _SQL_TOP_ORDERS_QTY,
        "doc_exact_dedup": _SQL_DOC_EXACT_DEDUP,
        "doc_token_counts": _SQL_DOC_TOKENS,
        "doc_quality": _SQL_DOC_QUALITY,
        "doc_fingerprint": _SQL_DOC_FINGERPRINT,
        "doc_lang_id": _SQL_DOC_LANG_ID,
        "doc_lang_confusion": _SQL_DOC_LANG_CONFUSION,
        "doc_quality_full_sql": _SQL_DOC_QUALITY_FULL,
        "doc_gopher_filter": _SQL_DOC_GOPHER,
        "doc_pii_scrub": _SQL_DOC_PII_SCRUB,
        "ngram_jaccard_pairs": _SQL_NGRAM_JACCARD,
        "ngram_containment_pairs": _SQL_NGRAM_CONTAINMENT,
        "ngram_prefix_pairs": _SQL_NGRAM_JACCARD,
        "embedding_topk": _SQL_EMBEDDING_TOPK,
        "embedding_knn_eval": _SQL_EMBEDDING_KNN_EVAL,
        "embedding_hard_negatives": _SQL_EMBEDDING_HARD_NEGATIVES,
        "embedding_centroids": _SQL_EMBEDDING_CENTROIDS,
        "embedding_source_centroids": _SQL_EMBEDDING_SOURCE_CENTROIDS,
        "embedding_dups": _SQL_EMBEDDING_DUPS,
        "embedding_dedup_clusters": _SQL_EMBEDDING_DEDUP_CLUSTERS,
        "event_props_numbers": _SQL_EVENT_PROPS_NUMBERS,
        "order_price_strings": _SQL_ORDER_PRICE_STRINGS,
        "doc_sample_hash": _SQL_DOC_SAMPLE_HASH,
        "doc_dedup_clusters": _curation.SQL_DOC_DEDUP_CLUSTERS,
        "doc_decontaminate": _curation.SQL_DOC_DECONTAMINATE,
        "doc_repetition": _curation.SQL_DOC_REPETITION,
        "doc_source_quota": _curation.SQL_DOC_SOURCE_QUOTA,
        "doc_token_bins": _curation.SQL_DOC_TOKEN_BINS,
        "doc_weighted_sample": _curation.SQL_DOC_WEIGHTED_SAMPLE,
        "doc_length_quantiles": _curation.SQL_DOC_LENGTH_QUANTILES,
        "vocab_top_terms": _curation.SQL_VOCAB_TOP_TERMS,
        "vocab_bpe_pairs": _curation.SQL_VOCAB_BPE_PAIRS,
        "doc_chunk": _curation.SQL_DOC_CHUNK,
        "doc_export_splits": _curation.SQL_DOC_EXPORT_SPLITS,
        "vocab_top_terms_by_source": _curation.SQL_VOCAB_TOP_TERMS_BY_SOURCE,
        "doc_percentile_in_source": _curation.SQL_DOC_PERCENTILE_IN_SOURCE,
        "events_chi_square": _curation.SQL_EVENTS_CHI_SQUARE,
        "source_divergence": _curation.SQL_SOURCE_DIVERGENCE,
        "doc_dedup_corpus": _curation.SQL_DOC_DEDUP_CORPUS,
        "doc_incremental_dedup": _curation.SQL_DOC_INCREMENTAL_DEDUP,
        "doc_dup_cluster_sizes": _curation.SQL_DOC_DUP_CLUSTER_SIZES,
        "doc_unigram_scores": _curation.SQL_DOC_UNIGRAM_SCORES,
        "doc_rarest_term": _curation.SQL_DOC_RAREST_TERM,
        "curation_pipeline": _sql_curation_pipeline(),
        "events_topk_per_user": _analytics.SQL_EVENTS_TOPK,
        "events_sliding": _analytics.SQL_EVENTS_SLIDING,
        "events_window_count": _analytics.SQL_EVENTS_WINDOW_COUNT,
        "events_range_join": _analytics.SQL_EVENTS_RANGE_JOIN,
        "events_funnel": _analytics.SQL_EVENTS_FUNNEL,
        "events_distinct_users": _analytics.SQL_EVENTS_DISTINCT_USERS,
        "orders_rollup": _analytics.SQL_ORDERS_ROLLUP,
        "orders_cube": _analytics.SQL_ORDERS_CUBE,
        "orders_ntile": _analytics.SQL_ORDERS_NTILE,
        "events_retention": _analytics.SQL_EVENTS_RETENTION,
        "events_outliers": _analytics.SQL_EVENTS_OUTLIERS,
        "events_hourly_users": _analytics.SQL_EVENTS_HOURLY_USERS,
        "events_moving_avg": _analytics.SQL_EVENTS_MOVING_AVG,
        "orders_cust_distribution": _analytics.SQL_ORDERS_CUST_DISTRIBUTION,
        "events_value_histogram": _analytics.SQL_EVENTS_VALUE_HISTOGRAM,
        "events_pivot": _analytics.SQL_EVENTS_PIVOT,
        "events_transitions": _analytics.SQL_EVENTS_TRANSITIONS,
        "events_user_sets": _analytics.SQL_EVENTS_USER_SETS,
        "lineitem_corr": _analytics.SQL_LINEITEM_CORR,
        "orders_open_by_month": _analytics.SQL_ORDERS_OPEN_BY_MONTH,
        "nation_segments": _analytics.SQL_NATION_SEGMENTS,
        "users_week_delta": _analytics.SQL_USERS_WEEK_DELTA,
        "orders_pareto": _analytics.SQL_ORDERS_PARETO,
        "events_seasonal_anomaly": _analytics.SQL_EVENTS_SEASONAL_ANOMALY,
        "events_journeys": _analytics.SQL_EVENTS_JOURNEYS,
        "orders_monthly_locf": _analytics.SQL_ORDERS_MONTHLY_LOCF,
        "events_rfm_segments": _analytics.SQL_EVENTS_RFM,
        "orders_diversified_topk": _analytics.SQL_ORDERS_DIVERSIFIED_TOPK,
        "events_debounce": _analytics.SQL_EVENTS_DEBOUNCE,
        "doc_split_assign": _curation.SQL_DOC_SPLIT_ASSIGN,
        "doc_tfidf_top_terms": _curation.SQL_DOC_TFIDF_TOP_TERMS,
        "doc_search_terms": _curation.SQL_DOC_SEARCH_TERMS,
        "doc_phrase_search": _curation.SQL_DOC_PHRASE_SEARCH,
        "vocab_heavy_hitters": _curation.SQL_VOCAB_HEAVY_HITTERS,
        "word_cooccurrence": _curation.SQL_WORD_COOCCURRENCE,
        "events_cdc_upsert": _analytics.SQL_EVENTS_CDC_UPSERT,
        "orders_skyline": _analytics.SQL_ORDERS_SKYLINE,
        "doc_stratified_sample": _curation.SQL_DOC_STRATIFIED_SAMPLE,
        "events_rate_limit": _analytics.SQL_EVENTS_RATE_LIMIT,
        "doc_mixture_order": _curation.SQL_DOC_MIXTURE_ORDER,
        "lineitem_lone_return_supplier": _analytics.SQL_LINEITEM_LONE_RETURN,
        "orders_snapshot_diff": _analytics.SQL_ORDERS_SNAPSHOT_DIFF,
        "events_profile": _analytics.SQL_EVENTS_PROFILE,
        "events_attribution": _analytics.SQL_EVENTS_ATTRIBUTION,
        "events_band_join": _analytics.SQL_EVENTS_BAND_JOIN,
        "media_exact_dedup": _SQL_MEDIA_EXACT_DEDUP,
        "doc_split_leakage_safe": _curation.SQL_DOC_SPLIT_LEAKAGE_SAFE,
        "doc_bm25_topk": _curation.SQL_DOC_BM25_TOPK,
        "event_value_quantiles": _analytics.SQL_EVENT_VALUE_QUANTILES,
        "doc_bigram_scores": _curation.SQL_DOC_BIGRAM_SCORES,
        "doc_dup_span_scrub": _curation.SQL_DOC_DUP_SPAN_SCRUB,
        "lineitem_small_qty_revenue": _analytics.SQL_LINEITEM_SMALL_QTY,
        "part_cheapest_supplier": _analytics.SQL_PART_CHEAPEST_SUPPLIER,
        "orders_partition_checksum": _analytics.SQL_ORDERS_PARTITION_CHECKSUM,
        "orders_discount_scenarios": _analytics.SQL_ORDERS_DISCOUNT_SCENARIOS,
        "part_name_snm_pairs": _analytics.SQL_PART_NAME_SNM,
        "customer_mode_segment": _analytics.SQL_CUSTOMER_MODE_SEGMENT,
        "events_funnel_windowed": _analytics.SQL_EVENTS_FUNNEL_WINDOWED,
        "events_scd_intervals": _analytics.SQL_EVENTS_SCD,
        "orders_golden_record": _analytics.SQL_ORDERS_GOLDEN_RECORD,
        "orders_view_maintenance": _analytics.SQL_ORDERS_VIEW_MAINTENANCE,
        "events_pattern_match": _analytics.SQL_EVENTS_PATTERN_MATCH,
        "embedding_dim_stats": _analytics.SQL_EMBEDDING_DIM_STATS,
        "doc_feature_hash": _curation.SQL_DOC_FEATURE_HASH,
        "orders_zorder_layout": _analytics.SQL_ORDERS_ZORDER,
        "events_running_clamp": _analytics.SQL_EVENTS_RUNNING_CLAMP,
        "q7_nation_volume": _tpch.SQL_Q7_NATION_VOLUME,
        "q8_market_share": _tpch.SQL_Q8_MARKET_SHARE,
        "q9_product_profit": _tpch.SQL_Q9_PRODUCT_PROFIT,
        "q10_returned_revenue": _tpch.SQL_Q10_RETURNED_REVENUE,
        "part_value_concentration": _tpch.SQL_PART_VALUE_CONCENTRATION,
        "q12_priority_class": _tpch.SQL_Q12_PRIORITY_CLASS,
        "q4_order_priority": _tpch.SQL_Q4_ORDER_PRIORITY,
        "q6_forecast_revenue": _tpch.SQL_Q6_FORECAST_REVENUE,
        "q14_promo_effect": _tpch.SQL_Q14_PROMO_EFFECT,
        "q15_top_supplier": _tpch.SQL_Q15_TOP_SUPPLIER,
        "supplier_part_counts": _tpch.SQL_SUPPLIER_PART_COUNTS,
        "q19_disjunctive_revenue": _tpch.SQL_Q19_DISJUNCTIVE_REVENUE,
        "supplier_part_share": _tpch.SQL_SUPPLIER_PART_SHARE,
        "missed_opportunities": _tpch.SQL_MISSED_OPPORTUNITIES,
        "customer_name_ed1_pairs": _linkage.SQL_CUSTOMER_NAME_ED1,
        "events_activity_bitmap": _linkage.SQL_EVENTS_ACTIVITY_BITMAP,
        "referential_integrity_audit": _linkage.SQL_REFERENTIAL_INTEGRITY,
        "doc_ks_distance": _curation.SQL_DOC_KS_DISTANCE,
        "orders_exact_median": _tpch.SQL_ORDERS_EXACT_MEDIAN,
        "events_value_mad": _analytics.SQL_EVENTS_VALUE_MAD,
        "orders_winsorized_mean": _tpch.SQL_ORDERS_WINSORIZED_MEAN,
        "events_auc": _analytics.SQL_EVENTS_AUC,
        "orders_median_by_priority": _tpch.SQL_ORDERS_MEDIAN_BY_PRIORITY,
        "events_twap": _analytics.SQL_EVENTS_TWAP,
        "orders_gini": _tpch.SQL_ORDERS_GINI,
        "orders_benford": _linkage.SQL_ORDERS_BENFORD,
    }

# ---------------------------------------------------------------------------
# triplet / knowledge-graph pipeline (SURVEY.md §3.1, M1-M12 shims) and
# multimodal plumbing — rows-only for the driver (model stand-ins are not
# SQL), oracle'd by pytest against the deterministic shim semantics


def _doc_text_rows(sf_dir: str) -> rd.Dataset:
    """documents → (url_hash, text) rows: the extracted-content shape the
    triplet pipeline consumes (surrogate url per doc)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array([f"doc{d:08d}" for d in ids], pa.string()),
                "text": batch["text"],
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# domain-gate keywords matched to the synthetic documents corpus (the M3
# gate is a parameterized keyword rule standing in for the IoT few-shot)
_GATE = ("query", "vector", "stream", "index", "sensor", "smart", "device")

_TRIPLET_COLS = [
    "url_hash", "subj_type", "subj_name", "pred", "obj_type", "obj_name", "weight", "method",
]


_TRIPLET_CACHE: dict[str, pd.DataFrame] = {}
_TRIPLET_DS_CACHE: dict[str, rd.Dataset] = {}


def _triplets_of(sf_dir: str) -> rd.Dataset:
    """Validated triplet rows, MATERIALIZED once per sf_dir — four queries
    (extraction, dedup chain, judge panel, validation stats) share the one
    actor-pool run instead of re-executing the whole shim chain."""
    key = os.path.normpath(sf_dir)
    ds = _TRIPLET_DS_CACHE.get(key)
    if ds is None:
        from .triplets import triplet_dataset

        ds = _TRIPLET_DS_CACHE[key] = triplet_dataset(
            _doc_text_rows(sf_dir), gate_keywords=_GATE
        ).materialize()
    return ds


def _deduped_triplets_df(sf_dir: str) -> pd.DataFrame:
    """Deduped triplet table, cached per sf_dir (several KG queries share it;
    the result is small — one row per distinct triplet)."""
    key = os.path.normpath(sf_dir)
    if key not in _TRIPLET_CACHE:
        from .triplets import dedup_triplets

        _TRIPLET_CACHE[key] = dedup_triplets(_triplets_of(sf_dir)).to_pandas()
    return _TRIPLET_CACHE[key].copy()


def q_triplet_extraction(sf_dir: str) -> pd.DataFrame:
    """Full analysis chain: IoT gate → NER → triplet gen → validation weight
    (actor-pool stages; deterministic shims of M1/M2/M3/M8)."""
    out = _triplets_of(sf_dir).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=_TRIPLET_COLS)
    return out[_TRIPLET_COLS].sort_values(_TRIPLET_COLS[:6]).reset_index(drop=True)


def q_triplets_dedup(sf_dir: str) -> pd.DataFrame:
    """A2 — distinct triplets with max weight + provenance count (KG.py:450)."""
    out = _deduped_triplets_df(sf_dir)
    out["weight"] = out["weight"].round(4)
    return out.sort_values(
        ["subj_type", "subj_name", "pred", "obj_type", "obj_name"]
    ).reset_index(drop=True)


def q_kg_nodes(sf_dir: str) -> pd.DataFrame:
    """S12/J4 — KG node table, deduped by sanitized key (KG.py:63-81)."""
    from .triplets import kg_tables

    nodes, _ = kg_tables(rd.from_pandas(_deduped_triplets_df(sf_dir)))
    return (
        nodes.to_pandas()
        .sort_values(["node_type", "node_key"])
        .reset_index(drop=True)
    )


def q_kg_export(sf_dir: str) -> pd.DataFrame:
    """S8/S12 — the KG terminal sink: node + edge collections written as
    JSON-lines datasets; returns the load manifest (rows-only)."""
    from .triplets import kg_tables, write_kg_json

    nodes, edges = kg_tables(rd.from_pandas(_deduped_triplets_df(sf_dir)))
    out_dir = os.path.join(
        "/tmp/llmsr_kg", os.path.basename(os.path.normpath(sf_dir))
    )
    manifest = write_kg_json(nodes, edges, out_dir)
    return pd.DataFrame([manifest])


def q_kg_top_vertices(sf_dir: str) -> pd.DataFrame:
    """J5/A7/O4 — per-vertex inbound edge count, top-10."""
    from .triplets import kg_tables, top_vertices_by_edges

    _, edges = kg_tables(rd.from_pandas(_deduped_triplets_df(sf_dir)))
    return top_vertices_by_edges(edges, k=10)


def _kg_node_hash(ntype: pd.Series, name: pd.Series) -> np.ndarray:
    """KG node identity: md5_number_lower twin of ``type|graph_key(name)``,
    masked to 63 bits (uint64 degrades to float64 in pandas blocks)."""
    from ..functions.textnorm import graph_key
    from .curation import _MASK63, _md5_lower64

    return np.fromiter(
        (_md5_lower64(f"{t}|{graph_key(n)}") & _MASK63 for t, n in zip(ntype, name)),
        dtype=np.int64,
        count=len(ntype),
    )


def q_kg_components(sf_dir: str) -> pd.DataFrame:
    """Connected components over the knowledge graph: which entities are
    transitively linked by any triplet. Node identity = the kg_nodes
    (node_type, node_key) pair hashed with the md5_number_lower twin
    (mask 63 — uint64 degrades to float64 in pandas blocks); edges =
    subject↔object per DEDUPED triplet. Reuses the curation plane's
    contracting min-label CC (K bucket-grouped rounds, one lazy
    execution), so the same dataflow that clusters near-dup docs labels
    KG communities. component_id = min node hash in the component;
    oracle = recursive-CTE closure over the sequential oracle's expected
    triplets with the identical hash (convergence is hash-checked)."""
    from ..functions.textnorm import graph_key
    from .curation import connected_components

    tri = _deduped_triplets_df(sf_dir)
    if len(tri) == 0:
        return pd.DataFrame(columns=["node_type", "node_key", "component_id"])

    ha = _kg_node_hash(tri["subj_type"], tri["subj_name"])
    hb = _kg_node_hash(tri["obj_type"], tri["obj_name"])
    pairs = rd.from_pandas(pd.DataFrame({"doc_a": ha, "doc_b": hb}))
    # epilogue: KG node labels are bounded by this query's result size
    lab = connected_components(pairs).to_pandas().set_index("doc_id")["cluster_id"]
    nodes = pd.DataFrame(
        {
            "node_type": pd.concat([tri["subj_type"], tri["obj_type"]]),
            "node_key": pd.concat(
                [tri["subj_name"].map(graph_key), tri["obj_name"].map(graph_key)]
            ),
            "h": np.concatenate([ha, hb]),
        }
    ).drop_duplicates(["node_type", "node_key"])
    nodes["component_id"] = np.minimum(
        nodes["h"].to_numpy(), nodes["h"].map(lab).fillna(nodes["h"]).astype(np.int64)
    )
    return (
        nodes[["node_type", "node_key", "component_id"]]
        .sort_values(["node_type", "node_key"])
        .reset_index(drop=True)
    )


def q_kg_pagerank(sf_dir: str) -> pd.DataFrame:
    """Weighted PageRank over the knowledge graph (directed subj→obj edges,
    weight = number of distinct triplets between the node pair): K
    bucket-grouped relaxation rounds with dangling-mass redistribution,
    lazily chained into ONE streaming execution (``pipelines/graph.py`` —
    the CC dataflow generalized from min-fold to weighted sum-fold). Node
    identity matches ``kg_components``; oracle = an independent dict-based
    sequential PageRank over the sequential oracle's expected triplets
    (``oracle_triplets.sequential_pagerank`` — no hashing, no buckets),
    persisted and SELECTed, so the driver hash check proves both the
    dataflow and the float-rounding contract."""
    from ..functions.textnorm import graph_key
    from .graph import pagerank

    tri = _deduped_triplets_df(sf_dir)
    if len(tri) == 0:
        return pd.DataFrame(columns=["node_type", "node_key", "pagerank"])
    ha = _kg_node_hash(tri["subj_type"], tri["subj_name"])
    hb = _kg_node_hash(tri["obj_type"], tri["obj_name"])
    edges = (
        pd.DataFrame({"src": ha, "dst": hb})
        .groupby(["src", "dst"], as_index=False)
        .size()
        .rename(columns={"size": "weight"})
    )
    edges["weight"] = edges["weight"].astype("float64")
    nodes = pd.DataFrame(
        {
            "node_type": pd.concat([tri["subj_type"], tri["obj_type"]]),
            "node_key": pd.concat(
                [tri["subj_name"].map(graph_key), tri["obj_name"].map(graph_key)]
            ),
            "h": np.concatenate([ha, hb]),
        }
    ).drop_duplicates(["node_type", "node_key"])
    pr = pagerank(rd.from_pandas(edges), n_nodes=int(nodes["h"].nunique()))
    nodes["pagerank"] = nodes["h"].map(pr.set_index("node")["pagerank"])
    return (
        nodes[["node_type", "node_key", "pagerank"]]
        .sort_values(["node_type", "node_key"])
        .reset_index(drop=True)
    )


def q_kg_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle counting over the knowledge graph (the graph-ENUMERATION
    class, vs kg_components/kg_pagerank's iterative propagation): per node,
    the number of entity triangles it participates in. Edges = distinct
    undirected subject↔object node-hash pairs (canonical lo<hi, self-loops
    dropped); the count runs as ``pipelines/graph.triangle_counts`` —
    min-vertex-centered wedge emission bucketed by closing-pair hash, an
    in-bucket wedge⋈edge closing join, and a per-vertex fold, three
    NB-key groupbys lazily chained in ONE execution. Node identity matches
    ``kg_components``; oracle = the triple-self-join closure over the
    sequential oracle's expected triplets with the identical hash."""
    from ..functions.textnorm import graph_key
    from .graph import triangle_counts

    tri = _deduped_triplets_df(sf_dir)
    if len(tri) == 0:
        return pd.DataFrame(columns=["node_type", "node_key", "n_triangles"])
    ha = _kg_node_hash(tri["subj_type"], tri["subj_name"])
    hb = _kg_node_hash(tri["obj_type"], tri["obj_name"])
    lo, hi = np.minimum(ha, hb), np.maximum(ha, hb)
    edges = (
        pd.DataFrame({"a": lo, "b": hi})
        .query("a != b")
        .drop_duplicates()
        .reset_index(drop=True)
    )
    counts = triangle_counts(rd.from_pandas(edges)).set_index("node")["n_triangles"]
    nodes = pd.DataFrame(
        {
            "node_type": pd.concat([tri["subj_type"], tri["obj_type"]]),
            "node_key": pd.concat(
                [tri["subj_name"].map(graph_key), tri["obj_name"].map(graph_key)]
            ),
            "h": np.concatenate([ha, hb]),
        }
    ).drop_duplicates(["node_type", "node_key"])
    nodes["n_triangles"] = (
        nodes["h"].map(counts).fillna(0).astype(np.int64)
    )
    return (
        nodes[["node_type", "node_key", "n_triangles"]]
        .sort_values(["node_type", "node_key"])
        .reset_index(drop=True)
    )


def q_triplet_validation_text(sf_dir: str) -> pd.DataFrame:
    """M8+J1 — per-method validation stats of the text-joined cascade:
    the NLI branch scores sentences of the ACTUAL source text (attached by
    the hash-partitioned url_hash join in triplet_dataset), so its weights
    are non-degenerate. One compact row per method."""
    out = _triplets_of(sf_dir).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=["method", "n", "mean_weight", "n_nonzero"])
    g = out.groupby("method", as_index=False).agg(
        n=("weight", "size"),
        mean_weight=("weight", "mean"),
        n_nonzero=("weight", lambda s: int((s > 0).sum())),
    )
    g["mean_weight"] = g["mean_weight"].round(4)
    return g.sort_values("method").reset_index(drop=True)


def q_precision_recall_eval(sf_dir: str) -> pd.DataFrame:
    """M9/A5 — macro precision/recall/F1 eval (reference
    ``precision_recall.py:187-311,495-518``); rows-only (fuzzy-judge
    semantics are not SQL); pytest checks against a sequential oracle."""
    from .evalpr import precision_recall_eval

    # threshold 90: the fuzzy judge's partial_ratio saturates below it on
    # triplets sharing subject+predicate (the reference's known leniency at
    # 60-70, precision_recall.py:436) — 90 discriminates per-object
    return precision_recall_eval(_doc_text_rows(sf_dir), threshold=90.0)


def q_extract_cascade(sf_dir: str) -> pd.DataFrame:
    """E8 — schema → module → LLM 3-tier fallback extraction cascade
    (``crawl4ai_extraction.py:99-184``) over the stored pages corpus."""
    from ..sources.pages import generate_corpus
    from .evalpr import extract_cascade

    corpus = generate_corpus(sf_dir)
    return extract_cascade(corpus.pages_dir, _PRODUCT_CONFIG)


def q_image_analysis(sf_dir: str) -> pd.DataFrame:
    """M4 — the reference's conditional image chain COMPOSED as pipeline
    stages (``image_analysis.py:19-160``): scrape image refs → 3-way
    classify (actor pool) → filter DETAILED → summarize + NER-the-summary
    second pass (actor pool, the conditional model call) → per-page entity
    UNION with the text path's NER (A3). Output: distinct (url_hash,
    entity) rows; dedup is the NB-key bucket-grouped pattern (flat per-key
    cost), never a driver set. Rows-only; pytest asserts parity with a
    sequential fold of the same shims."""
    from ..functions.content import image_refs
    from ..functions.html_text import extract_text
    from ..sources.pages import generate_corpus
    from ..stages.llmshim import (
        EntityExtractor,
        ImageClassifier,
        ImageSummarizerNER,
    )
    from .neardup import nb_for

    NUM_BUCKETS = nb_for(sf_dir)  # corpus-derived partition count

    corpus = generate_corpus(sf_dir)
    pages = rd.read_parquet(corpus.pages_dir, columns=["url_hash", "html"])
    kw = dict(concurrency=2, batch_size=256, batch_format="pandas", num_cpus=0.25)

    def img_rows(batch: pa.Table) -> pa.Table:
        hs, srcs, alts = [], [], []
        for h, html in zip(batch["url_hash"], batch["html"]):
            for src, alt in image_refs(bytes(html.as_py())):
                hs.append(h.as_py().hex())
                srcs.append(src)
                alts.append(alt)
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(hs, pa.string()),
                "image_src": pa.array(srcs, pa.string()),
                "alt_text": pa.array(alts, pa.string()),
            }
        )

    img_ents = (
        pages.map_batches(img_rows, batch_format="pyarrow")
        .map_batches(ImageClassifier, **kw)
        .map_batches(
            lambda df: df[df["img_class"] == "DETAILED"], batch_format="pandas"
        )
        # min=1: the DETAILED filter can leave a single block at test scale
        .map_batches(ImageSummarizerNER, **{**kw, "concurrency": (1, 2)})
    )

    def text_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(
                    [h.as_py().hex() for h in batch["url_hash"]], pa.string()
                ),
                "text": pa.array(
                    [extract_text(bytes(x.as_py())) for x in batch["html"]],
                    pa.string(),
                ),
            }
        )

    text_ents = pages.map_batches(text_rows, batch_format="pyarrow").map_batches(
        EntityExtractor, **kw
    )

    def explode(t: pa.Table) -> pa.Table:
        hs, es = [], []
        for h, ents in zip(t["url_hash"].to_pylist(), t["entities"].to_pylist()):
            for e in ents:
                hs.append(h)
                es.append(e)
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(hs, pa.string()),
                "entity": pa.array(es, pa.string()),
                "bucket": pa.array(
                    [int(h[:8], 16) % NUM_BUCKETS for h in hs], pa.int64()
                ),
            }
        )

    union = img_ents.map_batches(explode, batch_format="pyarrow").union(
        text_ents.map_batches(explode, batch_format="pyarrow")
    )
    out = (
        union.groupby("bucket")
        .map_groups(
            lambda g: g[["url_hash", "entity"]].drop_duplicates(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values(["url_hash", "entity"]).reset_index(drop=True)


def q_judge_panel(sf_dir: str) -> pd.DataFrame:
    """M6 — multi-judge vote merge over rendered triplet claims."""
    from ..stages.llmshim import JudgePanel

    trips = _triplets_of(sf_dir)

    def claims(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "claim": [
                    f"{s} {p} {o}"
                    for s, p, o in zip(batch["subj_name"], batch["pred"], batch["obj_name"])
                ]
            }
        )

    out = (
        trips.map_batches(claims, batch_format="pandas")
        .map_batches(JudgePanel, concurrency=2, batch_size=512, batch_format="pandas", num_cpus=0.25)
        .to_pandas()
    )
    return out.sort_values("claim").reset_index(drop=True)


def q_media_decode(sf_dir: str) -> pd.DataFrame:
    """REAL multimodal decode (S13 upgraded from a declared stub): render
    genuine PGM-image / PCM-WAV payloads per doc_id, then an actor-pool
    decode stage parses the actual bytes (PGM header+raster; RIFF/WAV via
    the stdlib parser) and must recover exactly the integer facts the
    generator encoded — dimensions, sample counts, pixel/sample checksums.
    Oracle = the generator's persisted truth table
    (``sources/media.persist_media_truth``): generator-writes vs
    decoder-reads, independent directions. Wide binary rows → small
    batch_size; stateless decode runs in the task pool."""
    from ..sources.media import render_media
    from ..stages.multimodal import MediaDecode

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        kinds, payloads = [], []
        for d in ids:
            kind, payload = render_media(int(d))
            kinds.append(kind)
            payloads.append(payload)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(to_media, batch_format="pyarrow", batch_size=256)
        .map_batches(MediaDecode(), batch_format="pandas", batch_size=64)
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_resize(sf_dir: str) -> pd.DataFrame:
    """REAL image resize (the multimodal transform stage, not a stub):
    PGM payloads → actor-pool ``MediaResize`` (decode raster, exact 2×2
    integer box downsample, re-encode) → new dims + pixel sum + raster
    crc32, all integers. Oracle: sequential resize with an independent
    reshape-based block-mean formulation
    (``oracle_analysis.persist_expected_media_resize``). Wide binary rows
    → small batch_size."""
    from ..sources.media import render_media
    from ..stages.multimodal import MediaResize

    def to_images(batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for d in batch["doc_id"].to_pylist():
            kind, payload = render_media(int(d))
            if kind == "image":
                ids.append(int(d))
                payloads.append(payload)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(to_images, batch_format="pyarrow", batch_size=256)
        .map_batches(MediaResize(), batch_format="pandas", batch_size=64)
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_frames(sf_dir: str) -> pd.DataFrame:
    """REAL audio frame-sampling (one wide binary row in → N frame rows
    out): WAV payloads → actor-pool ``AudioFrames`` (decode PCM, strided
    1024/512 windows, exact integer energy + zero-crossing count per
    frame via one cumulative-sum pass). Oracle: sequential per-frame
    slice sums (independent formulation,
    ``oracle_analysis.persist_expected_media_frames``)."""
    from ..sources.media import render_media
    from ..stages.multimodal import AudioFrames

    def to_audio(batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for d in batch["doc_id"].to_pylist():
            kind, payload = render_media(int(d))
            if kind == "audio":
                ids.append(int(d))
                payloads.append(payload)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(to_audio, batch_format="pyarrow", batch_size=256)
        .map_batches(AudioFrames(), batch_format="pandas", batch_size=64)
        .to_pandas()
    )
    return out.sort_values(["media_id", "frame_no"]).reset_index(drop=True)


MEDIA_LIB = 64  # distinct media assets in the simulated library


def q_media_audio_features(sf_dir: str) -> pd.DataFrame:
    """Whisper-SHAPED audio featurization (M11's real kernel behind the
    stub seam): WAV payloads → actor-pool ``AudioTranscriptProxy`` (exact
    integer energy/zero-crossing frames → strict-integer-mean speech
    segmentation → token-count envelope). Oracle: sequential independent
    formulation (``oracle_analysis.persist_expected_audio_features``)."""
    from ..sources.media import render_media
    from ..stages.multimodal import AudioTranscriptProxy

    def to_audio(batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for d in batch["doc_id"].to_pylist():
            kind, payload = render_media(int(d))
            if kind == "audio":
                ids.append(int(d))
                payloads.append(payload)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(to_audio, batch_format="pyarrow", batch_size=256)
        .map_batches(AudioTranscriptProxy(), batch_format="pandas", batch_size=64)
        .to_pandas()
    )
    return out.sort_values("media_id").reset_index(drop=True)


def q_media_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact BINARY dedup over a media column — the content-hash image/audio
    dedup a multimodal corpus runs before feature extraction. Docs
    reference a shared asset library (asset id = doc_id % MEDIA_LIB, the
    many-docs-one-asset layout of real web corpora); the engine renders
    the actual payload bytes and dedups on a 64-bit BLAKE2b content
    fingerprint of the BYTES — the shuffle carries (hash, doc_id) rows,
    never payloads (the 100-TB shape: fingerprints travel, content
    doesn't). Per-bucket fold keeps the min-doc representative + refcount.

    Oracle: the generator's asset mapping is injective payload↔asset-id
    (pinned by the media_decode truth gate), so content-equality groups
    are exactly the doc_id % MEDIA_LIB classes — SQL-expressible."""
    import hashlib as _hl

    from ..sources.media import render_media

    def fp_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        fps: dict[int, int] = {}
        out_h = np.empty(len(ids), np.int64)
        for i, d in enumerate(ids):
            a = int(d) % MEDIA_LIB
            h = fps.get(a)
            if h is None:
                _, payload = render_media(a)
                h = (
                    int.from_bytes(
                        _hl.blake2b(payload, digest_size=8).digest(), "little"
                    )
                    & 0x7FFFFFFFFFFFFFFF
                )
                fps[a] = h
            out_h[i] = h
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(out_h % 64, pa.int64()),
                "h": pa.array(out_h, pa.int64()),
                "doc_id": batch["doc_id"],
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("h", as_index=False).agg(
            rep_doc=("doc_id", "min"), n_refs=("doc_id", "size")
        )
        return out[["rep_doc", "n_refs"]].astype("int64")

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(fp_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("rep_doc").reset_index(drop=True)


_SQL_MEDIA_EXACT_DEDUP = f"""
SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc,
       CAST(count(*) AS BIGINT) AS n_refs
FROM documents
GROUP BY doc_id % {MEDIA_LIB}
ORDER BY rep_doc
"""


def q_media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing: documents→binary payloads → decode-stub meta →
    feature-stub embeddings (list<float32>, ANN-compatible layout). Small
    batch sizes on the binary column (SURVEY.md §7.4.5)."""
    from ..stages.multimodal import FeatureExtractStub, FrameSampleStub, MediaDecodeStub

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        kinds = ["image", "audio", "video"]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array([f"m{d:08d}" for d in ids], pa.string()),
                "kind": pa.array([kinds[d % 3] for d in ids], pa.string()),
                "payload": pa.array(
                    [t.encode("utf-8") for t in batch["text"].to_pylist()], pa.binary()
                ),
            }
        )

    # materialize: BOTH consumers (feature chain + frame chain) read this —
    # without the barrier each re-executes the read+to_media pass (measured
    # 2.0 s → 3.7 s regression in round 2)
    media = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow"
    ).materialize()
    decoded = media.map_batches(
        MediaDecodeStub, concurrency=2, batch_size=64, batch_format="pandas", num_cpus=0.25
    )
    feats = decoded.map_batches(
        FeatureExtractStub, concurrency=2, batch_size=64, batch_format="pandas", num_cpus=0.25
    ).to_pandas()
    feats["dim"] = [len(e) for e in feats["embedding"]]
    feats["e0"] = [round(float(e[0]), 6) for e in feats["embedding"]]
    # video rows additionally flow through the frame sampler (one row in →
    # N frame rows out; small batches on the binary column)
    frames = (
        media.filter(expr="kind == 'video'")
        .map_batches(
            FrameSampleStub, concurrency=2, batch_size=64, batch_format="pandas", num_cpus=0.25
        )
        .groupby("media_id")
        .aggregate(Count(alias_name="n_frames"))
        .to_pandas()
    )
    out = feats.merge(frames, on="media_id", how="left")
    out["n_frames"] = out["n_frames"].fillna(0).astype("int64")
    return out[["media_id", "dim", "e0", "n_frames"]].sort_values("media_id").reset_index(drop=True)


def q_doc_sample(sf_dir: str) -> pd.DataFrame:
    """O2 — seeded shuffle + take-50 (``entity_analysis.py:137-138``)."""
    ds = _read(sf_dir, "documents", ["doc_id"]).random_shuffle(seed=42).limit(50)
    return ds.to_pandas()

# ---------------------------------------------------------------------------
# embedding near-dup + ANN scale path

# synthetic embeddings are near-orthogonal (max pairwise cos ≈ 0.48), so the
# "near-dup" threshold is set where the corpus actually has mass — the
# operator (blocked matmul + threshold + pair dedup) is what is exercised
_EMB_DUP_THRESHOLD = 0.45


def q_embedding_dups(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold): blocked float64
    matmul per batch against the broadcast normalized matrix — the
    brute-force O(n²/B) formulation (the LSH-bucketed ANN below is the
    10^9-row path). SQL oracle via list_cosine_similarity."""
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    all_ref = ray.put((ids, mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(all_ref)
        b_ids = batch["vec_id"].to_numpy()
        b_mat = _emb_matrix(batch["embedding"])
        b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
        sims = b_mat @ mat_all.T  # (b, N)
        out_a, out_b, out_s = [], [], []
        rows, cols = np.nonzero(sims >= _EMB_DUP_THRESHOLD)
        for r, c in zip(rows, cols):
            a_id, b_id = int(b_ids[r]), int(ids_all[c])
            if a_id < b_id:  # each unordered pair once
                out_a.append(a_id)
                out_b.append(b_id)
                out_s.append(round(float(sims[r, c]), 4))
        return pa.Table.from_pydict(
            {"vec_a": out_a, "vec_b": out_b, "cos_sim": out_s}
        )

    out = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(pairs_batch, batch_format="pyarrow", batch_size=1024)
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"), "vec_b": pd.Series([], dtype="int64"),
             "cos_sim": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


_SQL_EMBEDDING_DUPS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
ORDER BY vec_a, vec_b
"""


def q_embedding_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """SEMANTIC dedup clusters: connected components over the exact
    embedding-cosine near-dup pairs — the same contracting min-label CC
    the text-dedup plane uses (``curation.connected_components``, K
    bucket-grouped rounds in one lazy execution), composed over a second
    modality. The pair stage here is the brute-force oracle twin (pairs
    stay a Dataset, never collected pre-CC); the 10^9-row path swaps in
    ``embedding_dups_lsh``'s banded pair expansion unchanged, since CC
    only sees (a, b) rows. keep = 1 on each cluster's min vec_id; oracle
    = recursive-CTE closure over the identical SQL pair set."""
    import pyarrow.parquet as pq

    from .curation import connected_components

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    all_ref = ray.put((ids, mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(all_ref)
        b_ids = batch["vec_id"].to_numpy()
        b_mat = _emb_matrix(batch["embedding"])
        b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
        sims = b_mat @ mat_all.T
        rows, cols = np.nonzero(sims >= _EMB_DUP_THRESHOLD)
        a_ids = b_ids[rows].astype(np.int64)
        b2 = ids_all[cols].astype(np.int64)
        keep = a_ids < b2
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(a_ids[keep], pa.int64()),
                "doc_b": pa.array(b2[keep], pa.int64()),
            }
        )

    pairs = rd.read_parquet(emb_path, columns=["vec_id", "embedding"]).map_batches(
        pairs_batch, batch_format="pyarrow", batch_size=1024
    )
    # epilogue: the label table IS this query's contract-bound result
    lab = connected_components(pairs.materialize()).to_pandas()
    if len(lab) == 0:
        return pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "cluster_id": pd.Series([], dtype="int64"),
                "keep": pd.Series([], dtype="int64"),
            }
        )
    lab = lab.rename(columns={"doc_id": "vec_id"})
    lab["keep"] = (lab["vec_id"] == lab["cluster_id"]).astype("int64")
    return lab.sort_values("vec_id").reset_index(drop=True)


_SQL_EMBEDDING_DEDUP_CLUSTERS = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
), edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL
  SELECT vec_b, vec_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS vec_id, least(a, min(b)) AS cluster_id,
       CAST(least(a, min(b)) = a AS BIGINT) AS keep
FROM reach GROUP BY a ORDER BY vec_id
"""


def q_embedding_dups_lsh(sf_dir: str, broadcast_limit: int = 50_000) -> pd.DataFrame:
    """Embedding near-dup pairs — the banded hyperplane-LSH SCALE path for
    what q_embedding_dups brute-forces (q_embedding_dups stays the SQL
    oracle twin; this is the 10^9-row formulation):

    each batch hashes its own vectors into ``n_bands`` sign-bit band keys
    (norm-invariant, no broadcast matrix) → the same NB-key
    ``grouped_pair_expansion`` the shingle-MinHash path uses (bucket
    df-cap, in-group pair emission, cross-band dedup) → exact-cosine
    verification via ``Dataset.join`` of the candidate pairs against the
    candidate vectors only (candidate-mass-bounded — the corpus matrix is
    never broadcast). Band-key width scales with corpus size so buckets
    stay bounded; at this corpus's unusually low 0.45 threshold the
    sign-bit collision prob is 0.65/bit, so recall is band-count-bounded
    (pytest asserts ≥0.6 recall vs the oracled brute force; at a realistic
    0.9 near-dup threshold the same parameters give ≥0.99).

    Rows-only (hash semantics are not SQL)."""
    import math

    import pyarrow.parquet as pq

    from .neardup import _MASK63, _PAIR_MIX, grouped_pair_expansion, nb_for

    NUM_BUCKETS = nb_for(sf_dir, "embeddings")  # corpus-derived partition count

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    pf = pq.ParquetFile(emb_path)
    n = pf.metadata.num_rows
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0])
    n_bits = max(5, int(math.ceil(math.log2(max(2, n / 16)))))
    n_bands = 24
    rng = np.random.RandomState(11)
    planes_ref = ray.put(rng.randn(n_bands, dim, n_bits))

    def band_rows(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        mat = _emb_matrix(batch["embedding"])
        weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))
        keys = [
            (np.int64(b) << np.int64(n_bits))
            | (((mat @ pl[b]) > 0) @ weights).astype(np.int64)
            for b in range(n_bands)
        ]
        bkey = np.concatenate(keys)
        return pa.Table.from_pydict(
            {
                "bkey": pa.array(bkey, pa.int64()),
                "doc_id": pa.array(np.tile(ids, n_bands), pa.int64()),
                "bucket": pa.array(
                    ((bkey * _PAIR_MIX) & _MASK63) % NUM_BUCKETS, pa.int64()
                ),
            }
        )

    emb = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    cands = grouped_pair_expansion(
        emb.map_batches(band_rows, batch_format="pyarrow")
    ).materialize()
    empty = pd.DataFrame(
        {
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
            "cos_sim": pd.Series([], dtype="float64"),
        }
    )
    if cands.count() == 0:
        return empty

    # verification inputs: candidate vectors only (near-dup-mass-bounded).
    # The candidate-id side stays a Dataset end-to-end (VERDICT r3 #3: no
    # driver-side id set — dup mass is O(corpus) at 100 TB): per-batch
    # distinct ids from the pair stream, then a hash-partitioned left_semi
    # join prunes the packed corpus vectors. Vectors pack to fixed-width
    # binary BEFORE the join (Acero rejects list-typed payload columns).
    def pair_ids(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()]
        )
        return pa.table({"vid": pc.unique(both)})

    cand_ids = _scrub_empty_blocks(cands.map_batches(pair_ids, batch_format="pyarrow"))

    def pack_norm(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        mat = _emb_matrix(batch["embedding"])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pa.Table.from_pydict(
            {
                "vid": pa.array(ids, pa.int64()),
                "blob": pa.array([r.tobytes() for r in mat], pa.binary()),
            }
        )

    filtered = (
        emb.map_batches(pack_norm, batch_format="pyarrow")
        .join(cand_ids, "left_semi", num_partitions=8, on=("vid",), right_on=("vid",))
        .materialize()
    )

    if filtered.count() <= broadcast_limit:
        # small candidate mass (the common near-dup regime): broadcast the
        # candidate vectors once (one (need, d) matrix + sorted id index)
        # and verify each pair batch with ONE vectorized row-gather +
        # einsum — saves the two join shuffles, whose fixed cost dominates
        # at this size. The partitioned-join path below stays the big-mass
        # plan (same threshold-switch pattern as the crawl control plane).
        vids, mats = [], []
        for bt in filtered.iter_batches(batch_format="pandas"):
            vids.append(bt["vid"].to_numpy(dtype=np.int64))
            mats.append(np.stack([np.frombuffer(b, np.float64) for b in bt["blob"]]))
        vid_arr = np.concatenate(vids)
        order = np.argsort(vid_arr)
        lookup_ref = ray.put((vid_arr[order], np.concatenate(mats)[order]))

        def verify_bcast(batch: pd.DataFrame) -> pd.DataFrame:
            ids_sorted, m = ray.get(lookup_ref)
            a = batch["doc_a"].to_numpy(dtype=np.int64)
            b = batch["doc_b"].to_numpy(dtype=np.int64)
            ra = np.searchsorted(ids_sorted, a)
            rb = np.searchsorted(ids_sorted, b)
            sims = np.round(np.einsum("ij,ij->i", m[ra], m[rb]), 4)
            keep = sims >= _EMB_DUP_THRESHOLD
            return pd.DataFrame(
                {"vec_a": a[keep], "vec_b": b[keep], "cos_sim": sims[keep]}
            )

        out = cands.map_batches(verify_bcast, batch_format="pandas").to_pandas()
        if len(out) == 0:
            return empty
        out = out.astype({"vec_a": "int64", "vec_b": "int64"})
        return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    def _rename(key_name: str, blob_name: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([key_name, blob_name])

        return fn

    va = filtered.map_batches(_rename("va", "blob_a"), batch_format="pyarrow")
    vb = filtered.map_batches(_rename("vb", "blob_b"), batch_format="pyarrow")
    joined = cands.join(
        va, "inner", num_partitions=8, on=("doc_a",), right_on=("va",)
    ).join(vb, "inner", num_partitions=8, on=("doc_b",), right_on=("vb",))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sims = [
            round(float(np.frombuffer(a, np.float64) @ np.frombuffer(b, np.float64)), 4)
            for a, b in zip(batch["blob_a"], batch["blob_b"])
        ]
        out = pd.DataFrame(
            {"vec_a": batch["doc_a"], "vec_b": batch["doc_b"], "cos_sim": sims}
        )
        return out[out["cos_sim"] >= _EMB_DUP_THRESHOLD]

    out = joined.map_batches(verify, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return empty
    out = out.astype({"vec_a": "int64", "vec_b": "int64"})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def _lsh_planes(n: int) -> int:
    """Bucket-count scales with corpus size (~64 vectors per bucket)."""
    import math

    return max(3, int(math.log2(max(2, n // 64))))


def q_embedding_topk_lsh(sf_dir: str) -> pd.DataFrame:
    """ANN scale path: random-hyperplane LSH bucketing, ZERO shuffles.

    The query side is tiny (Q vectors), so its 4×Q bucket keys broadcast;
    each batch hashes its own vectors, keeps only members of a query
    bucket (candidate sets are bucket-bounded, not corpus-bounded) and
    scores them against the broadcast query matrix locally — corpus
    vectors never leave their batch, nothing groups by a high-cardinality
    key. pytest asserts recall ≥ 0.6 vs the brute-force q_embedding_topk.

    Rows-only (hash semantics are not SQL)."""
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    dim = len(qt["embedding"][0].as_py())
    n_planes = _lsh_planes(qt.num_rows)
    rng = np.random.RandomState(7)
    planes = [rng.randn(dim, n_planes) for _ in range(4)]

    def lsh_keys(mat: np.ndarray) -> np.ndarray:
        """(n, dim) → (n, 4) int64 bucket keys (table id in the high bits)."""
        cols = []
        for t_i, p in enumerate(planes):
            bits = (mat @ p) > 0
            keys = bits @ (1 << np.arange(p.shape[1]))
            cols.append((t_i << p.shape[1]) | keys.astype(np.int64))
        return np.stack(cols, axis=1)

    order = np.argsort(qt["vec_id"].to_numpy())[: _ANN_QUERIES]
    q_ids = qt["vec_id"].to_numpy()[order]
    q_mat = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
    )
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_keys = lsh_keys(q_mat)  # (Q, 4)
    bcast = ray.put((planes, q_ids, q_norm, q_keys))

    def score_batch(batch: pa.Table) -> pa.Table:
        pl, q_ids_, q_norm_, q_keys_ = ray.get(bcast)
        ids = batch["vec_id"].to_numpy()
        mat = _emb_matrix(batch["embedding"])
        keys = lsh_keys(mat)  # (n, 4)
        nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids_)):
            # candidate = shares ≥1 bucket with the query (any of 4 tables)
            cand = (keys == q_keys_[qi][None, :]).any(axis=1)
            cand &= ids != q_ids_[qi]
            if not cand.any():
                continue
            sims = nmat[cand] @ q_norm_[qi]
            for n_id, s in zip(ids[cand], sims):
                out_q.append(int(q_ids_[qi]))
                out_n.append(int(n_id))
                out_s.append(round(float(s), 4))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cands = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(score_batch, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    if len(cands) == 0:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "sim", "rank"])
    out = cands.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    out = out.groupby("query_id", as_index=False).head(_ANN_TOPK)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def q_embedding_topk_ivf(
    sf_dir: str, n_cells: int = 16, n_probe: int = 8, iters: int = 2
) -> pd.DataFrame:
    """ANN scale path #2: IVF (inverted-file) cells from DISTRIBUTED
    k-means. Each of ``iters`` rounds is one pass of per-batch partial
    (sum, count) accumulation against broadcast centroids — the mergeable
    -sketch pattern, so the shuffle-free training scales to 10^9 vectors;
    driver state is only the (n_cells × d) centroid matrix. Search then
    probes the queries' top-``n_probe`` cells: every batch assigns its own
    vectors, keeps probe-cell members, and scores them locally against the
    broadcast query matrix (corpus vectors never leave their batch).

    The synthetic embeddings are near-orthogonal (no real cluster
    structure), so the default probes half the cells — recall is
    pytest-bounded vs brute force; real corpora need fewer probes.
    Rows-only (iterative k-means is not SQL)."""
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    all_ids = qt["vec_id"].to_numpy()
    order = np.argsort(all_ids)
    q_order = order[:_ANN_QUERIES]
    q_ids = all_ids[q_order]
    q_mat = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in q_order]
    )
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    # deterministic init: the n_cells lowest vec_ids' vectors
    seed_idx = order[:n_cells]
    cents = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in seed_idx]
    )
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    for _ in range(iters):
        c_ref = ray.put(cents)

        def kmeans_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            mat = _emb_matrix(batch["embedding"])
            nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            assign = np.argmax(c @ nmat.T, axis=0)  # cosine on normalized
            cells, counts, sums = [], [], []
            for cell in np.unique(assign):
                m = assign == cell
                cells.append(int(cell))
                counts.append(int(m.sum()))
                sums.append(nmat[m].sum(axis=0).tolist())
            return pa.Table.from_pydict(
                {
                    "cell": pa.array(cells, pa.int64()),
                    "count": pa.array(counts, pa.int64()),
                    "vsum": pa.array(sums, pa.list_(pa.float64())),
                }
            )

        part = ds.map_batches(kmeans_partial, batch_format="pyarrow", batch_size=2048).to_pandas()
        new = cents.copy()
        for cell, grp in part.groupby("cell"):
            s = np.sum(np.stack([np.asarray(v) for v in grp["vsum"]]), axis=0)
            n = grp["count"].sum()
            if n > 0:
                v = s / n
                norm = np.linalg.norm(v)
                if norm > 0:
                    new[int(cell)] = v / norm
        cents = new

    # probe set: each query's top-n_probe cells; a cell→query-list map rides
    # the broadcast so batches score members only against relevant queries
    probe = np.argsort(-(cents @ q_norm.T), axis=0)[:n_probe].T  # (Q, n_probe)
    bcast = ray.put((cents, q_ids, q_norm, probe))

    def ivf_score(batch: pa.Table) -> pa.Table:
        c, q_ids_, q_norm_, probe_ = ray.get(bcast)
        ids = batch["vec_id"].to_numpy()
        mat = _emb_matrix(batch["embedding"])
        nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        assign = np.argmax(c @ nmat.T, axis=0)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids_)):
            cand = np.isin(assign, probe_[qi]) & (ids != q_ids_[qi])
            if not cand.any():
                continue
            sims = nmat[cand] @ q_norm_[qi]
            for n_id, s in zip(ids[cand], sims):
                out_q.append(int(q_ids_[qi]))
                out_n.append(int(n_id))
                out_s.append(round(float(s), 4))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cands = ds.map_batches(ivf_score, batch_format="pyarrow", batch_size=2048).to_pandas()
    if len(cands) == 0:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "sim", "rank"])
    out = cands.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    out = out.groupby("query_id", as_index=False).head(_ANN_TOPK)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def q_embedding_topk_pq(
    sf_dir: str, n_sub: int = 8, n_codes: int = 16, iters: int = 2, rerank: int = 50
) -> pd.DataFrame:
    """ANN scale path #3: PRODUCT QUANTIZATION with in-batch exact re-rank.
    Training reuses the IVF path's shuffle-free distributed k-means — one
    streaming pass per iteration accumulates per-(subspace, code) partial
    (sum, count) against broadcast codebooks, all ``n_sub`` subspaces in
    the same pass; driver state is the (n_sub × n_codes × d/n_sub)
    codebook tensor only. Search is asymmetric distance computation: each
    batch encodes its OWN vectors (corpus vectors never leave their
    batch), sums per-query LUT entries (one (n_sub × n_codes) table per
    query, broadcast), takes the top-``rerank`` ADC candidates per query
    per batch, and re-scores exactly against the broadcast query matrix —
    so emitted sims are EXACT cosines and candidate volume is
    O(#batches · Q · rerank), shuffle-free. Rows-only (iterative k-means
    is not SQL); recall is pytest-bounded vs the oracled brute force."""
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    all_ids = qt["vec_id"].to_numpy()
    order = np.argsort(all_ids)
    q_order = order[:_ANN_QUERIES]
    q_ids = all_ids[q_order]
    q_mat = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in q_order]
    )
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    d = q_mat.shape[1]
    dsub = d // n_sub

    # deterministic init: the n_codes lowest vec_ids' normalized subvectors
    seed_idx = order[:n_codes]
    seed = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in seed_idx]
    )
    seed = seed / np.linalg.norm(seed, axis=1, keepdims=True)
    # books[m]: (n_codes, dsub)
    books = np.stack([seed[:, m * dsub : (m + 1) * dsub] for m in range(n_sub)])

    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    for _ in range(iters):
        b_ref = ray.put(books)

        def pq_partial(batch: pa.Table) -> pa.Table:
            bk = ray.get(b_ref)
            mat = _emb_matrix(batch["embedding"])
            nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            subs, codes, counts, sums = [], [], [], []
            for m in range(n_sub):
                x = nmat[:, m * dsub : (m + 1) * dsub]  # (n, dsub)
                # nearest code by L2: argmin |x - c|^2 = argmax (2 x·c - |c|^2)
                sc = 2 * (x @ bk[m].T) - np.sum(bk[m] ** 2, axis=1)
                assign = np.argmax(sc, axis=1)
                for code in np.unique(assign):
                    mm = assign == code
                    subs.append(m)
                    codes.append(int(code))
                    counts.append(int(mm.sum()))
                    sums.append(x[mm].sum(axis=0).tolist())
            return pa.Table.from_pydict(
                {
                    "sub": pa.array(subs, pa.int64()),
                    "code": pa.array(codes, pa.int64()),
                    "count": pa.array(counts, pa.int64()),
                    "vsum": pa.array(sums, pa.list_(pa.float64())),
                }
            )

        part = ds.map_batches(pq_partial, batch_format="pyarrow", batch_size=2048).to_pandas()
        new = books.copy()
        for (m, code), grp in part.groupby(["sub", "code"]):
            s = np.sum(np.stack([np.asarray(v) for v in grp["vsum"]]), axis=0)
            n = grp["count"].sum()
            if n > 0:
                new[int(m), int(code)] = s / n
        books = new

    bcast = ray.put((books, q_ids, q_norm))

    def pq_score(batch: pa.Table) -> pa.Table:
        bk, q_ids_, q_norm_ = ray.get(bcast)
        ids = batch["vec_id"].to_numpy()
        mat = _emb_matrix(batch["embedding"])
        nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n = len(ids)
        # encode the batch: codes (n_sub, n)
        adc = np.zeros((len(q_ids_), n), dtype=np.float64)
        for m in range(n_sub):
            x = nmat[:, m * dsub : (m + 1) * dsub]
            sc = 2 * (x @ bk[m].T) - np.sum(bk[m] ** 2, axis=1)
            assign = np.argmax(sc, axis=1)  # (n,)
            # per-query LUT for this subspace: (Q, n_codes)
            lut = q_norm_[:, m * dsub : (m + 1) * dsub] @ bk[m].T
            adc += lut[:, assign]
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids_)):
            cand = ids != q_ids_[qi]
            ci = np.flatnonzero(cand)
            if len(ci) == 0:
                continue
            take = ci[np.argsort(-adc[qi, ci], kind="stable")[:rerank]]
            sims = nmat[take] @ q_norm_[qi]  # exact re-rank
            for n_id, s in zip(ids[take], sims):
                out_q.append(int(q_ids_[qi]))
                out_n.append(int(n_id))
                out_s.append(round(float(s), 4))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cands = ds.map_batches(pq_score, batch_format="pyarrow", batch_size=2048).to_pandas()
    if len(cands) == 0:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "sim", "rank"])
    out = cands.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    out = out.groupby("query_id", as_index=False).head(_ANN_TOPK)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def q_search_discovery(sf_dir: str) -> pd.DataFrame:
    """F12/F13 — search-driven discovery: (host, query) seed rows through a
    SearchDiscovery actor pool (per-actor corpus index = the browser-session
    state), emitting frontier-shaped URL rows with pagination ranks."""
    from ..sources.pages import generate_corpus, num_hosts
    from ..stages.discovery import SearchDiscovery

    corpus = generate_corpus(sf_dir)
    h = min(corpus.n_hosts, 8)
    seeds = pd.DataFrame(
        [
            {"host": f"host{i:03d}.example", "query": q}
            for i in range(h)
            for q in ("query", "vector", "stream")
        ]
    )
    out = (
        rd.from_pandas(seeds)
        .repartition(2)  # ≥ pool size: one input block starves the 2nd actor
        .map_batches(
            SearchDiscovery,
            fn_constructor_kwargs={
                "pages_dir": corpus.pages_dir,
                "num_buckets": corpus.num_buckets,
            },
            concurrency=2,
            batch_size=8,
            batch_format="pandas",
            num_cpus=0.5,
        )
        .to_pandas()
    )
    return out.sort_values(["host", "query", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# TPC-H-Q18-shaped large-volume orders (high-cardinality HAVING → join)

_Q18_MIN_QTY = 180.0
_Q18_TOPK = 20


def q_q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, joined back to orders + customer, top-K by order value.
    The HAVING aggregate is over l_orderkey — web-scale cardinality — so
    it runs as per-batch pandas partials shuffled by a stable
    orderkey-hash bucket (NB keys; an orderkey is whole within its
    bucket, so in-bucket sums are exact) with the ``> T`` filter applied
    IN-BUCKET: only the selectivity-bounded hitter set ever leaves the
    shuffle. Hitters join orders and customer via hash-partitioned
    ``Dataset.join`` (no broadcast key sets), and the ``_topk_cut``
    epilogue keeps the driver at O(#blocks · K) rows."""
    from .analytics import _splitmix64
    from .neardup import nb_for

    NUM_BUCKETS = nb_for(sf_dir, "lineitem")  # corpus-derived partition count

    def li_partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "q": t["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        p = df.groupby("l_orderkey", as_index=False).agg(part_q=("q", "sum"))
        p["bucket"] = (
            _splitmix64(p["l_orderkey"].to_numpy()) % np.uint64(NUM_BUCKETS)
        ).astype(np.int64)
        return pa.Table.from_pandas(p, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_orderkey", as_index=False).agg(sum_qty=("part_q", "sum"))
        return s[s["sum_qty"] > _Q18_MIN_QTY]

    hitters = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(li_partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )
    bo = hitters.join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        "inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    joined = bo.join(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def shape(t: pa.Table) -> pa.Table:
        od = pc.strftime(
            pc.cast(t["o_orderdate"], pa.timestamp("us")), format="%Y-%m-%d"
        )
        return pa.Table.from_pydict(
            {
                "c_name": t["c_name"],
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["l_orderkey"],
                "o_orderdate": od,
                "o_totalprice": t["o_totalprice"],
                "sum_qty": t["sum_qty"],
            }
        )

    top = _topk_cut(
        joined.map_batches(shape, batch_format="pyarrow"),
        ["o_totalprice", "o_orderkey"],
        [False, True],
        _Q18_TOPK,
        round_cols={"o_totalprice": 2, "sum_qty": 2},
    )
    return top.reset_index(drop=True)


_SQL_Q18_LARGE = f"""
SELECT c_name, o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > {_Q18_MIN_QTY}
ORDER BY o_totalprice DESC, o_orderkey LIMIT {_Q18_TOPK}
"""


_KCORE_K = 3


def q_kg_kcore(sf_dir: str) -> pd.DataFrame:
    """k-core membership over the knowledge graph — the deletion-cascade
    graph class (vs kg_components/kg_pagerank's propagation and
    kg_triangles' enumeration): iterative peeling until every surviving
    entity keeps ≥ k neighbors. Runs as ``pipelines/graph.kcore`` — each
    round one NB-key bucket groupby that peels to a LOCAL fixpoint and
    exchanges only cross-bucket kill notices, all rounds lazily chained in
    ONE execution. Node identity matches ``kg_components``; oracle = an
    independent set-based sequential peel run to a true fixpoint
    (``oracle_triplets.sequential_kcore``), so the driver hash equality
    also proves the engine's round budget converged."""
    from ..functions.textnorm import graph_key
    from .graph import kcore

    tri = _deduped_triplets_df(sf_dir)
    if len(tri) == 0:
        return pd.DataFrame(columns=["node_type", "node_key", "in_kcore"])
    ha = _kg_node_hash(tri["subj_type"], tri["subj_name"])
    hb = _kg_node_hash(tri["obj_type"], tri["obj_name"])
    lo, hi = np.minimum(ha, hb), np.maximum(ha, hb)
    edges = (
        pd.DataFrame({"a": lo, "b": hi})
        .query("a != b")
        .drop_duplicates()
        .reset_index(drop=True)
    )
    alive = set(kcore(rd.from_pandas(edges), k=_KCORE_K)["node"].tolist())
    nodes = pd.DataFrame(
        {
            "node_type": pd.concat([tri["subj_type"], tri["obj_type"]]),
            "node_key": pd.concat(
                [tri["subj_name"].map(graph_key), tri["obj_name"].map(graph_key)]
            ),
            "h": np.concatenate([ha, hb]),
        }
    ).drop_duplicates(["node_type", "node_key"])
    nodes["in_kcore"] = nodes["h"].isin(alive).astype(np.int64)
    return (
        nodes[["node_type", "node_key", "in_kcore"]]
        .sort_values(["node_type", "node_key"])
        .reset_index(drop=True)
    )


def q_kg_bfs_depths(sf_dir: str) -> pd.DataFrame:
    """Multi-source BFS over the knowledge graph — the MIN-PLUS propagation
    class (CC's min-fold with an additive hop cost): the exact shortest hop
    count from the nearest seed entity (node hash % BFS_SEED_MOD == 0) for
    every reachable entity. Runs as ``pipelines/graph.bfs_depths`` — K
    bucket-grouped rounds, each relaxing to a LOCAL fixpoint (the k-core
    acceleration applied to distances) and exchanging only cross-bucket
    depth messages, lazily chained into ONE execution; an unapplied
    improving message RAISES instead of returning too-deep depths. Node
    identity matches ``kg_components``; oracle = a bounded recursive-CTE
    walk taking min depth per node, so the driver hash equality also
    proves the round budget covered the graph's hop diameter."""
    from ..functions.textnorm import graph_key
    from .graph import bfs_depths

    tri = _deduped_triplets_df(sf_dir)
    if len(tri) == 0:
        return pd.DataFrame(columns=["node_type", "node_key", "depth"])
    ha = _kg_node_hash(tri["subj_type"], tri["subj_name"])
    hb = _kg_node_hash(tri["obj_type"], tri["obj_name"])
    lo, hi = np.minimum(ha, hb), np.maximum(ha, hb)
    edges = (
        pd.DataFrame({"a": lo, "b": hi})
        .query("a != b")
        .drop_duplicates()
        .reset_index(drop=True)
    )
    depths = bfs_depths(rd.from_pandas(edges)).set_index("node")["depth"]
    nodes = pd.DataFrame(
        {
            "node_type": pd.concat([tri["subj_type"], tri["obj_type"]]),
            "node_key": pd.concat(
                [tri["subj_name"].map(graph_key), tri["obj_name"].map(graph_key)]
            ),
            "h": np.concatenate([ha, hb]),
        }
    ).drop_duplicates(["node_type", "node_key"])
    nodes["depth"] = nodes["h"].map(depths)
    out = nodes[nodes["depth"].notna()].copy()
    out["depth"] = out["depth"].astype("int64")
    return (
        out[["node_type", "node_key", "depth"]]
        .sort_values(["node_type", "node_key"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# kNN label-prediction eval (similarity-search quality as integer counts)

_KNN_Q = 100  # fixed query subset (lowest vec_ids)
_KNN_K = 5
# Power-of-two quantization scale: float32→float64 is exact, ×2^20 is exact
# (pure exponent shift), floor is exact — so BOTH numpy and DuckDB derive the
# IDENTICAL int64 vector from the same float32 list. |q| < 2^20 and d = 64 ⇒
# |dot| ≤ 2^46 fits int64 exactly and casts to float64 exactly. This removes
# the round-3 red row's float32-vs-float64 cosine boundary sensitivity: the
# decided quantity is derived from exact integers by two identical IEEE
# float64 ops on both sides (see _SQL_EMBEDDING_KNN_EVAL).
_KNN_QSCALE = 1048576.0


def q_embedding_knn_eval(sf_dir: str) -> pd.DataFrame:
    """Leave-self-out kNN classification accuracy over the embedding
    column: for a fixed query subset, predict each query's label by
    majority vote of its K nearest neighbors and fold to per-label
    integer (n_queries, n_correct) — the similarity-search QUALITY-eval
    shape. Neighbors rank by cosine over 2^20-quantized integer vectors:
    exact int64 dots/norms, then score = d·|d|/‖b‖² — a strictly
    monotone transform of cosine (the query's own norm is constant per
    query) computed with the same two IEEE float64 ops in the SQL
    oracle, so ranking and ties are bit-identical across engines.
    Scale form matches ``embedding_topk``: only the (Q × d) query matrix
    broadcasts; the corpus streams in batches (one integer matmul each)
    emitting top-K partials with neighbor labels riding along; the
    driver merges O(#batches · Q · K) rows, votes (count DESC, label
    ASC — the SQL tie order), and outputs a #labels-sized table."""
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding", "label"])
    order = np.argsort(qt["vec_id"].to_numpy())[:_KNN_Q]
    q_ids = qt["vec_id"].to_numpy()[order]
    q_labels = qt["label"].to_numpy()[order]
    q_mat = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
    )
    q_int = np.floor(q_mat * _KNN_QSCALE).astype(np.int64)
    q_ref = ray.put((q_ids, q_int))

    def topk_batch(batch: pa.Table) -> pa.Table:
        q_ids_, q_int_ = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy()
        labels = batch["label"].to_numpy()
        mat = _emb_matrix(batch["embedding"])
        m_int = np.floor(mat * _KNN_QSCALE).astype(np.int64)
        dots = q_int_ @ m_int.T  # exact int64 (|dot| ≤ 64·2^40 = 2^46)
        nsq = np.einsum("ij,ij->i", m_int, m_int)  # exact int64 squared norms
        d64 = dots.astype(np.float64)
        n64 = nsq.astype(np.float64)  # exact casts (< 2^53)
        score = (d64 * np.abs(d64)) / n64  # two IEEE ops — bit-equal to SQL
        out_q, out_n, out_l, out_s = [], [], [], []
        k = min(_KNN_K + 1, score.shape[1])
        for qi in range(score.shape[0]):
            thr = np.partition(score[qi], -k)[-k]
            idx = np.nonzero(score[qi] >= thr)[0]
            for j in idx:
                if ids[j] == q_ids_[qi]:
                    continue
                out_q.append(int(q_ids_[qi]))
                out_n.append(int(ids[j]))
                out_l.append(int(labels[j]))
                out_s.append(float(score[qi, j]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "nlabel": pa.array(out_l, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding", "label"])
        .map_batches(topk_batch, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    top = (
        partials.sort_values(
            ["query_id", "score", "neighbor_id"], ascending=[True, False, True]
        )
        .groupby("query_id", as_index=False)
        .head(_KNN_K)
    )
    votes = (
        top.groupby(["query_id", "nlabel"], as_index=False)
        .size()
        .rename(columns={"size": "c"})
    )
    votes = votes.sort_values(
        ["query_id", "c", "nlabel"], ascending=[True, False, True], kind="stable"
    )
    pred = votes.groupby("query_id", as_index=False).head(1)[["query_id", "nlabel"]]
    truth = pd.DataFrame({"query_id": q_ids.astype(np.int64), "label": q_labels.astype(np.int64)})
    m = truth.merge(pred, on="query_id")
    m["ok"] = (m["nlabel"] == m["label"]).astype(np.int64)
    out = m.groupby("label", as_index=False).agg(
        n_queries=("ok", "size"), n_correct=("ok", "sum")
    )
    return out.sort_values("label").reset_index(drop=True)


_SQL_EMBEDDING_KNN_EVAL = f"""
WITH q AS (
  SELECT vec_id AS qid, label AS qlabel,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_KNN_QSCALE}) AS BIGINT)) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {_KNN_Q}
), c AS (
  SELECT vec_id AS nid, label AS nlabel,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_KNN_QSCALE}) AS BIGINT)) AS nv
  FROM embeddings
), sims AS (
  SELECT q.qid, q.qlabel, c.nid, c.nlabel,
    CAST(CAST(list_aggregate(
      list_transform(list_zip(q.qv, c.nv), s -> s[1] * s[2]), 'sum') AS BIGINT)
      AS DOUBLE) AS d,
    CAST(CAST(list_aggregate(
      list_transform(c.nv, x -> x * x), 'sum') AS BIGINT) AS DOUBLE) AS n
  FROM q CROSS JOIN c WHERE c.nid != q.qid
), scored AS (
  -- exact-int-derived score via the same two IEEE float64 ops as the engine
  SELECT qid, qlabel, nid, nlabel, (d * abs(d)) / n AS score FROM sims
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn
  FROM scored
), votes AS (
  SELECT qid, qlabel, nlabel, count(*) AS c FROM ranked
  WHERE rn <= {_KNN_K} GROUP BY qid, qlabel, nlabel
), pred AS (
  SELECT qid, qlabel, nlabel,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, nlabel) AS rn2
  FROM votes
)
SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM pred WHERE rn2 = 1
GROUP BY qlabel ORDER BY qlabel
"""


# ---------------------------------------------------------------------------
# distributed linear probe (ridge normal equations as a mergeable sketch)

_PROBE_LAMBDA = 1.0


def q_embedding_linear_probe(sf_dir: str) -> pd.DataFrame:
    """Train a linear classifier on the embedding column IN the engine —
    the distributed-ML-training shape a training-data pipeline needs for
    quality probes: ridge regression to one-hot labels via the normal
    equations, whose sufficient statistics (XᵀX d×d, XᵀY d×L, n) are a
    MERGEABLE SKETCH — each batch emits one constant-size row, the driver
    folds O(#batches) of them and solves a d×d system (d=64). Evaluation
    is a second streaming pass with the (d×L) weight matrix broadcast,
    folding integer per-label confusion partials. Rows-only by design:
    the matrix solve is float-order-dependent (no SQL twin); pytest gates
    parity against a sequential NumPy fit plus an accuracy floor."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    n_labels = 10

    def sketch(batch: pa.Table) -> pa.Table:
        X = _emb_matrix(batch["embedding"])
        y = batch["label"].to_numpy()
        Y = np.zeros((len(y), n_labels), dtype=np.float64)
        Y[np.arange(len(y)), y] = 1.0
        xtx = X.T @ X  # (d, d)
        xty = X.T @ Y  # (d, L)
        return pa.Table.from_pydict(
            {
                "xtx": pa.array([xtx.ravel().tolist()], pa.list_(pa.float64())),
                "xty": pa.array([xty.ravel().tolist()], pa.list_(pa.float64())),
                "n": pa.array([len(y)], pa.int64()),
            }
        )

    parts = (
        rd.read_parquet(emb_path, columns=["embedding", "label"])
        .map_batches(sketch, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    d = int(np.sqrt(len(parts["xtx"].iloc[0])))
    xtx = np.sum([np.asarray(v).reshape(d, d) for v in parts["xtx"]], axis=0)
    xty = np.sum(
        [np.asarray(v).reshape(d, n_labels) for v in parts["xty"]], axis=0
    )
    W = np.linalg.solve(xtx + _PROBE_LAMBDA * np.eye(d), xty)  # (d, L)
    w_ref = ray.put(W)

    def confusion(batch: pa.Table) -> pa.Table:
        W_ = ray.get(w_ref)
        X = _emb_matrix(batch["embedding"])
        y = batch["label"].to_numpy().astype(np.int64)
        pred = np.argmax(X @ W_, axis=1).astype(np.int64)
        df = pd.DataFrame({"label": y, "ok": (pred == y).astype(np.int64)})
        p = df.groupby("label", as_index=False).agg(
            part_n=("ok", "size"), part_ok=("ok", "sum")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    conf = (
        rd.read_parquet(emb_path, columns=["embedding", "label"])
        .map_batches(confusion, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    out = conf.groupby("label", as_index=False).agg(
        n=("part_n", "sum"), n_correct=("part_ok", "sum")
    )
    out["accuracy"] = (out["n_correct"] / out["n"]).round(4)
    return out.sort_values("label").reset_index(drop=True)


def q_embedding_source_centroids(sf_dir: str) -> pd.DataFrame:
    """Cross-MODALITY join + grouped vector mean: the metadata table
    (documents.source) hash-partition-joins the vector table on
    doc_id = vec_id (``Dataset.join`` — neither side broadcasts), then
    per-source centroids fold as the mergeable (sum-vector, n) sketch in
    long form. The join is the shape every multimodal pipeline needs to
    attach curation metadata to an embedding store; output is
    #sources × d rows."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def pack(batch: pa.Table) -> pa.Table:
        # Acero hash joins reject list-typed payload columns — carry the
        # vector through the join as fixed-width float64 bytes instead
        mat = _emb_matrix(batch["embedding"])
        return pa.Table.from_pydict(
            {
                "vec_id": batch["vec_id"],
                "emb_bin": pa.array(
                    [mat[i].tobytes() for i in range(mat.shape[0])], pa.binary()
                ),
            }
        )

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(pack, batch_format="pyarrow")
    joined = emb.join(docs, "inner", num_partitions=8, on=("vec_id",), right_on=("doc_id",))

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_numpy(zero_copy_only=False)
        blobs = batch["emb_bin"].to_pylist()
        mat = np.frombuffer(b"".join(blobs), dtype=np.float64).reshape(
            len(blobs), -1
        )
        out_src, out_pos, out_sum, out_n = [], [], [], []
        for s in np.unique(srcs):
            sel = mat[srcs == s]
            v = sel.sum(axis=0)
            for pos in range(len(v)):
                out_src.append(str(s))
                out_pos.append(pos + 1)
                out_sum.append(float(v[pos]))
                out_n.append(int(sel.shape[0]))
        return pa.Table.from_pydict(
            {
                "source": pa.array(out_src, pa.string()),
                "pos": pa.array(out_pos, pa.int64()),
                "s": pa.array(out_sum, pa.float64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "pos"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg["centroid"] = (agg["s"] / agg["n"]).round(4)
    return (
        agg[["source", "pos", "centroid"]]
        .sort_values(["source", "pos"])
        .reset_index(drop=True)
    )


_SQL_EMBEDDING_SOURCE_CENTROIDS = """
SELECT source, pos, round(avg(val), 4) AS centroid
FROM (SELECT d.source, unnest(e.embedding) AS val,
             generate_subscripts(e.embedding, 1) AS pos
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id)
GROUP BY source, pos ORDER BY source, pos
"""


def q_doc_lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID EVAL: confusion counts of the stopword classifier vs the
    generator's ``lang`` truth column — the model-eval shape over a text
    kernel. Per batch: the same ``lang_id`` kernel plus domain-sized
    (truth, pred) count partials; one #langs² groupby. Oracle = the
    generated stopword-twin SQL joined to the truth column (kernel and SQL
    derive from the same tables, so they cannot drift)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        preds = pd.DataFrame(
            {
                "lang_true": batch["lang"],
                "lang_pred": [A.lang_id(t) for t in batch["text"]],
            }
        )
        return preds.groupby(["lang_true", "lang_pred"], as_index=False).agg(
            part_n=("lang_pred", "size")
        )

    out = (
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(fn, batch_format="pandas")
        .groupby(["lang_true", "lang_pred"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    return out.sort_values(["lang_true", "lang_pred"]).reset_index(drop=True)


_SQL_DOC_LANG_CONFUSION = f"""
WITH pred AS ({_lang_id_sql()})
SELECT d.lang AS lang_true, p.lang_pred, count(*) AS n
FROM documents d JOIN pred p ON p.doc_id = d.doc_id
GROUP BY lang_true, p.lang_pred ORDER BY lang_true, lang_pred
"""


def q_embedding_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Contrastive HARD-NEGATIVE mining: for each query vector, the most
    similar corpus vector with a DIFFERENT label — the pair-mining step of
    contrastive training-data prep. Same scale form as ``embedding_topk``
    (queries + labels broadcast, corpus streams, per-batch top-1 partials
    on rounded sims with the different-label filter applied in-batch);
    ties break (sim DESC, neighbor_id ASC) identically in SQL."""
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding", "label"])
    order = np.argsort(qt["vec_id"].to_numpy())[:_KNN_Q]
    q_ids = qt["vec_id"].to_numpy()[order]
    q_labels = qt["label"].to_numpy()[order].astype(np.int64)
    q_mat = np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
    )
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_labels, q_norm))

    def top1_batch(batch: pa.Table) -> pa.Table:
        q_ids_, q_labels_, q_norm_ = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy()
        labels = batch["label"].to_numpy().astype(np.int64)
        mat = _emb_matrix(batch["embedding"])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims_r = np.round(q_norm_ @ mat.T, 4)  # (Q, n)
        out_q, out_n, out_l, out_s = [], [], [], []
        for qi in range(sims_r.shape[0]):
            mask = labels != q_labels_[qi]
            if not mask.any():
                continue
            s = sims_r[qi][mask]
            thr = s.max()
            idx = np.flatnonzero(mask)[np.nonzero(s >= thr)[0]]
            for j in idx:  # keep rounded-sim ties for the global tiebreak
                out_q.append(int(q_ids_[qi]))
                out_n.append(int(ids[j]))
                out_l.append(int(labels[j]))
                out_s.append(float(sims_r[qi, j]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "neg_label": pa.array(out_l, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        rd.read_parquet(emb_path, columns=["vec_id", "embedding", "label"])
        .map_batches(top1_batch, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    out = (
        partials.sort_values(
            ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
        )
        .groupby("query_id", as_index=False)
        .head(1)
    )
    # the sim column stays internal: DuckDB computes cosines over float32
    # lists, so a raw value within float noise of a 4dp boundary can round
    # differently across engines (observed once at sf0.001) — the MINING
    # result (which neighbor) is stable, the reported float is not
    return (
        out[["query_id", "neighbor_id", "neg_label"]]
        .sort_values("query_id")
        .reset_index(drop=True)
    )


_SQL_EMBEDDING_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe, label AS qlabel FROM embeddings
  ORDER BY vec_id LIMIT {_KNN_Q}
), sims AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id, e.label AS neg_label,
         round(list_cosine_similarity(q.qe, e.embedding), 4) AS sim
  FROM q CROSS JOIN embeddings e WHERE e.label != q.qlabel
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rn
  FROM sims
)
SELECT query_id, neighbor_id, neg_label FROM ranked WHERE rn = 1
ORDER BY query_id
"""


def _source_fingerprint(src: str) -> str:
    """Content fingerprint for the source-format twin export caches: size +
    head/tail bytes of the parquet (covers footer metadata, so a regenerated
    table with an unchanged row count still invalidates — ADVICE r4)."""
    import hashlib

    size = os.path.getsize(src)
    h = hashlib.md5()
    h.update(str(size).encode())
    with open(src, "rb") as f:
        h.update(f.read(65536))
        if size > 131072:
            f.seek(-65536, 2)
            h.update(f.read(65536))
    return h.hexdigest()[:10]


def q_events_hourly_json(sf_dir: str) -> pd.DataFrame:
    """Source-format breadth: the SAME tumbling-window aggregate as
    ``events_hourly``, but read through ``ray.data.read_json`` from a
    JSON-lines export of the events table (cached per sf under /tmp —
    written once by DuckDB, so the bytes are engine-independent). Proves
    the engine's operators are source-agnostic: only the read node
    changes; the oracle is identical SQL over the parquet view."""
    import duckdb as _duck
    import pyarrow.parquet as _pq

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    os.makedirs(base, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    n_rows = _pq.read_metadata(src).num_rows
    path = os.path.join(base, f"events-{tag}-n{n_rows}-{_source_fingerprint(src)}.jsonl")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        _duck.sql(
            "COPY (SELECT event_type, epoch_us(ts) AS ts_us, value "
            f"FROM read_parquet('{src}') ORDER BY event_id) "
            f"TO '{tmp}' (FORMAT JSON)"
        )
        os.replace(tmp, path)

    def windowed(batch: pa.Table) -> pa.Table:
        epoch_s = pc.divide(pc.cast(batch["ts_us"], pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch_s, 3600), 3600)
        return pa.Table.from_pydict(
            {
                "event_type": batch["event_type"],
                "window_start": win,
                "value": batch["value"],
            }
        )

    out = (
        rd.read_json(path)
        .map_batches(windowed, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    return (
        _round(out, {"sum_value": 2})
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )


def q_events_hourly_csv(sf_dir: str) -> pd.DataFrame:
    """Source-format breadth twin #2: the SAME tumbling-window aggregate as
    ``events_hourly``, read through ``ray.data.read_csv`` from a CSV export
    of the events table (cached per sf under /tmp — written once by DuckDB,
    so the bytes are engine-independent). With ``events_hourly_json`` this
    covers the reference's text-source formats; only the read node changes,
    the oracle is identical SQL over the parquet view."""
    import duckdb as _duck
    import pyarrow.parquet as _pq

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    os.makedirs(base, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    n_rows = _pq.read_metadata(src).num_rows
    path = os.path.join(base, f"events-{tag}-n{n_rows}-{_source_fingerprint(src)}.csv")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        _duck.sql(
            "COPY (SELECT event_type, epoch_us(ts) AS ts_us, value "
            f"FROM read_parquet('{src}') ORDER BY event_id) "
            f"TO '{tmp}' (FORMAT CSV, HEADER)"
        )
        os.replace(tmp, path)

    def windowed(batch: pa.Table) -> pa.Table:
        epoch_s = pc.divide(pc.cast(batch["ts_us"], pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch_s, 3600), 3600)
        return pa.Table.from_pydict(
            {
                "event_type": batch["event_type"],
                "window_start": win,
                "value": batch["value"],
            }
        )

    out = (
        rd.read_csv(path)
        .map_batches(windowed, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    return (
        _round(out, {"sum_value": 2})
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )


def q_media_phash_dups(sf_dir: str) -> pd.DataFrame:
    """Perceptual near-duplicate IMAGE pairs — the multimodal analog of the
    MinHash/SimHash text near-dups: every doc renders a shared-asset image
    variant (re-edit, not byte-copy — exact content-hash dedup misses it,
    cf. `media_exact_dedup`), the engine decodes the actual bytes and
    computes a 64-bit average-hash with EXACT integer bit decisions
    (`stages/multimodal.ahash64`), and pairs with hamming ≤ PHASH_HAM_T are
    enumerated by the multi-index construction: 4 disjoint 16-bit bands —
    a pair within distance 3 MUST agree exactly on ≥1 band (pigeonhole), so
    recall is provably 1.0, no probabilistic LSH tuning. Band-key groupby
    is NB-bucket-bounded (the repo-wide pair-expansion shape); hashes ride
    the shuffle rows so the hamming verify runs in-group, vectorized; a
    second NB-key groupby dedups cross-band repeats. Payloads never enter
    the shuffle — only (doc_id, phash) rows travel (the 100-TB shape).
    Oracle: sequential brute-force O(n²) scan with a Fraction-mean hash
    formulation (`oracle_analysis.persist_expected_media_phash`) —
    independent on both the hash axis and the join axis. Skew note: exact
    pair enumeration is inherently quadratic in an asset's copy count; a
    production corpus caps per-key expansion (cf. DF_CAP) or emits
    cluster representatives instead."""
    from ..sources.media import render_image_variant
    from ..stages.multimodal import PHASH_HAM_T, ahash64, decode_image, popcount64
    from .neardup import _MASK63, _PAIR_MIX, nb_for

    NUM_BUCKETS = nb_for(sf_dir)  # corpus-derived partition count

    def hash_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = np.empty(len(ids), np.int64)
        for i, d in enumerate(ids):
            _, _, arr = decode_image(render_image_variant(int(d)))
            hs[i] = ahash64(arr)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([int(x) for x in ids], pa.int64()),
                "phash": pa.array(hs, pa.int64()),
            }
        )

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        hs = batch["phash"].to_numpy()
        u = np.ascontiguousarray(hs).view(np.uint64)
        keys = [
            (np.int64(b) << np.int64(16))
            | ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            for b in range(4)
        ]
        bkey = np.concatenate(keys)
        return pa.Table.from_pydict(
            {
                "bkey": pa.array(bkey, pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "phash": pa.array(np.tile(hs, 4), pa.int64()),
                "bucket": pa.array(
                    ((bkey * _PAIR_MIX) & _MASK63) % NUM_BUCKETS, pa.int64()
                ),
            }
        )

    def bucket_cands(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("doc_a", "doc_b", "hamming", "pbucket")}
        )
        vc = g["bkey"].value_counts()
        g = g[g["bkey"].isin(vc[vc >= 2].index)]
        if len(g) == 0:
            return empty
        m = g.merge(g, on="bkey", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if len(m) == 0:
            return empty
        ham = popcount64(
            (
                np.ascontiguousarray(m["phash_a"].to_numpy()).view(np.uint64)
                ^ np.ascontiguousarray(m["phash_b"].to_numpy()).view(np.uint64)
            ).view(np.int64)
        )
        m = m[ham <= PHASH_HAM_T]
        ham = ham[ham <= PHASH_HAM_T]
        if len(m) == 0:
            return empty
        pp = pd.DataFrame(
            {
                "doc_a": m["doc_id_a"].to_numpy(),
                "doc_b": m["doc_id_b"].to_numpy(),
                "hamming": ham,
            }
        ).drop_duplicates(["doc_a", "doc_b"])
        pp["pbucket"] = ((pp["doc_a"] * _PAIR_MIX + pp["doc_b"]) % NUM_BUCKETS).astype("int64")
        return pp.astype("int64")

    def dedup_cands(g: pd.DataFrame) -> pd.DataFrame:
        return g[["doc_a", "doc_b", "hamming"]].drop_duplicates(["doc_a", "doc_b"]).astype("int64")

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(hash_rows, batch_format="pyarrow", batch_size=256)
        .map_batches(band_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_cands, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedup_cands, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("doc_a", "doc_b", "hamming")}
        )
    return (
        out[["doc_a", "doc_b", "hamming"]]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def q_events_hourly_ipc(sf_dir: str) -> pd.DataFrame:
    """Source-format breadth twin #3: the SAME tumbling-window aggregate as
    ``events_hourly``, read through a CUSTOM datasource — Arrow IPC (Feather
    v2) files via ``ray.data.read_binary_files`` + a zero-copy in-batch IPC
    decode (Ray Data has no native IPC reader; this is the pattern for any
    container format it lacks: binary rows in, ``pa.ipc.open_file`` out,
    one flat_map-shaped batch transform). The export is sharded into
    multiple IPC files so the read parallelizes like a real lake layout;
    bytes are engine-independent (written once by pyarrow from the parquet
    table). Oracle: identical SQL over the parquet view."""
    import pyarrow.ipc as _ipc
    import pyarrow.parquet as _pq

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    src = os.path.join(sf_dir, "events.parquet")
    n_rows = _pq.read_metadata(src).num_rows
    ipc_dir = os.path.join(base, f"events-ipc-{tag}-n{n_rows}-{_source_fingerprint(src)}")
    if not os.path.isdir(ipc_dir):
        tmp = ipc_dir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        t = _pq.read_table(src, columns=["event_type", "ts", "value"])
        shard = max(1, t.num_rows // 4)
        for i in range(0, t.num_rows, shard):
            with _ipc.new_file(
                os.path.join(tmp, f"part-{i // shard:04d}.arrow"),
                t.schema,
            ) as w:
                w.write_table(t.slice(i, shard))
        os.replace(tmp, ipc_dir)

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            _ipc.open_file(pa.BufferReader(buf.as_py())).read_all()
            for buf in batch["bytes"]
        ]
        t = pa.concat_tables(tables)
        epoch_s = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch_s, 3600), 3600)
        return pa.Table.from_pydict(
            {
                "event_type": t["event_type"],
                "window_start": win,
                "value": t["value"],
            }
        )

    out = (
        rd.read_binary_files(ipc_dir)
        .map_batches(decode, batch_format="pyarrow", batch_size=1)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    return (
        _round(out, {"sum_value": 2})
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )


def q_crawl_host_profile(sf_dir: str) -> pd.DataFrame:
    """Crawl-derived host×depth profile — a DISTRIBUTED reduction of the
    crawl output (per (host, depth): pages, hits, extracted chars), the
    post-crawl reporting pass a production pipeline runs over the lineage
    directory. Streams the round outputs via `extracted_dataset` (predicate
    pushdown on hrank, column-pruned read — never the text/link columns)
    into one bounded-key groupby (host cardinality = site count, not URL
    count). Oracle: the SAME reduction in SQL over the sequential oracle's
    expected extracted table, with host re-derived from canon_url — so the
    engine's carried `host` column is cross-checked against the URL
    canonicalization."""
    from .curation import _MASK63, _md5_lower64
    from .neardup import nb_for

    NUM_BUCKETS = nb_for(sf_dir)  # corpus-derived partition count

    eng, result = _crawl_for(sf_dir)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(is_hit=(df["fetch_status"] == "hit").astype("int64"))
        g = (
            df.groupby(["host", "depth"], sort=False)
            .agg(
                n_pages=("host", "size"),
                n_hits=("is_hit", "sum"),
                sum_chars=("n_chars", "sum"),
            )
            .reset_index()
        )
        # deterministic cross-process host hash (python hash() is
        # PYTHONHASHSEED-randomized per worker — buckets would split)
        g["bucket"] = (
            g["host"].map(lambda h: _md5_lower64(h) & _MASK63) % NUM_BUCKETS
        ).astype("int64")
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # a host is whole within its bucket — exact in-bucket totals,
        # no global per-host groupby (the 1 ms/key trap at site counts)
        return (
            g.groupby(["host", "depth"], sort=False)
            .agg(
                n_pages=("n_pages", "sum"),
                n_hits=("n_hits", "sum"),
                sum_chars=("sum_chars", "sum"),
            )
            .reset_index()
        )

    out = (
        result.extracted_dataset(
            columns=["host", "depth", "fetch_status", "n_chars", "hrank"]
        )
        .map_batches(partials, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    for c in ("depth", "n_pages", "n_hits", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["host", "depth"]).reset_index(drop=True)


def q_kg_link_scores(sf_dir: str) -> pd.DataFrame:
    """Link-prediction scores over the knowledge graph (the
    graph-SIMILARITY class, vs enumeration/propagation/peeling): per
    existing edge, the endpoint degrees, the common-neighbor count
    (= triangles through the edge, closed once via the min-vertex wedge
    machinery with a per-EDGE credit step — `graph.edge_link_scores`) and
    the neighbor-Jaccard c/(deg_a+deg_b−c), the single terminal division.
    All decided quantities are integer counts; oracle = the identical
    definition as a DuckDB self-join over the sequential oracle's expected
    triplets with the same node hash."""
    from ..functions.textnorm import graph_key
    from .graph import edge_link_scores

    tri = _deduped_triplets_df(sf_dir)
    cols = [
        "a_type", "a_key", "b_type", "b_key",
        "deg_a", "deg_b", "n_common", "jaccard",
    ]
    if len(tri) == 0:
        return pd.DataFrame(columns=cols)
    ha = _kg_node_hash(tri["subj_type"], tri["subj_name"])
    hb = _kg_node_hash(tri["obj_type"], tri["obj_name"])
    lo, hi = np.minimum(ha, hb), np.maximum(ha, hb)
    edges = (
        pd.DataFrame({"a": lo, "b": hi})
        .query("a != b")
        .drop_duplicates()
        .reset_index(drop=True)
    )
    scored = edge_link_scores(rd.from_pandas(edges))
    nodes = (
        pd.DataFrame(
            {
                "node_type": pd.concat([tri["subj_type"], tri["obj_type"]]),
                "node_key": pd.concat(
                    [tri["subj_name"].map(graph_key), tri["obj_name"].map(graph_key)]
                ),
                "h": np.concatenate([ha, hb]),
            }
        )
        .drop_duplicates("h")
        .set_index("h")
    )
    scored["a_type"] = scored["a"].map(nodes["node_type"])
    scored["a_key"] = scored["a"].map(nodes["node_key"])
    scored["b_type"] = scored["b"].map(nodes["node_type"])
    scored["b_key"] = scored["b"].map(nodes["node_key"])
    scored["jaccard"] = scored["n_common"].to_numpy() / (
        scored["deg_a"].to_numpy() + scored["deg_b"].to_numpy()
        - scored["n_common"].to_numpy()
    )
    return (
        scored[cols]
        .sort_values(["a_type", "a_key", "b_type", "b_key"])
        .reset_index(drop=True)
    )
