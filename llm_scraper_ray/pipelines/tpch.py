"""TPC-H-shaped relational operator classes not yet covered by the engine
(the reference's §2.5-2.8 join/aggregate surface, widened to the classic
decision-support shapes a user would expect from any engine). Each query is
the idiomatic Ray-Data expression of ONE distinct distributed shape:

  - q7:  nation-PAIR volume — fact⋈fact shuffle join with BOTH group keys
    riding opposite sides of the join (supplier nation on lineitem partials,
    customer nation on the orders side).
  - q8:  market share — ratio of conditional sums per year, both legs
    integer-quantized so the decided ratio is a quotient of exact int64s.
  - q9:  product profit — computed measure over two broadcast dimensions
    (part attributes + supplier nation), no shuffle at all until the tiny
    (nation, year) groupby.
  - q10: returned-item revenue — fact⋈fact join + distributed top-k cut,
    dimension attributes attached AFTER the cut (never a customer shuffle).
  - q11 (part_value_concentration): group-sum > fraction-of-global-total —
    two-pass scalar threshold, integer cents so the cut is exact.
  - q12 (priority_class): conditional aggregation over a shuffle join
    (CASE WHEN inside the fold, partials pre-agged per orderkey).
  - q14 (promo_effect): single-row ratio of conditional integer sums.
  - q15 (top_supplier): argmax-with-ties over a group-sum — exact integer
    revenue so cross-engine float summation order cannot flip the winner.
  - q16 (supplier_part_counts): COUNT(DISTINCT) per group via in-bucket
    triple dedup (bucket = hash(group key), so a group's triples are whole
    within one bucket — no high-cardinality groupby, no driver set).
  - q19 (disjunctive_revenue): OR-of-conjunctions predicate pushdown,
    vectorized per batch over broadcast part attributes.
  - q20 (supplier_part_share): per-(part,supplier) share vs per-part total,
    both computed IN-BUCKET (partkey-hash buckets), integer quantities.
  - q22 (missed_opportunities): global-scalar filter (avg positive balance,
    decided by integer cross-multiplication — no float division) + anti-join
    against the order fact, grouped per nation.

All money quantities that DECIDE anything (thresholds, ranks, shares) are
quantized with floor(x * 100) int64 on BOTH engines (the CLAUDE.md
knn-eval lesson); display-only sums use the established round-2dp-both-sides
convention. Reference parity: the reference's join/aggregate surface is
`util/*_analysis.py`-era pandas merges — these re-express the same class of
work as hash-partitioned `Dataset.join` + broadcast dims + partial pre-agg.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

NB = 64  # bucket count for in-bucket dedup/share groupbys


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _small(sf_dir: str, table: str, columns: list[str]) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    ).to_pandas()


def _us(date: str) -> int:
    return int(pd.Timestamp(date).value // 1000)


def _year_from_us(us: np.ndarray) -> np.ndarray:
    return (
        us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
    )


def _cents(x: np.ndarray) -> np.ndarray:
    """floor(x*100) — the one quantization numpy and DuckDB share exactly."""
    return np.floor(x * 100.0).astype(np.int64)


# ---------------------------------------------------------------------------
# Q7: volume shipping between nation pairs


_Q7_LO = _us("1996-01-01")
_Q7_HI = _us("1998-01-01")


def q_q7_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q7 shape: revenue per (supplier nation, customer nation, ship
    year) for cross-nation trades. Supplier nation is a broadcast dimension
    lookup inside the lineitem partial pass; customer nation rides the
    orders side of ONE orderkey-partitioned join; the pair filter runs
    in-batch post-join; the final groupby folds ≤ 25·25·2 keys."""
    supp = _small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_ref = ray.put(
        pd.Series(
            supp["s_nationkey"].to_numpy(np.int64),
            index=supp["s_suppkey"].to_numpy(np.int64),
        )
    )
    nation = _small(sf_dir, "nation", ["n_nationkey", "n_name"])

    oc = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def li_partials(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= _Q7_LO) & (sd < _Q7_HI)
        lut = ray.get(supp_ref)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        snat = lut.reindex(
            t["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        ).to_numpy(np.int64)
        rev = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": ok,
                "s_nat": snat,
                "l_year": _year_from_us(sd[keep]),
                "rev": rev,
            }
        )
        p = df.groupby(["l_orderkey", "s_nat", "l_year"], as_index=False).agg(
            part_rev=("rev", "sum")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_partials, batch_format="pyarrow")

    def cross_nation(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["s_nat"], pc.cast(t["c_nationkey"], pa.int64()))
        return t.filter(keep).select(["s_nat", "c_nationkey", "l_year", "part_rev"])

    agg = (
        li.join(
            oc, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
        )
        .map_batches(cross_nation, batch_format="pyarrow")
        .groupby(["s_nat", "c_nationkey", "l_year"])
        .aggregate(Sum("part_rev", alias_name="rev_cents"))
        .to_pandas()
    )
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    agg["supp_nation"] = agg["s_nat"].map(names)
    agg["cust_nation"] = agg["c_nationkey"].map(names)
    agg["rev_cents"] = agg["rev_cents"].astype(np.int64)
    agg["l_year"] = agg["l_year"].astype(np.int64)
    return (
        agg[["supp_nation", "cust_nation", "l_year", "rev_cents"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


SQL_Q7_NATION_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE s.s_nationkey <> c.c_nationkey
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8: market share of one supplier nation inside one customer region


_Q8_REGIONKEY = 2  # ASIA
_Q8_NATIONKEY = 2  # NATION_2 (in ASIA)
_Q8_PTYPE = "STANDARD"


def q_q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q8 shape: per order year, NATION_2's share of all STANDARD-part
    revenue delivered to ASIA customers. Both the numerator and denominator
    are integer-cent sums (floor(rev·100) per line item, identical on both
    engines), so the decided ratio is a quotient of exact int64s — the
    knn-eval quantization pattern applied to a ratio aggregate."""
    part = _small(sf_dir, "part", ["p_partkey", "p_type"])
    std_keys = part.loc[part["p_type"] == _Q8_PTYPE, "p_partkey"].to_numpy(np.int64)
    supp = _small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _small(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    asia_nations = nation.loc[
        nation["n_regionkey"] == _Q8_REGIONKEY, "n_nationkey"
    ].to_numpy(np.int64)
    bc = ray.put(
        {
            "std": std_keys,
            "snat": pd.Series(
                supp["s_nationkey"].to_numpy(np.int64),
                index=supp["s_suppkey"].to_numpy(np.int64),
            ),
        }
    )

    oc = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .join(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
            "inner",
            num_partitions=8,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        .map_batches(
            lambda t: t.filter(
                pc.is_in(
                    pc.cast(t["c_nationkey"], pa.int64()),
                    value_set=pa.array(asia_nations, pa.int64()),
                )
            ).select(["o_orderkey", "o_orderdate"]),
            batch_format="pyarrow",
        )
    )

    def li_partials(t: pa.Table) -> pa.Table:
        d = ray.get(bc)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(pk, d["std"])
        snat = d["snat"].reindex(
            t["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        ).to_numpy(np.int64)
        cents = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "nat_cents": np.where(snat == _Q8_NATIONKEY, cents, 0),
                "tot_cents": cents,
            }
        )
        p = df.groupby("l_orderkey", as_index=False).agg(
            nat_cents=("nat_cents", "sum"), tot_cents=("tot_cents", "sum")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partials, batch_format="pyarrow")

    def yearize(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "o_year": pa.array(_year_from_us(od), pa.int64()),
                "nat_cents": t["nat_cents"],
                "tot_cents": t["tot_cents"],
            }
        )

    agg = (
        li.join(
            oc, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
        )
        .map_batches(yearize, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("nat_cents", alias_name="nat_cents"),
            Sum("tot_cents", alias_name="tot_cents"),
        )
        .to_pandas()
    )
    agg["nat_cents"] = agg["nat_cents"].astype(np.int64)
    agg["tot_cents"] = agg["tot_cents"].astype(np.int64)
    agg["mkt_share"] = (agg["nat_cents"] / agg["tot_cents"]).round(6)
    return (
        agg[["o_year", "nat_cents", "tot_cents", "mkt_share"]]
        .sort_values("o_year")
        .reset_index(drop=True)
    )


SQL_Q8_MARKET_SHARE = f"""
WITH v AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CASE WHEN s.s_nationkey = {_Q8_NATIONKEY}
              THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT) ELSE 0 END AS nat_c,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS tot_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE n.n_regionkey = {_Q8_REGIONKEY} AND p.p_type = '{_Q8_PTYPE}')
SELECT o_year, CAST(sum(nat_c) AS BIGINT) AS nat_cents,
       CAST(sum(tot_c) AS BIGINT) AS tot_cents,
       round(CAST(sum(nat_c) AS BIGINT) / CAST(sum(tot_c) AS BIGINT), 6)
         AS mkt_share
FROM v GROUP BY o_year ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9: product-type profit by supplier nation and ship year


_Q9_NAME_SUBSTR = "widget"
_Q9_COST_FRAC = 0.5  # stand-in supply cost = 0.5 · p_retailprice (no partsupp)


def q_q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q9 shape (adapted: no partsupp table — supply cost is
    0.5·p_retailprice): profit per (supplier nation, ship year) on parts
    whose name contains 'widget'. Part attributes and supplier nation are
    both broadcast dimensions resolved inside ONE lineitem pass; the only
    shuffle is the ≤ 25·7-key groupby of in-batch partials."""
    part = _small(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    hit = part[part["p_name"].str.contains(_Q9_NAME_SUBSTR)]
    supp = _small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _small(sf_dir, "nation", ["n_nationkey", "n_name"])
    bc = ray.put(
        {
            "price": pd.Series(
                hit["p_retailprice"].to_numpy(np.float64),
                index=hit["p_partkey"].to_numpy(np.int64),
            ),
            "snat": pd.Series(
                supp["s_nationkey"].to_numpy(np.int64),
                index=supp["s_suppkey"].to_numpy(np.int64),
            ),
        }
    )

    def partials(t: pa.Table) -> pa.Table:
        d = ray.get(bc)
        price = d["price"].reindex(
            t["l_partkey"].to_numpy(zero_copy_only=False)
        ).to_numpy(np.float64)
        keep = ~np.isnan(price)
        snat = d["snat"].reindex(
            t["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        ).to_numpy(np.int64)
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)[keep]
        amount = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
            - _Q9_COST_FRAC
            * price[keep]
            * t["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        )
        df = pd.DataFrame(
            {"s_nat": snat, "l_year": _year_from_us(sd), "amount": amount}
        )
        p = df.groupby(["s_nat", "l_year"], as_index=False).agg(
            part_amt=("amount", "sum")
        )
        return pa.Table.from_pandas(p, preserve_index=False)

    agg = (
        _read(
            sf_dir,
            "lineitem",
            [
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["s_nat", "l_year"])
        .aggregate(Sum("part_amt", alias_name="profit_cents"))
        .to_pandas()
    )
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    agg["n_name"] = agg["s_nat"].map(names)
    agg["profit_cents"] = agg["profit_cents"].astype(np.int64)
    agg["l_year"] = agg["l_year"].astype(np.int64)
    return (
        agg[["n_name", "l_year", "profit_cents"]]
        .sort_values(["n_name", "l_year"])
        .reset_index(drop=True)
    )


SQL_Q9_PRODUCT_PROFIT = f"""
SELECT n.n_name,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                 - {_Q9_COST_FRAC} * p.p_retailprice * l.l_quantity) * 100)
                AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%{_Q9_NAME_SUBSTR}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q10: returned-item revenue, top 20 customers


_Q10_LO = _us("1996-01-01")
_Q10_HI = _us("1996-07-01")
_Q10_K = 20


def q_q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q10 shape: top-20 customers by revenue on RETURNED line items
    for orders placed in 1996H1. One orderkey-partitioned join of
    return-filtered lineitem partials against date-filtered orders, a
    custkey groupby, a distributed top-k cut (revenue is integer cents so
    the rank is exact), and customer attributes attached to the 20
    SURVIVORS only — the customer fact is never shuffled."""

    def orders_filter(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(od, _Q10_LO), pc.less(od, _Q10_HI))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_filter, batch_format="pyarrow"
    )

    def li_partials(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        cents = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "cents": cents,
            }
        )
        p = df.groupby("l_orderkey", as_index=False).agg(part_c=("cents", "sum"))
        return pa.Table.from_pandas(p, preserve_index=False)

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(li_partials, batch_format="pyarrow")

    agg = (
        li.join(
            orders,
            "inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .groupby("o_custkey")
        .aggregate(Sum("part_c", alias_name="rev_cents"))
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["rev_cents", "o_custkey"], ascending=[False, True], kind="stable"
        ).head(_Q10_K)

    cand = agg.map_batches(topk, batch_format="pandas").to_pandas()
    top = (
        cand.sort_values(["rev_cents", "o_custkey"], ascending=[False, True], kind="stable")
        .head(_Q10_K)
        .reset_index(drop=True)
    )
    keys = set(top["o_custkey"].astype(np.int64))
    names = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(
            lambda t: t.filter(
                pc.is_in(
                    pc.cast(t["c_custkey"], pa.int64()),
                    value_set=pa.array(sorted(keys), pa.int64()),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey")
    out["rev_cents"] = out["rev_cents"].astype(np.int64)
    return (
        out[["c_custkey", "c_name", "rev_cents"]]
        .sort_values(["rev_cents", "c_custkey"], ascending=[False, True], kind="stable")
        .reset_index(drop=True)
    )


SQL_Q10_RETURNED_REVENUE = f"""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS rev_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY 1, 2 ORDER BY rev_cents DESC, c_custkey LIMIT {_Q10_K}
"""


# ---------------------------------------------------------------------------
# Q11 (adapted): parts concentrating more than a fraction of total value


def q_part_value_concentration(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q11 shape (adapted to lineitem — no partsupp table): parts
    whose total extended-price value exceeds 1.5× the MEAN per-part value
    (a scale-invariant threshold — a fixed fraction of the global total
    empties out as the part count grows). The per-part groupby materializes
    once; its row count and the global cents total are two tiny scalar
    folds; the cut compares 2·value·n_parts > 3·total in exact int64, so
    no float boundary exists."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "l_partkey": t["l_partkey"],
                "cents": pa.array(
                    _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)),
                    pa.int64(),
                ),
            }
        )

    agg = (
        li.map_batches(to_cents, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("cents", alias_name="value_cents"))
        .materialize()
    )
    total = int(agg.sum("value_cents"))
    n_parts = int(agg.count())

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        keep = 2 * df["value_cents"].to_numpy(np.int64) * n_parts > 3 * total
        return df[keep]

    out = agg.map_batches(cut, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("l_partkey", "value_cents")}
        )
    out["value_cents"] = out["value_cents"].astype(np.int64)
    out["l_partkey"] = out["l_partkey"].astype(np.int64)
    return (
        out.sort_values(["value_cents", "l_partkey"], ascending=[False, True], kind="stable")
        .reset_index(drop=True)
    )


SQL_PART_VALUE_CONCENTRATION = """
WITH v AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_parts FROM v)
SELECT l_partkey, value_cents FROM v, t
WHERE 2 * value_cents * n_parts > 3 * total
ORDER BY value_cents DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Q12 (adapted): order-priority class counts per line status


_Q12_LO = _us("1996-01-01")
_Q12_HI = _us("1997-01-01")
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_q12_priority_class(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q12 shape (adapted: no l_shipmode column — grouped by
    l_linestatus): per line status, how many 1996-shipped line items belong
    to high-priority orders vs the rest. Lineitem pre-aggregates per
    (orderkey, linestatus) COUNT partials before the shuffle; the CASE
    split happens post-join in-batch; the final groupby folds 2 keys."""

    def li_partials(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= _Q12_LO) & (sd < _Q12_HI)
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "l_linestatus": np.asarray(t["l_linestatus"].to_pylist(), object)[keep],
            }
        )
        p = df.groupby(["l_orderkey", "l_linestatus"], as_index=False).size()
        return pa.Table.from_pandas(
            p.rename(columns={"size": "n_lines"}), preserve_index=False
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"]).map_batches(
        li_partials, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def split(t: pa.Table) -> pa.Table:
        hi = pc.is_in(
            t["o_orderpriority"], value_set=pa.array(list(_Q12_HIGH))
        ).to_numpy(zero_copy_only=False)
        n = t["n_lines"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "l_linestatus": t["l_linestatus"],
                "high_line_count": pa.array(np.where(hi, n, 0), pa.int64()),
                "low_line_count": pa.array(np.where(hi, 0, n), pa.int64()),
            }
        )

    out = (
        li.join(
            orders,
            "inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .map_batches(split, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
        .to_pandas()
    )
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("l_linestatus").reset_index(drop=True)


SQL_Q12_PRIORITY_CLASS = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q14: promotion-revenue share for one ship month


_Q14_LO = _us("1996-09-01")
_Q14_HI = _us("1996-10-01")


def q_q14_promo_effect(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q14 shape: one-row ratio of conditional sums — the share of
    September-1996 revenue on PROMO-type parts. Part type is a broadcast
    key array; both legs are exact integer cents folded by a Sum over
    per-batch partials, so the single decided float is one division of two
    int64s — identical IEEE result on both engines."""
    part = _small(sf_dir, "part", ["p_partkey", "p_type"])
    promo = ray.put(
        part.loc[part["p_type"] == "PROMO", "p_partkey"].to_numpy(np.int64)
    )

    def partials(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= _Q14_LO) & (sd < _Q14_HI)
        cents = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        )
        isp = np.isin(t["l_partkey"].to_numpy(zero_copy_only=False)[keep], ray.get(promo))
        return pa.Table.from_pydict(
            {
                "promo_cents": pa.array([int(cents[isp].sum())], pa.int64()),
                "tot_cents": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partials, batch_format="pyarrow")
        .sum(["promo_cents", "tot_cents"])
    )
    pcents, tcents = int(agg["sum(promo_cents)"]), int(agg["sum(tot_cents)"])
    return pd.DataFrame(
        {
            "promo_cents": pd.Series([pcents], dtype="int64"),
            "tot_cents": pd.Series([tcents], dtype="int64"),
            "promo_share": [round(100.0 * pcents / tcents, 6)],
        }
    )


SQL_Q14_PROMO_EFFECT = """
SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS tot_cents,
       round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) ELSE 0 END) AS BIGINT)
             / CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT), 6) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01'
"""


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue — argmax with ties


_Q15_LO = _us("1996-01-01")
_Q15_HI = _us("1996-04-01")


def q_q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q15 shape: the supplier(s) achieving MAX total revenue in
    1996Q1 — argmax-with-ties over a group sum. Revenue is exact integer
    cents end-to-end, so 'equals the max' is an integer comparison that
    cannot flip across engines (the float-argmax trap). Per-suppkey sums
    fold partials; the max is a scalar second pass over the same tiny
    aggregate; names attach to survivors only."""

    def partials(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= _Q15_LO) & (sd < _Q15_HI)
        cents = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        )
        df = pd.DataFrame(
            {"l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False)[keep], "cents": cents}
        )
        p = df.groupby("l_suppkey", as_index=False).agg(part_c=("cents", "sum"))
        return pa.Table.from_pandas(p, preserve_index=False)

    agg = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("part_c", alias_name="total_rev_cents"))
        .materialize()
    )
    best = int(agg.max("total_rev_cents"))
    out = (
        agg.filter(lambda r: r["total_rev_cents"] == best)
        .to_pandas()
    )
    supp = _small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = out.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["total_rev_cents"] = out["total_rev_cents"].astype(np.int64)
    return (
        out[["s_suppkey", "s_name", "total_rev_cents"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


SQL_Q15_TOP_SUPPLIER = """
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_rev_cents
FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev_cents = (SELECT max(total_rev_cents) FROM r)
ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 (adapted): distinct-supplier counts per (brand, size)


_Q16_EXCL_BRAND = "Brand#1"
_Q16_MIN_BAL = 1000.0


def q_supplier_part_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q16 shape (adapted: supplier relationships observed from
    lineitem, no partsupp; the 'customer complaints' exclusion becomes
    s_acctbal < 1000): COUNT(DISTINCT supplier) per (p_brand, p_size),
    excluding one brand. The distinct runs IN-BUCKET: triples bucket by
    hash of their GROUP key (brand, size), so a group's triples are whole
    within one bucket and per-batch-distinct partials + one NB-key
    groupby/map_groups finish it — no high-cardinality groupby (the
    1 ms/key trap), no driver-side pair set."""
    part = _small(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    part = part[part["p_brand"] != _Q16_EXCL_BRAND]
    supp = _small(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    bad = supp.loc[supp["s_acctbal"] < _Q16_MIN_BAL, "s_suppkey"].to_numpy(np.int64)
    bc = ray.put(
        {
            "brand": pd.Series(
                part["p_brand"].to_numpy(object), index=part["p_partkey"].to_numpy(np.int64)
            ),
            "size": pd.Series(
                part["p_size"].to_numpy(np.int64), index=part["p_partkey"].to_numpy(np.int64)
            ),
            "bad": bad,
        }
    )

    def triples(t: pa.Table) -> pa.Table:
        d = ray.get(bc)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        brand = d["brand"].reindex(pk)
        keep = brand.notna().to_numpy() & ~np.isin(sk, d["bad"])
        df = pd.DataFrame(
            {
                "p_brand": brand.to_numpy(object)[keep],
                "p_size": d["size"].reindex(pk).to_numpy(np.float64)[keep].astype(np.int64),
                "s_suppkey": sk[keep],
            }
        ).drop_duplicates()
        key = pd.util.hash_pandas_object(
            df["p_brand"].astype(str) + "|" + df["p_size"].astype(str), index=False
        ).to_numpy(np.uint64)
        df["bucket"] = (key % NB).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["p_brand", "p_size", "s_suppkey"])
        out = u.groupby(["p_brand", "p_size"], as_index=False).agg(
            supplier_cnt=("s_suppkey", "size")
        )
        out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
        return out

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(triples, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_distinct, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.sort_values(
            ["supplier_cnt", "p_brand", "p_size"], ascending=[False, True, True], kind="stable"
        ).reset_index(drop=True)
    )


SQL_SUPPLIER_PART_COUNTS = f"""
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < {_Q16_MIN_BAL})
GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate revenue


_Q19_ARMS = (
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#15", 1, 10, 10.0, 20.0),
    ("Brand#21", 1, 15, 20.0, 30.0),
)


def q_q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q19 shape: revenue under an OR of three (brand, size-range,
    quantity-range) conjunctions — the disjunctive-predicate-pushdown
    class. Part attributes broadcast once; each batch evaluates the whole
    disjunction vectorized and emits a single partial integer-cents row."""
    part = _small(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    bc = ray.put(
        {
            "brand": pd.Series(
                part["p_brand"].to_numpy(object), index=part["p_partkey"].to_numpy(np.int64)
            ),
            "size": pd.Series(
                part["p_size"].to_numpy(np.int64), index=part["p_partkey"].to_numpy(np.int64)
            ),
        }
    )

    def partials(t: pa.Table) -> pa.Table:
        d = ray.get(bc)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        brand = d["brand"].reindex(pk).to_numpy(object)
        size = d["size"].reindex(pk).to_numpy(np.float64)
        keep = np.zeros(len(pk), bool)
        for b, slo, shi, qlo, qhi in _Q19_ARMS:
            keep |= (
                (brand == b)
                & (size >= slo)
                & (size <= shi)
                & (qty >= qlo)
                & (qty <= qhi)
            )
        cents = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        )
        return pa.Table.from_pydict(
            {"rev_cents": pa.array([int(cents.sum())], pa.int64())}
        )

    total = int(
        _read(
            sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
        )
        .map_batches(partials, batch_format="pyarrow")
        .sum("rev_cents")
    )
    return pd.DataFrame({"rev_cents": pd.Series([total], dtype="int64")})


def _q19_sql() -> str:
    arms = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
        f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _Q19_ARMS
    )
    return f"""
SELECT CAST(coalesce(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
            * 100) AS BIGINT)), 0) AS BIGINT) AS rev_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {arms}
"""


SQL_Q19_DISJUNCTIVE_REVENUE = _q19_sql()


# ---------------------------------------------------------------------------
# Q20 (adapted): suppliers shipping the majority of a part's volume


_Q20_PREFIX = "blue "
_Q20_LO = _us("1996-01-01")
_Q20_HI = _us("1997-01-01")


def q_supplier_part_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q20 shape (adapted: shipped quantity from lineitem, no
    partsupp availability): (part, supplier) pairs where one supplier
    shipped MORE THAN HALF of a 'blue '-prefixed part's total 1996 volume.
    Both the per-(part, supplier) sum and the per-part total are computed
    IN-BUCKET (rows bucket by partkey hash, so a part's rows are whole
    within one bucket) — no second shuffle, no per-part groupby. Quantity
    is integer-cast, so 2·qty_supp > qty_part is exact."""
    part = _small(sf_dir, "part", ["p_partkey", "p_name"])
    hit = ray.put(
        part.loc[part["p_name"].str.startswith(_Q20_PREFIX), "p_partkey"].to_numpy(
            np.int64
        )
    )

    def partials(t: pa.Table) -> pa.Table:
        sd = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        keep = (sd >= _Q20_LO) & (sd < _Q20_HI) & np.isin(pk, ray.get(hit))
        df = pd.DataFrame(
            {
                "p_partkey": pk[keep],
                "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False)[keep],
                "qty": t["l_quantity"].to_numpy(zero_copy_only=False)[keep].astype(np.int64),
            }
        )
        p = df.groupby(["p_partkey", "s_suppkey"], as_index=False).agg(
            part_qty=("qty", "sum")
        )
        p["bucket"] = (
            pd.util.hash_pandas_object(p["p_partkey"], index=False).to_numpy(np.uint64)
            % NB
        ).astype(np.int64)
        return pa.Table.from_pandas(p, preserve_index=False)

    def majority(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["p_partkey", "s_suppkey"], as_index=False).agg(
            qty_supp=("part_qty", "sum")
        )
        tot = ps.groupby("p_partkey", as_index=False).agg(qty_part=("qty_supp", "sum"))
        m = ps.merge(tot, on="p_partkey")
        m = m[2 * m["qty_supp"] > m["qty_part"]]
        for c in ("p_partkey", "s_suppkey", "qty_supp", "qty_part"):
            m[c] = m[c].astype(np.int64)
        return m[["p_partkey", "s_suppkey", "qty_supp", "qty_part"]]

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(majority, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["p_partkey", "s_suppkey"]).reset_index(drop=True)


SQL_SUPPLIER_PART_SHARE = f"""
WITH ps AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey AS s_suppkey,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_supp
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '{_Q20_PREFIX}%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1, 2),
t AS (SELECT p_partkey, CAST(sum(qty_supp) AS BIGINT) AS qty_part
      FROM ps GROUP BY 1)
SELECT ps.p_partkey, ps.s_suppkey, ps.qty_supp, t.qty_part
FROM ps JOIN t ON ps.p_partkey = t.p_partkey
WHERE 2 * ps.qty_supp > t.qty_part
ORDER BY ps.p_partkey, ps.s_suppkey
"""


# ---------------------------------------------------------------------------
# Q22 (adapted): rich customers with no recent orders, per nation


_Q22_CUT = _us("2001-01-01")


def q_missed_opportunities(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q22 shape (adapted: nationkey instead of phone country code):
    per nation, count + total balance of customers whose account balance
    exceeds the average POSITIVE balance and who placed no orders on/after
    2001-01-01. The global-average filter is decided by integer
    cross-multiplication (bal_cents · n_pos > sum_pos_cents — no float
    division anywhere); the no-orders side is a hash-partitioned
    ``Dataset.join(left_anti)`` against per-batch-distinct custkey
    partials, never a driver key set."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partials(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"].to_numpy(zero_copy_only=False))
        pos = cents > 0
        return pa.Table.from_pydict(
            {
                "s": pa.array([int(cents[pos].sum())], pa.int64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    tot = cust.map_batches(bal_partials, batch_format="pyarrow").sum(["s", "n"])
    pos_sum, pos_n = int(tot["sum(s)"]), int(tot["sum(n)"])

    recent = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "o_custkey": pc.unique(
                        t.filter(
                            pc.greater_equal(
                                pc.cast(t["o_orderdate"], pa.int64()), _Q22_CUT
                            )
                        )["o_custkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
    )

    def rich(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"].to_numpy(zero_copy_only=False))
        keep = cents * pos_n > pos_sum
        return pa.Table.from_pydict(
            {
                "c_custkey": t["c_custkey"].filter(pa.array(keep)),
                "c_nationkey": t["c_nationkey"].filter(pa.array(keep)),
                "bal_cents": pa.array(cents[keep], pa.int64()),
            }
        )

    out = (
        cust.map_batches(rich, batch_format="pyarrow")
        .join(
            recent,
            "left_anti",
            num_partitions=8,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
        .groupby("c_nationkey")
        .aggregate(
            Count(alias_name="numcust"),
            Sum("bal_cents", alias_name="totbal_cents"),
        )
        .to_pandas()
    )
    if len(out) == 0:  # all-dropped epilogue guard (schema-less frame)
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("c_nationkey", "numcust", "totbal_cents")}
        )
    out["c_nationkey"] = out["c_nationkey"].astype(np.int64)
    out["numcust"] = out["numcust"].astype(np.int64)
    out["totbal_cents"] = out["totbal_cents"].astype(np.int64)
    return out.sort_values("c_nationkey").reset_index(drop=True)


SQL_MISSED_OPPORTUNITIES = """
WITH b AS (SELECT CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                    AS pos_sum,
                  CAST(count(*) AS BIGINT) AS pos_n
           FROM customer WHERE floor(c_acctbal * 100) > 0)
SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totbal_cents
FROM customer c, b
WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT) * b.pos_n > b.pos_sum
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# exact distributed median via iterative histogram refinement (selection)


_MEDIAN_BINS = 4096


def cents_span(cents: "rd.Dataset") -> tuple[int, int, int]:
    """(count, min, max) of an int64 ``cents`` column — one constant-size
    fold (each batch emits ONE scalar row)."""

    def span(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        if len(c) == 0:
            return pa.Table.from_pydict(
                {"n": pa.array([], pa.int64()), "lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(c)], pa.int64()),
                "lo": pa.array([int(c.min())], pa.int64()),
                "hi": pa.array([int(c.max())], pa.int64()),
            }
        )

    s = cents.map_batches(span, batch_format="pyarrow").to_pandas()
    if len(s) == 0:
        return 0, 0, 0
    return int(s["n"].sum()), int(s["lo"].min()), int(s["hi"].max())


def exact_kth(cents: "rd.Dataset", k: int, lo: int, hi: int) -> int:
    """EXACT k-th smallest (1-based) of an int64 ``cents`` column over an
    UNBOUNDED value domain — the distributed selection algorithm (iterative
    histogram refinement), not a value-count fold (those require a bounded
    distinct-value domain, cf. `doc_length_quantiles`). Each refinement
    round histograms the candidate interval into 4096 bins — every batch
    emits ONE row whose counts ride as a packed int64 blob, so the fold is
    #batches rows and there is NO per-bin groupby (4096 keys × 1 ms = the
    known groupby trap) — and the k-th element's bin becomes the next
    interval. ceil(log2(range)/12) rounds ≈ 2-4 executions total at any
    scale; the final interval (width ≤ 4096) finishes with one exact
    in-interval value-count pass. The caller passes a MATERIALIZED dataset
    (each round re-scans it from the object store)."""
    while hi - lo + 1 > _MEDIAN_BINS:
        edges = np.linspace(lo, hi + 1, _MEDIAN_BINS + 1).astype(np.int64)

        def hist(t: pa.Table, edges=edges, lo=lo, hi=hi) -> pa.Table:
            c = t["cents"].to_numpy(zero_copy_only=False)
            c = c[(c >= lo) & (c <= hi)]
            counts, _ = np.histogram(c, bins=edges)
            return pa.Table.from_pydict(
                {"blob": pa.array([counts.astype(np.int64).tobytes()], pa.binary())}
            )

        parts = cents.map_batches(hist, batch_format="pyarrow").to_pandas()
        total = np.zeros(_MEDIAN_BINS, np.int64)
        for b in parts["blob"]:
            total += np.frombuffer(b, np.int64)
        cum = np.cumsum(total)
        b = int(np.searchsorted(cum, k))
        k -= int(cum[b - 1]) if b > 0 else 0
        lo, hi = int(edges[b]), int(edges[b + 1]) - 1

    def vc(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        c = c[(c >= lo) & (c <= hi)]
        u, cnt = np.unique(c, return_counts=True)
        return pa.Table.from_pydict(
            {"val": pa.array(u, pa.int64()), "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    vals = cents.map_batches(vc, batch_format="pyarrow").to_pandas()
    vals = vals.groupby("val")["c"].sum().sort_index()
    cum = vals.cumsum()
    return int(cum.index[int(np.searchsorted(cum.to_numpy(), k))])


def _orders_cents(sf_dir: str) -> "rd.Dataset":
    base = _read(sf_dir, "orders", ["o_totalprice"])

    def cents_col(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"cents": pa.array(_cents(t["o_totalprice"].to_numpy(zero_copy_only=False)), pa.int64())}
        )

    return base.map_batches(cents_col, batch_format="pyarrow").materialize()


def q_orders_exact_median(sf_dir: str) -> pd.DataFrame:
    """EXACT median order price via `exact_kth` (selection by iterative
    histogram refinement). Prices are integer cents (floor·100, the
    cross-engine quantization), so 'the k-th smallest' is engine-exact;
    k = ceil(n/2) matches DuckDB ``quantile_disc(0.5)``."""
    cents = _orders_cents(sf_dir)
    n, lo, hi = cents_span(cents)
    median = exact_kth(cents, (n + 1) // 2, lo, hi)
    return pd.DataFrame(
        {"n": pd.Series([n], dtype="int64"), "median_cents": pd.Series([median], dtype="int64")}
    )


SQL_ORDERS_EXACT_MEDIAN = """
SELECT CAST(count(*) AS BIGINT) AS n,
       quantile_disc(CAST(floor(o_totalprice * 100) AS BIGINT), 0.5)
         AS median_cents
FROM orders
"""


# ---------------------------------------------------------------------------
# winsorized mean: robust aggregation after exact-percentile clamping


def q_orders_winsorized_mean(sf_dir: str) -> pd.DataFrame:
    """Winsorized (5%/95%-clamped) mean order price — robust aggregation
    over heavy-tailed values. The p05/p95 cut points are EXACT order
    statistics from two `exact_kth` selections (rank = ceil(q·n), pinned to
    DuckDB's ``quantile_disc`` convention — verified on discriminating
    n/q cases); the clamp + sum is then one vectorized integer fold. All
    decided quantities are int64 cents; the mean is the single float
    division both engines perform identically. Scale shape: 2 selection
    passes (2-4 executions each, constant-size partials) + 1 fold — no
    sort, no shuffle."""
    cents = _orders_cents(sf_dir)
    n, lo, hi = cents_span(cents)
    k05 = max(1, -(-n // 20))          # ceil(0.05·n) without float
    k95 = max(1, -(-(19 * n) // 20))   # ceil(0.95·n)
    p05 = exact_kth(cents, k05, lo, hi)
    p95 = exact_kth(cents, k95, lo, hi)

    def clamp_sum(t: pa.Table, p05=p05, p95=p95) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        s = int(np.clip(c, p05, p95).sum())
        return pa.Table.from_pydict({"s": pa.array([s], pa.int64())})

    tot = int(cents.map_batches(clamp_sum, batch_format="pyarrow").to_pandas()["s"].sum())
    return pd.DataFrame(
        {
            "n": pd.Series([n], dtype="int64"),
            "p05_cents": pd.Series([p05], dtype="int64"),
            "p95_cents": pd.Series([p95], dtype="int64"),
            "winsorized_sum_cents": pd.Series([tot], dtype="int64"),
            "winsorized_mean_cents": pd.Series([tot / n], dtype="float64"),
        }
    )


SQL_ORDERS_WINSORIZED_MEAN = """
WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
q AS (SELECT quantile_disc(cents, 0.05) AS p05,
             quantile_disc(cents, 0.95) AS p95 FROM c)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(q.p05 AS BIGINT) AS p05_cents,
       CAST(q.p95 AS BIGINT) AS p95_cents,
       CAST(sum(LEAST(GREATEST(c.cents, q.p05), q.p95)) AS BIGINT)
         AS winsorized_sum_cents,
       CAST(sum(LEAST(GREATEST(c.cents, q.p05), q.p95)) AS BIGINT)
         / count(*) AS winsorized_mean_cents
FROM c, q GROUP BY q.p05, q.p95
"""


# ---------------------------------------------------------------------------
# grouped exact median: simultaneous per-group selection refinement


def q_orders_median_by_priority(sf_dir: str) -> pd.DataFrame:
    """EXACT median order price PER PRIORITY CLASS — the selection
    machinery (`exact_kth`'s iterative histogram refinement) generalized to
    G simultaneous groups in the SAME executions: every refinement pass
    histograms each still-active group's candidate interval (one packed
    int64 blob row per (batch, group) — #batches·G partial rows, no
    per-value groupby), and each group's k-th bin narrows independently
    until its interval fits one exact value-count pass. G is the grouping
    key's cardinality (bounded, 5 here); the refinement does NOT multiply
    executions — all groups ride the same pass, so the cost is
    max-rounds-over-groups, not sum. Rank = ceil(n_g/2), pinned to DuckDB
    ``quantile_disc(0.5)``."""
    base = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "grp": t["o_orderpriority"],
                "cents": pa.array(
                    _cents(t["o_totalprice"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
            }
        )

    ds = base.map_batches(prep, batch_format="pyarrow").materialize()

    def span(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("grp")["cents"].agg(["count", "min", "max"]).reset_index()
        return g.rename(columns={"count": "n", "min": "lo", "max": "hi"})

    s = (
        ds.map_batches(span, batch_format="pandas")
        .to_pandas()
        .groupby("grp")
        .agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    )
    state = {
        str(grp): [int(r.n), (int(r.n) + 1) // 2, int(r.lo), int(r.hi)]
        for grp, r in s.iterrows()
    }  # grp -> [n, k, lo, hi]

    while True:
        active = {g: v for g, v in state.items() if v[3] - v[2] + 1 > _MEDIAN_BINS}
        if not active:
            break
        bounds = {g: (v[2], v[3]) for g, v in active.items()}

        def hist(df: pd.DataFrame, bounds=bounds) -> pd.DataFrame:
            grps, blobs = [], []
            for g, sub in df.groupby("grp"):
                b = bounds.get(str(g))
                if b is None:
                    continue
                lo, hi = b
                c = sub["cents"].to_numpy()
                c = c[(c >= lo) & (c <= hi)]
                edges = np.linspace(lo, hi + 1, _MEDIAN_BINS + 1).astype(np.int64)
                counts, _ = np.histogram(c, bins=edges)
                grps.append(str(g))
                blobs.append(counts.astype(np.int64).tobytes())
            return pd.DataFrame({"grp": grps, "blob": blobs})

        parts = ds.map_batches(hist, batch_format="pandas").to_pandas()
        for g in active:
            total = np.zeros(_MEDIAN_BINS, np.int64)
            for blob in parts.loc[parts["grp"] == g, "blob"]:
                total += np.frombuffer(blob, np.int64)
            cum = np.cumsum(total)
            n, k, lo, hi = state[g]
            edges = np.linspace(lo, hi + 1, _MEDIAN_BINS + 1).astype(np.int64)
            b = int(np.searchsorted(cum, k))
            k -= int(cum[b - 1]) if b > 0 else 0
            state[g] = [n, k, int(edges[b]), int(edges[b + 1]) - 1]

    bounds = {g: (v[2], v[3]) for g, v in state.items()}

    def vc(df: pd.DataFrame, bounds=bounds) -> pd.DataFrame:
        grps, vals, cnts = [], [], []
        for g, sub in df.groupby("grp"):
            lo, hi = bounds[str(g)]
            c = sub["cents"].to_numpy()
            c = c[(c >= lo) & (c <= hi)]
            u, cnt = np.unique(c, return_counts=True)
            grps.extend([str(g)] * len(u))
            vals.extend(int(x) for x in u)
            cnts.extend(int(x) for x in cnt)
        return pd.DataFrame({"grp": grps, "val": vals, "c": cnts})

    vals = (
        ds.map_batches(vc, batch_format="pandas")
        .to_pandas()
        .groupby(["grp", "val"])["c"]
        .sum()
        .reset_index()
    )
    out_rows = []
    for g, (n, k, lo, hi) in sorted(state.items()):
        sub = vals[vals["grp"] == g].sort_values("val")
        cum = sub["c"].cumsum().to_numpy()
        med = int(sub["val"].to_numpy()[int(np.searchsorted(cum, k))])
        out_rows.append((g, n, med))
    return pd.DataFrame(out_rows, columns=["o_orderpriority", "n", "median_cents"]).astype(
        {"n": "int64", "median_cents": "int64"}
    )


SQL_ORDERS_MEDIAN_BY_PRIORITY = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       quantile_disc(CAST(floor(o_totalprice * 100) AS BIGINT), 0.5)
         AS median_cents
FROM orders GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Gini coefficient: exact inequality statistic on the prefix-sum scan


def q_orders_gini(sf_dir: str, batch_size: int = 65536) -> pd.DataFrame:
    """EXACT Gini coefficient of order prices —
    G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over the globally sorted values.
    One sort by cents; each batch emits ONE partial row (count, sum, and
    its LOCAL rank-weighted sum Σ j·xⱼ, j = in-batch 1-based rank — bounded
    by batch_size·max_cents·batch_size, inside int64); the driver folds
    with PYTHON ints (the global Σ i·x = Σ_b [offset_b·S_b + L_b] exceeds
    int64 at corpus scale — the overflow-safe epilogue pattern, cf.
    doc_ks_distance). Tie order cannot matter (equal x ⇒ identical
    contribution under any permutation), so the engine's batch order and
    DuckDB's row_number agree by construction. Emitted: exact integer
    numerator/denominator + the single terminal division."""
    cents = _orders_cents(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        j = np.arange(1, len(c) + 1, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "first_val": pa.array([int(c[0])], pa.int64()),
                "last_val": pa.array([int(c[-1])], pa.int64()),
                "n": pa.array([len(c)], pa.int64()),
                "s": pa.array([int(c.sum())], pa.int64()),
                "l": pa.array([int((j * c).sum())], pa.int64()),
            }
        )

    # batches are contiguous intervals of the sorted stream, so positional
    # order is recovered by (first_val, last_val): for intervals I before J,
    # max(I) ≤ min(J); identical (first, last) ⇒ both all-one-value, where
    # order cannot matter. A single-column sort key has no row tiebreaker —
    # first_val alone would misorder a [v,v] block after a [v,w] block.
    parts = (
        cents.sort("cents")
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
        .sort_values(["first_val", "last_val"], kind="stable")
        .reset_index(drop=True)
    )
    # fold in python ints (arbitrary precision): offsets are the prefix
    # row counts in value order; equal-value batches may interleave at
    # their seam, but tie permutations leave Σ i·x unchanged
    w = 0
    off = 0
    n = 0
    s = 0
    for r in parts.itertuples(index=False):
        w += off * int(r.s) + int(r.l)
        off += int(r.n)
        n += int(r.n)
        s += int(r.s)
    num = 2 * w - (n + 1) * s
    den = n * s
    # num/den exceed int64 at corpus scale (den = n·s wraps around TPC-H
    # sf1 magnitudes) — emit exact decimal STRINGS so the arbitrary-
    # precision contract survives; DuckDB mirrors with HUGEINT → VARCHAR
    return pd.DataFrame(
        {
            "n": pd.Series([n], dtype="int64"),
            "sum_cents": pd.Series([s], dtype="int64"),
            "gini_num": pd.Series([str(num)], dtype="object"),
            "gini_den": pd.Series([str(den)], dtype="object"),
            "gini": pd.Series([num / den], dtype="float64"),
        }
    )


SQL_ORDERS_GINI = """
WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c),
t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             sum(rn * cents) AS w FROM r)
SELECT n, s AS sum_cents,
       CAST(2 * w - (n + 1) * s AS VARCHAR) AS gini_num,
       CAST(CAST(n AS HUGEINT) * s AS VARCHAR) AS gini_den,
       CAST(2 * w - (n + 1) * s AS DOUBLE) / (CAST(n AS HUGEINT) * s) AS gini
FROM t
"""


# ---------------------------------------------------------------------------
# Q4: order-priority checking (decorrelated EXISTS via a mergeable per-order
# max) — adapted to this schema (no l_commitdate/l_receiptdate: "late" =
# any lineitem shipped > 60 days after the order date)

_Q4_LATE_US = 60 * 24 * 3600 * 1_000_000


def q_q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q4 shape: per order priority, how many orders have at least
    one LATE lineitem. EXISTS(any late line) ⇔ max(l_shipdate) over the
    order's lines exceeds the cutoff, so the correlated subquery
    decorrelates into a mergeable per-orderkey MAX partial folded inside
    ``map_batches`` (batch-local groupby — no corpus-cardinality key
    groupby), ONE bucketed shuffle join against orders, and a
    #priorities-key fold. Timestamps compare as exact int64 µs."""

    def li_partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship_us": pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        p = df.groupby("l_orderkey", as_index=False)["ship_us"].max()
        return pa.Table.from_pandas(p, preserve_index=False)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        li_partials, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def fold(t: pa.Table) -> pa.Table:
        # batch-local: finish the per-order max (join partials may repeat an
        # orderkey across input blocks), decide lateness, count per priority
        df = pd.DataFrame(
            {
                "k": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship_us": t["ship_us"].to_numpy(zero_copy_only=False),
                "od_us": pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
                "pri": t["o_orderpriority"].to_pylist(),
            }
        )
        g = df.groupby("k", as_index=False).agg(
            ship_us=("ship_us", "max"), od_us=("od_us", "first"), pri=("pri", "first")
        )
        late = g[g["ship_us"] > g["od_us"] + _Q4_LATE_US]
        p = late.groupby("pri", as_index=False).size()
        return pa.Table.from_pandas(
            p.rename(columns={"pri": "o_orderpriority", "size": "n"}),
            preserve_index=False,
        )

    joined = li.join(
        orders,
        "inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = (
        joined.map_batches(fold, batch_format="pyarrow")
        .to_pandas()
        .groupby("o_orderpriority", as_index=False)["n"]
        .sum()
    )
    out["order_count"] = out["n"].astype("int64")
    return (
        out[["o_orderpriority", "order_count"]]
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


SQL_Q4_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND epoch_us(l_shipdate) > epoch_us(o_orderdate) + CAST(5184000 AS BIGINT) * 1000000
)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6: forecast revenue change — one exact-integer filter+fold pass


def q_q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q6 shape: Σ extendedprice·discount over the (discount band,
    quantity cap) slice — ONE column-pruned scan, per-batch exact integer
    fold (cents × discount basis points; the single float division is
    terminal). Predicate on the quantized integers on BOTH sides, so the
    slice is decided identically."""

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bp = np.floor(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (bp >= 5) & (bp <= 7) & (qty < 24)
        return pa.Table.from_pydict(
            {
                "n": pa.array([int(keep.sum())], pa.int64()),
                "num": pa.array([int((cents[keep] * bp[keep]).sum())], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    num = int(parts["num"].sum())
    return pd.DataFrame(
        {
            "n_lines": pd.Series([n], dtype="int64"),
            "revenue_num": pd.Series([num], dtype="int64"),
            "revenue": pd.Series([round(num / 10000.0, 2)], dtype="float64"),
        }
    )


SQL_Q6_FORECAST_REVENUE = """
WITH q AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(floor(l_discount * 100) AS BIGINT) AS bp
  FROM lineitem
  WHERE CAST(floor(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
    AND l_quantity < 24)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(cents * bp), 0) AS BIGINT) AS revenue_num,
       round(CAST(coalesce(sum(cents * bp), 0) AS BIGINT) / 10000.0, 2) AS revenue
FROM q
"""
