"""Row-group-pruned keyed reads over the hash-bucketed pages layout.

The pages corpus is written bucket-per-hash-prefix, sorted by ``url_hash``
inside each bucket, in small row groups (sources/pages.py). That layout is
the engine's disk-backed key-value index: any column keyed by url_hash can
be served by (1) picking the bucket from the hash prefix, (2) pruning to
the row groups whose [min,max] statistics cover the digest, (3) decoding
and LRU-caching just those row groups. Per-reader memory is bounded by
``cache_cap`` row groups — never a bucket, never the corpus.

Used by the fetch actors (``html``) and the frontier-expansion actors
(``warc_ts`` — replacing round 1's O(corpus) driver dict + ``ray.put``
broadcast of every url_hash→warc_ts pair).
"""

from __future__ import annotations

import os
from bisect import bisect_right
from collections import OrderedDict

import pyarrow.parquet as pq

from ..sources.pages import bucket_of


class BucketRangeReader:
    """Keyed lookup of one value column over the bucketed pages layout."""

    def __init__(
        self,
        pages_dir: str,
        num_buckets: int,
        value_col: str,
        cache_cap: int = 1024,
        decode=None,
    ):
        self.pages_dir = pages_dir
        self.num_buckets = num_buckets
        self.value_col = value_col
        self.decode = decode or (lambda v: v)
        self._meta: dict[int, tuple] = {}  # b → (ParquetFile|None, mins, maxs)
        self._rg_cache: "OrderedDict[tuple[int, int], dict]" = OrderedDict()
        self._cache_cap = cache_cap

    def _bucket_meta(self, b: int):
        hit = self._meta.get(b)
        if hit is not None:
            return hit
        path = os.path.join(self.pages_dir, f"bucket={b:02d}", "part.parquet")
        if not os.path.exists(path):
            self._meta[b] = (None, [], [], [])
            return self._meta[b]
        pf = pq.ParquetFile(path)
        md = pf.metadata
        if md.num_row_groups == 0 or md.num_rows == 0:
            self._meta[b] = (None, [], [], [])  # empty bucket → every key misses
            return self._meta[b]
        rg0 = md.row_group(0)
        ci = next(
            j for j in range(rg0.num_columns)
            if rg0.column(j).path_in_schema == "url_hash"
        )
        mins, maxs, rgs = [], [], []
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            if rg.num_rows == 0:
                continue
            st = rg.column(ci).statistics
            if st is None or not st.has_min_max:
                # stats absent (writer settings) — one key-column read of
                # this group recovers the range; never skip silently
                keys = pf.read_row_group(i, columns=["url_hash"])["url_hash"]
                lo = min(keys.to_pylist())
                hi = max(keys.to_pylist())
            else:
                lo, hi = st.min, st.max
            mins.append(lo)
            maxs.append(hi)
            rgs.append(i)
        self._meta[b] = (pf, mins, maxs, rgs)
        return self._meta[b]

    def _rg_table(self, b: int, pf, rg: int) -> dict:
        key = (b, rg)
        hit = self._rg_cache.get(key)
        if hit is not None:
            self._rg_cache.move_to_end(key)
            return hit
        t = pf.read_row_group(rg, columns=["url_hash", self.value_col])
        dec = self.decode
        d = {
            h.as_py(): dec(v) for h, v in zip(t["url_hash"], t[self.value_col])
        }
        if len(self._rg_cache) >= self._cache_cap:
            self._rg_cache.popitem(last=False)
        self._rg_cache[key] = d
        return d

    def lookup_bucket(self, b: int, digs: list[bytes]) -> dict:
        """digests (any order) of ONE bucket → {digest: value|None}."""
        pf, mins, maxs, rgs = self._bucket_meta(b)
        out: dict = {}
        if pf is None:
            return {d: None for d in digs}
        by_rg: dict[int, list[bytes]] = {}
        for d in digs:
            i = bisect_right(mins, d) - 1
            if i < 0 or d > maxs[i]:
                out[d] = None  # outside every row-group range → miss
                continue
            by_rg.setdefault(rgs[i], []).append(d)
        for i, ds_ in by_rg.items():
            tbl = self._rg_table(b, pf, i)
            for d in ds_:
                out[d] = tbl.get(d)
        return out

    def get_many(self, digs: list[bytes]) -> dict:
        """digests across buckets → {digest: value|None}."""
        by_bucket: dict[int, list[bytes]] = {}
        for d in digs:
            by_bucket.setdefault(bucket_of(d, self.num_buckets), []).append(d)
        out: dict = {}
        for b, ds_ in by_bucket.items():
            out.update(self.lookup_bucket(b, ds_))
        return out


class WarcIndex:
    """url_hash → warc_ts (int64 us; -1 unknown) over the pages buckets.

    The dict-free replacement for round 1's driver-resident
    ``warc_lookup``: O(cache_cap row groups) memory wherever it runs
    (driver fast path, frontier-expansion actors), disk-backed."""

    def __init__(self, pages_dir: str, num_buckets: int, cache_cap: int = 4096):
        self._reader = BucketRangeReader(
            pages_dir,
            num_buckets,
            "warc_ts",
            cache_cap=cache_cap,
            decode=lambda v: v.value,  # timestamp[us] scalar → int64 us
        )

    def ts_for_hex(self, hex_hashes) -> list[int]:
        digs = [bytes.fromhex(h) for h in hex_hashes]
        got = self._reader.get_many(digs)
        return [got[d] if got[d] is not None else -1 for d in digs]
