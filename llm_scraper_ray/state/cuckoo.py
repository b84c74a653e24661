"""Cuckoo-filter URL-seen set with an exact sidecar (SURVEY.md F8, §7.4.3).

The reference keeps URL-seen state in in-memory Python sets
(``extract_product_urls.py:12,39-41``; ``util/scraper/search_scraper.py:62``)
— exact but single-process and unbounded. At 10^10-URL frontier scale the
north_rule demands a sharded approximate-membership structure; this module
provides the per-shard filter:

  - **CuckooFilter**: 4-slot buckets, 16-bit fingerprints, partial-key cuckoo
    hashing (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
    CoNEXT 2014). ~18 bits/key at 95% load, supports deletion (unused here)
    and O(1) membership with ≤2 bucket probes.
  - **exact sidecar**: a set of the exact 20-byte SHA-1 digests. The engine's
    correctness criterion is *exact* seen-set equality (a false positive
    would silently drop a URL), so the filter is the fast path and the
    sidecar the authority: only filter-hits consult it. At test scale the
    sidecar is a Python set; at 10^10 scale it becomes the per-partition
    sorted hash file on disk consulted on filter-hit only (the filter's
    ~3% false-positive rate bounds that I/O).

Keys are the 20-byte ``url_sha1`` digests; bucket index and fingerprint are
carved from independent digest bytes. All state serializes to bytes for
per-round checkpointing.
"""

from __future__ import annotations

import pickle

import numpy as np

_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0):
        nb = 1
        while nb * 4 < capacity * 1.10:
            nb *= 2
        self.num_buckets = nb
        self.table = np.zeros((nb, 4), dtype=np.uint16)
        self.count = 0
        self.seed = seed
        self._rng = np.random.RandomState(seed)

    # -- key carving -------------------------------------------------------

    def _fp_and_index(self, digest: bytes) -> tuple[int, int]:
        i1 = int.from_bytes(digest[0:8], "little") & (self.num_buckets - 1)
        fp = int.from_bytes(digest[8:10], "little") or 1
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        # standard partial-key alt index: i XOR hash(fp)
        return (i ^ (fp * 0x5BD1E995)) & (self.num_buckets - 1)

    # -- ops ---------------------------------------------------------------

    def contains(self, digest: bytes) -> bool:
        fp, i1 = self._fp_and_index(digest)
        if (self.table[i1] == fp).any():
            return True
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i2] == fp).any())

    def add(self, digest: bytes) -> bool:
        """Insert; False only when the filter is saturated (caller must then
        grow/reshard — never silently drop)."""
        fp, i1 = self._fp_and_index(digest)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop
        i = i1 if self._rng.randint(2) else i2
        for _ in range(_MAX_KICKS):
            slot = self._rng.randint(4)
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt_index(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "num_buckets": self.num_buckets,
                "table": self.table,
                "count": self.count,
                "seed": self.seed,
                "rng": self._rng.get_state(),
            }
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        st = pickle.loads(data)
        obj = cls.__new__(cls)
        obj.num_buckets = st["num_buckets"]
        obj.table = st["table"]
        obj.count = st["count"]
        obj.seed = st["seed"]
        obj._rng = np.random.RandomState()
        obj._rng.set_state(st["rng"])
        return obj


class SeenShard:
    """One shard of the URL-seen set: cuckoo fast path + exact authority.

    Lookup protocol (mirrors the at-scale design): filter-miss → definitely
    unseen (no sidecar touch); filter-hit → confirm against the exact set.
    """

    def __init__(self, capacity: int = 1 << 16, seed: int = 0):
        self.filter = CuckooFilter(capacity, seed=seed)
        self.exact: set[bytes] = set()
        self.capacity = capacity

    def contains_many(self, digests: list[bytes]) -> list[bool]:
        out = []
        for d in digests:
            if not self.filter.contains(d):
                out.append(False)  # fast path: no exact consult
            else:
                out.append(d in self.exact)
        return out

    def add_many(self, digests: list[bytes]) -> int:
        added = 0
        for d in digests:
            if d in self.exact:
                continue
            self.exact.add(d)
            if not self.filter.add(d):
                self._grow()
                self.filter.add(d)
            added += 1
        return added

    def check_and_add_many(self, digests: list[bytes]) -> list[bool]:
        """Atomic test-and-set per digest; returns prior membership."""
        out = []
        for d in digests:
            seen = self.filter.contains(d) and d in self.exact
            out.append(seen)
            if not seen:
                self.exact.add(d)
                if not self.filter.add(d):
                    self._grow()
                    self.filter.add(d)
        return out

    def _grow(self) -> None:
        self.capacity *= 2
        f = CuckooFilter(self.capacity, seed=self.filter.seed)
        for d in self.exact:
            f.add(d)
        self.filter = f

    def __len__(self) -> int:
        return len(self.exact)

    def to_bytes(self) -> bytes:
        keys = b"".join(self.exact)  # set content only; order is irrelevant
        return pickle.dumps(
            {"filter": self.filter.to_bytes(), "keys": keys, "capacity": self.capacity}
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "SeenShard":
        st = pickle.loads(data)
        obj = cls.__new__(cls)
        obj.filter = CuckooFilter.from_bytes(st["filter"])
        keys = st["keys"]
        obj.exact = {keys[i : i + 20] for i in range(0, len(keys), 20)}
        obj.capacity = st["capacity"]
        return obj
