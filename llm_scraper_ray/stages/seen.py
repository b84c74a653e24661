"""Sharded URL-seen-set actors (SURVEY.md F8, J6 — the central anti-join).

The seen set is the engine's only cross-round shared mutable state. It is
sharded by SHA-1 prefix across ``num_shards`` Ray actors, each holding one
``state.cuckoo.SeenShard`` (cuckoo filter fast path + exact sidecar
authority). Batch transforms route each digest to ``shard[digest[0] %
num_shards]`` and issue one batched call per shard, so actor traffic is
O(batches × shards), not O(urls).

Determinism contract (pipelines/spec.py): within a frontier round, all
``contains`` queries run in an execution that completes before the execution
that performs ``add``s for selected URLs begins; round-level candidates are
hash-unique, so robots-blocked ``add``s in the query execution can never
race a query for the same digest. Replayed tasks re-``add`` idempotently.
"""

from __future__ import annotations

import ray

from ..state.cuckoo import SeenShard


@ray.remote(num_cpus=0)
class SeenShardActor:
    """One shard. num_cpus=0: membership lookups are micro-work — reserving
    CPUs here would starve the map/fetch stages on small nodes (the shard
    count, not CPU reservations, bounds its parallelism)."""

    def __init__(self, capacity: int = 1 << 16, seed: int = 0):
        self.shard = SeenShard(capacity=capacity, seed=seed)

    def contains_many(self, digests: list[bytes]) -> list[bool]:
        return self.shard.contains_many(digests)

    def add_many(self, digests: list[bytes]) -> int:
        return self.shard.add_many(digests)

    def check_and_add_many(self, digests: list[bytes]) -> list[bool]:
        return self.shard.check_and_add_many(digests)

    def size(self) -> int:
        return len(self.shard)

    def clear(self) -> None:
        self.shard = SeenShard(capacity=self.shard.capacity, seed=self.shard.filter.seed)

    def snapshot(self) -> bytes:
        return self.shard.to_bytes()

    def restore(self, data: bytes) -> int:
        self.shard = SeenShard.from_bytes(data)
        return len(self.shard)


class SeenSet:
    """Driver-side facade over the shard actors."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 16):
        self.num_shards = num_shards
        self.actors = [
            SeenShardActor.remote(capacity=capacity_per_shard, seed=i)
            for i in range(num_shards)
        ]

    def route(self, digests: list[bytes]) -> dict[int, list[int]]:
        """shard index → positions in ``digests``."""
        routes: dict[int, list[int]] = {}
        for pos, d in enumerate(digests):
            routes.setdefault(d[0] % self.num_shards, []).append(pos)
        return routes

    def contains_many(self, digests: list[bytes]) -> list[bool]:
        routes = self.route(digests)
        out = [False] * len(digests)
        futures = {
            s: self.actors[s].contains_many.remote([digests[p] for p in poss])
            for s, poss in routes.items()
        }
        for s, poss in routes.items():
            for p, val in zip(poss, ray.get(futures[s])):
                out[p] = val
        return out

    def add_many(self, digests: list[bytes]) -> None:
        routes = self.route(digests)
        ray.get(
            [
                self.actors[s].add_many.remote([digests[p] for p in poss])
                for s, poss in routes.items()
            ]
        )

    def size(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))

    def clear(self) -> None:
        ray.get([a.clear.remote() for a in self.actors])

    def snapshot_to(self, directory: str) -> None:
        import os

        os.makedirs(directory, exist_ok=True)
        blobs = ray.get([a.snapshot.remote() for a in self.actors])
        for i, blob in enumerate(blobs):
            with open(os.path.join(directory, f"shard_{i:02d}.bin"), "wb") as f:
                f.write(blob)

    def restore_from(self, directory: str) -> int:
        import os

        total = 0
        futures = []
        for i, a in enumerate(self.actors):
            with open(os.path.join(directory, f"shard_{i:02d}.bin"), "rb") as f:
                futures.append(a.restore.remote(f.read()))
        for n in ray.get(futures):
            total += n
        return total

    def all_digests(self) -> set[bytes]:
        """Exact membership dump (test-scale verification only)."""
        out: set[bytes] = set()
        for blob in ray.get([a.snapshot.remote() for a in self.actors]):
            shard = SeenShard.from_bytes(blob)
            out |= shard.exact
        return out
