"""Cuckoo filter + SeenShard properties (SURVEY.md F8, §7.4.3)."""

import hashlib

from llm_scraper_ray.state.cuckoo import CuckooFilter, SeenShard


def _digest(i: int) -> bytes:
    return hashlib.sha1(f"url-{i}".encode()).digest()


def test_no_false_negatives():
    f = CuckooFilter(capacity=5000)
    for i in range(4000):
        assert f.add(_digest(i))
    for i in range(4000):
        assert f.contains(_digest(i))


def test_false_positive_rate_bounded():
    f = CuckooFilter(capacity=5000)
    for i in range(4000):
        f.add(_digest(i))
    fp = sum(f.contains(_digest(i)) for i in range(10_000, 30_000))
    # 16-bit fingerprints, 2 buckets × 4 slots → fpr ≈ 8/2^16 ≈ 0.012%
    assert fp / 20_000 < 0.005


def test_serialization_roundtrip():
    f = CuckooFilter(capacity=1000)
    for i in range(800):
        f.add(_digest(i))
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.count == f.count
    assert all(g.contains(_digest(i)) for i in range(800))


def test_shard_exact_authority_and_grow():
    s = SeenShard(capacity=64)  # tiny → forces grow
    digests = [_digest(i) for i in range(500)]
    assert s.contains_many(digests) == [False] * 500
    s.add_many(digests)
    assert s.contains_many(digests) == [True] * 500
    assert len(s) == 500
    # filter-hit-but-not-exact cannot produce a false positive
    others = [_digest(i) for i in range(1000, 1500)]
    assert s.contains_many(others) == [False] * 500
    # check_and_add is an atomic test-and-set
    prior = s.check_and_add_many(others[:10] + digests[:5])
    assert prior == [False] * 10 + [True] * 5
    # snapshot/restore preserves membership exactly
    s2 = SeenShard.from_bytes(s.to_bytes())
    assert s2.exact == s.exact
