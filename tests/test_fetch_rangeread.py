"""FetchExtract range reads: row-group pruning + bounded cache."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from llm_scraper_ray.stages.fetch import FetchExtract


def _make_bucket(tmp_path, bucket: int, n: int = 2000, rg: int = 256):
    rows = sorted(
        (hashlib.sha1(f"u{i}".encode()).digest(), f"<html>{i}</html>".encode())
        for i in range(n)
    )
    d = tmp_path / "pages" / f"bucket={bucket:02d}"
    os.makedirs(d, exist_ok=True)
    t = pa.Table.from_pydict(
        {
            "url_hash": pa.array([r[0] for r in rows], pa.binary(20)),
            "html": [r[1] for r in rows],
        }
    )
    pq.write_table(t, str(d / "part.parquet"), row_group_size=rg)
    return rows


def test_lookup_prunes_row_groups(tmp_path):
    rows = _make_bucket(tmp_path, 3)
    fx = FetchExtract(str(tmp_path / "pages"), num_buckets=256, cache_cap=64)
    # a narrow sorted digest range → only the covering row groups load
    digs = [rows[100][0], rows[101][0], rows[150][0]]
    got = fx.lookup_bucket(3, digs)
    assert got == {d: h for d, h in rows[100:102] + rows[150:151]}
    assert len(fx.reader._rg_cache) == 1  # all three digests sit in row group 0
    # a digest outside every range is a miss without any data read
    missing = hashlib.sha1(b"nope").digest()
    got2 = fx.lookup_bucket(3, sorted([missing, rows[1999][0]]))
    assert got2[missing] is None
    assert got2[rows[1999][0]] == rows[1999][1]
    assert len(fx.reader._rg_cache) <= 3


def test_cache_cap_bounds_memory(tmp_path):
    rows = _make_bucket(tmp_path, 0, n=2000, rg=128)  # ~16 row groups
    fx = FetchExtract(str(tmp_path / "pages"), num_buckets=256, cache_cap=2)
    got = fx.lookup_bucket(0, [d for d, _ in rows])  # touch every row group
    assert all(got[d] == h for d, h in rows)
    assert len(fx.reader._rg_cache) <= 2  # LRU never exceeds the cap


def test_missing_bucket_is_all_miss(tmp_path):
    fx = FetchExtract(str(tmp_path / "pages"), num_buckets=256)
    d = hashlib.sha1(b"x").digest()
    assert fx.lookup_bucket(7, [d]) == {d: None}
