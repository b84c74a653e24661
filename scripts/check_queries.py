"""Driver-mirror check: run each queries() entry and its oracle_sql side by
side on an sf_dir, compare row count + order-insensitive values.

Usage: python scripts/check_queries.py [sf_dir] [name ...]
"""

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-strict normalization: sort columns by name, stringify object
    columns, sort rows, round floats to 6dp (r03 evidence: queries with
    sub-1e-6 float diffs were driver hash-GREEN, so the driver rounds).
    Width-only integer normalization (int32→int64) is kept, but int-vs-float
    KIND drift is a failure — both r03 driver-red rows were DuckDB
    HUGEINT→float64 kind drift the old mirror's blanket int64 cast hid."""
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    return df


def kinds(df: pd.DataFrame) -> list[str]:
    return [df[c].dtype.kind for c in df.columns]


def vhash(df: pd.DataFrame) -> str:
    """Driver-policy value hash: normalized frame → row-major string → md5.
    Makes the mirror's pass criterion literally the driver's (sort columns
    by name, round floats, hash values) rather than just frame-equality."""
    import hashlib

    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(str(v) for v in row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    # crawl oracle SQL reads the persisted expected tables for ONE sf dir
    # (the driver's compare scale by default) — point it at ours
    os.environ["LLMSR_ORACLE_SF_DIR"] = sf_dir

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # go through the driver contract module exactly as the driver does
    import __ray_entry__

    all_queries = __ray_entry__.queries
    all_oracle_sql = __ray_entry__.oracle_sql

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    queries = all_queries()
    oracles = all_oracle_sql()
    failures = 0
    results: dict = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(sf_dir)
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
            failures += 1
            continue
        secs = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: {len(got)} rows (rows-only) [{secs:.1f}s]")
            results[name] = {"ok": True, "rows": len(got), "rows_only": True}
            continue
        want = con.sql(oracles[name]).df()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            results[name] = {"ok": False, "err": "column mismatch"}
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            results[name] = {"ok": False, "err": f"rows {len(g)} != {len(w)}"}
            failures += 1
            continue
        if kinds(g) != kinds(w):
            print(f"FAIL {name}: dtype kinds {kinds(g)} != {kinds(w)} for {list(g.columns)}")
            results[name] = {"ok": False, "err": "dtype kind mismatch"}
            failures += 1
            continue
        hg, hw = vhash(g), vhash(w)
        if hg == hw:
            print(f"ok   {name}: {len(g)} rows MATCH hash={hg[:10]} [{secs:.1f}s]")
            results[name] = {"ok": True, "rows": len(g), "hash": hg}
        else:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
                msg = "hash drift but frames equal (stringify ambiguity)"
            except AssertionError as e:
                msg = f"value mismatch: {str(e)[:300]}"
            print(f"FAIL {name}: {msg}")
            results[name] = {"ok": False, "err": msg}
            failures += 1
    ray.shutdown()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n": len(results), "failures": failures, "queries": results},
                f,
                indent=1,
            )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
