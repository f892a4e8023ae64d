"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf dir and compare row count + schema + order-insensitive
value hash against oracle_sql() via DuckDB.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = sorted(df.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.sha1("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(ours)} (rows-only) [{dt:.1f}s]")
            if len(ours) == 0:
                print(f"WARN {name}: zero rows")
            continue
        theirs = con.execute(oracles[name]).df()
        o_cols, t_cols = sorted(ours.columns), sorted(theirs.columns)
        status = []
        if o_cols != t_cols:
            status.append(f"schema {o_cols} != {t_cols}")
        if len(ours) != len(theirs):
            status.append(f"rows {len(ours)} != {len(theirs)}")
        if not status and value_hash(ours) != value_hash(theirs):
            status.append("value-hash mismatch")
        if status:
            print(f"FAIL {name}: {'; '.join(status)} [{dt:.1f}s]")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(ours)} hash match [{dt:.1f}s]")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main())
