"""Local replica of the driver's correctness gate: run every QUERIES entry
and its ORACLE_SQL side-by-side on an sf dir, compare row-count + schema +
order-insensitive value hash. Usage:

    PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(normalize(df), index=False).sum())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from graphsetintersection_ray.pipelines.queries import QUERIES, ORACLE_SQL

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            rdf = res.to_pandas()
        else:
            rdf = pd.DataFrame(res)
        ray_sec = time.time() - t0
        if name not in ORACLE_SQL:
            print(f"{name:24s} rows={len(rdf):7d}  (no oracle) {ray_sec:6.1f}s")
            continue
        odf = con.execute(ORACLE_SQL[name]).df()
        a, b = normalize(rdf), normalize(odf)
        ok_rows = len(a) == len(b)
        ok_schema = list(a.columns) == list(b.columns)
        ok_hash = ok_rows and ok_schema and value_hash(rdf) == value_hash(odf)
        status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name:24s} rows={len(rdf):7d}/{len(odf):7d} "
            f"schema={'Y' if ok_schema else 'N'} hash={'Y' if ok_hash else 'N'} "
            f"{status} {ray_sec:6.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            print("  ray:", a.head(3).to_dict("records"))
            print("  sql:", b.head(3).to_dict("records"))
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL QUERIES MATCH")
    ray.shutdown()


if __name__ == "__main__":
    main()
