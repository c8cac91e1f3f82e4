"""Driver-style side-by-side compare: Ray pipeline vs DuckDB oracle.

Usage: python scripts/compare_queries.py [sf_dir] [query ...]
Mirrors the driver's CORRECTNESS check: sorts columns by name, sorts rows,
compares row count, schema (names) and values exactly.
"""

from __future__ import annotations

import os
import sys

# runnable from any cwd: python puts scripts/ (not the repo root) on
# sys.path when invoked as `python scripts/compare_queries.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, o_df: pd.DataFrame) -> str:
    if set(ray_df.columns) != set(o_df.columns):
        return f"SCHEMA {sorted(ray_df.columns)} vs {sorted(o_df.columns)}"
    if len(ray_df) != len(o_df):
        return f"ROWS {len(ray_df)} vs {len(o_df)}"
    a, b = norm(ray_df), norm(o_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            if not (np.isclose(av, bv, rtol=0, atol=0, equal_nan=True)).all():
                bad = np.nonzero(av != bv)[0][:3]
                return f"VALUES col={c} rows={bad} {av[bad]} vs {bv[bad]}"
        else:
            if not (pd.Series(av).fillna("~") == pd.Series(bv).fillna("~")).all():
                return f"VALUES col={c}"
    return "OK"


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(__import__("os").environ.get("RAY_GRAFT_CPUS", "16")), include_dashboard=False)
    from ahrd_ray.pipelines.queriesdef import registry

    reg = registry()
    names = sys.argv[2:] or [n for n, (_, sql) in reg.items() if sql]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    failures = 0
    for n in names:
        fn, sql = reg[n]
        if sql is None:
            print(f"{n}: no_oracle", flush=True)
            continue
        try:
            ray_df = to_df(fn(sf))
            o_df = con.sql(sql).df()
            verdict = compare(n, ray_df, o_df)
        except Exception as e:  # noqa: BLE001
            verdict = f"ERROR {type(e).__name__}: {e}"
        if verdict != "OK":
            failures += 1
        print(f"{n}: {verdict}", flush=True)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
