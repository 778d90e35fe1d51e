"""Local mini-driver: run selected queries() vs oracle_sql() at a given sf
and report row/value equality the same way the real driver does."""
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else None

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entry

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(res):
    if hasattr(res, "iter_batches"):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")

qs = entry.queries()
oracles = entry.oracle_sql()
names = NAMES or [n for n in qs if n in oracles]
for name in names:
    try:
        import gc

        gc.collect()  # free prior query's shuffle pools/blocks (bench.py note)
        got = norm(to_df(qs[name](SF)))
        if name not in oracles:
            print(f"{name}: rows={len(got)} (no oracle)")
            continue
        want = norm(con.execute(oracles[name]).df())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            ok_vals = True
            for c in got.columns:
                a, b = got[c].to_numpy(), want[c].to_numpy()
                # dtype KIND must match: the driver value-hashes dtypes, so
                # int64 1 vs float64 1.0 is a red hash even though == says
                # equal (the r3+r4 knn_geo_sharded red hid here for two
                # rounds — an empty float64 frame upcast the whole concat)
                if a.dtype.kind != b.dtype.kind:
                    ok_vals = False
                    print(f"  col {c} DTYPE drift: ray={a.dtype} sql={b.dtype}")
                    continue
                if np.issubdtype(a.dtype, np.floating):
                    same = np.array_equal(a, b, equal_nan=True)
                else:
                    same = (a == b).all() if len(a) else True
                if not same:
                    ok_vals = False
                    print(f"  col {c} mismatch; first diffs:")
                    bad = np.nonzero(a != b)[0][:5] if len(a) else []
                    for i in bad:
                        print(f"    row {i}: ray={a[i]!r} sql={b[i]!r}")
        print(f"{name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
              f"vals_ok={ok_vals}")
        if not ok_cols:
            print(f"  ray cols:  {list(got.columns)}")
            print(f"  sql cols:  {list(want.columns)}")
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}")

ray.shutdown()
