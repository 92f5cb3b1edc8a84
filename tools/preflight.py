#!/usr/bin/env python3
"""Oracle pre-flight (SURVEY.md §5.2.1): replicate the driver's t2 gate
locally. Usage:
    python3 tools/preflight.py [sfDir] [outDir]
after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query: load our parquet (outDir/<name>/*.parquet), run the
declared oracle SQL in DuckDB against bare-named views over the same
testdata, canonicalize (columns sorted by name, rows sorted by all
columns), and diff values exactly.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes so int32 vs int64 etc. don't create false diffs
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: determinism is the whole point
    return a == b


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass, fails = 0, []
    all_dirs = {d.rstrip("/").split("/")[-1]
                for d in glob.glob(f"{outdir}/*/")}
    no_oracle = sorted(all_dirs - set(oracle))
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output (query threw?)")
            fails.append(name)
            continue
        try:
            ref = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails.append(name)
            continue
        ours = canon(con.sql(
            f"SELECT * FROM read_parquet({files!r})").df())
        if list(ours.columns) != list(ref.columns):
            print(f"FAIL {name}: schema ours={list(ours.columns)} "
                  f"ref={list(ref.columns)}")
            fails.append(name)
            continue
        if len(ours) != len(ref):
            print(f"FAIL {name}: rows ours={len(ours)} ref={len(ref)}")
            fails.append(name)
            continue
        diff = None
        for c in ours.columns:
            ov, rv = ours[c].tolist(), ref[c].tolist()
            for i, (a, b) in enumerate(zip(ov, rv)):
                if not cells_equal(a, b):
                    diff = (c, i, a, b)
                    break
            if diff:
                break
        if diff:
            c, i, a, b = diff
            print(f"FAIL {name}: first diff col={c} row={i} "
                  f"ours={a!r} ref={b!r}")
            fails.append(name)
        else:
            n_pass += 1
            print(f"PASS {name} ({len(ours)} rows)")
    for name in no_oracle:
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if files:
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})") \
                   .fetchone()[0]
            print(f"NOORACLE {name} (rows={n}{' — EMPTY!' if n == 0 else ''})")
        else:
            print(f"NOORACLE {name}: MISSING OUTPUT")
    print(f"\n{n_pass}/{len(oracle)} oracle queries pass; "
          f"{len(no_oracle)} rows-only")
    if fails:
        print("failing:", " ".join(fails))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
