#!/usr/bin/env python3
"""Oracle pre-flight (SURVEY.md §5.2.1): replicate the driver's t2 gate
locally. Usage:
    python3 tools/preflight.py [sfDir] [outDir]
after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query: load our parquet (outDir/<name>/*.parquet), run the
declared oracle SQL in DuckDB against bare-named views over the same
testdata, canonicalize (columns sorted by name, rows sorted by all
columns), and diff values exactly.

Driver parity (hardened after round 4, where 6 entries passed here but
failed the driver): the driver's hash is DTYPE-SENSITIVE, so this gate
must be too.
  - int vs float dtype mismatch between our output and the oracle is a
    FAIL (round 4: DuckDB SUM(BIGINT) -> HUGEINT -> float64 vs Spark
    int64 — values equal, driver hash red).
  - a DESCRIBE probe on every declared oracle rejects HUGEINT and
    LIST/STRUCT/MAP/ARRAY columns at declare time, before any compare.
  - our own output is probed the same way: an array/struct column in an
    oracle-declared query crashes the driver's pandas sort (round 4:
    vec_quantize ERR "unhashable type: numpy.ndarray").
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB types the driver's pandas bridge mangles or crashes on.
BAD_ORACLE_TYPES = ("HUGEINT",)
NESTED_MARKERS = ("[]", "STRUCT", "MAP(", "LIST", "ARRAY")


def dtype_kind(dtype) -> str:
    """Coarse dtype class for driver-parity comparison. int vs float is
    exactly the distinction the driver's hash is sensitive to; widths
    within a class (int32 vs int64) survive its pandas round-trip."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


def probe_types(con, sql: str) -> dict:
    """name -> DuckDB type string for a query, without running it."""
    return {r[0]: str(r[1]).upper()
            for r in con.sql(f"DESCRIBE {sql}").fetchall()}


def type_hazards(types: dict, side: str) -> list:
    out = []
    for col, t in types.items():
        if any(m in t for m in NESTED_MARKERS):
            out.append(f"{side} column {col} has nested type {t} "
                       "(driver pandas sort crashes: unhashable ndarray)")
        if side == "oracle" and any(b in t for b in BAD_ORACLE_TYPES):
            out.append(f"oracle column {col} is {t} "
                       "(pandas converts to float64; Spark int64 -> "
                       "driver hash mismatch). CAST(... AS BIGINT).")
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns. NO dtype
    normalization — kind mismatches are caught before this runs, and
    within-kind widths are widened only for the value diff."""
    df = df.reindex(sorted(df.columns), axis=1)
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


def selftest() -> int:
    """Prove the hazard probes catch the round-4 failure classes:
    `python3 tools/preflight.py --selftest` must print two RED lines and
    exit 0 only if both classes are flagged."""
    con = duckdb.connect()
    hugeint = type_hazards(
        probe_types(con, "SELECT SUM(CAST(1 AS BIGINT)) AS n"), "oracle")
    nested = type_hazards(
        probe_types(con, "SELECT [1, 2, 3] AS q"), "spark")
    for h in hugeint + nested:
        print(f"RED (expected): {h}")
    ok = bool(hugeint) and bool(nested)
    print("selftest:", "PASS" if ok else "FAIL — a hazard class is NOT caught")
    return 0 if ok else 1


def main() -> int:
    if "--selftest" in sys.argv:
        return selftest()
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
        # static type probes BEFORE any value compare: reject the
        # round-4 failure class at declare time
        try:
            ref_types = probe_types(con, sql)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails.append(name)
            continue
        ours_sql = f"SELECT * FROM read_parquet({files!r})"
        ours_types = probe_types(con, ours_sql)
        hazards = (type_hazards(ref_types, "oracle")
                   + type_hazards(ours_types, "spark"))
        if hazards:
            for h in hazards:
                print(f"FAIL {name}: {h}")
            fails.append(name)
            continue
        ref = canon(con.sql(sql).df())
        ours = canon(con.sql(ours_sql).df())
        if list(ours.columns) != list(ref.columns):
            print(f"FAIL {name}: schema ours={list(ours.columns)} "
                  f"ref={list(ref.columns)}")
            fails.append(name)
            continue
        # dtype-exact gate (driver parity): int vs float is a hash
        # mismatch on the driver even when every value is equal
        kind_diff = [
            (c, dtype_kind(ours[c].dtype), dtype_kind(ref[c].dtype))
            for c in ours.columns
            if dtype_kind(ours[c].dtype) != dtype_kind(ref[c].dtype)]
        if kind_diff:
            for c, ok, rk in kind_diff:
                print(f"FAIL {name}: dtype col={c} ours={ok} ref={rk} "
                      "(driver hash is dtype-sensitive)")
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
