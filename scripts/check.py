#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run each SparkEntry oracle SQL in DuckDB over the sf tables and compare
with the parquet dumped by graft.Verify (columns sorted by name, rows
sorted, exact value equality). Usage:
  python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata ships single files; Spark-written corpora (e.g. the
    # ReplicaCorpus 10x evidence run) are directories of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

fails, passes, skips = [], [], []
import time
for name in sorted(os.listdir(outdir)):
    t0 = time.time()
    # flushed progress heartbeat: the summary prints at the end, so on a
    # big corpus a slow oracle would otherwise look like a silent hang
    print(f"... {name}", file=sys.stderr, flush=True)
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    spark_df = pq.ParquetDataset(files).read().to_pandas()
    if name not in oracle:
        skips.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"rows {len(a)} vs {len(b)}"))
        continue
    # The driver hashes typed values, so an int64 column on one side vs
    # float64 on the other (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float in
    # pandas) is a hash mismatch even when values compare equal. Mirror
    # that — INCLUDING object-vs-numeric pairs: Spark parquet decimal128
    # lands in pandas as object (Python Decimal) while DuckDB 1.0's
    # fetchdf renders DECIMAL(38,0) as float64; equal values, different
    # typed hashes (this exact blind spot let four round-9 queries pass
    # locally and fail the driver). An object dtype on either side with a
    # numeric dtype on the other is a mismatch; object-vs-object is left
    # to the value comparison (strings etc.).
    def _num(k):
        return k in ("i", "u", "f")
    kind_mismatch = [
        (c, a[c].dtype, b[c].dtype) for c in a.columns
        if a[c].dtype.kind != b[c].dtype.kind
        and ({a[c].dtype.kind, b[c].dtype.kind} <= {"i", "u", "f"}
             or ("O" in {a[c].dtype.kind, b[c].dtype.kind}
                 and (_num(a[c].dtype.kind) or _num(b[c].dtype.kind))))
    ]
    if kind_mismatch:
        fails.append((name, f"dtype kind mismatch: {kind_mismatch}"))
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        passes.append((name, len(a)))
        print(f"    {name} ok in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    except AssertionError as e:
        # find first differing cell for diagnostics
        msg = str(e).split("\n")[0]
        detail = ""
        for c in a.columns:
            neq = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
            if neq.any():
                i = neq.idxmax()
                detail = f" col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r}"
                break
        fails.append((name, msg + detail))

for n, r in passes:
    print(f"PASS  {n}  ({r} rows)")
for n, r in skips:
    print(f"SKIP  {n}  (rows-only, {r} rows)")
for n, m in fails:
    print(f"FAIL  {n}  {m}")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
