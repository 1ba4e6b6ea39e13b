#!/usr/bin/env python3
"""At-scale companion to check.py (judge round-10 item #4: one
FULL-surface Verify+check on a 10x ReplicaCorpus): same canon + typed
compare as check.py, but each oracle runs in its OWN worker process
under a wall-clock budget, and the pool runs oracles in parallel.

Why the budget exists: a handful of oracles are EXHAUSTIVE TRUTH
PASSES by design (all-pairs Jaccard over a slice, exhaustive-cosine
recall baselines) — at gate scale they are the point (the simple
quadratic spec the banded Spark plan must match); at 10x they are
O(n^2) in DuckDB and would run for hours. The SPARK side of those
queries is banded/bucketed and completes fine — a timeout here is a
statement about the oracle's deliberate brute-force shape, not about
the library. Timeouts are reported as their own class, with the Spark
row count recorded.

Usage: python3 scripts/scale_check.py <sfDir> <verifyOutDir>
         [wallBudgetSec] [workers]

The budget is a GLOBAL wall deadline for the whole run. A query still
running at the deadline is only classified as a benign TIMEOUT if it
is on the EXPLICIT allowlist of known exhaustive truth-pass oracles
below; anything else over budget is a FAIL and the run exits nonzero
(round-11 advisor: "by elimination" classification silently converted
hung workers and accidentally-quadratic new oracles into benign
timeouts, overstating the evidence run's coverage).
"""
import json, sys, glob, os, time
import multiprocessing as mp

sfdir, outdir = sys.argv[1], sys.argv[2]
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 2700.0
workers = int(sys.argv[4]) if len(sys.argv) > 4 else 8

# Oracles ALLOWED to time out: quadratic-by-design exhaustive truth
# passes whose brute-force shape IS their value at gate scale. EMPTY
# since round 12 — q25/q118/q231/q299 now run their truth pass on the
# scale-tiered 2048-doc panel (SparkEntry.TruthPanelCap), so every
# declared oracle is expected to certify at 10x. Add a name here ONLY
# with a PLANS.md entry explaining why its oracle cannot be
# scale-tiered.
TRUTH_PASS_ALLOWLIST: set = set()


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first")
    return df.reset_index(drop=True)


def run_one(args):
    """Worker: one oracle end-to-end. Own duckdb connection (capped
    memory + threads so `workers` of these coexist), own compare."""
    name, d, sql = args
    import duckdb
    import shutil
    import pyarrow.parquet as pq
    import pandas as pd
    t0 = time.time()
    con = None
    # per-worker spill dir (see below); removed in the finally so repeated
    # runs / the stream wrapper's many batches don't accumulate leftovers
    # in /tmp (r15 advisor)
    tmp = f"/tmp/duckdb_tmp_{os.getpid()}"
    try:
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            return (name, "FAIL", "no spark output", 0.0)
        spark_df = pq.ParquetDataset(files).read().to_pandas()
        if sql is None:
            return (name, "SKIP", f"rows-only, {len(spark_df)} rows",
                    time.time() - t0)
        con = duckdb.connect()
        # per-worker caps sized so `workers` coexist on a 128 GiB box;
        # a single resource-heavy oracle (q221's unrolled k-core peel
        # chain at 100x needs >12 GB of CTE materializations) re-runs
        # solo with SCALE_CHECK_MEM/THREADS raised
        mem = os.environ.get("SCALE_CHECK_MEM", "12GB")
        thr = os.environ.get("SCALE_CHECK_THREADS", "4")
        con.execute(f"SET memory_limit='{mem}'; SET threads={thr};")
        # in-memory DuckDB spills to <cwd>/.tmp with block files that are
        # NOT pid-scoped — concurrent workers sharing a cwd unlink each
        # other's spill blocks (observed at 100x as spurious aborts /
        # instant allocation failures). Give every worker its own dir.
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}';")
        if os.environ.get("SCALE_CHECK_NO_ORDER"):
            # stream large joins instead of materializing them in
            # insertion order — the difference between 67 GB of spill
            # and none for list-payload joins; canon() sorts rows, so
            # result order never matters to the compare
            con.execute("SET preserve_insertion_order=false;")
        for p in glob.glob(f"{sfdir}/*.parquet"):
            tname = os.path.basename(p)[:-len(".parquet")]
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM"
                        f" read_parquet('{src}')")
        duck_df = con.execute(sql).fetchdf()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            return (name, "FAIL",
                    f"columns {list(a.columns)} vs {list(b.columns)}",
                    time.time() - t0)
        if len(a) != len(b):
            return (name, "FAIL", f"rows {len(a)} vs {len(b)}",
                    time.time() - t0)

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
            return (name, "FAIL", f"dtype kind mismatch: {kind_mismatch}",
                    time.time() - t0)
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True)
        return (name, "PASS", f"{len(a)} rows", time.time() - t0)
    except AssertionError as e:
        return (name, "FAIL", str(e).split("\n")[0], time.time() - t0)
    except Exception as e:
        return (name, "FAIL", f"oracle error: {e}"[:200], time.time() - t0)
    finally:
        if con is not None:
            try:
                con.close()
            except Exception:
                pass
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    tasks = []
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if os.path.isdir(d):
            tasks.append((name, d, oracle.get(name)))

    results = {}
    pool = mp.Pool(workers)
    async_res = [(n, pool.apply_async(run_one, ((n, d, s),)))
                 for n, d, s in tasks]
    pool.close()
    t_start = time.time()
    pending = dict(async_res)
    while pending and time.time() - t_start < budget:
        for n, r in list(pending.items()):
            if r.ready():
                results[n] = r.get()
                print(f"{results[n][1]:7s} {n}  ({results[n][2]})"
                      f"  [{results[n][3]:.1f}s]", flush=True)
                del pending[n]
        time.sleep(2)
    # Final drain BEFORE terminate: the poll loop sleeps 2s, so a worker
    # that finished just inside the deadline can be ready() but undrained
    # when the loop exits — terminate() would discard its (possibly
    # PASSing) result and the over-budget branch below would reclassify a
    # genuinely completed oracle as a hard FAIL (round-12 advisor).
    for n, r in list(pending.items()):
        if r.ready():
            results[n] = r.get()
            print(f"{results[n][1]:7s} {n}  ({results[n][2]})"
                  f"  [{results[n][3]:.1f}s]", flush=True)
            del pending[n]
    pool.terminate()
    for n, _ in async_res:
        if n not in results:
            if n in TRUTH_PASS_ALLOWLIST:
                results[n] = (n, "TIMEOUT",
                              "oracle exceeded the wall budget (allowlisted "
                              "exhaustive truth pass — quadratic by design)",
                              budget)
                print(f"TIMEOUT {n}  (allowlisted truth-pass oracle over "
                      f"budget)", flush=True)
            else:
                results[n] = (n, "FAIL",
                              "oracle over wall budget and NOT on the "
                              "truth-pass allowlist — hung worker or "
                              "accidentally-quadratic oracle", budget)
                print(f"FAIL    {n}  (over budget, not allowlisted)",
                      flush=True)
    npass = sum(1 for v in results.values() if v[1] == "PASS")
    nskip = sum(1 for v in results.values() if v[1] == "SKIP")
    nfail = sum(1 for v in results.values() if v[1] == "FAIL")
    nto = sum(1 for v in results.values() if v[1] == "TIMEOUT")
    print(f"\n{npass} pass, {nskip} rows-only, {nto} oracle-timeout, "
          f"{nfail} fail")
    for v in sorted(results.values()):
        if v[1] == "FAIL":
            print(f"  FAIL {v[0]}: {v[2]}")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
