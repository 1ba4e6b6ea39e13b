#!/usr/bin/env python3
"""Incremental driver for scale_check.py: consume a Verify outDir WHILE
the Spark dump is still running.

Why: at the 100x rung the full-surface Verify is LATENCY-bound (one
query at a time, load ~2-3 on 32 CPUs), and the DuckDB oracle pool is
CPU-bound — running them back-to-back wastes half the wall clock. This
wrapper polls the outDir, stages each COMPLETED query dump (its
`_SUCCESS` marker exists) into a per-batch dir of symlinks next to a
copy of oracle_sql.json, and runs the REAL scale_check.py on the batch
— same canon, same typed compare, same hard-FAIL timeout semantics, so
the union of batch reports is exactly what one monolithic run at the
same HEAD would print. Batches are cheap: a worker re-opens its own
DuckDB either way.

Usage: scale_check_stream.py <sfDir> <verifyOutDir> <stageRoot>
         [batchBudgetSec] [workers] [pollSec] [skipFile]

`skipFile` (one query name per line) pre-seeds the done set — the
resume/parallel-instance hook: a second instance can take over the
stream while a straggler batch of the first is still draining, without
double-checking its queries.

Stops when no new dir has appeared for `idle_limit` polls AND a
`DONE` file exists in verifyOutDir (touch it when Verify's process
exits), or when every dumped dir has been checked and DONE is present.
Exit code 1 if any batch reported a FAIL.
"""
import os, shutil, subprocess, sys, time

sfdir, outdir, stage_root = sys.argv[1], sys.argv[2], sys.argv[3]
budget = sys.argv[4] if len(sys.argv) > 4 else "7200"
workers = sys.argv[5] if len(sys.argv) > 5 else "6"
poll = float(sys.argv[6]) if len(sys.argv) > 6 else 60.0
here = os.path.dirname(os.path.abspath(__file__))

os.makedirs(stage_root, exist_ok=True)
done: set = set()
if len(sys.argv) > 7:
    done.update(l.strip() for l in open(sys.argv[7]) if l.strip())
    print(f"== pre-seeded done set: {len(done)} queries ==", flush=True)
batch_no = 0
any_fail = False
while True:
    ready = []
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if (name not in done and os.path.isdir(d)
                and os.path.exists(os.path.join(d, "_SUCCESS"))):
            ready.append(name)
    if ready:
        batch_no += 1
        stage = os.path.join(stage_root, f"batch_{batch_no:03d}")
        os.makedirs(stage, exist_ok=True)
        shutil.copy(os.path.join(outdir, "oracle_sql.json"),
                    os.path.join(stage, "oracle_sql.json"))
        for name in ready:
            dst = os.path.join(stage, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(outdir, name), dst)
        print(f"== batch {batch_no}: {len(ready)} queries ==", flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.join(here, "scale_check.py"),
             sfdir, stage, budget, workers])
        if rc != 0:
            any_fail = True
        done.update(ready)
    elif os.path.exists(os.path.join(outdir, "DONE")):
        print(f"== stream done: {len(done)} queries checked over "
              f"{batch_no} batches, any_fail={any_fail} ==", flush=True)
        sys.exit(1 if any_fail else 0)
    else:
        time.sleep(poll)
