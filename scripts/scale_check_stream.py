#!/usr/bin/env python3
"""Incremental driver for scale_check.py: consume a Verify outDir WHILE
the Spark dump is still running.

Why: at the 100x rung the full-surface Verify is LATENCY-bound (one
query at a time, load ~2-3 on 32 CPUs), and the DuckDB oracle pool is
CPU-bound — running them back-to-back wastes half the wall clock. This
wrapper polls the outDir, stages each COMPLETED query dump (its
`_SUCCESS` marker exists) into a per-batch dir of symlinks next to a
copy of oracle_sql.json, and runs the REAL scale_check.py on the batch
— same canon, same typed compare. Budget semantics mirror the
monolithic run's single GLOBAL deadline: `budgetSec` is the total
oracle wall across ALL batches — each batch gets only what the earlier
batches left (cumulative scale_check.py wall is subtracted), so a
slow oracle that would hard-FAIL under one monolithic deadline cannot
pass here just because its batch started fresh (r15 advisor). Batches
are cheap: a worker re-opens its own DuckDB either way.

Usage: scale_check_stream.py <sfDir> <verifyOutDir> <stageRoot>
         [budgetSec] [workers] [pollSec] [skipFile]

`skipFile` (one query name per line) pre-seeds the done set — the
resume/parallel-instance hook: a second instance can take over the
stream while a straggler batch of the first is still draining, without
double-checking its queries (pre-seeded queries count as COVERED by
the other instance, so the coverage audit below skips them).

Stops when a `DONE` file exists in verifyOutDir (touch it when
Verify's process exits) and no new ready dir remains. On the DONE
branch the checked set is audited against EVERY query subdir in
verifyOutDir: a dir that never earned a `_SUCCESS` marker (crashed or
incomplete Spark dump) is reported as FAIL — a monolithic
scale_check.py run would FAIL it with 'no spark output', and the union
of batch reports must not claim more coverage than that (r15 advisor;
the r11 failure mode). Exit code 1 if any batch FAILed or any dumped
dir was never checked.
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
oracle_elapsed = 0.0  # cumulative scale_check.py wall, vs the GLOBAL budget
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
        # the remaining GLOBAL budget; floor of 1s so an exhausted budget
        # still classifies the batch's queries (instant hard-FAIL, exactly
        # what the monolithic run's expired deadline would print)
        remaining = max(float(budget) - oracle_elapsed, 1.0)
        print(f"== batch {batch_no}: {len(ready)} queries "
              f"(budget remaining {remaining:.0f}s) ==", flush=True)
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, os.path.join(here, "scale_check.py"),
             sfdir, stage, str(remaining), workers])
        oracle_elapsed += time.time() - t0
        if rc != 0:
            any_fail = True
        done.update(ready)
    elif os.path.exists(os.path.join(outdir, "DONE")):
        # coverage audit: every query subdir must have been checked (or
        # pre-seeded as another instance's). A dir with no _SUCCESS never
        # became `ready` — the monolithic run would FAIL it as 'no spark
        # output'; claiming stream coverage without it overstates the gate.
        unchecked = sorted(
            name for name in os.listdir(outdir)
            if os.path.isdir(os.path.join(outdir, name)) and name not in done)
        for name in unchecked:
            print(f"FAIL    {name}  (dumped dir never checked — no _SUCCESS "
                  f"marker; incomplete/crashed Spark dump)", flush=True)
        print(f"== stream done: {len(done)} queries checked over "
              f"{batch_no} batches ({oracle_elapsed:.0f}s oracle wall), "
              f"{len(unchecked)} unchecked dirs, any_fail={any_fail} ==",
              flush=True)
        sys.exit(1 if (any_fail or unchecked) else 0)
    else:
        time.sleep(poll)
