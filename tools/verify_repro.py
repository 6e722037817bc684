"""Repro loop for the rare 1-row decode-hash verify failure seen at
local[8] (BENCH/scalebench_r2i_lvl28.log). Runs maint_runner repeatedly
on the prebuilt table until a failure (with VERIFY-DIAG dump) or N reps.
"""
import os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
table = sys.argv[1]
src = sys.argv[2]
level = sys.argv[3] if len(sys.argv) > 3 else "8"
n = int(sys.argv[4]) if len(sys.argv) > 4 else 12
env = dict(os.environ)
env["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/r2k/spark-local"
for i in range(n):
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "maint_runner.py"),
         level, table, src],
        env=env, capture_output=True, text=True)
    dt = round(time.time() - t0, 1)
    ok = p.returncode == 0
    print(f"rep {i} local[{level}] rc={p.returncode} {dt}s", flush=True)
    if ok and p.stdout.strip():
        # rep timings are clean-window scaling evidence — keep them in
        # the same jsonl shape health_gated_reps writes
        with open(os.path.join(REPO, "BENCH", "verify_repro.log.jsonl"), "a") as jf:
            jf.write(p.stdout.strip().splitlines()[-1] + "\n")
    if not ok:
        sys.stderr.write(p.stderr[-8000:] + "\n")
        print("FAILURE REPRODUCED", flush=True)
        break
