"""One-level scale notch for the maintenance bench (round-4 VERDICT
task 8): run the committed compact → cluster → MERGE protocol at the
NEXT table size up from the 1.536M-row / 22.7 GB pair runs, single
parallelism level (local[32]), gate-instrumented, and report scan GB/s,
merge rows/s and the per-stage phase split — the question is whether
the per-JOB fixed costs (planning/driver phases) stay flat while the
per-BYTE work scales with the input.

Size choice, disclosed: the VERDICT suggested 4x again (~6.1M rows),
but that table is 91 GB and this box's tmpfs IS its 126 GB RAM — a
rewrite stage holds old+new file sets plus the cluster stage's
full-payload shuffle (≈ 3x table, 270 GB). Even the 2x notch (3.072M
rows, 45.4 GB) only fits with (a) maint_runner's in-place mode (no
pristine copy; the table is REBUILT between reps) and (b) shuffle
scratch moved to the shared disk (the one resource with headroom).
Disk shuffle adds a serial IO term to the rewrite phases — a sandbox
artifact, disclosed in the report — while the fixed planning/driver
phases the notch probes are unaffected.

Per rep: deterministic rebuild (untimed) -> maint_runner in-place at
local[32] with between-stage GC (untimed) -> one JSON line appended to
the log. Gates are maint_runner's own (alloc_gate, cpu_fresh pair).

Usage: python tools/scale_notch.py <log.jsonl> [img_rows] [--reps N]
       python tools/scale_notch.py <log.jsonl> [img_rows] --aggregate
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import REPO, build_inputs  # noqa: E402

ROOT = "/dev/shm/scale_notch"
DISK_SCRATCH = "/root/notch-scratch"


def aggregate(log_path: str) -> None:
    reps = [json.loads(ln) for ln in open(log_path) if ln.strip()]
    if not reps:
        raise SystemExit("no reps in log")
    best_fresh = min(r["times"]["cpu_fresh"] for r in reps)

    def clean(r):
        return (
            r["times"].get("alloc_gate", 0.0) <= 1.0
            and r["times"]["cpu_fresh_gate"] <= best_fresh * 1.25
        )

    n_clean = sum(1 for r in reps if clean(r))
    keys = {k for r in reps for k in r["times"]}
    minima = {k: min(r["times"][k] for r in reps if k in r["times"]) for k in sorted(keys)}
    phases = {}
    for stage in ("compact", "cluster", "merge"):
        pk = {k for r in reps for k in r.get("phases", {}).get(stage, {})}
        phases[stage] = {
            k: min(r["phases"][stage][k] for r in reps if k in r.get("phases", {}).get(stage, {}))
            for k in sorted(pk)
        }
    r0 = reps[0]
    total = sum(minima[s] for s in ("compact", "cluster", "merge", "verify"))
    print(json.dumps({
        "rows": r0["rows"],
        "n_reps": len(reps),
        "n_clean": n_clean,
        "times": minima,
        "phases": phases,
        "maint_sec": round(total, 3),
        "rows_per_sec": round(r0["rows"] / total, 1),
        "scan_gbps": max(r["scan_gbps"] for r in reps),
        "merge_rows_per_sec": max(r["merge_rows_per_sec"] for r in reps),
    }, indent=1))


def main() -> None:
    log_path = sys.argv[1]
    args = sys.argv[2:]
    img_rows = int(args[0]) if args and not args[0].startswith("--") else 3_072_000
    if "--aggregate" in args:
        aggregate(log_path)
        return
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 2

    os.makedirs(DISK_SCRATCH, exist_ok=True)
    env = dict(os.environ)
    env["SPARK_GRAFT_LOCAL_DIR"] = DISK_SCRATCH  # shuffle on disk (see doc)
    env["SPARK_GRAFT_INPLACE"] = "1"
    env["SPARK_GRAFT_BENCH_GC"] = "1"

    for rep in range(reps):
        shutil.rmtree(ROOT, ignore_errors=True)
        os.makedirs(ROOT, exist_ok=True)
        print(f"rep{rep}: building {img_rows}-row table (untimed)...", flush=True)
        table_dir, src_dir = build_inputs(ROOT, img_rows)
        print(f"rep{rep}: running maint_runner local[32] in-place...", flush=True)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "maint_runner.py"),
             "32", table_dir, src_dir],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (ln for ln in out.stdout.splitlines() if ln.startswith("{")), None
        )
        if line is None:
            sys.stderr.write(out.stderr[-4000:] + "\n")
            raise SystemExit(f"rep {rep} failed")
        with open(log_path, "a") as f:
            f.write(line + "\n")
        r = json.loads(line)
        print(f"rep{rep}: {r['times']} -> {r['rows_per_sec']} rows/s", flush=True)
    shutil.rmtree(ROOT, ignore_errors=True)
    shutil.rmtree(DISK_SCRATCH, ignore_errors=True)
    aggregate(log_path)


if __name__ == "__main__":
    main()
