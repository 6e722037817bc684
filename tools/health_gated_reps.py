"""Health-gated rep collector for the two-cluster-size scaling bench.

The sandbox host intermittently degrades fresh page-fault servicing to
~1 ms/page (see BENCH/NOTES_r2.md), which poisons every allocation-heavy
Spark stage. This runner polls a first-touch probe and only launches
maintenance reps (tools/maint_runner.py at local[2]/[8]/[32], interleaved)
while the host is healthy, appending rep lines in the exact format
``tools/scaling_bench.py --from-log`` re-aggregates.

Usage:
  python tools/health_gated_reps.py <table_dir> <src_dir> <log_path>
         [--target-clean N] [--max-hours H]

A rep line is only counted clean when its own alloc_gate <= 1.0 s.
Exits when every level has N clean reps or the time budget runs out.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_ms(tries: int = 3) -> int:
    """First-touch 64 MB of fresh pages in a subprocess; healthy < 100 ms.

    The degradation is BURSTY at second granularity (measured: 17 s,
    31 ms, 10 ms back-to-back), so a single bad sample must not park the
    collector — report the MIN of a few samples: only a persistently
    degraded host fails all of them."""
    script = (
        "import time,numpy as np; t0=time.time();"
        "a=np.empty(1<<26,dtype=np.uint8); a[::4096]=1;"
        "print(int((time.time()-t0)*1000))"
    )
    best = 10**9
    for _ in range(tries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", script],
                capture_output=True, text=True, timeout=300,
            )
            best = min(best, int(out.stdout.strip()))
        except Exception:
            pass
        if best <= 1000:
            return best
        time.sleep(2)
    return best


def main() -> None:
    table_dir, src_dir, log_path = sys.argv[1], sys.argv[2], sys.argv[3]
    target = 3
    if "--target-clean" in sys.argv:
        target = int(sys.argv[sys.argv.index("--target-clean") + 1])
    max_hours = 5.0
    if "--max-hours" in sys.argv:
        max_hours = float(sys.argv[sys.argv.index("--max-hours") + 1])

    env = dict(os.environ)
    env.setdefault(
        "SPARK_GRAFT_LOCAL_DIR", os.path.join(os.path.dirname(table_dir), "spark-local")
    )
    levels = [2, 8, 32]
    if "--levels" in sys.argv:
        levels = [int(x) for x in sys.argv[sys.argv.index("--levels") + 1].split(",")]
    # Optional per-level cpu_gate ceilings ("8:3.6,32:2.4"): alloc_gate
    # alone misses plain CPU contention (another Spark job on the box
    # inflates every stage while fresh-page faults stay fast), so a rep
    # only counts toward the clean target if its in-rep pure-CPU probe
    # also lands under the level's quiet-window ceiling.
    gate_max = {}
    if "--gate-max" in sys.argv:
        for part in sys.argv[sys.argv.index("--gate-max") + 1].split(","):
            lv, mx = part.split(":")
            gate_max[int(lv)] = float(mx)
    clean = {lv: 0 for lv in levels}
    # resume: count clean reps already in the log
    if os.path.exists(log_path):
        import ast, re

        pat = re.compile(r"rep\d+ local\[(\d+)\]: (\{.*\}) -> ")
        for line in open(log_path):
            m = pat.search(line)
            if m:
                t = ast.literal_eval(m.group(2))
                if t.get("alloc_gate", 0.0) <= 1.0:
                    clean[int(m.group(1))] = clean.get(int(m.group(1)), 0) + 1

    deadline = time.time() + max_hours * 3600
    rep = 1000  # offset so rep ids never collide with scaling_bench's own
    log = open(log_path, "a", buffering=1)
    log.write(f"# health_gated_reps start {time.strftime('%H:%M:%S')} clean={clean}\n")
    while time.time() < deadline and any(clean[lv] < target for lv in levels):
        ms = probe_ms()
        if ms > 1000:
            log.write(f"# {time.strftime('%H:%M:%S')} host degraded probe={ms}ms, sleeping\n")
            time.sleep(90)
            continue
        rep += 1
        for lv in levels:
            if clean[lv] >= target:
                continue
            t0 = time.time()
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "maint_runner.py"),
                 str(lv), table_dir, src_dir],
                capture_output=True, text=True, env=env,
            )
            if out.returncode != 0:
                log.write(f"# rep{rep} local[{lv}] FAILED: {out.stderr[-500:]}\n")
                continue
            r = json.loads(out.stdout.strip().splitlines()[-1])
            is_clean = r["times"].get("alloc_gate", 0.0) <= 1.0 and r[
                "times"
            ].get("cpu_gate", 0.0) <= gate_max.get(lv, float("inf"))
            log.write(
                f"rep{rep} local[{lv}]{'' if is_clean else ' [NOISY]'}: "
                f"{r['times']} -> {r['rows_per_sec']} rows/s\n"
            )
            # full rep record (incl. per-phase timings) for offline
            # phase-minima analysis, which the rep line can't carry
            with open(log_path + ".jsonl", "a") as jf:
                jf.write(json.dumps(r) + "\n")
            if is_clean:
                clean[lv] += 1
            # if the host degraded mid-rep, stop burning the window
            if r["times"].get("alloc_gate", 0.0) > 5.0:
                break
        log.write(f"# cycle done clean={clean} elapsed_rep={round(time.time()-t0,1)}s\n")
    log.write(f"# health_gated_reps done {time.strftime('%H:%M:%S')} clean={clean}\n")


if __name__ == "__main__":
    main()
