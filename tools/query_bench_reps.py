"""Health-gated per-query rep collector for the HEADLINE query bench.

The one-shot driver bench (bench.py) times each headline query once; on
this shared box a single observation is ±2-3× (BENCH/NOTES_r2.md), which
made several r2 query timings look regressed while the run's own alloc
probe degraded 2× mid-run. This tool collects N interleaved reps, each
in a FRESH subprocess/JVM, gates every rep on (a) the 64 MB first-touch
alloc probe and (b) an in-rep pure-CPU Spark probe, and reports
PER-QUERY MINIMA over clean reps — the same minima-over-gated-reps
discipline as tools/scaling_bench.py, applied to the query list.

Usage:
  python tools/query_bench_reps.py <log.jsonl> [--reps N] [--cpus C]
         [--sf-dir D] [--alloc-gate-ms M] [--cpu-gate-s S] [--queries a,b]
  python tools/query_bench_reps.py <log.jsonl> --aggregate   # minima only
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_REP_SCRIPT = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np

def alloc_probe_ms():
    t0 = time.time()
    a = np.empty(1 << 26, dtype=np.uint8); a[::4096] = 1
    return int((time.time() - t0) * 1000)

pre = alloc_probe_ms()
from pyspark.sql import functions as F
from aws_medallion_datalake_spark.session import get_session
import __spark_entry__ as entry
cpus = {cpus}
spark = get_session(f"local[{{cpus}}]", shuffle_partitions=max(8, cpus))
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).select(F.sum("id")).collect()  # warm JVM + workers

t0 = time.time()
spark.range(0, 60_000_000, 1, cpus * 8).select(
    F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256)))
).collect()
cpu_probe = round(time.time() - t0, 3)

qs = entry.queries()
out = {{}}
for name in {names!r}:
    t0 = time.time()
    qs[name](spark, {sf_dir!r}).collect()
    out[name] = round(time.time() - t0, 3)
out["_alloc_pre"] = pre
out["_alloc_post"] = alloc_probe_ms()
out["_cpu_probe"] = cpu_probe
print("QUERYREP " + json.dumps(out))
"""


def aggregate(log_path: str, alloc_gate: int, cpu_gate: float) -> dict:
    minima: dict = {}
    n_clean = n_all = 0
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rep = json.loads(line)
            n_all += 1
            clean = (
                max(rep.get("_alloc_pre", 0), rep.get("_alloc_post", 0))
                <= alloc_gate
                and rep.get("_cpu_probe", 0) <= cpu_gate
            )
            if not clean:
                continue
            n_clean += 1
            for k, v in rep.items():
                if not k.startswith("_"):
                    minima[k] = min(minima.get(k, 1e18), v)
    return {"clean_reps": n_clean, "total_reps": n_all, "minima": minima}


def main() -> None:
    log_path = sys.argv[1]
    args = sys.argv[2:]

    def opt(name, default, cast=str):
        return cast(args[args.index(name) + 1]) if name in args else default

    alloc_gate = opt("--alloc-gate-ms", 250, int)
    cpu_gate = opt("--cpu-gate-s", 1.2, float)
    if "--aggregate" in args:
        print(json.dumps(aggregate(log_path, alloc_gate, cpu_gate), indent=1))
        return
    reps = opt("--reps", 5, int)
    cpus = opt("--cpus", 32, int)
    sf_dir = opt("--sf-dir", "/root/testdata/sf0.1")
    if "--queries" in args:
        names = opt("--queries", "", str).split(",")
    else:
        sys.path.insert(0, REPO)
        import bench

        names = list(bench.HEADLINE)
    script = _REP_SCRIPT.format(
        repo=REPO, cpus=cpus, names=names, sf_dir=sf_dir
    )
    done_clean = 0
    for i in range(reps * 3):  # retry budget: noisy reps don't count
        if done_clean >= reps:
            break
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        line = next(
            (ln[len("QUERYREP "):] for ln in out.stdout.splitlines()
             if ln.startswith("QUERYREP ")),
            None,
        )
        if line is None:
            sys.stderr.write(out.stderr[-2000:] + "\n")
            raise SystemExit(f"rep {i} produced no result line")
        rep = json.loads(line)
        with open(log_path, "a") as f:
            f.write(line + "\n")
        clean = (
            max(rep["_alloc_pre"], rep["_alloc_post"]) <= alloc_gate
            and rep["_cpu_probe"] <= cpu_gate
        )
        done_clean += int(clean)
        print(
            f"rep {i}: clean={clean} alloc={rep['_alloc_pre']}/"
            f"{rep['_alloc_post']}ms cpu={rep['_cpu_probe']}s "
            f"({done_clean}/{reps} clean)",
            flush=True,
        )
        time.sleep(5)
    print(json.dumps(aggregate(log_path, alloc_gate, cpu_gate), indent=1))


if __name__ == "__main__":
    main()
