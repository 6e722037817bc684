"""Checkpoint manifest: resumable maintenance runs with per-unit lineage.

Generalizes the reference's externalized progress state — the DynamoDB
watermark (/root/reference/scripts/watermark_helper.py:9-42) and the Step
Functions month-cursor backfill loop
(/root/reference/step-functions/digit-historical-load.json:28-97, SURVEY.md
§2.9 T2/T3, §3.3) — into an append-only JSONL manifest: one record per
completed work unit (a compaction group, a stage commit), carrying lineage
(source snapshot id, input file list, rows, bytes) and metrics. Restart =
replay the file, skip completed units; failure mid-stage never corrupts
committed work because data lands in isolated prefixes and the table commit
is the last step.

Append of a single JSONL line is atomic for our single-writer driver
(O_APPEND + one write syscall).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


def _to_native(obj):
    """Recursively convert numpy scalars so json can serialize manifest rows."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: _to_native(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_native(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


class RunCheckpoint:
    """Append-only JSONL checkpoint for one logical maintenance run."""

    def __init__(self, path: str):
        self.path = path
        self._records: list = []
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._records.append(json.loads(line))

    # ---- write ----

    def record(self, rtype: str, key: str, payload: Optional[dict] = None) -> None:
        rec = {
            "type": rtype,
            "key": key,
            "ts_ms": int(time.time() * 1000),
            **_to_native(payload or {}),
        }
        line = json.dumps(rec)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._records.append(rec)

    def unit_done(self, stage: str, unit: str, lineage: dict) -> None:
        """Record one completed work unit (e.g. a compaction group):
        lineage carries source_snapshot_id, input files, rows, bytes,
        output prefix + manifest entries."""
        self.record("unit_done", f"{stage}/{unit}", lineage)

    def stage_done(self, stage: str, metrics: dict) -> None:
        self.record("stage_done", stage, {"metrics": metrics})

    def stage_failed(self, stage: str, failure: dict) -> None:
        """Record a structured per-stage failure (the reference pipeline's
        error-notification payload, persisted instead of emailed —
        scripts/error_handler/lambda_error_handler.py). Failure records
        never mark the stage done: a resume re-runs it."""
        self.record("stage_failed", stage, {"failure": failure})

    def run_succeeded(self, summary: dict) -> None:
        """Record the end-of-run success summary (the reference pipeline's
        success notification + CloudWatch PipelineSuccess metric,
        scripts/lambda_success_notification.py:26-44, persisted instead
        of emailed): one record after every stage completed cleanly."""
        self.record("run_succeeded", "run", {"summary": summary})

    # ---- read / resume ----

    def is_unit_done(self, stage: str, unit: str) -> bool:
        return any(
            r["type"] == "unit_done" and r["key"] == f"{stage}/{unit}" for r in self._records
        )

    def unit_payload(self, stage: str, unit: str) -> Optional[dict]:
        for r in self._records:
            if r["type"] == "unit_done" and r["key"] == f"{stage}/{unit}":
                return r
        return None

    def is_stage_done(self, stage: str) -> bool:
        return any(r["type"] == "stage_done" and r["key"] == stage for r in self._records)

    def stage_metrics(self, stage: str) -> Optional[dict]:
        for r in self._records:
            if r["type"] == "stage_done" and r["key"] == stage:
                return r.get("metrics")
        return None

    def units_done(self, stage: str) -> list:
        pre = f"{stage}/"
        return [r for r in self._records if r["type"] == "unit_done" and r["key"].startswith(pre)]

    def failures(self) -> list:
        return [r for r in self._records if r["type"] == "stage_failed"]

    def run_summary(self) -> Optional[dict]:
        """Latest end-of-run success summary, if the run completed."""
        for r in reversed(self._records):
            if r["type"] == "run_succeeded":
                return r.get("summary")
        return None
