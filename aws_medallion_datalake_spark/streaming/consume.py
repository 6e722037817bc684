"""Bookmark-checkpointed incremental consumption of table changes.

The reference's incremental story is Glue job bookmarks: each scheduled
run processes only source data added since the last run, with the cursor
stored outside the job (/root/reference/terraform/glue_digit.tf:14,
SURVEY.md §2.9 T5). This module is that loop over OUR snapshot log:
``consume_changes`` reads ``Table.changes(bookmark, current)`` — planned
from manifest diffs, never a directory listing — hands the batch to the
caller, and advances the bookmark only after the handler returns.

Delivery contract (same as Spark's ``foreachBatch`` / Glue bookmarks):
at-least-once for the handler's side effects — a crash between handler
success and bookmark write replays the same ``(from, to]`` range —
so exactly-once end-to-end needs an idempotent sink keyed on the range
(e.g. ``exactly_once_append`` with ``batch_id=to_snapshot``).

The first run with a fresh checkpoint processes the WHOLE current
snapshot as its initial batch (Delta's streaming-from-table default);
pass ``start_snapshot_id`` to begin strictly after a known snapshot
instead.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.checkpoint import RunCheckpoint
from ..sources.tableformat import Table


def last_consumed_snapshot(checkpoint_path: str) -> Optional[int]:
    """The consumer's bookmark (last fully-processed snapshot id)."""
    cp = RunCheckpoint(checkpoint_path)
    done = [int(r["key"].rsplit("/", 1)[1]) for r in cp.units_done("consume")]
    return max(done) if done else None


def consume_changes(
    table: Table,
    spark: SparkSession,
    checkpoint_path: str,
    fn: Optional[Callable[[DataFrame, Optional[int], int], object]] = None,
    *,
    columns: Optional[Sequence[str]] = None,
    start_snapshot_id: Optional[int] = None,
    cdc: bool = False,
) -> Optional[dict]:
    """Process rows added since the bookmark, exactly one batch per call.

    Returns ``{"from_snapshot", "to_snapshot", "rows" or "result"}`` for
    a processed batch, or ``None`` when the consumer is caught up (no
    commit since the bookmark — also when the only commits since were
    physical: compaction/cluster/expire emit no rows, but the bookmark
    still advances past them so the next call stays O(new work)).
    ``fn(df, from_sid, to_sid)`` does the side effect; without ``fn``
    the batch is counted (materializing it) and the count returned.

    ``cdc=True`` feeds the handler ``Table.changes_cdc`` batches instead
    — full changelog rows with ``_change_type``/``_commit_snapshot_id``
    so the consumer can retract deleted/updated rows downstream. The
    initial fresh-checkpoint batch is the current snapshot tagged as
    inserts (there is no earlier state to diff against)."""
    cp = RunCheckpoint(checkpoint_path)
    done = [int(r["key"].rsplit("/", 1)[1]) for r in cp.units_done("consume")]
    bookmark = max(done) if done else start_snapshot_id
    cur = table.metadata().current_snapshot_id
    if cur is None or (bookmark is not None and cur == bookmark):
        return None
    if bookmark is None:
        df = table.scan(spark, snapshot_id=cur, columns=columns)
        if cdc:
            from pyspark.sql import functions as F

            df = df.select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(cur).cast("long").alias("_commit_snapshot_id"),
            )
        frm: Optional[int] = None
    elif cdc:
        df = table.changes_cdc(spark, bookmark, cur)
        if columns:
            df = df.select(
                *columns, "_change_type", "_commit_snapshot_id"
            )
        frm = bookmark
    else:
        df = table.changes(spark, bookmark, cur, columns=columns)
        frm = bookmark
    result = fn(df, frm, cur) if fn is not None else df.count()
    cp.unit_done(
        "consume", str(cur), {"from_snapshot": frm, "to_snapshot": cur}
    )
    out = {"from_snapshot": frm, "to_snapshot": cur}
    out["result" if fn is not None else "rows"] = result
    return out
