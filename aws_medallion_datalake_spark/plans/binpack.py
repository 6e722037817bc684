"""Bin-packing compaction planner (first-fit-decreasing to a target size).

Replaces the reference's degenerate ``coalesce(1)`` small-file policy
(/root/reference/scripts/silver_digit_clean.py:127,
 scripts/bronze_digit.py:149 — SURVEY.md §2.1 S7, §4) with the policy the
north_star demands: pack manifest entries per partition into rewrite groups
of ≈ ``target_file_size_bytes``; each group becomes one right-sized output
file. Oversized files get their own split groups.

Planning is O(files log files) pure pandas on the manifest — no data read.
At 10^8-file scale the same FFD runs per-partition inside a Spark
``applyInPandas`` over the manifest DataFrame (``plan_compaction_spark``;
partition count is the parallelism) — ``compact()`` picks the path by
manifest row count, like ``Table.scan``'s planner split. The planner is
deliberately a pure function of manifest rows so both paths share it; the
driver receives only the resulting GROUPS (bounded by the rewrite batch,
and their path lists are needed driver-side anyway to submit the read).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd


@dataclass
class CompactionGroup:
    group_id: int
    partition_json: str
    kind: str  # "pack" (N small files → 1) | "split" (1 big file → N)
    paths: list
    input_bytes: int
    input_records: int
    n_output_files: int = 1
    # True when the inputs carry range structure worth preserving (their
    # key spans are near-disjoint): the rewrite then re-sorts the packed
    # output. Random-order inputs (raw bronze, span-overlapping) skip the
    # sort — it buys no pruning and costs CPU.
    ordered: bool = False


@dataclass
class CompactionPlan:
    groups: list = field(default_factory=list)

    @property
    def rewritten_paths(self) -> set:
        return {p for g in self.groups for p in g.paths}

    def summary(self) -> dict:
        return {
            "groups": len(self.groups),
            "files_in": sum(len(g.paths) for g in self.groups),
            "files_out": sum(g.n_output_files for g in self.groups),
            "bytes": sum(g.input_bytes for g in self.groups),
        }


def _is_range_structured(rows: list, order_col: str) -> bool:
    """True when the files' key spans are near-disjoint (sum of per-file
    spans ≲ the group's total span) — i.e., a previously clustered
    layout whose order the rewrite should preserve with a re-sort."""
    lo_c, hi_c = f"min_{order_col}", f"max_{order_col}"
    if not rows or lo_c not in rows[0].index:
        return False
    los = [r[lo_c] for r in rows]
    his = [r[hi_c] for r in rows]
    if any(pd.isna(v) for v in los + his):
        return False
    total_span = float(max(his)) - float(min(los))
    if total_span <= 0:
        return False
    sum_spans = sum(float(h) - float(lo) for lo, h in zip(los, his))
    return sum_spans <= 2.0 * total_span


def plan_compaction(
    manifest: pd.DataFrame,
    target_file_size_bytes: int,
    *,
    min_input_files: int = 2,
    small_file_ratio: float = 0.75,
    max_file_ratio: float = 1.8,
    order_col: str = "phash",
) -> CompactionPlan:
    """Pack undersized files per partition; split oversized ones.

    - candidates: files < small_file_ratio * target (too small) or
      > max_file_ratio * target (too big).
    - pack groups with fewer than ``min_input_files`` inputs are dropped —
      rewriting a lone small file buys nothing.
    - packing order: when the manifest carries ``min_<order_col>`` stats,
      candidates are packed NEXT-FIT in (min_key, path) order so each
      output file concatenates key-ADJACENT inputs — a clustered table
      stays clustered through compaction (path is the tiebreaker:
      cluster-written files sort by bucket within their commit prefix).
      Without stats, first-fit-decreasing by size maximizes bin fill.
    """
    small = int(target_file_size_bytes * small_file_ratio)
    big = int(target_file_size_bytes * max_file_ratio)
    key_stats = f"min_{order_col}" if f"min_{order_col}" in manifest.columns else None
    groups: list = []
    gid = 0
    for pjson, part in manifest.groupby("partition_json", sort=True):
        cand = part[part["file_size_bytes"] < small]
        bins: list = []  # (remaining_bytes, [rows])
        if key_stats is not None:
            cand = cand.sort_values([key_stats, "path"])
            for _, row in cand.iterrows():  # next-fit: keep key adjacency
                sz = int(row["file_size_bytes"])
                if bins and bins[-1][0] >= sz:
                    bins[-1][0] -= sz
                    bins[-1][1].append(row)
                else:
                    bins.append([target_file_size_bytes - sz, [row]])
        else:
            cand = cand.sort_values("file_size_bytes", ascending=False)
            for _, row in cand.iterrows():  # first-fit-decreasing
                sz = int(row["file_size_bytes"])
                for b in bins:
                    if b[0] >= sz:
                        b[0] -= sz
                        b[1].append(row)
                        break
                else:
                    bins.append([target_file_size_bytes - sz, [row]])
        for b in bins:
            rows = b[1]
            if len(rows) < min_input_files:
                continue
            groups.append(
                CompactionGroup(
                    group_id=gid,
                    partition_json=str(pjson),
                    kind="pack",
                    paths=[r["path"] for r in rows],
                    input_bytes=int(sum(r["file_size_bytes"] for r in rows)),
                    input_records=int(sum(r["record_count"] for r in rows)),
                    n_output_files=1,
                    ordered=_is_range_structured(rows, order_col),
                )
            )
            gid += 1
        for _, row in part[part["file_size_bytes"] > big].iterrows():
            n_out = max(2, round(int(row["file_size_bytes"]) / target_file_size_bytes))
            groups.append(
                CompactionGroup(
                    group_id=gid,
                    partition_json=str(pjson),
                    kind="split",
                    paths=[row["path"]],
                    input_bytes=int(row["file_size_bytes"]),
                    input_records=int(row["record_count"]),
                    n_output_files=int(n_out),
                )
            )
            gid += 1
    return CompactionPlan(groups=groups)


_GROUP_ROW_DDL = (
    "partition_json string, kind string, paths array<string>, "
    "input_bytes long, input_records long, n_output_files int, ordered boolean"
)


def plan_compaction_spark(
    manifest_df,
    target_file_size_bytes: int,
    *,
    min_input_files: int = 2,
    small_file_ratio: float = 0.75,
    max_file_ratio: float = 1.8,
    order_col: str = "phash",
) -> CompactionPlan:
    """The ≥``SPARK_MANIFEST_THRESHOLD`` planner: run ``plan_compaction``
    per partition inside ``applyInPandas`` over the manifest DataFrame.
    The quadratic-ish FFD/next-fit loop executes on executors (one task
    per partition); the driver collects one row per GROUP, not per file."""

    def _plan_slice(pdf: pd.DataFrame) -> pd.DataFrame:
        plan = plan_compaction(
            pdf,
            target_file_size_bytes,
            min_input_files=min_input_files,
            small_file_ratio=small_file_ratio,
            max_file_ratio=max_file_ratio,
            order_col=order_col,
        )
        return pd.DataFrame(
            [
                {
                    "partition_json": g.partition_json,
                    "kind": g.kind,
                    "paths": list(g.paths),
                    "input_bytes": g.input_bytes,
                    "input_records": g.input_records,
                    "n_output_files": g.n_output_files,
                    "ordered": bool(g.ordered),
                }
                for g in plan.groups
            ],
            columns=[
                "partition_json", "kind", "paths", "input_bytes",
                "input_records", "n_output_files", "ordered",
            ],
        )

    rows = (
        manifest_df.groupBy("partition_json")
        .applyInPandas(_plan_slice, _GROUP_ROW_DDL)
        .toPandas()
    )
    # deterministic group ids across runs: order by partition, kind, lead path
    rows["_lead"] = rows["paths"].map(lambda ps: ps[0] if len(ps) else "")
    rows = rows.sort_values(["partition_json", "kind", "_lead"]).reset_index(drop=True)
    groups = [
        CompactionGroup(
            group_id=i,
            partition_json=str(r["partition_json"]),
            kind=str(r["kind"]),
            paths=list(r["paths"]),
            input_bytes=int(r["input_bytes"]),
            input_records=int(r["input_records"]),
            n_output_files=int(r["n_output_files"]),
            ordered=bool(r["ordered"]),
        )
        for i, r in rows.iterrows()
    ]
    return CompactionPlan(groups=groups)
