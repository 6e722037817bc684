"""Optimistic-concurrency commit protocol (Iceberg commit semantics).

Reference parity: the reference relies on Glue/LakeFormation to serialize
writers (terraform/glue_digit.tf); this engine implements Iceberg's
optimistic protocol itself — metadata-version CAS, transparent rebase for
commuting (add-only) commits, validation failure for non-additive ones.
"""

import threading

import pytest

from aws_medallion_datalake_spark.sources.generator import SCHEMA, generate_images
from aws_medallion_datalake_spark.sources.tableformat import (
    CommitConflictError,
    Table,
)

STATS = ["phash", "w", "h", "image_id"]


@pytest.fixture()
def table(tmp_path, spark):
    t = Table.create(
        str(tmp_path / "images"),
        schema_ddl=SCHEMA,
        partition_cols=["ingest_date"],
        stats_cols=STATS,
    )
    df = generate_images(spark, 100, n_files=4, n_dates=2)
    t.commit("append", t.write_files(df))
    return t


def test_racing_appends_all_land(table, spark):
    """N writers racing append commits: every commit lands exactly once
    (rebased onto whichever head won), totals are the sum of all parts."""
    n_writers, rows_each = 6, 30
    entries = []
    for i in range(n_writers):
        df = generate_images(spark, rows_each, n_files=2, start=1000 + i * rows_each)
        entries.append(table.write_files(df))

    barrier = threading.Barrier(n_writers)
    errors = []

    def run(man):
        barrier.wait()
        try:
            table.commit("append", man, max_retries=30)
        except BaseException as e:  # noqa: BLE001 — collected for the assert
            errors.append(e)

    threads = [threading.Thread(target=run, args=(m,)) for m in entries]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    meta = table.metadata()
    # 1 seed + n_writers appends, all on one linear history
    assert len(meta.snapshots) == 1 + n_writers
    chain = {s.snapshot_id: s.parent_snapshot_id for s in meta.snapshots}
    seen = set()
    cur = meta.current_snapshot_id
    while cur is not None:
        assert cur not in seen
        seen.add(cur)
        cur = chain[cur]
    assert len(seen) == 1 + n_writers
    head = table.snapshot(meta.current_snapshot_id)
    assert int(head.summary["total_records"]) == 100 + n_writers * rows_each
    assert table.scan(spark).count() == 100 + n_writers * rows_each


def test_append_rebases_over_concurrent_winner(table, spark, monkeypatch):
    """Deterministic race: a competing append lands between our head read
    and our CAS. The additive commit must rebase and keep BOTH file sets."""
    competitor = table.write_files(
        generate_images(spark, 40, n_files=2, start=2000)
    )
    ours = table.write_files(generate_images(spark, 25, n_files=1, start=3000))

    other = Table(table.root)
    orig = Table._write_manifest
    fired = {}

    def inject_then_write(self, sid, man):
        if not fired:
            fired["armed"] = True  # guard against recursion via other.commit
            fired["winner"] = other.commit("append", competitor).snapshot_id
        return orig(self, sid, man)

    monkeypatch.setattr(Table, "_write_manifest", inject_then_write)
    snap = table.commit("append", ours)
    # rebase: our snapshot parents on the competitor's, not the seed
    assert snap.parent_snapshot_id == fired["winner"]
    assert int(snap.summary["total_records"]) == 100 + 40 + 25
    assert table.scan(spark).count() == 165


def test_nonadditive_commit_raises_on_lost_race(table, spark, monkeypatch):
    """A replace commit encodes the parent's exact file set; losing the CAS
    must surface as CommitConflictError (Iceberg validation failure), and
    the winner's commit must remain intact."""
    competitor = table.write_files(
        generate_images(spark, 10, n_files=1, start=4000)
    )
    rewrite = table.write_files(generate_images(spark, 100, n_files=2, start=5000))

    other = Table(table.root)
    orig = Table._write_manifest
    fired = {}

    def inject_then_write(self, sid, man):
        if not fired:
            fired["armed"] = True  # guard against recursion via other.commit
            other.commit("append", competitor)
        return orig(self, sid, man)

    monkeypatch.setattr(Table, "_write_manifest", inject_then_write)
    with pytest.raises(CommitConflictError):
        table.commit("replace", rewrite)
    # winner intact; loser left no visible state
    assert table.scan(spark).count() == 110
    # re-plan against the new head succeeds (the caller's retry contract)
    monkeypatch.setattr(Table, "_write_manifest", orig)
    full = table.manifest_pdf()
    table.commit("replace", full)
    assert table.scan(spark).count() == 110
