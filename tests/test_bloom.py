"""Parquet footer bloom filters (BLOOM_COLS_PROP table property):
written on ingest, preserved through every rewrite operator, and
actually discriminating (present key hits, absent key misses).

Blooms are read back through parquet-mr via py4j — pyarrow doesn't
expose them — which checks the REAL reader-side artifact Spark's scan
consults for row-group skipping, not a reimplementation."""

import os

import pytest

from aws_medallion_datalake_spark.operators.cluster import cluster
from aws_medallion_datalake_spark.operators.compact import compact
from aws_medallion_datalake_spark.operators.merge import merge_into
from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
from aws_medallion_datalake_spark.sources.generator import generate_updates
from aws_medallion_datalake_spark.sources.tableformat import (
    BLOOM_COLS_PROP,
    Table,
    bloom_write_options,
)


def _blooms(spark, table: Table, column: str):
    """{rel_path: bloom | None} for the current snapshot's data files,
    read with parquet-mr (the reader Spark itself uses)."""
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for rel in table.manifest_pdf()["path"]:
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(table.root, rel))
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            block = reader.getRowGroups().get(0)
            cmd = next(
                c
                for c in block.getColumns()
                if c.getPath().toDotString() == column
            )
            if cmd.getBloomFilterOffset() < 0:
                bloom = None
            else:
                bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cmd)
            yield rel, bloom, jvm
        finally:
            reader.close()


def _find(bloom, jvm, s: str) -> bool:
    b = jvm.org.apache.parquet.io.api.Binary.fromString(s)
    return bool(bloom.findHash(bloom.hash(b)))


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom") / "t")
    return bronze_ingest(spark, root, 800, n_files=8, n_dates=2)


def test_ingest_writes_discriminating_blooms(spark, table):
    ids = {r["image_id"] for r in table.scan(spark, columns=["image_id"]).collect()}
    present = sorted(ids)[0]
    n = 0
    for rel, bloom, jvm in _blooms(spark, table, "image_id"):
        assert bloom is not None, f"no bloom in {rel}"
        hits = sum(_find(bloom, jvm, f"no-such-{i:06d}") for i in range(50))
        assert hits <= 5, f"absent-key FPR too high in {rel}: {hits}/50"
        n += 1
    assert n >= 8
    # the file holding `present` answers True for it
    found = any(
        _find(bloom, jvm, present)
        for _, bloom, jvm in _blooms(spark, table, "image_id")
    )
    assert found


def test_rewrites_preserve_blooms(spark, table):
    compact(table, spark, target_file_size_bytes=1 << 20)
    cluster(table, spark, curve="morton")
    src = generate_updates(spark, 800, 40, 20, n_files=2)
    merge_into(table, spark, src, target_file_size_bytes=1 << 20)
    for rel, bloom, _ in _blooms(spark, table, "image_id"):
        assert bloom is not None, f"rewrite dropped bloom in {rel}"


def test_point_lookup_correct_through_blooms(spark, table):
    some = table.scan(spark).select("image_id").head()["image_id"]
    assert table.scan(spark, predicates=[("image_id", "=", some)]).count() == 1
    assert (
        table.scan(spark, predicates=[("image_id", "=", "img-nonexistent")]).count()
        == 0
    )


def test_tables_without_the_property_write_no_blooms(spark, tmp_path):
    t = Table.create(
        str(tmp_path / "plain"), "id string, v long", stats_cols=["id"]
    )
    assert bloom_write_options(t.metadata()) == {}
    df = spark.range(100).selectExpr("cast(id as string) as id", "id as v")
    t.commit("append", t.write_files(df.coalesce(1)))
    for rel, bloom, _ in _blooms(spark, t, "id"):
        assert bloom is None


def test_property_parsing_multi_column():
    from aws_medallion_datalake_spark.sources.tableformat import TableMetadata

    meta = TableMetadata(
        table_uuid="x", location="x", schema_ddl="a string, b string",
        partition_cols=[], stats_cols=[], current_snapshot_id=None,
        snapshots=[], properties={BLOOM_COLS_PROP: "a, b"},
    )
    opts = bloom_write_options(meta)
    assert opts["parquet.bloom.filter.enabled#a"] == "true"
    assert opts["parquet.bloom.filter.enabled#b"] == "true"
