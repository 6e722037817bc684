"""make_big_sf.py invariants: the K-times-larger star must keep exact
row multiples, unique primary keys, and lineitem->orders referential
integrity (l_orderkey reuses orders' offset). DuckDB-only — no Spark
session needed."""

import subprocess
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def big(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfbig"))
    subprocess.run(
        [sys.executable, "tools/make_big_sf.py", out, "3"],
        check=True, capture_output=True, text=True,
    )
    return out


def test_row_counts_are_exact_multiples(big):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        n_src = con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_big = con.execute(f"SELECT count(*) FROM '{big}/{t}.parquet'").fetchone()[0]
        assert n_big == 3 * n_src, t


def test_primary_keys_stay_unique(big):
    con = duckdb.connect()
    for t, k in (("orders", "o_orderkey"), ("events", "event_id"),
                 ("documents", "doc_id"), ("embeddings", "vec_id")):
        dup = con.execute(
            f"SELECT count(*) - count(DISTINCT {k}) FROM '{big}/{t}.parquet'"
        ).fetchone()[0]
        assert dup == 0, t


def test_lineitem_orders_referential_integrity(big):
    # every replicated lineitem must still join its order: the l_orderkey
    # offset is the o_orderkey offset by construction
    con = duckdb.connect()
    orphans = con.execute(
        f"""
        SELECT count(*) FROM '{big}/lineitem.parquet' l
        LEFT JOIN '{big}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        """
    ).fetchone()[0]
    assert orphans == 0


def test_dims_unchanged(big):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part"):
        diff = con.execute(
            f"""
            SELECT count(*) FROM (
              (SELECT * FROM '{SRC}/{t}.parquet'
               EXCEPT SELECT * FROM '{big}/{t}.parquet')
              UNION ALL
              (SELECT * FROM '{big}/{t}.parquet'
               EXCEPT SELECT * FROM '{SRC}/{t}.parquet')
            )
            """
        ).fetchone()[0]
        assert diff == 0, t
