"""Build a scaled-up SF directory from /root/testdata/sf0.1 for
larger-scale query benchmarking (BENCH/NOTES_r4 §5).

The driver ships sf0.001/0.01/0.1 only; round-3 VERDICT asked for
headline query numbers at >= 4x the r3 table bytes. This tool
synthesizes a K-times-larger star deterministically from the ORIGINAL
driver data — no external data, no RNG:

- Fact tables (orders, lineitem, events, documents, embeddings) are
  replicated K times; copy i offsets each table's PRIMARY key by
  i * OFF (a power of 10 above the key's max) so keys stay unique.
  l_orderkey uses the SAME offset as o_orderkey, so every lineitem
  still joins its order; foreign keys into dims are left untouched,
  so dim joins keep their selectivity and the fact side grows K-fold
  — exactly how a fact table grows in production.
- Dim tables (region, nation, customer, supplier, part) are copied
  as-is.

DuckDB does the rewrite (no JVM, cheap on a couple of cores); output
parquet row groups are ~122k rows, so Spark splits each file across
executors as usual.

Usage: python tools/make_big_sf.py <out_dir> [K]   (default K=5)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]
# table -> (primary key offset column(s)); l_orderkey reuses orders' OFF
FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def key_offset(con: duckdb.DuckDBPyConnection, table: str, col: str) -> int:
    mx = con.execute(
        f"SELECT max({col}) FROM '{SRC}/{table}.parquet'"
    ).fetchone()[0]
    # integral digit count — float log10 imprecision near exact powers
    # of 10 could yield an offset <= max key (round-4 ADVICE)
    off = 10 ** len(str(int(mx)))
    assert off > mx, (off, mx)
    return off


def main() -> None:
    out = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # one offset per key DOMAIN: orderkey's offset comes from orders and
    # is reused by lineitem so the join keys replicate consistently
    off = {
        "o_orderkey": key_offset(con, "orders", "o_orderkey"),
        "event_id": key_offset(con, "events", "event_id"),
        "doc_id": key_offset(con, "documents", "doc_id"),
        "vec_id": key_offset(con, "embeddings", "vec_id"),
    }
    off["l_orderkey"] = off["o_orderkey"]
    for t in DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in FACT_KEYS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i * {off[c]} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"""
            COPY (
              SELECT {sel}
              FROM '{SRC}/{t}.parquet', range({k}) r(i)
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
            """
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows (x{k})")


if __name__ == "__main__":
    main()
