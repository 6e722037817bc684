"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship star-schema query on sf0.001.
``queries()`` — one callable per implemented operator family from
SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity search, text analysis, image maintenance).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
query; image/maintenance queries (engine-internal, non-SQL) are
rows-only checks.

Column-name parity rule: every computed column is aliased identically
in the Spark plan and the oracle SQL. Derived ints are cast to INT on
both sides; float aggregates are rounded identically on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _hex15_to_long(c):
    """Low-60-bit integer of an md5 hex digest — matches DuckDB's
    CAST('0x' || substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(c, 1, 15), 16, 10).cast("long")


_STOPWORDS = ("the", "a")

# 3-word shingles over whitespace-tokenized text (docs with >= 3 tokens)
_SHINGLE_EXPR = (
    "transform(sequence(1, size(toks) - 2), "
    "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), "
    "element_at(toks, i + 2)))"
)


def _doc_tokens(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .withColumn("toks", F.split(F.trim(F.col("text")), " "))
        .withColumn("n_tokens", F.size("toks"))
    )


def _doc_shingles(spark, sf_dir):
    """(doc_id, shingle) distinct 3-gram word shingles."""
    return (
        _doc_tokens(spark, sf_dir)
        .filter(F.col("n_tokens") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLE_EXPR)).alias("shingle"))
        .distinct()
    )


_SHINGLE_SQL = """
    SELECT DISTINCT doc_id,
           unnest([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                   for i in range(1, len(toks) - 1)]) AS shingle
    FROM (
        SELECT doc_id, string_split(trim(text), ' ') AS toks
        FROM documents
        WHERE len(string_split(trim(text), ' ')) >= 3
    )
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: star-schema revenue rollup (SURVEY.md §2.3 J1/J4 +
    §2.4 A4) — customer ⋈ nation ⋈ region ⋈ orders with broadcast dims."""
    sf_dir = "/root/testdata/sf0.001"
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# relational operator queries (SURVEY.md §2)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """A4 multi-measure grouped agg (TPC-H Q1 shape) + F11 round."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _sql_pricing_summary():
    return """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """


def q_top_orders(spark, sf_dir):
    """O1 ORDER BY ... LIMIT top-k (deterministic tie-break on key)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(10)
    )


def _sql_top_orders():
    return """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 10
    """


def q_segment_revenue(spark, sf_dir):
    """J1 fact⋈dim broadcast join + A4 grouped measures."""
    orders = _t(spark, sf_dir, "orders")
    customer = F.broadcast(_t(spark, sf_dir, "customer"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def _sql_segment_revenue():
    return """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """


def q_region_rollup(spark, sf_dir):
    """J4 dim⋈dim⋈dim chain + A4."""
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
            F.countDistinct("n_name").alias("n_nations"),
        )
    )


def _sql_region_rollup():
    return """
        SELECT r_name, count(*) AS n_customers,
               round(avg(c_acctbal), 2) AS avg_acctbal,
               count(DISTINCT n_name) AS n_nations
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """


def q_conditional_agg(spark, sf_dir):
    """A5 SUM(CASE WHEN)/COUNT(CASE WHEN) + P6 status predicate."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "n_finished"
            ),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            F.count("*").alias("n_total"),
        )
    )


def _sql_conditional_agg():
    return """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_finished,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
               count(*) AS n_total
        FROM orders GROUP BY o_orderpriority
    """


def q_distinct_agg(spark, sf_dir):
    """A6 COUNT(DISTINCT) incl. concat-key distinct."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(
                F.concat(F.col("o_custkey").cast("string"), F.lit("|"), F.col("o_orderpriority"))
            ).alias("n_cust_prio"),
        )
    )


def _sql_distinct_agg():
    return """
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(DISTINCT concat(CAST(o_custkey AS VARCHAR), '|', o_orderpriority)) AS n_cust_prio
        FROM orders GROUP BY o_orderstatus
    """


def q_table_counts(spark, sf_dir):
    """A8/U1 count-per-table UNION ALL report."""
    names = ["customer", "orders", "lineitem", "part", "supplier"]
    dfs = [
        _t(spark, sf_dir, n).agg(F.count("*").alias("n_rows")).select(
            F.lit(n).alias("tabela"), "n_rows"
        )
        for n in names
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _sql_table_counts():
    parts = [
        f"SELECT '{n}' AS tabela, count(*) AS n_rows FROM {n}"
        for n in ["customer", "orders", "lineitem", "part", "supplier"]
    ]
    return " UNION ALL ".join(parts)


def q_segment_share(spark, sf_dir):
    """W1 percent-of-total window over an aggregate."""
    agg = _t(spark, sf_dir, "customer").groupBy("c_mktsegment").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy()
    return agg.select(
        "c_mktsegment",
        "n",
        F.round(F.col("n") * 100.0 / F.sum("n").over(w), 2).alias("pct"),
    )


def _sql_segment_share():
    return """
        SELECT c_mktsegment, n, round(n * 100.0 / sum(n) OVER (), 2) AS pct
        FROM (SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment)
    """


def q_monthly_growth(spark, sf_dir):
    """W2 lag-style MoM growth + F20 calendar derivation."""
    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("growth"),
    )


def _sql_monthly_growth():
    return """
        SELECT month, revenue,
               round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS growth
        FROM (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        )
    """


def q_acctbal_bands(spark, sf_dir):
    """F6 CASE WHEN bucketing (age-band pattern)."""
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(band.alias("band"), "c_acctbal")
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


def _sql_acctbal_bands():
    return """
        SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 3000 THEN 'low'
                    WHEN c_acctbal < 7000 THEN 'mid'
                    ELSE 'high' END AS band,
               count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
        FROM customer GROUP BY 1
    """


def q_orders_calendar(spark, sf_dir):
    """F7/F8/F20 calendar attrs (year/quarter/weekend flag) + agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("ano"),
            F.quarter("o_orderdate").cast("int").alias("trimestre"),
            F.dayofweek("o_orderdate").isin(1, 7).alias("eh_fim_semana"),
            "o_totalprice",
        )
        .groupBy("ano", "trimestre", "eh_fim_semana")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


def _sql_orders_calendar():
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark: 1=Sunday..7=Saturday.
    return """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS ano,
               CAST(quarter(o_orderdate) AS INTEGER) AS trimestre,
               dayofweek(o_orderdate) IN (0, 6) AS eh_fim_semana,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2, 3
    """


def q_ship_window(spark, sf_dir):
    """P4 date-range predicate + P2 not-null filter + pushdown-friendly plan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & F.col("l_returnflag").isNotNull()
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


def _sql_ship_window():
    return """
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_returnflag IS NOT NULL
        GROUP BY l_returnflag
    """


def q_part_pruned(spark, sf_dir):
    """P3/P7 value-exclusion predicates + manual column pruning."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter((F.col("p_size").between(10, 30)) & (F.col("p_brand") != "Brand#3"))
        .groupBy("p_brand", "p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


def _sql_part_pruned():
    return """
        SELECT p_brand, p_type, count(*) AS n_parts,
               round(avg(p_retailprice), 2) AS avg_price
        FROM part
        WHERE p_size BETWEEN 10 AND 30 AND p_brand != 'Brand#3'
        GROUP BY p_brand, p_type
    """


def q_string_cleanup(spark, sf_dir):
    """F1/F2/F10/F12/F13 string kernel: trim, control-char strip,
    digits-only, concat, coalesce."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim(F.regexp_replace(F.col("c_name"), "[\\t\\n\\r]", "")).alias("name_clean"),
        F.regexp_replace(F.col("c_name"), "[^0-9]", "").alias("name_digits"),
        F.concat(
            F.coalesce(F.col("c_mktsegment"), F.lit("")),
            F.lit("-"),
            F.col("c_nationkey").cast("string"),
        ).alias("seg_nation"),
    )


def _sql_string_cleanup():
    return r"""
        SELECT c_custkey,
               trim(regexp_replace(c_name, '[\t\n\r]', '', 'g')) AS name_clean,
               regexp_replace(c_name, '[^0-9]', '', 'g') AS name_digits,
               concat(coalesce(c_mktsegment, ''), '-', CAST(c_nationkey AS VARCHAR)) AS seg_nation
        FROM customer
    """


def q_events_hourly(spark, sf_dir):
    """F8 HOUR(ts)/DATE(ts) derived grouping over the events table."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type", F.hour("ts").cast("int").alias("hora")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def _sql_events_hourly():
    return """
        SELECT event_type, CAST(hour(ts) AS INTEGER) AS hora,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """


def q_events_json(spark, sf_dir):
    """F17/F18 JSON-string parse (from_json) + aggregate on extracted field."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json(F.col("props"), "k int").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


def _sql_events_json():
    return """
        SELECT event_type,
               count(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_with_k,
               round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k,
               max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        FROM events GROUP BY event_type
    """


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]


def q_quality_profile(spark, sf_dir):
    """A7 one-pass column-completeness profile (reference:
    gold_agilean.py:103-162 without its O(columns) scan loop)."""
    from aws_medallion_datalake_spark.pipeline.medallion import quality_profile

    df = _t(spark, sf_dir, "orders").select(*_PROFILE_COLS)
    return quality_profile(df).withColumnRenamed("column", "col_name")


def _sql_quality_profile():
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""SELECT '{c}' AS col_name, count({c}) AS non_null, count(*) AS total,
                round(count({c}) * 100.0 / count(*), 2) AS completeness_pct,
                CASE WHEN count({c}) * 100.0 / count(*) >= 80 THEN 'GOOD'
                     WHEN count({c}) * 100.0 / count(*) >= 50 THEN 'FAIR'
                     ELSE 'POOR' END AS status
                FROM orders"""
        )
    return " UNION ALL ".join(parts)


def q_silver_casts(spark, sf_dir):
    """F5/F14/F15/F16 silver-layer cast kernel: invalid-value sentinel →
    null, S/N-style boolean, unix-seconds → timestamp, typed casts
    (reference: silver_digit_clean.py:72-75 + TRANSFORMACAO rules)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_clean"),
        (F.col("o_orderstatus") == "O").alias("is_open"),
        F.from_unixtime(F.col("o_orderkey") + F.lit(1_500_000_000)).alias("fake_ts"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.round(F.col("o_totalprice").cast("double") / 100.0, 4).alias("price_h"),
    )


def _sql_silver_casts():
    return """
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P') AS status_clean,
               o_orderstatus = 'O' AS is_open,
               strftime(to_timestamp(o_orderkey + 1500000000), '%Y-%m-%d %H:%M:%S') AS fake_ts,
               CAST(floor(o_totalprice) AS BIGINT) AS price_int,
               round(CAST(o_totalprice AS DOUBLE) / 100.0, 4) AS price_h
        FROM orders
    """


# ---------------------------------------------------------------------------
# training-data pipeline: dedup / fingerprint / text analysis
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup via content fingerprint (hash-groupBy)."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        d.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
            (F.count("*") - F.countDistinct("fp")).alias("n_dupes"),
        )
    )


def _sql_dedup_exact():
    return """
        SELECT source, count(*) AS n_docs,
               count(DISTINCT md5(lower(trim(text)))) AS n_distinct,
               count(*) - count(DISTINCT md5(lower(trim(text)))) AS n_dupes
        FROM documents GROUP BY source
    """


def q_doc_fingerprint(spark, sf_dir):
    """Per-document 60-bit content fingerprint (md5-based rolling id)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _hex15_to_long(F.md5(F.lower(F.trim(F.col("text"))))).alias("fingerprint"),
    )


def _sql_doc_fingerprint():
    return """
        SELECT doc_id,
               CAST('0x' || substr(md5(lower(trim(text))), 1, 15) AS BIGINT) AS fingerprint
        FROM documents
    """


def q_train_val_split(spark, sf_dir):
    """Deterministic train/val/test assignment — a training-data pipeline
    staple the reference lacks entirely: split membership must be a pure
    function of the document id (stable across runs, machines, and
    engine versions), never ``rand()``. Bucket = low-60-bit md5(doc_id)
    mod 100; <90 train, <95 val, else test. Stratified report per
    source so class drift between splits is visible. Scales: one
    narrow-column scan + hash agg, no shuffle beyond the groupBy."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.pmod(
        _hex15_to_long(F.md5(F.col("doc_id").cast("string"))), F.lit(100)
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


def _sql_train_val_split():
    return """
        SELECT source,
               CASE WHEN b < 90 THEN 'train'
                    WHEN b < 95 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs
        FROM (
            SELECT source,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
            FROM documents
        )
        GROUP BY 1, 2
    """


def q_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer) aggregated per source."""
    d = _doc_tokens(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).cast("double").alias("avg_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )


def _sql_token_stats():
    return r"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
                 AS total_tokens,
               CAST(round(avg(len(string_split(trim(text), ' '))), 2)
                    AS DOUBLE) AS avg_tokens,
               max(len(string_split(trim(text), ' '))) AS max_tokens
        FROM documents GROUP BY source
    """


# GPT-2-style pre-tokenizer, minus contra-RE2 constructs (no lookahead,
# ASCII classes) so Spark's Java regex and DuckDB's RE2 count identically
# (verified match-for-match against Python re on the documents table).
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +"


def q_bpe_token_stats(spark, sf_dir):
    """Token counting with a BPE-ish pre-tokenizer regex (the GPT-2
    pretokenizer shape) vs the whitespace tokenizer, per source.

    JVM-side ``regexp_count`` — no Python row path; at 10^12 docs this
    is a single partial+final hash aggregate over a projected column.
    """
    d = _t(spark, sf_dir, "documents")
    n_bpe = F.regexp_count("text", F.lit(_BPE_PAT))
    n_ws = F.size(F.split(F.trim("text"), " "))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_bpe.cast("bigint")).alias("total_bpe"),
        F.sum(n_ws.cast("bigint")).alias("total_ws"),
        F.round(
            F.sum(n_bpe.cast("double")) / F.sum(n_ws.cast("double")), 4
        ).alias("bpe_per_ws"),
    )


def _sql_bpe_token_stats():
    sqlpat = _BPE_PAT.replace("'", "''")
    return f"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '{sqlpat}'))) AS BIGINT)
                 AS total_bpe,
               CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
                 AS total_ws,
               round(sum(len(regexp_extract_all(text, '{sqlpat}'))::DOUBLE)
                     / sum(len(string_split(trim(text), ' '))::DOUBLE), 4)
                 AS bpe_per_ws
        FROM documents GROUP BY source
    """


def q_doc_quality(spark, sf_dir):
    """Quality scoring: length + stopword-ratio heuristic → class."""
    d = _doc_tokens(spark, sf_dir)
    stop_n = F.size(F.filter("toks", lambda t: t.isin(*_STOPWORDS)))
    d = d.withColumn("stop_ratio", stop_n / F.col("n_tokens"))
    score = (
        F.least(F.col("n_tokens") / 200.0, F.lit(1.0)) * 0.6
        + (1.0 - F.least(F.col("stop_ratio") * 5.0, F.lit(1.0))) * 0.4
    )
    d = d.withColumn("score", score)
    status = (
        F.when(F.col("score") >= 0.7, "GOOD")
        .when(F.col("score") >= 0.4, "FAIR")
        .otherwise("POOR")
    )
    return (
        d.select("lang", status.alias("status"), "score")
        .groupBy("lang", "status")
        .agg(F.count("*").alias("n"), F.round(F.avg("score"), 4).alias("avg_score"))
    )


def _sql_doc_quality():
    return """
        WITH t AS (
            SELECT lang,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(list_filter(string_split(trim(text), ' '),
                                   x -> x IN ('the', 'a'))) AS stop_n
            FROM documents
        ), s AS (
            SELECT lang,
                   least(n_tokens / 200.0, 1.0) * 0.6
                   + (1.0 - least((stop_n / n_tokens) * 5.0, 1.0)) * 0.4 AS score
            FROM t
        )
        SELECT lang,
               CASE WHEN score >= 0.7 THEN 'GOOD'
                    WHEN score >= 0.4 THEN 'FAIR'
                    ELSE 'POOR' END AS status,
               count(*) AS n, round(avg(score), 4) AS avg_score
        FROM s GROUP BY 1, 2
    """


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword-ratio n-gram proxy) vs labeled lang."""
    d = _doc_tokens(spark, sf_dir)
    stop_n = F.size(F.filter("toks", lambda t: t.isin(*_STOPWORDS)))
    ratio = stop_n / F.col("n_tokens")
    pred = (
        F.when(ratio >= 0.08, "en").when(ratio >= 0.04, "mix").otherwise("other")
    )
    return (
        d.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


def _sql_lang_id():
    return """
        WITH t AS (
            SELECT lang,
                   len(list_filter(string_split(trim(text), ' '),
                                   x -> x IN ('the', 'a')))
                   / len(string_split(trim(text), ' '))::DOUBLE AS ratio
            FROM documents
        )
        SELECT lang,
               CASE WHEN ratio >= 0.08 THEN 'en'
                    WHEN ratio >= 0.04 THEN 'mix'
                    ELSE 'other' END AS predicted,
               count(*) AS n
        FROM t GROUP BY 1, 2
    """


def q_unigram_logppl(spark, sf_dir):
    """Corpus unigram log-perplexity scorer (CCNet-style quality
    signal, ref `gold_agilean.py`-class analytics re-targeted at
    pretraining curation): fit a unigram LM on the corpus itself, then
    score every document by its mean token ``-log2 p(token)`` and roll
    the scores up per source.

    100 TB shape: ONE shuffle to count the vocabulary (partial+final
    hash agg over the exploded token column), and the model — the
    (token, count) table — is vocabulary-sized, not corpus-sized, so
    it BROADCASTS back onto the token stream (`.explain` shows
    BroadcastHashJoin; no shuffle of the 10^12-token fact side). The
    corpus-total denominator is a one-row agg cross-joined broadcast,
    never a driver collect.
    """
    tok = (
        _doc_tokens(spark, sf_dir)
        .select("doc_id", "source", F.explode("toks").alias("token"))
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("tot"))
    model = counts.crossJoin(F.broadcast(total))
    scored = tok.join(F.broadcast(model), "token").select(
        "doc_id",
        "source",
        (-F.log2(F.col("cnt") / F.col("tot"))).alias("nll"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.first("source").alias("source"), F.avg("nll").alias("logppl")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("logppl"), 4).alias("avg_logppl"),
        F.round(F.min("logppl"), 4).alias("min_logppl"),
        F.round(F.max("logppl"), 4).alias("max_logppl"),
    )


def _sql_unigram_logppl():
    return """
        WITH tok AS (
            SELECT doc_id, source,
                   unnest(string_split(trim(text), ' ')) AS token
            FROM documents
        ), cnt AS (
            SELECT token, count(*) AS c FROM tok GROUP BY 1
        ), tot AS (
            SELECT sum(c)::DOUBLE AS t FROM cnt
        ), per_doc AS (
            SELECT doc_id, any_value(source) AS source,
                   avg(-log2(c / t)) AS logppl
            FROM tok JOIN cnt USING (token) CROSS JOIN tot
            GROUP BY doc_id
        )
        SELECT source, count(*) AS n_docs,
               round(avg(logppl), 4) AS avg_logppl,
               round(min(logppl), 4) AS min_logppl,
               round(max(logppl), 4) AS max_logppl
        FROM per_doc GROUP BY source
    """


def q_dup_ngram_frac(spark, sf_dir):
    """Duplicated-n-gram-fraction diagnostic (the Dolma/RefinedWeb
    dedup statistic): for every document, the fraction of its 3-gram
    shingle OCCURRENCES whose shingle also appears in at least one
    OTHER document; per-source average plus a count of heavy-dup docs
    (fraction >= 0.5).

    100 TB shape: document-frequency is ONE shuffle keyed on the
    shingle (partial countDistinct per partition first); the join back
    onto the occurrence stream re-uses the same shingle key, so AQE
    plans it as a shuffle-hash join with no extra exchange on the
    occurrence side, and the per-doc rollup is the only other shuffle.
    A hot shingle (stopword trigram) skews the doc-freq key — at scale
    the mitigation is the salted two-level countDistinct; here the
    3-word key space is already wide enough that AQE's skew split
    covers it.
    """
    occ = (
        _doc_tokens(spark, sf_dir)
        .filter(F.col("n_tokens") >= 3)
        .select("doc_id", "source", F.explode(F.expr(_SHINGLE_EXPR)).alias("shingle"))
    )
    docfreq = occ.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("docs")
    )
    per_doc = (
        occ.join(docfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            (
                F.sum(F.when(F.col("docs") > 1, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double")
            ).alias("frac"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("frac"), 4).alias("avg_dup_frac"),
        F.sum(F.when(F.col("frac") >= 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("heavy_dup_docs"),
    )


def _sql_dup_ngram_frac():
    return """
        WITH t AS (
            SELECT doc_id, source, string_split(trim(text), ' ') AS toks
            FROM documents
        ), occ AS (
            SELECT doc_id, source,
                   unnest([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                           for i in range(1, len(toks) - 1)]) AS shingle
            FROM t WHERE len(toks) >= 3
        ), df AS (
            SELECT shingle, count(DISTINCT doc_id) AS docs
            FROM occ GROUP BY 1
        ), per_doc AS (
            SELECT doc_id, any_value(source) AS source,
                   sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE AS frac
            FROM occ JOIN df USING (shingle) GROUP BY doc_id
        )
        SELECT source, count(*) AS n_docs,
               round(avg(frac), 4) AS avg_dup_frac,
               CAST(sum(CASE WHEN frac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS heavy_dup_docs
        FROM per_doc GROUP BY source
    """


def q_zipf_vocab_stats(spark, sf_dir):
    """Vocabulary statistics per source: vocab size, hapax-legomenon
    count (tokens seen exactly once within the source), type-token
    ratio — the Zipf-shape profile used to spot degenerate or
    machine-generated text partitions in a pretraining corpus.

    100 TB shape: one shuffle keyed (source, token) with map-side
    partial counts, then a per-source rollup of the vocabulary-sized
    intermediate — the second shuffle moves |vocab| rows, not corpus
    rows.
    """
    tok = (
        _doc_tokens(spark, sf_dir)
        .select("source", F.explode("toks").alias("token"))
    )
    per_token = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_token.groupBy("source").agg(
        F.sum("cnt").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
        F.round(F.count(F.lit(1)) / F.sum("cnt").cast("double"), 6).alias(
            "type_token_ratio"
        ),
    )


def _sql_zipf_vocab_stats():
    return """
        WITH tok AS (
            SELECT source, unnest(string_split(trim(text), ' ')) AS token
            FROM documents
        ), per_token AS (
            SELECT source, token, count(*) AS cnt FROM tok GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(cnt) AS BIGINT) AS total_tokens,
               count(*) AS vocab,
               CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hapax,
               round(count(*) / sum(cnt)::DOUBLE, 6) AS type_token_ratio
        FROM per_token GROUP BY source
    """


# PII patterns (identical semantics in Java regex and DuckDB RE2: no
# lookaround, no backrefs). Applied with replace-ALL on both sides
# (DuckDB needs the explicit 'g' flag; Spark regexp_replace is global).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b555-[0-9]{3,4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def q_pii_scrub(spark, sf_dir):
    """PII redaction — the scrub stage every pretraining pipeline runs
    before export: emails / phone numbers / IPv4s replaced with typed
    placeholder tokens via pure ``regexp_replace`` (JVM whole-stage
    codegen, one linear pass, no UDF — at 100 TB this is a map-only
    stage with zero shuffle until the tiny final agg). The corpus is
    synthetic word soup, so deterministic PII is injected from doc_id
    first — BOTH sides inject identically, keeping the oracle exact.
    Redaction order matters (emails before IPs, so 'user@10.0.0.1'
    domains never half-match); counts come from regexp_extract_all on
    the pre-scrub text. Verified content-level via a 60-bit md5
    fingerprint of the scrubbed text summed mod 1e6+3."""
    d = _t(spark, sf_dir, "documents")
    pii = F.concat_ws(
        "",
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com call 555-0"),
        F.format_string("%03d", (F.col("doc_id") % 900).cast("int")),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 3) % 250).cast("string"),
    )
    d = d.withColumn("txt", pii)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    # F.lit patterns (not F.expr/SQL literals): Spark SQL string literals
    # eat backslashes, so '\b' would become a backspace char there
    def _n(pat):
        return F.size(
            F.regexp_extract_all(F.col("txt"), F.lit(pat), F.lit(0))
        )

    n_email, n_phone, n_ip = _n(_PII_EMAIL), _n(_PII_PHONE), _n(_PII_IP)
    return (
        d.select(
            "source",
            clean.alias("clean"),
            n_email.alias("e"),
            n_phone.alias("p"),
            n_ip.alias("i"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("e").alias("emails"),
            F.sum("p").alias("phones"),
            F.sum("i").alias("ips"),
            F.sum(F.length("clean")).alias("clean_chars"),
            F.sum(_hex15_to_long(F.md5(F.col("clean"))) % 1000003).alias(
                "content_fp"
            ),
        )
    )


def _sql_pii_scrub():
    email, phone, ip = _PII_EMAIL, _PII_PHONE, _PII_IP
    return f"""
        WITH t AS (
            SELECT source,
                   text || ' contact user' || doc_id || '@mail'
                        || (doc_id % 7) || '.example.com call 555-0'
                        || lpad((doc_id % 900)::VARCHAR, 3, '0')
                        || ' ip 10.0.' || (doc_id % 250) || '.'
                        || ((doc_id * 3) % 250) AS txt
            FROM documents
        ), s AS (
            SELECT source,
                   regexp_replace(regexp_replace(regexp_replace(
                       txt, '{email}', '<EMAIL>', 'g'),
                       '{phone}', '<PHONE>', 'g'),
                       '{ip}', '<IP>', 'g') AS clean,
                   len(regexp_extract_all(txt, '{email}')) AS e,
                   len(regexp_extract_all(txt, '{phone}')) AS p,
                   len(regexp_extract_all(txt, '{ip}')) AS i
            FROM t
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(e) AS BIGINT) AS emails,
               CAST(sum(p) AS BIGINT) AS phones,
               CAST(sum(i) AS BIGINT) AS ips,
               CAST(sum(len(clean)) AS BIGINT) AS clean_chars,
               CAST(sum(CAST('0x' || substr(md5(clean), 1, 15) AS BIGINT)
                        % 1000003) AS BIGINT) AS content_fp
        FROM s GROUP BY source
    """


def q_url_blocklist(spark, sf_dir):
    """Domain-blocklist filtering — the URL-level quality gate of a crawl
    pipeline: derive each doc's host (deterministic from source/doc_id,
    both sides identical), keep docs whose host is NOT on the blocklist,
    and profile the survivors per TLD. The blocklist is a tiny in-memory
    dim BROADCAST to every executor (left_anti) — the corpus side never
    shuffles; at 100 TB this is a map-side anti-join, the same plan as
    the decontamination entry."""
    blocked = ["src1.example.com", "src4.example.net", "src7.example.org"]
    d = _t(spark, sf_dir, "documents")
    tld = (
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "net")
        .otherwise("org")
    )
    d = d.withColumn(
        "host", F.concat_ws("", F.col("source"), F.lit(".example."), tld)
    )
    bl = spark.createDataFrame([(h,) for h in blocked], "host string")
    kept = d.join(F.broadcast(bl), "host", "left_anti")
    return (
        kept.withColumn("tld", F.substring_index("host", ".", -1))
        .groupBy("tld")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").alias("chars"),
        )
    )


def _sql_url_blocklist():
    return """
        WITH t AS (
            SELECT *,
                   source || '.example.' ||
                   CASE WHEN doc_id % 3 = 0 THEN 'com'
                        WHEN doc_id % 3 = 1 THEN 'net'
                        ELSE 'org' END AS host
            FROM documents
        )
        SELECT split_part(host, '.', 3) AS tld,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM t
        WHERE host NOT IN ('src1.example.com', 'src4.example.net',
                           'src7.example.org')
        GROUP BY 1
    """


def q_tfidf_keywords(spark, sf_dir):
    """Per-document TF-IDF top-k keywords — the topical-mining stage of a
    training-data pipeline. One explode pass builds (doc, token) term
    frequencies (partial+final hash agg); document frequencies are a
    vocabulary-sized aggregate joined back (vocab ≪ corpus, broadcast at
    scale); smoothed idf = ln((N+1)/(df+1)). Top-3 per doc via one
    row_number window partitioned by doc — no global sort. The ordering
    is engine-deterministic: tf and df are integers, so equal (tf, df)
    means bit-equal scores, and the (score DESC, token ASC) tie-break is
    total."""
    d = _doc_tokens(spark, sf_dir)
    n_docs = _t(spark, sf_dir, "documents").count()
    tf = (
        d.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = tf.join(F.broadcast(dfreq), "token").withColumn(
        "score",
        F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("score", 4).alias("score"),
        )
    )


def _sql_tfidf_keywords():
    return """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
            FROM documents
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf
            FROM tok GROUP BY 1, 2
        ), dfreq AS (
            SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
        ), scored AS (
            SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                   tf.tf * ln(((SELECT count(*) FROM documents) + 1.0)
                              / (dfreq.df + 1.0)) AS score
            FROM tf JOIN dfreq USING (token)
        )
        SELECT doc_id, CAST(rk AS INT) AS rk, token,
               CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
               round(score, 4) AS score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, token ASC
            ) AS rk
            FROM scored
        )
        WHERE rk <= 3
    """


_MIN_LONG = -9223372036854775808  # bit 63's signed-int64 weight


def q_simhash(spark, sf_dir):
    """Full 64-bit SimHash per document (near-dup key). Per-token hash
    bits come from md5: bits 0-59 from hex digits 1-15, bits 60-63 from
    hex digit 16 — so all 64 signature bits are independent. The sign
    bit (63) is assembled with the signed-int64 weight so the result is
    a true 64-bit signature in a Spark LongType / DuckDB BIGINT."""
    d = _doc_tokens(spark, sf_dir)
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    md5 = F.md5("tok")
    h_lo = _hex15_to_long(md5)  # bits 0-59
    h_hi = F.conv(F.substring(md5, 16, 1), 16, 10).cast("long")  # bits 60-63
    bit_sums = [
        F.sum(
            F.shiftright(h_lo if b < 60 else h_hi, b if b < 60 else b - 60)
            .bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(64):
        weight = F.lit(_MIN_LONG) if b == 63 else F.lit(1 << b)
        term = F.when(F.col(f"b{b}") > 0, weight).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash64"))


def _sql_simhash():
    def src(b):
        return f"((h_lo >> {b}) & 1)" if b < 60 else f"((h_hi >> {b - 60}) & 1)"

    bit_sums = ", ".join(f"sum({src(b)} * 2 - 1) AS b{b}" for b in range(64))
    sim = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({_MIN_LONG if b == 63 else (1 << b)} AS BIGINT) ELSE 0 END)"
        for b in range(64)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(t.tok), 1, 15) AS BIGINT) AS h_lo,
                   CAST('0x' || substr(md5(t.tok), 16, 1) AS BIGINT) AS h_hi
            FROM documents, unnest(string_split(trim(text), ' ')) AS t(tok)
        ), agg AS (
            SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id
        )
        SELECT doc_id, CAST({sim} AS BIGINT) AS simhash64 FROM agg
    """


def q_simhash_hamming_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS: 64-bit simhash → banded Hamming join
    (4 bands x 16 bits; pigeonhole-exact for distance <= 3) → exact
    bit_count filter. The operator that turns the `simhash` fingerprint
    into an actual dedup stage (Manku et al. WWW'07); candidates are
    ~1.4% of all-pairs at this SF. Oracle is the brute-force all-pairs
    join — band recall is provably exact, so results must match."""
    from aws_medallion_datalake_spark.functions.hamming import hamming_pairs

    sim = q_simhash(spark, sf_dir)
    return hamming_pairs(sim, "doc_id", "simhash64", max_distance=3).orderBy(
        "doc_id_a", "doc_id_b"
    )


def _sql_simhash_hamming_pairs():
    return f"""
        WITH sim AS ({_sql_simhash()})
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3
        ORDER BY doc_id_a, doc_id_b
    """


_N_MINHASH = 8  # 2 bands x 4 rows


def q_minhash_signature(spark, sf_dir):
    """MinHash signatures over 3-gram shingles, banded for LSH
    (shingle → minhash → band). Band values are join keys for
    candidate-pair generation at scale."""
    sh = _doc_shingles(spark, sf_dir)
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_N_MINHASH - 1))).alias("seed"),
        "shingle",
    )
    h = _hex15_to_long(F.md5(F.concat("shingle", F.lit("#"), F.col("seed").cast("string"))))
    mins = seeded.groupBy("doc_id", "seed").agg(F.min(h).alias("mh"))
    per_seed = [
        F.min(F.when(F.col("seed") == s, F.col("mh"))).alias(f"mh{s}")
        for s in range(_N_MINHASH)
    ]
    sig = mins.groupBy("doc_id").agg(*per_seed)
    band0 = F.concat_ws("-", *[F.col(f"mh{s}").cast("string") for s in range(4)])
    band1 = F.concat_ws("-", *[F.col(f"mh{s}").cast("string") for s in range(4, 8)])
    return sig.select("doc_id", band0.alias("band0"), band1.alias("band1"))


def _sql_minhash_signature():
    per_seed = ", ".join(
        f"min(CASE WHEN seed = {s} THEN mh END) AS mh{s}" for s in range(_N_MINHASH)
    )
    band0 = " || '-' || ".join(f"CAST(mh{s} AS VARCHAR)" for s in range(4))
    band1 = " || '-' || ".join(f"CAST(mh{s} AS VARCHAR)" for s in range(4, 8))
    return f"""
        WITH sh AS ({_SHINGLE_SQL}),
        mins AS (
            SELECT doc_id, seed,
                   min(CAST('0x' || substr(md5(shingle || '#' || CAST(seed AS VARCHAR)), 1, 15) AS BIGINT)) AS mh
            FROM sh, (SELECT unnest(range({_N_MINHASH})) AS seed)
            GROUP BY doc_id, seed
        ), sig AS (
            SELECT doc_id, {per_seed} FROM mins GROUP BY doc_id
        )
        SELECT doc_id, {band0} AS band0, {band1} AS band1 FROM sig
    """


_SHINGLE_DF_CAP = 100  # drop shingles present in > CAP docs (hot-key guard)


def q_ngram_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup: top-20 most similar doc pairs via
    shingle inverted index (the bucket-join scale path: pairs are only
    generated for docs sharing ≥1 shingle).

    Hot-key guard: a shingle occurring in k docs emits k² pairs, so
    boilerplate shingles blow up quadratically at scale — shingles with
    document frequency > _SHINGLE_DF_CAP are dropped from the index
    before the self-join (standard near-dup practice; they carry no
    discriminative signal). Sizes keep counting ALL shingles so the
    Jaccard denominator is unchanged."""
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    hot = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") > _SHINGLE_DF_CAP
    )
    # the HOT set is small by construction — broadcast anti-join
    shc = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = shc.alias("a")
    b = shc.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(20)
    )


def _sql_ngram_jaccard_pairs():
    return f"""
        WITH sh AS ({_SHINGLE_SQL}),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        shc AS (
            SELECT * FROM sh
            WHERE shingle NOT IN (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) > {_SHINGLE_DF_CAP}
            )
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
            FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(common / (sa.sz + sb.sz - common)::DOUBLE, 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 20
    """


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def _cosine(e_col, q_lit):
    dot = F.aggregate(
        F.zip_with(e_col, q_lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.aggregate(
        F.transform(e_col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n2 = F.aggregate(
        F.transform(q_lit, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (F.sqrt(n1) * F.sqrt(n2))


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline (query = vec_id 0). The
    query vector rides along as a broadcast 1-row frame — no
    mid-pipeline ``.head()`` driver job (same pattern as
    ``q_ivf_topk``)."""
    e = _t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qemb")
    )
    return (
        e.crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("qemb")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def _sql_embedding_topk():
    return """
        WITH q AS (SELECT i, (SELECT embedding FROM embeddings WHERE vec_id = 0)[i]::DOUBLE AS v
                   FROM generate_series(1, 64) g(i)),
        e AS (SELECT vec_id, i, embedding[i]::DOUBLE AS v
              FROM embeddings, generate_series(1, 64) g(i))
        SELECT e.vec_id,
               round(sum(e.v * q.v) / (sqrt(sum(e.v * e.v)) * sqrt(sum(q.v * q.v))), 4) AS cos_sim
        FROM e JOIN q USING (i)
        GROUP BY e.vec_id
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """


# Sign-bit LSH, parameterized: _LSH_BANDS independent bands of
# _LSH_BITS sign-bit hyperplanes each (bands OR candidates together so
# recall is tunable; bits set bucket granularity = collision rate).
# At 10^12 scale: more bits → smaller buckets → bounded within-bucket
# pair counts; more bands → recall. The 7-bit × 2-band default gives
# 128 buckets/band here; production would use 16+ bits.
_LSH_BITS = 7
_LSH_BANDS = 2


def _lsh_band_dims(band: int) -> list:
    """1-based embedding positions for one band's hyperplanes (disjoint
    coordinate sets per band; 64-dim embeddings)."""
    return [1 + band + _LSH_BANDS * k for k in range(_LSH_BITS)]


def _lsh_bucket_col(band: int):
    bucket = None
    for k, d in enumerate(_lsh_band_dims(band)):
        bit = F.when(F.element_at("embedding", d) > 0, F.lit(1 << k)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def _lsh_bucket_sql(band: int) -> str:
    return " + ".join(
        f"(CASE WHEN embedding[{d}] > 0 THEN {1 << k} ELSE 0 END)"
        for k, d in enumerate(_lsh_band_dims(band))
    )


def q_lsh_buckets(spark, sf_dir):
    """LSH-bucketed ANN scale path: multi-band sign-bit bucketing;
    per-(band, bucket) histogram (the band+bucket pair is the shuffle
    key that confines pairwise comparisons at 100 TB)."""
    e = _t(spark, sf_dir, "embeddings")
    per_band = [
        e.select(
            F.lit(band).alias("band"),
            _lsh_bucket_col(band).alias("bucket"),
            "label",
        )
        for band in range(_LSH_BANDS)
    ]
    allb = per_band[0]
    for p in per_band[1:]:
        allb = allb.unionByName(p)
    return allb.groupBy("band", "bucket").agg(
        F.count("*").alias("n"), F.countDistinct("label").alias("n_labels")
    )


def _sql_lsh_buckets():
    unions = "\n UNION ALL \n".join(
        f"SELECT {band} AS band, CAST({_lsh_bucket_sql(band)} AS INTEGER) AS bucket, label FROM embeddings"
        for band in range(_LSH_BANDS)
    )
    return f"""
        SELECT band, bucket, count(*) AS n, count(DISTINCT label) AS n_labels
        FROM ({unions}) GROUP BY band, bucket
    """


def q_label_centroid_sim(spark, sf_dir):
    """Per-label centroid cosine (embedding-cosine near-dup building
    block): explode → dim-wise mean → cosine of each vector to its
    label centroid → avg per label."""
    e = _t(spark, sf_dir, "embeddings")
    pos = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = pos.groupBy("label", "i").agg(F.avg("v").alias("m"))
    j = pos.join(cent, ["label", "i"])
    per_vec = j.groupBy("vec_id", "label").agg(
        (
            F.sum(F.col("v") * F.col("m"))
            / (F.sqrt(F.sum(F.col("v") * F.col("v"))) * F.sqrt(F.sum(F.col("m") * F.col("m"))))
        ).alias("cos")
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n"), F.round(F.avg("cos"), 4).alias("avg_centroid_sim")
    )


def _sql_label_centroid_sim():
    return """
        WITH pos AS (
            SELECT vec_id, label, i, embedding[i]::DOUBLE AS v
            FROM embeddings, generate_series(1, 64) g(i)
        ), cent AS (
            SELECT label, i, avg(v) AS m FROM pos GROUP BY label, i
        ), per_vec AS (
            SELECT pos.vec_id, pos.label,
                   sum(pos.v * cent.m) / (sqrt(sum(pos.v * pos.v)) * sqrt(sum(cent.m * cent.m))) AS cos
            FROM pos JOIN cent ON pos.label = cent.label AND pos.i = cent.i
            GROUP BY pos.vec_id, pos.label
        )
        SELECT label, count(*) AS n, round(avg(cos), 4) AS avg_centroid_sim
        FROM per_vec GROUP BY label
    """


def q_embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup: multi-band sign-bit LSH bucket join
    confines the pairwise cosine to same-(band,bucket) candidates (the
    100 TB scale path — the shuffle key is (band, bucket), never the
    full cross product; bands union for recall, then distinct); top-15
    most similar candidate pairs returned."""
    e = _t(spark, sf_dir, "embeddings")
    per_band = [
        e.select(
            "vec_id",
            F.lit(band).alias("band"),
            _lsh_bucket_col(band).alias("bucket"),
        )
        for band in range(_LSH_BANDS)
    ]
    eb = per_band[0]
    for p in per_band[1:]:
        eb = eb.unionByName(p)
    a, b = eb.alias("a"), eb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pairs = cand.join(
        emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")),
        "vec_a",
    ).join(
        emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")),
        "vec_b",
    )
    cos = _pair_cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(15)
    )


def _pair_cosine(ea, eb):
    dot = F.aggregate(
        F.zip_with(ea, eb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.aggregate(
        F.transform(ea, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nb = F.aggregate(
        F.transform(eb, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def _sql_embedding_neardup_pairs():
    unions = "\n UNION ALL \n".join(
        f"SELECT vec_id, {band} AS band, {_lsh_bucket_sql(band)} AS bucket FROM embeddings"
        for band in range(_LSH_BANDS)
    )
    return f"""
        WITH eb AS ({unions}),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM eb a JOIN eb b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id
        ), pairs AS (
            SELECT c.vec_a, c.vec_b, ea.embedding AS ea, ebb.embedding AS eb
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.vec_a
            JOIN embeddings ebb ON ebb.vec_id = c.vec_b
        ), pos AS (
            SELECT vec_a, vec_b, ea[i]::DOUBLE AS va, eb[i]::DOUBLE AS vb
            FROM pairs, generate_series(1, 64) g(i)
        )
        SELECT vec_a, vec_b,
               round(sum(va * vb) / (sqrt(sum(va * va)) * sqrt(sum(vb * vb))), 4) AS cos_sim
        FROM pos GROUP BY vec_a, vec_b
        ORDER BY cos_sim DESC, vec_a ASC, vec_b ASC LIMIT 15
    """


# ---------------------------------------------------------------------------
# image lakehouse maintenance — PURE-FUNCTION oracles (round-5 redesign).
#
# Round 4 proved the previous design's /tmp live-file side-channel does
# not survive the driver harness (CORRECTNESS_r04: every flow entry
# rows/schema-green but hash-red, while the identical comparison passes
# locally at local[8] AND local[32]). The deterministic generator makes
# the side-channel unnecessary: every input row is a pure function of
# its index i (sources/generator.row_props), so each flow's
# post-maintenance LOGICAL state is itself a pure function — which the
# DuckDB oracle recomputes from ``generate_series`` with ZERO
# filesystem coupling (``_sql_img_rows`` mirrors row_props; each
# ``_sql_image_*`` replays the flow's merge/update/delete semantics in
# SQL). The compared frame therefore fingerprints only SQL-recomputable
# columns (image_id, caption, w, h, fmt, ingest_date); the
# codec-dependent columns (bytes, phash) stay verified by pytest (PSNR
# ≥ 40 dB, caption byte-equality, phash known-vectors — the north-rule
# per-row invariants, tests/test_kernels.py tests/test_pipeline.py) and
# by the driver-green landed-projection entries (image_phash_neardup,
# image_features_ann). ``oracle_canary`` keeps ONE deliberate
# side-channel entry so the next CORRECTNESS artifact still
# discriminates harness-namespace failures from content failures.
# ---------------------------------------------------------------------------

_IMG_ROWS = 400
_ORACLE_STATE_ROOT = "/tmp/medallion_oracle"


def _oracle_root(name):
    """Fresh deterministic scratch root for one flow entry's engine
    tables. Since the round-5 oracle redesign the DuckDB side no longer
    reads it (see section comment) — it is plain per-entry scratch."""
    import shutil

    root = os.path.join(_ORACLE_STATE_ROOT, name)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    return root


def _final_state_frame(t, spark, caption_col="caption"):
    """Per-(ingest_date, fmt) invariants + 60-bit content fingerprint of
    the table's CURRENT logical state over the SQL-recomputable columns
    — the engine half of the post-maintenance equality oracle (the
    DuckDB half replays the same flow from the generator row function,
    ``_sql_final_state_over``)."""
    fp = _hex15_to_long(
        F.md5(
            F.concat_ws(
                "|",
                F.col("image_id"),
                F.coalesce(F.col(caption_col), F.lit("<null>")),
            )
        )
    )
    return (
        t.scan(spark)
        .groupBy("ingest_date", "fmt")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("image_id").alias("n_ids"),
            F.sum("w").alias("sum_w"),
            F.sum("h").alias("sum_h"),
            F.sum(fp % 1000003).alias("content_fp"),
        )
        .orderBy("ingest_date", "fmt")
    )


# DuckDB mirror of sources/generator.row_props constants — DuckDB list
# literals are 1-indexed; ``//`` is integer division in both engines.
_SQL_COLORS = "['red','amber','green','cyan','blue','violet','gray','teal']"
_SQL_SHAPES = "['stripe','wave','grid','spiral','blob','checker']"


def _sql_img_rows(lo, hi, n_dates=4):
    """Relation of generator rows i ∈ [lo, hi] (INCLUSIVE), mirroring
    sources/generator.row_props exactly; the codec-dependent
    bytes/phash columns are intentionally absent (pytest-verified)."""
    return f"""SELECT i,
           'img-' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,
           [32,64,96,128][(i % 4) + 1] AS w,
           [32,48,64,128][((i // 4) % 4) + 1] AS h,
           CASE WHEN i % 5 = 0 THEN 'jpeg' ELSE 'png' END AS fmt,
           'a ' || {_SQL_COLORS}[(i % 8) + 1] || ' ' ||
               {_SQL_SHAPES}[(i % 6) + 1] || ' pattern #' ||
               CAST(i AS VARCHAR) AS caption,
           '2024-01-0' || CAST((i % {n_dates}) + 1 AS VARCHAR) AS ingest_date
      FROM generate_series({lo}, {hi}) t(i)"""


def _sql_final_state_over(rows_sql, caption_col="caption"):
    """DuckDB half of the equality oracle: ``_final_state_frame``'s
    aggregate computed over a pure-SQL replay of the flow's final
    logical row set."""
    return f"""
        SELECT ingest_date, fmt, count(*) AS n,
               count(DISTINCT image_id) AS n_ids,
               sum(w) AS sum_w, sum(h) AS sum_h,
               sum(CAST('0x' || substr(md5(image_id || '|' ||
                     coalesce({caption_col}, '<null>')), 1, 15) AS BIGINT)
                   % 1000003) AS content_fp
        FROM ({rows_sql})
        GROUP BY ingest_date, fmt
        ORDER BY ingest_date, fmt
    """


def q_oracle_canary(spark, sf_dir):
    """Driver-harness canary (round-4 VERDICT task 1): writes a tiny
    CONSTANT parquet under the same /tmp root the round-4 flow oracles
    used as a side-channel, returns a frame reading it back; its oracle
    reads the same file. Green ⟺ the driver executes the Spark entry
    before its oracle in a shared filesystem namespace. Together with
    the pure-SQL flow oracles this discriminates failure classes: canary
    red ⇒ the /tmp side-channel is unusable in the driver harness
    (explains CORRECTNESS_r04's 19 hash-red flow rows); canary green +
    a pure-replay flow red ⇒ genuine content bug in that flow."""
    root = _oracle_root("canary")
    spark.range(0, 10, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") * 7 + 3).alias("v")
    ).write.parquet(os.path.join(root, "t"))
    df = spark.read.parquet(os.path.join(root, "t"))
    return df.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def _sql_oracle_canary():
    return f"""
        SELECT count(*) AS n, sum(v) AS sum_v,
               min(k) AS min_k, max(k) AS max_k
        FROM read_parquet('{_ORACLE_STATE_ROOT}/canary/t/*.parquet')
    """


def _sql_image_maintenance():
    # replay: MERGE upserts captions of i<40 (' (rev2)', bytes/phash
    # re-encoded — not fingerprinted) and inserts 400..419; the CoW
    # delete removes the h=32 class (HEIGHTS[(i//4)%4]=32 ⇔ (i//4)%4=0);
    # compact / hilbert cluster / expire are physical-only.
    rows = f"""
        SELECT * FROM (
            SELECT image_id, w, h, fmt,
                   CASE WHEN i < 40 THEN caption || ' (rev2)'
                        ELSE caption END AS caption,
                   ingest_date
            FROM ({_sql_img_rows(0, _IMG_ROWS + 19)})
        ) WHERE h <> 32
    """
    return _sql_final_state_over(rows)


def _sql_image_update():
    # replay: the CoW then MoR updates both hit h=128 rows, stacking
    # ' [cow]' then ' [mor]' onto the current caption; apply_deletes and
    # expiry are physical-only.
    rows = f"""
        SELECT image_id, w, h, fmt,
               CASE WHEN h = 128 THEN caption || ' [cow] [mor]'
                    ELSE caption END AS caption,
               ingest_date
        FROM ({_sql_img_rows(0, _IMG_ROWS - 1)})
    """
    return _sql_final_state_over(rows)


def _sql_image_dyn_overwrite():
    # replay: dynamic overwrite swaps the whole '2024-01-02' partition
    # for rows 90000..90039 (date forced); REPLACE WHERE h=32 then
    # atomically swaps every h=32 row for rows 95000..95009 (h forced).
    base = f"""SELECT image_id, w, h, fmt, caption, ingest_date
        FROM ({_sql_img_rows(0, _IMG_ROWS - 1)})
        WHERE ingest_date <> '2024-01-02'"""
    day = f"""SELECT image_id, w, h, fmt, caption,
               '2024-01-02' AS ingest_date
        FROM ({_sql_img_rows(90000, 90039)})"""
    repl = f"""SELECT image_id, w, 32 AS h, fmt, caption, ingest_date
        FROM ({_sql_img_rows(95000, 95009)})"""
    rows = f"""
        SELECT * FROM (
            SELECT * FROM ({base}) UNION ALL SELECT * FROM ({day})
        ) WHERE h <> 32
        UNION ALL SELECT * FROM ({repl})
    """
    return _sql_final_state_over(rows)


def _sql_image_incremental():
    # replay: append 50000..50099, then MERGE (upserts 0..39 ' (rev2)',
    # inserts 400..419); Table.changes consumption is read-only.
    rows = f"""
        SELECT image_id, w, h, fmt,
               CASE WHEN i < 40 THEN caption || ' (rev2)'
                    ELSE caption END AS caption,
               ingest_date
        FROM ({_sql_img_rows(0, _IMG_ROWS + 19)})
        UNION ALL
        SELECT image_id, w, h, fmt, caption, ingest_date
        FROM ({_sql_img_rows(50000, 50099)})
    """
    return _sql_final_state_over(rows)


def _sql_image_mor_delete():
    # replay: the merge-on-read delete suppresses the h=32 class of the
    # 200-row table; apply_deletes/expiry are physical-only.
    rows = f"SELECT * FROM ({_sql_img_rows(0, 199)}) WHERE h <> 32"
    return _sql_final_state_over(rows)


def _sql_image_eq_delete():
    # replay: equality-delete keys img-…000..004, then key 0's ORIGINAL
    # row is re-appended (sequence rule: appended after the delete ⇒
    # exempt) — net effect: ids 1..4 gone.
    rows = f"SELECT * FROM ({_sql_img_rows(0, 199)}) WHERE i NOT IN (1, 2, 3, 4)"
    return _sql_final_state_over(rows)


def _sql_image_mor_merge():
    # replay: MoR MERGE upserts 370..399 and inserts 400..429, all with
    # '-v2' captions; materialization preserves logical state.
    rows = f"""
        SELECT image_id, w, h, fmt,
               CASE WHEN i >= {_IMG_ROWS - 30} THEN caption || '-v2'
                    ELSE caption END AS caption,
               ingest_date
        FROM ({_sql_img_rows(0, _IMG_ROWS + 29)})
    """
    return _sql_final_state_over(rows)


def _sql_image_cdc():
    # replay: append 70000..70059; MERGE '-v2' for 375..399 (upsert) +
    # 400..424 (insert); CoW DELETE of img-…001; compaction is
    # physical-only (and the changelog consumption is read-only).
    rows = f"""
        SELECT image_id, w, h, fmt,
               CASE WHEN i >= {_IMG_ROWS - 25} THEN caption || '-v2'
                    ELSE caption END AS caption,
               ingest_date
        FROM ({_sql_img_rows(0, _IMG_ROWS + 24)}) WHERE i <> 1
        UNION ALL
        SELECT image_id, w, h, fmt, caption, ingest_date
        FROM ({_sql_img_rows(70000, 70059)})
    """
    return _sql_final_state_over(rows)


def _sql_image_sql_dml():
    # replay: UPDATE upper-cases captions where w >= 96 (i%4 ∈ {2,3});
    # DELETE removes img-…007; MERGE then REPLACES rows 380..399 with
    # plain-caption source rows and inserts 400..419 — so only
    # non-merged rows keep the uppercase. OPTIMIZE/ANALYZE are
    # physical/metadata-only.
    rows = f"""
        SELECT image_id, w, h, fmt,
               CASE WHEN w >= 96 AND i < {_IMG_ROWS - 20}
                    THEN upper(caption) ELSE caption END AS caption,
               ingest_date
        FROM ({_sql_img_rows(0, _IMG_ROWS + 19)}) WHERE i <> 7
    """
    return _sql_final_state_over(rows)


def _sql_image_datasource():
    # replay: the replica must carry the source's logical state — the
    # initial 0..399 batch plus the incremental 10000..10099 batch.
    rows = f"""
        SELECT * FROM ({_sql_img_rows(0, _IMG_ROWS - 1)})
        UNION ALL
        SELECT * FROM ({_sql_img_rows(10000, 10099)})
    """
    return _sql_final_state_over(rows)


def _sql_image_wap():
    # replay: the corrupt batch never publishes — base 0..199 plus the
    # clean 50000..50059 batch only.
    rows = f"""
        SELECT * FROM ({_sql_img_rows(0, 199)})
        UNION ALL
        SELECT * FROM ({_sql_img_rows(50000, 50059)})
    """
    return _sql_final_state_over(rows)


def _sql_image_live_pipeline():
    # replay: two exactly-once stream batches (0..119, 9000..9039), then
    # a MERGE whose source rows 50..69 carry w+7 (caption unchanged).
    rows = f"""
        SELECT image_id,
               w + CASE WHEN i BETWEEN 50 AND 69 THEN 7 ELSE 0 END AS w,
               h, fmt, caption, ingest_date
        FROM ({_sql_img_rows(0, 119)})
        UNION ALL
        SELECT image_id, w, h, fmt, caption, ingest_date
        FROM ({_sql_img_rows(9000, 9039)})
    """
    return _sql_final_state_over(rows)


def _sql_image_gold_star():
    # the star join replayed flat from the generator row function:
    # calendar attrs via date functions (Spark dayofweek 1=Sun..7=Sat ==
    # DuckDB dayofweek 0=Sun..6=Sat shifted), is_lossy = fmt != 'png';
    # silver passes every synthetic row through (valid fmts, positive
    # dims, unique non-null ids, no control chars in captions).
    return f"""
        SELECT year(d) AS ano, month(d) AS mes,
               dayofweek(d) IN (0, 6) AS eh_fim_semana,
               fmt AS fmt_key, fmt <> 'png' AS is_lossy,
               count(*) AS n_images,
               sum(w) AS sum_w,
               count(DISTINCT image_id) AS n_ids
        FROM (
            SELECT *, CAST(ingest_date AS DATE) AS d
            FROM ({_sql_img_rows(0, _IMG_ROWS - 1)})
        )
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY ano, mes, fmt_key
    """


def _sql_image_medallion():
    # gold_build's SQL-recomputable aggregate replayed from the
    # generator row function (silver passes every synthetic row
    # through); the codec-dependent gold measures (n_distinct_phash,
    # total_bytes) stay pytest-verified.
    return f"""
        SELECT ingest_date, fmt, count(*) AS n_images,
               round(avg(CAST(w AS DOUBLE) * h), 4) AS avg_pixels,
               min(w) AS min_w, max(w) AS max_w
        FROM ({_sql_img_rows(0, _IMG_ROWS - 1)})
        GROUP BY ingest_date, fmt
        ORDER BY ingest_date, fmt
    """


def _sql_image_matview():
    # the MV's defining aggregate replayed cold: base 0..399, appended
    # 50000..50099, MERGE inserts 400..415 (its updates leave
    # fmt/w/image_id unchanged, so count/sum/max are insensitive); must
    # equal the MV content the engine maintained through
    # incremental/bookmark/full refreshes.
    rows = " UNION ALL ".join(
        f"SELECT * FROM ({_sql_img_rows(a, b)})"
        for a, b in [
            (0, _IMG_ROWS - 1),
            (_IMG_ROWS, _IMG_ROWS + 15),
            (50000, 50099),
        ]
    )
    return f"""
        SELECT fmt, count(*) AS n, sum(w) AS total_w,
               max(image_id) AS max_id
        FROM ({rows})
        GROUP BY fmt
        ORDER BY fmt
    """


def q_events_windowed(spark, sf_dir):
    """Watermarked tumbling-window rollup (streaming operator run in
    batch mode — identical plan both ways; see streaming/ingest.py)."""
    from aws_medallion_datalake_spark.streaming.ingest import windowed_event_rollup

    e = _t(spark, sf_dir, "events")
    out = windowed_event_rollup(e, window="1 hour", watermark="2 hours")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def _sql_events_windowed():
    return """
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """


def q_event_sessions(spark, sf_dir):
    """Gap-based sessionization (batch twin of the
    applyInPandasWithState streaming operator, streaming/sessionize.py):
    lag → gap flag → cumsum session id → one aggregate. 30-minute gap,
    bounded to user_id < 50 for a stable result set."""
    from aws_medallion_datalake_spark.streaming.sessionize import sessionize_batch

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = sessionize_batch(e, gap_minutes=30)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.col("n_events").cast("long").alias("n_events"),
        "total_value",
    )


def _sql_event_sessions():
    return """
        WITH e AS (
            SELECT user_id, ts, coalesce(value, 0) AS value,
                   CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events WHERE user_id < 50
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts, value,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM e
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events,
               round(sum(value), 6) AS total_value
        FROM s GROUP BY user_id, sess
    """


def q_event_funnel(spark, sf_dir):
    """Ordered-step funnel (view → click → purchase): a user converts
    step k only with an event at or after their earliest qualifying
    time of step k-1. Classic product-analytics operator the events
    suite lacked.

    100 TB shape: all three step times are conditional MINs over the
    SAME user-partitioned window, so Catalyst plans ONE exchange on
    user_id and computes the dependency chain in two window passes over
    the sorted partition — no joins, no second shuffle; the final
    global rollup aggregates |users| rows down to one.
    """
    w = Window.partitionBy("user_id")
    e = _t(spark, sf_dir, "events")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    e2 = e1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        e2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3"))
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("step_view"),
        F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("step_click"),
        F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("step_purchase"),
        F.round(
            F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0))
            / F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0)).cast(
                "double"
            ),
            4,
        ).alias("view_to_purchase_rate"),
    )


def _sql_event_funnel():
    return """
        WITH e1 AS (
            SELECT user_id, ts, event_type,
                   min(CASE WHEN event_type = 'view' THEN ts END)
                     OVER (PARTITION BY user_id) AS t1
            FROM events
        ), e2 AS (
            SELECT user_id, ts, event_type, t1,
                   min(CASE WHEN event_type = 'click' AND ts >= t1
                            THEN ts END)
                     OVER (PARTITION BY user_id) AS t2
            FROM e1
        ), e3 AS (
            SELECT user_id, t1, t2,
                   min(CASE WHEN event_type = 'purchase' AND ts >= t2
                            THEN ts END)
                     OVER (PARTITION BY user_id) AS t3
            FROM e2
        ), per_user AS (
            SELECT user_id, any_value(t1) AS t1, any_value(t2) AS t2,
                   min(t3) AS t3
            FROM e3 GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS step_view,
               CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS step_click,
               CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS step_purchase,
               round(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
                     / sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE,
                     4) AS view_to_purchase_rate
        FROM per_user
    """


_IVF_K = 8  # coarse centroids (IVF lists); seeds: vectors 0..K-1
_IVF_NPROBE = 2
_IVF_ROUNDS = 2  # Lloyd refinement rounds on the codebook


def _ivf_assign(e, cent):
    """(vec_id, list_id): nearest centroid by squared L2, distances
    rounded to 6 dp, ties to the lowest cid — deterministic across
    engines. cent is K rows → broadcast crossJoin, one windowed argmin."""
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                "embedding", "cemb", lambda x, y: (x.cast("double") - y) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    pairs = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("list_id"))
    )


def q_ivf_topk(spark, sf_dir):
    """IVF approximate nearest neighbor with a TRAINED codebook: seeds
    (vectors 0..K-1) are refined by ``_IVF_ROUNDS`` Lloyd iterations —
    assign every vector to its nearest centroid (broadcast crossJoin +
    windowed argmin), recompute centroids as per-list elementwise means
    (rounded to 6 dp so the DuckDB oracle's unrolled CTEs stay in
    lockstep) — then the query probes its NPROBE nearest lists and runs
    exact cosine within them.

    Scale: each Lloyd round is one broadcast join + two hash aggregates
    over (list_id, i) — k×d rows of centroid state, never collected to
    the driver; at 10^12 vectors the probe phase reads ~NPROBE/K of the
    data. The query vector is a broadcast 1-row frame (no ``.head()``
    driver job mid-pipeline)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cemb"),
    )
    for _ in range(_IVF_ROUNDS):
        assign = _ivf_assign(e, cent)
        cent = (
            e.join(assign, "vec_id")
            .select("list_id", F.posexplode("embedding").alias("i", "v"))
            .groupBy("list_id", "i")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cv"))
            .groupBy("list_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("s")
            )
            .select(
                F.col("list_id").alias("cid"),
                F.transform("s", lambda st: st["cv"]).alias("cemb"),
            )
        )
    assign = _ivf_assign(e, cent)
    qrow = e.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qemb")
    )
    qd2 = F.round(
        F.aggregate(
            F.zip_with("cemb", "qemb", lambda x, y: (x - y) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    probe = (
        cent.crossJoin(F.broadcast(qrow))
        .select("cid", qd2.alias("d2"))
        .orderBy("d2", "cid")
        .limit(_IVF_NPROBE)
    )
    cand = assign.join(
        F.broadcast(probe.select(F.col("cid").alias("list_id"))), "list_id"
    )
    return (
        e.join(cand, "vec_id")
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), F.col("qemb")), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def _sql_ivf_topk():
    # the Lloyd rounds of q_ivf_topk, unrolled as CTE pairs (assign_r,
    # cent_{r+1}); distances and centroid means rounded to 6 dp on both
    # engines so the trained codebooks are bit-identical
    assign_tpl = """
        {a} AS (
            SELECT vec_id, cid AS list_id FROM (
                SELECT d.vec_id, d.cid,
                       row_number() OVER (PARTITION BY d.vec_id
                                          ORDER BY d.d2, d.cid) AS rn
                FROM (
                    SELECT e.vec_id, c.cid,
                           round(sum((e.v - c.cv) * (e.v - c.cv)), 6) AS d2
                    FROM e JOIN {c} c USING (i) GROUP BY 1, 2
                ) d
            ) WHERE rn = 1
        )"""
    cent_tpl = """
        {cnext} AS (
            SELECT a.list_id AS cid, e.i, round(avg(e.v), 6) AS cv
            FROM e JOIN {a} a USING (vec_id) GROUP BY 1, 2
        )"""
    ctes = []
    c = "c0"
    for r in range(_IVF_ROUNDS):
        a = f"a{r}"
        ctes.append(assign_tpl.format(a=a, c=c))
        c_next = f"c{r + 1}"
        ctes.append(cent_tpl.format(cnext=c_next, a=a))
        c = c_next
    ctes.append(assign_tpl.format(a="assign", c=c))
    return f"""
        WITH e AS (
            SELECT vec_id, i, embedding[i]::DOUBLE AS v
            FROM embeddings, generate_series(1, 64) g(i)
        ), c0 AS (
            SELECT vec_id::INT AS cid, i, v AS cv FROM e
            WHERE vec_id < {_IVF_K}
        ), {",".join(ctes)},
        q AS (SELECT i, v FROM e WHERE vec_id = 0),
        qd AS (
            SELECT c.cid, round(sum((q.v - c.cv) * (q.v - c.cv)), 6) AS d2
            FROM q JOIN {c} c USING (i) GROUP BY 1
        ), probe AS (SELECT cid FROM qd ORDER BY d2, cid LIMIT {_IVF_NPROBE}),
        cand AS (
            SELECT a.vec_id FROM assign a JOIN probe p ON a.list_id = p.cid
        ), pos AS (
            SELECT e.vec_id, e.v, q.v AS qv
            FROM e JOIN q USING (i)
            WHERE e.vec_id IN (SELECT vec_id FROM cand)
        )
        SELECT vec_id,
               round(sum(v * qv) / (sqrt(sum(v * v)) * sqrt(sum(qv * qv))), 4)
                   AS cos_sim
        FROM pos GROUP BY vec_id
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """


_SEMDEDUP_TAU = 0.35  # prune threshold (margin to nearest pair cos: 8e-6 at sf0.1)


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster embeddings, prune
    within-cluster semantic near-duplicates (cosine ≥ τ vs a lower-id
    vector); report per-cluster kept/pruned counts.

    Runs ``operators.semdedup``: broadcast-centroid assignment (one
    shuffle on vec_id), then a per-cluster numpy ``M @ M.T`` kernel
    under ``applyInPandas`` (one shuffle on cluster) — the dim-exploded
    (cluster, i) quadratic self-join is gone. Clusters above
    ``max_cluster_size`` are deterministically refined in-memory so no
    task ever holds more than max_cluster_size² pair products; at 10^12
    vectors total pairwise work is O(n · max_cluster_size), linear in n.
    """
    from aws_medallion_datalake_spark.operators.semdedup import (
        assign_clusters,
        semdedup_flags,
        semdedup_stats,
    )

    e = _t(spark, sf_dir, "embeddings")
    assign = assign_clusters(e)
    flags = semdedup_flags(e, assign, tau=_SEMDEDUP_TAU)
    return semdedup_stats(flags)


def _sql_semdedup():
    return f"""
        WITH dims AS (
            SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS v
            FROM embeddings, generate_series(1, 64) g(i)
        ), cent AS (
            SELECT label AS c, g.i AS i, avg(embedding[g.i]::DOUBLE) AS cv
            FROM embeddings, generate_series(1, 64) g(i) GROUP BY 1, 2
        ), percos AS (
            SELECT d.vec_id, c.c,
                   round(sum(d.v * c.cv) / (sqrt(sum(d.v * d.v)) * sqrt(sum(c.cv * c.cv))), 6) AS cos
            FROM dims d JOIN cent c USING (i) GROUP BY 1, 2
        ), assign AS (
            SELECT vec_id, c AS cluster FROM (
                SELECT vec_id, c,
                       row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c DESC) rn
                FROM percos) WHERE rn = 1
        ), ad AS (
            SELECT d.vec_id, a.cluster, d.i, d.v
            FROM dims d JOIN assign a USING (vec_id)
        ), pairs AS (
            SELECT y.vec_id AS w,
                   round(sum(x.v * y.v) / (sqrt(sum(x.v * x.v)) * sqrt(sum(y.v * y.v))), 6) AS cos
            FROM ad x JOIN ad y
              ON x.cluster = y.cluster AND x.i = y.i AND x.vec_id < y.vec_id
            GROUP BY x.vec_id, y.vec_id
        ), pruned AS (
            SELECT DISTINCT w FROM pairs WHERE cos >= {_SEMDEDUP_TAU}
        )
        SELECT a.cluster, count(*) AS n_vectors,
               count(p.w) AS n_pruned,
               count(*) FILTER (WHERE p.w IS NULL) AS n_kept
        FROM assign a LEFT JOIN pruned p ON a.vec_id = p.w
        GROUP BY a.cluster
    """


# ---------------------------------------------------------------------------
# gold star schema via the spark.sql surface (S13 + J5)
# ---------------------------------------------------------------------------


def _register_gold_tpch_views(spark, sf_dir):
    """Dims + facts as TEMP VIEWS built with spark.sql — the reference's
    gold layer consumed through SQL (S13: sql/athena_gold_queries.sql,
    terraform/athena.tf:7-53); star layout mirrors
    scripts/gold_digit_fixed.py:34-146 (dims are distinct projections,
    facts keep natural keys)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_raw")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_raw")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY VIEW v_dim_tempo AS
           SELECT DISTINCT date_format(o_orderdate, 'yyyy-MM-dd') AS data_key,
                  year(o_orderdate) AS ano,
                  month(o_orderdate) AS mes,
                  date_format(o_orderdate, 'MMMM') AS nome_mes,
                  dayofweek(o_orderdate) IN (1, 7) AS eh_fim_semana
           FROM v_orders_raw"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY VIEW v_dim_cliente AS
           SELECT DISTINCT c_custkey AS cliente_key, c_name, c_mktsegment
           FROM v_customer_raw"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY VIEW v_fato_orders AS
           SELECT o_orderkey, o_custkey AS cliente_key,
                  date_format(o_orderdate, 'yyyy-MM-dd') AS data_key,
                  o_totalprice
           FROM v_orders_raw"""
    )
    # aggregated fact (the fato_resumo_obras analogue,
    # gold_digit_fixed.py:131-146)
    spark.sql(
        """CREATE OR REPLACE TEMPORARY VIEW v_fato_resumo_cliente AS
           SELECT cliente_key,
                  round(sum(o_totalprice), 2) AS total_price,
                  count(*) AS n_orders,
                  round(avg(o_totalprice), 2) AS media_price,
                  min(data_key) AS primeiro_pedido,
                  max(data_key) AS ultimo_pedido
           FROM v_fato_orders GROUP BY cliente_key"""
    )


def q_gold_star_rollup(spark, sf_dir):
    """Monthly fact⋈dim_tempo rollup over the SQL gold surface — the
    'Produtividade por mês' Athena query shape
    (sql/athena_gold_queries.sql:21-31), run with spark.sql (S13)."""
    _register_gold_tpch_views(spark, sf_dir)
    return spark.sql(
        """SELECT t.ano, t.mes, t.nome_mes,
                  round(sum(f.o_totalprice), 2) AS total_price_mes,
                  count(DISTINCT f.cliente_key) AS clientes_ativos,
                  round(avg(f.o_totalprice), 2) AS media_price,
                  count(*) AS n_orders
           FROM v_fato_orders f
           JOIN v_dim_tempo t ON f.data_key = t.data_key
           GROUP BY t.ano, t.mes, t.nome_mes
           ORDER BY t.ano, t.mes"""
    )


def _sql_gold_star_rollup():
    return """
        WITH dim_tempo AS (
            SELECT DISTINCT strftime(o_orderdate, '%Y-%m-%d') AS data_key,
                   CAST(year(o_orderdate) AS INTEGER) AS ano,
                   CAST(month(o_orderdate) AS INTEGER) AS mes,
                   strftime(o_orderdate, '%B') AS nome_mes
            FROM orders
        ), fato AS (
            SELECT o_custkey AS cliente_key,
                   strftime(o_orderdate, '%Y-%m-%d') AS data_key, o_totalprice
            FROM orders
        )
        SELECT t.ano, t.mes, t.nome_mes,
               round(sum(f.o_totalprice), 2) AS total_price_mes,
               count(DISTINCT f.cliente_key) AS clientes_ativos,
               round(avg(f.o_totalprice), 2) AS media_price,
               count(*) AS n_orders
        FROM fato f JOIN dim_tempo t ON f.data_key = t.data_key
        GROUP BY t.ano, t.mes, t.nome_mes
        ORDER BY t.ano, t.mes
    """


def q_gold_fact_dim_join(spark, sf_dir):
    """J5 dim ⋈ AGGREGATED-fact — the 'Resumo agregado por obra' shape
    (sql/athena_gold_queries.sql:81-95: dim_obras JOIN fato_resumo_obras),
    via spark.sql over the registered gold views."""
    _register_gold_tpch_views(spark, sf_dir)
    return spark.sql(
        """SELECT c.c_name, c.c_mktsegment,
                  r.total_price, r.n_orders, r.media_price,
                  r.primeiro_pedido, r.ultimo_pedido
           FROM v_dim_cliente c
           JOIN v_fato_resumo_cliente r ON c.cliente_key = r.cliente_key
           ORDER BY r.total_price DESC, c.c_name ASC
           LIMIT 20"""
    )


def _sql_gold_fact_dim_join():
    return """
        WITH dim_cliente AS (
            SELECT DISTINCT c_custkey AS cliente_key, c_name, c_mktsegment
            FROM customer
        ), resumo AS (
            SELECT o_custkey AS cliente_key,
                   round(sum(o_totalprice), 2) AS total_price,
                   count(*) AS n_orders,
                   round(avg(o_totalprice), 2) AS media_price,
                   min(strftime(o_orderdate, '%Y-%m-%d')) AS primeiro_pedido,
                   max(strftime(o_orderdate, '%Y-%m-%d')) AS ultimo_pedido
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_name, c.c_mktsegment,
               r.total_price, r.n_orders, r.media_price,
               r.primeiro_pedido, r.ultimo_pedido
        FROM dim_cliente c JOIN resumo r ON c.cliente_key = r.cliente_key
        ORDER BY r.total_price DESC, c.c_name ASC
        LIMIT 20
    """


def q_gold_weekend_split(spark, sf_dir):
    """Weekday-vs-weekend temporal split — the 'Fins de semana vs dias
    úteis' Athena shape (sql/athena_gold_queries.sql:62-70), F20 weekend
    flag on the date dim."""
    _register_gold_tpch_views(spark, sf_dir)
    return spark.sql(
        """SELECT CASE WHEN t.eh_fim_semana THEN 'Fim de Semana'
                       ELSE 'Dia Útil' END AS tipo_dia,
                  count(*) AS total_registros,
                  round(sum(f.o_totalprice), 2) AS total_price,
                  round(avg(f.o_totalprice), 2) AS media_price
           FROM v_fato_orders f
           JOIN v_dim_tempo t ON f.data_key = t.data_key
           GROUP BY t.eh_fim_semana
           ORDER BY total_price DESC"""
    )


def _sql_gold_weekend_split():
    # DuckDB dayofweek: 0=Sun..6=Sat; Spark: 1=Sun..7=Sat
    return """
        WITH dim_tempo AS (
            SELECT DISTINCT strftime(o_orderdate, '%Y-%m-%d') AS data_key,
                   dayofweek(o_orderdate) IN (0, 6) AS eh_fim_semana
            FROM orders
        ), fato AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS data_key, o_totalprice
            FROM orders
        )
        SELECT CASE WHEN t.eh_fim_semana THEN 'Fim de Semana'
                    ELSE 'Dia Útil' END AS tipo_dia,
               count(*) AS total_registros,
               round(sum(f.o_totalprice), 2) AS total_price,
               round(avg(f.o_totalprice), 2) AS media_price
        FROM fato f JOIN dim_tempo t ON f.data_key = t.data_key
        GROUP BY t.eh_fim_semana
        ORDER BY total_price DESC
    """


def q_events_json_explode(spark, sf_dir):
    """F17 from_json(array<struct>) + explode — the Funcionarios-array
    expansion pattern (docs/SILVER_API_DIGIT_TRANSFORMACAO.md:72-79,
    102-104): rows are packed into a JSON array string per group (F18
    to_json), parsed back with an explicit array<struct> schema, exploded
    one row per element, and re-aggregated."""
    e = _t(spark, sf_dir, "events")
    packed = e.groupBy("event_type").agg(
        F.to_json(
            F.collect_list(
                F.struct(F.col("value").alias("v"), F.col("user_id").alias("u"))
            )
        ).alias("arr_json")
    )
    parsed = packed.select(
        "event_type",
        F.explode(
            F.from_json("arr_json", "array<struct<v:double,u:bigint>>")
        ).alias("el"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("el.v"), 2).alias("total_value"),
        F.countDistinct("el.u").alias("n_users"),
    )


def _sql_events_json_explode():
    # the JSON pack/unpack round-trip is lossless; the oracle checks the
    # recovered semantics directly
    return """
        SELECT event_type, count(*) AS n_rows,
               round(sum(value), 2) AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """


def q_hidden_partition_scan(spark, sf_dir):
    """Hidden partitioning (Iceberg-style transform spec,
    aws_medallion_datalake_spark/sources/transforms.py): orders loaded
    into an engine table partitioned by months(o_orderdate) +
    bucket(16, o_custkey). The scan is given only PLAIN source-column
    predicates — a date range — and maps them to transform-space file
    pruning internally; users never name derived columns (the anti-
    Hive-trap answer to the reference's materialized year=/month=/day=
    layout, /root/reference/scripts/bronze_digit.py:143-148). The
    oracle runs the same filter + rollup over the raw parquet, so a
    green row proves transform pruning drops no qualifying rows and
    row-level re-filtering drops every non-qualifying one."""
    import tempfile

    from aws_medallion_datalake_spark.sources import transforms as T
    from aws_medallion_datalake_spark.sources.tableformat import Table

    o = _t(spark, sf_dir, "orders")
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in o.schema.fields)
    spec = ["months(o_orderdate)", "bucket(16, o_custkey)"]
    t = Table.create(
        os.path.join(tempfile.mkdtemp(prefix="entry_hidden_part_"), "orders_tbl"),
        ddl,
        partition_cols=spec,
        stats_cols=["o_orderkey"],
    )
    t.commit("append", t.write_files(o.repartitionByRange(8, *T.exprs(spec))))
    scanned = t.scan(
        spark,
        predicates=[("o_orderdate", "between", ("1996-01-01", "1996-12-31"))],
    )
    return scanned.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


def _sql_hidden_partition_scan():
    return """
        SELECT o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price,
               count(DISTINCT o_custkey) AS n_custs
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1996-12-31'
        GROUP BY o_orderpriority
    """


_MINHASH_MAX_BUCKET = 64  # hot-band guard cap (mirrored in the oracle SQL)


def q_minhash_candidate_pairs(spark, sf_dir):
    """MinHash+LSH DEDUP, end to end: signatures → band self-join emits
    candidate pairs (docs agreeing on any band) → exact shingle-Jaccard
    verification of only those candidates. The band join is the 100 TB
    scale path: the shuffle key is the band value, never the cross
    product, and the verify stage touches candidate pairs only. A
    degenerate band (one value shared by k docs ⇒ k²/2 pairs) is capped
    by functions/lsh.banded_candidates's ``max_bucket`` guard — the
    same guard functions/hamming.py applies — with dropped buckets
    disclosed via its ``hot`` frame; the oracle mirrors the cap, so the
    entry stays hash-green at any scale factor (real fixture buckets
    top out at 4 members, far under the cap)."""
    from aws_medallion_datalake_spark.functions.lsh import banded_candidates

    sig = q_minhash_signature(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("b0:"), F.col("band0")),
                F.concat(F.lit("b1:"), F.col("band1")),
            )
        ).alias("band"),
    )
    cand, _hot = banded_candidates(bands, max_bucket=_MINHASH_MAX_BUCKET)
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (
        common.join(za, "doc_a")
        .join(zb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
    )


def _sql_minhash_candidate_pairs():
    sig_sql = _sql_minhash_signature()
    return f"""
        WITH sig AS ({sig_sql}),
        bands0 AS (
            SELECT doc_id, 'b0:' || band0 AS band FROM sig
            UNION ALL
            SELECT doc_id, 'b1:' || band1 AS band FROM sig
        ),
        -- hot-band guard mirror: buckets over the cap emit no pairs
        bands AS (
            SELECT * FROM bands0 WHERE band NOT IN (
                SELECT band FROM bands0
                GROUP BY band HAVING count(*) > {_MINHASH_MAX_BUCKET}
            )
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.doc_id < b.doc_id
        ),
        sh AS ({_SHINGLE_SQL}),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
            SELECT c.doc_a, c.doc_b, count(*) AS common
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT doc_a, doc_b,
               round(common / (sa.sz + sb.sz - common)::DOUBLE, 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
    """


_NEARDUP_JACCARD = 0.5


def q_neardup_components(spark, sf_dir):
    """Near-dup DEDUP CLUSTERS: connected components over the verified
    MinHash candidate-pair graph (edges = candidate pairs whose exact
    shingle-Jaccard ≥ threshold). Iterative min-label propagation — each
    round is one hash-join of the current labels against the symmetric
    edge list plus a min-aggregate, the standard distributed CC shape
    (GraphFrames/Pregel); rounds ≤ component diameter, tiny for near-dup
    clusters. Labels and edges carry ONLY (doc_id, label) int64 pairs —
    at 10^12 docs no payload ever moves and each round shuffles the edge
    list once. Output: one row per component with a canonical id
    (min doc_id) and a deterministic member list — the keep-one-copy
    decision a training-data pipeline actually executes."""
    # persist the verified pair list BEFORE the symmetric union: both
    # union branches reference it, and without the persist Spark
    # evaluates the whole MinHash band-join + Jaccard-verify subtree
    # twice inside the first job
    pairs = (
        q_minhash_candidate_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= _NEARDUP_JACCARD)
        .persist()
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # localCheckpoint (not just persist): persist caches the DATA but
    # every subsequent action still re-analyzes the full MinHash
    # band-join logical plan (hundreds of hash/explode expressions) —
    # with an iterative consumer that Catalyst re-analysis dominates the
    # wall clock. Checkpointing truncates the lineage to a fresh
    # in-memory root, the same discipline GraphFrames applies to
    # iterative graph algorithms.
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    pairs.unpersist()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Convergence detector: min-label propagation only ever LOWERS
    # labels, so sum(lbl) strictly decreases until the fixed point — one
    # tiny aggregate on the (persisted) new labels per round instead of
    # a join-against-previous round-trip.
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    for _ in range(20):  # diameter bound; propagation converges far sooner
        nbr = sym.join(labels, sym["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "lbl"
        )
        new = (
            labels.select("node", "lbl")
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)  # O(1) plan depth across rounds
        )
        new_sum = new.agg(F.sum("lbl")).first()[0]
        labels = new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    out = (
        labels.groupBy("lbl")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .select(F.col("lbl").alias("component"), "n_docs", "members")
        .orderBy("component")
    )
    return out


def _sql_neardup_components():
    pairs_sql = _sql_minhash_candidate_pairs()
    return f"""
        WITH RECURSIVE
        pairs AS ({pairs_sql}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            WHERE jaccard >= {_NEARDUP_JACCARD}
            UNION ALL
            SELECT doc_b, doc_a FROM pairs WHERE jaccard >= {_NEARDUP_JACCARD}
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
        SELECT component, count(*) AS n_docs,
               string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
        FROM comp GROUP BY component ORDER BY component
    """


def q_neardup_retention(spark, sf_dir):
    """Near-dup RETENTION POLICY: the keep/drop decision a training-data
    pipeline executes over the dedup clusters — keep the longest member
    of each component (ties: lowest doc_id), drop the rest. Composes
    the connected-components operator with a corpus join: the exploded
    member list (only docs inside dup clusters — a tiny fraction of the
    corpus) broadcasts onto ``documents``, so the 100 TB side joins
    shuffle-free; the per-component ranking then shuffles just the
    cluster members. Output: one row per component with the keeper and
    the sorted dropped-id list."""
    comps = q_neardup_components(spark, sf_dir)
    members = comps.select(
        "component", F.explode(F.split("members", ",")).alias("m")
    ).select("component", F.col("m").cast("long").alias("doc_id"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "n_chars"
    )
    joined = docs.join(F.broadcast(members), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = joined.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("component")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("keeper_id"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias(
                "keeper_chars"
            ),
            F.count("*").alias("n_docs"),
            (F.count("*") - F.lit(1)).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.when(F.col("rk") > 1, F.col("doc_id")))
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("dropped_ids"),
        )
        .orderBy("component")
    )


def _sql_neardup_retention():
    pairs_sql = _sql_minhash_candidate_pairs()
    return f"""
        WITH RECURSIVE
        pairs AS ({pairs_sql}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            WHERE jaccard >= {_NEARDUP_JACCARD}
            UNION ALL
            SELECT doc_b, doc_a FROM pairs WHERE jaccard >= {_NEARDUP_JACCARD}
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
        ranked AS (
            SELECT c.component, d.doc_id, d.n_chars,
                   row_number() OVER (
                       PARTITION BY c.component
                       ORDER BY d.n_chars DESC, d.doc_id ASC
                   ) AS rk
            FROM comp c JOIN documents d ON d.doc_id = c.node
        )
        SELECT component,
               max(CASE WHEN rk = 1 THEN doc_id END) AS keeper_id,
               max(CASE WHEN rk = 1 THEN n_chars END) AS keeper_chars,
               count(*) AS n_docs,
               count(*) - 1 AS n_dropped,
               string_agg(
                   CASE WHEN rk > 1 THEN CAST(doc_id AS VARCHAR) END,
                   ',' ORDER BY doc_id
               ) AS dropped_ids
        FROM ranked GROUP BY component ORDER BY component
    """


def q_image_gold_star(spark, sf_dir):
    """Engine-side S13: medallion pipeline → gold STAR SCHEMA (dims +
    facts + persisted quality table, gold_digit_fixed.py:34-146 /
    gold_agilean.py:103-162 analogues) → registered as temp views → an
    Athena-gold-shaped spark.sql join over them. The quality-table gate
    is asserted inline; the star-join result is hard-checked by DuckDB
    recomputing the same rollup (calendar attrs, lossy flag and all)
    as a from-scratch flat replay of the generator row function — the
    dims and facts must agree with it (codec-dependent measures stay
    pytest-verified; see the oracle section comment)."""
    from aws_medallion_datalake_spark.pipeline.medallion import (
        bronze_ingest,
        gold_build_star,
        register_gold_views,
        silver_refine,
    )

    root = _oracle_root("image_gold_star")
    bronze = bronze_ingest(spark, os.path.join(root, "bronze"), _IMG_ROWS, n_files=8)
    silver = silver_refine(bronze, spark, os.path.join(root, "silver"))
    tables = gold_build_star(silver, spark, os.path.join(root, "gold"))
    register_gold_views(spark, tables)
    n_good = spark.sql(
        "SELECT count(*) AS n FROM gold_quality WHERE status = 'GOOD'"
    ).first()["n"]
    assert int(n_good) >= 5, n_good  # required columns are fully populated
    return spark.sql(
        """SELECT d.ano, d.mes, d.eh_fim_semana, f.fmt_key, m.is_lossy,
                  count(*) AS n_images,
                  sum(f.w) AS sum_w,
                  count(DISTINCT f.image_id) AS n_ids
           FROM gold_fact_images f
           JOIN gold_dim_date d ON f.date_key = d.date_key
           JOIN gold_dim_fmt m ON f.fmt_key = m.fmt_key
           GROUP BY d.ano, d.mes, d.eh_fim_semana, f.fmt_key, m.is_lossy
           ORDER BY d.ano, d.mes, f.fmt_key"""
    )


def q_image_incremental(spark, sf_dir):
    """T5 snapshot-diff consumption: append + MERGE, then an incremental
    consumer reads Table.changes(first, current) and rolls up ONLY the
    new logical rows (append files + merge delta — asserted inline).
    The returned final-state aggregate is hard-checked by a DuckDB
    pure-SQL replay of the flow (see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.operators.merge import merge_into
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import (
        generate_images,
        generate_updates,
    )

    root = _oracle_root("image_incremental")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=4)
    s1 = t.metadata().current_snapshot_id
    t.commit("append", t.write_files(generate_images(spark, 100, n_files=1, start=50_000)))
    m = merge_into(t, spark, generate_updates(spark, _IMG_ROWS, 40, 20, n_files=2))
    delta = t.changes(spark, s1)
    # the incremental consumer's rollup, asserted inline: the delta is
    # exactly the appended rows + the merge's upserted/inserted rows
    n_delta = delta.count()
    assert n_delta == 100 + int(m.summary["rows_updated"]) + int(
        m.summary["rows_inserted"]
    ), n_delta
    assert delta.select("image_id").distinct().count() == n_delta
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_cdc(spark, sf_dir):
    """CDC changelog consumption (Table.changes_cdc): after an append, a
    caption-updating MERGE, and a copy-on-write DELETE, the changelog
    emits updates as delete-of-old + insert-of-new and the delete as a
    lone delete row; compaction emits nothing. The per-change-type
    rollup a retraction consumer would checkpoint is asserted inline;
    the returned final-state aggregate is hard-checked by a DuckDB
    pure-SQL replay of the flow (see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators import compact, delete_where
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.operators.merge import merge_into
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_cdc")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=4)
    s0 = t.metadata().current_snapshot_id
    t.commit("append", t.write_files(generate_images(spark, 60, n_files=1, start=70_000)))
    src = generate_images(spark, 50, n_files=1, start=_IMG_ROWS - 25).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("-v2"))
    )
    merge_into(t, spark, src, key="image_id")
    delete_where(t, spark, [("image_id", "=", "img-%012d" % 1)])
    compact(t, spark, target_file_size_bytes=8 * 1024 * 1024)
    cdc = t.changes_cdc(spark, s0)
    kinds = {
        r["_change_type"]: int(r["n"])
        for r in cdc.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    # append 60 + merge inserts 25 new ids + merge updates re-insert 25;
    # updates also retract 25 old copies, the CoW delete retracts 1;
    # compaction emits nothing (physical-only)
    assert kinds.get("insert", 0) == 60 + 50, kinds
    assert kinds.get("delete", 0) == 25 + 1, kinds
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_mor_merge(spark, sf_dir):
    """Merge-on-read MERGE (operators/merge.py _mor_merge): an upsert
    lands as delta append + positional delete files (O(changes) IO, no
    data-file rewrites — the write path a Morton-clustered table needs),
    then apply_deletes materializes. Per-stage accounting and the
    before/after logical-state identity are asserted inline; the
    returned final-state aggregate is hard-checked by a DuckDB pure-SQL
    replay of the flow (the "-v2" captions must be the surviving
    copies — see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators import apply_deletes
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.operators.merge import merge_into
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_mor_merge")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=4)
    src = generate_images(spark, 60, n_files=1, start=_IMG_ROWS - 30).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("-v2"))
    )
    s = merge_into(t, spark, src, key="image_id", mode="merge-on-read")
    pre = t.scan(spark).agg(
        F.count("*").alias("n"), F.countDistinct("image_id").alias("ids")
    ).first()
    assert int(s.summary["rows_updated"]) == 30
    assert int(s.summary["rows_inserted"]) == 30
    assert int(s.summary["delete_files_added"]) >= 1
    assert int(pre["n"]) == _IMG_ROWS + 30 == int(pre["ids"])
    apply_deletes(t, spark)
    post = t.scan(spark).agg(
        F.count("*").alias("n"), F.countDistinct("image_id").alias("ids")
    ).first()
    assert (int(post["n"]), int(post["ids"])) == (int(pre["n"]), int(pre["ids"]))
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_update(spark, sf_dir):
    """UPDATE ... SET ... WHERE in both Iceberg write modes
    (operators/update.py): a copy-on-write bulk update rewrites only the
    stats-pruned touched files; a merge-on-read sparse update costs
    O(updated rows) (positional deletes + delta append, zero rewrites);
    apply_deletes materializes with identical logical state. Per-stage
    accounting is asserted inline; the returned final-state aggregate
    is hard-checked by a DuckDB pure-SQL replay of the flow (see the
    oracle section comment)."""
    from aws_medallion_datalake_spark.operators import (
        apply_deletes,
        update_where,
    )
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest

    root = _oracle_root("image_update")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=4)
    # deterministic SQL-replayable predicate on a stats column (h), so
    # the pure-SQL oracle can replay exactly which rows are touched
    preds = [("h", "=", 128)]
    cow = update_where(
        t, spark, preds, {"caption": F.concat(F.col("caption"), F.lit(" [cow]"))}
    )
    mor = update_where(
        t,
        spark,
        preds,
        {"caption": F.concat(F.col("caption"), F.lit(" [mor]"))},
        mode="merge-on-read",
    )
    n_mor_visible = (
        t.scan(spark).filter(F.col("caption").endswith(" [mor]")).count()
    )
    apply_deletes(t, spark)
    post = t.scan(spark).agg(
        F.count("*").alias("n"),
        F.sum(F.col("caption").endswith(" [mor]").cast("long")).alias("upd"),
    ).first()
    # per-stage accounting, asserted inline (the RESULT is the hard
    # scan-equality oracle below; these are the engine-internal checks
    # the old rows-only return carried)
    assert int(cow.summary["rows_updated"]) == int(mor.summary["rows_updated"])
    assert int(cow.summary["files_rewritten"]) >= 1
    assert int(mor.summary["delete_files_added"]) >= 1
    assert int(n_mor_visible) == int(mor.summary["rows_updated"])
    assert int(post["n"]) == _IMG_ROWS and int(post["upd"]) == n_mor_visible
    # expire so the live snapshot's files are exactly <root>/t/data/**
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_dyn_overwrite(spark, sf_dir):
    """Dynamic partition overwrite + REPLACE WHERE
    (operators/overwrite.py): the snapshot-isolated versions of the
    reference's daily partition-refresh
    (scripts/bronze_digit_daily.py:184-190). Refresh one ingest_date
    with a dynamic overwrite (exact files drop wholesale, other
    partitions untouched), then replace a height class atomically with
    validation. Per-stage + CDC accounting is asserted inline; the
    returned final-state aggregate is hard-checked by a DuckDB pure-SQL
    replay of the flow (see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators import (
        overwrite_partitions,
        replace_where,
    )
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_dyn_overwrite")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=4)
    s0 = t.metadata().current_snapshot_id
    day = generate_images(spark, 40, n_files=2, start=90000).withColumn(
        "ingest_date", F.lit("2024-01-02")
    )
    ov = overwrite_partitions(t, spark, day)
    n_day = t.scan(
        spark, predicates=[("ingest_date", "=", "2024-01-02")]
    ).count()
    # deterministic SQL-replayable range on a stats column (h=32), with
    # replacement rows forced into the range (replace_where validates)
    preds = [("h", "=", 32)]
    repl = generate_images(spark, 10, n_files=1, start=95000).withColumn(
        "h", F.lit(32)
    )
    rw = replace_where(t, spark, repl, preds)
    cdc = (
        t.changes_cdc(spark, s0)
        .groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    kinds = {r["_change_type"]: int(r["n"]) for r in cdc}
    # accounting invariants, asserted inline (the RESULT is the hard
    # scan-equality oracle; these are the engine-internal checks the old
    # rows-only return carried)
    assert int(ov.summary["rows_inserted"]) == 40 == int(n_day)
    assert int(ov.summary["partitions_replaced"]) == 1
    assert int(rw.summary["rows_inserted"]) == 10
    assert int(t.scan(spark, predicates=preds).count()) == 10
    assert kinds.get("insert", 0) >= 50 and kinds.get("delete", 0) >= 1
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_schema_ops(spark, sf_dir):
    """Schema governance surfaces (tableformat.py): CHECK constraints
    (add validates existing data; writes enforce row-level inside the
    write job), type widening (int→bigint, manifest stats normalized
    first), and mergeSchema append evolution (new column added
    metadata-only, old files read NULL). Per-phase accounting is
    asserted inline; the final logical state — constraint-rejected rows
    absent, 2^40-width widened rows present, license NULL for every
    pre-evolution row — is hard-checked by a DuckDB pure-SQL replay of
    the flow (see the oracle section comment)."""
    import time as _time

    from aws_medallion_datalake_spark.operators.expire import (
        expire_snapshots,
        remove_orphan_files,
    )
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest

    root = _oracle_root("image_schema_ops")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=4)
    from aws_medallion_datalake_spark.sources.generator import generate_images

    t.add_constraint(spark, "pos_dims", "w > 0 AND h > 0")
    bad_rejected = False
    try:
        t.write_files(
            generate_images(spark, 8, n_files=1, start=40000).withColumn(
                "w", F.lit(-1)
            )
        )
    except Exception:
        bad_rejected = True
    assert bad_rejected  # row-level CHECK fired inside the write job
    assert int(t.scan(spark).count()) == _IMG_ROWS
    t.widen_column("w", "bigint")
    wide = generate_images(spark, 12, n_files=1, start=41000).withColumn(
        "w", (F.col("w").cast("bigint") + F.lit(2**40)).cast("bigint")
    )
    t.append(wide)
    assert int(t.scan(spark, predicates=[("w", ">=", 2**40)]).count()) == 12
    lic = generate_images(spark, 6, n_files=1, start=42000).withColumn(
        "license", F.lit("cc-by")
    )
    t.append(lic, merge_schema=True)
    n_lic = int(t.scan(spark).filter(F.col("license") == "cc-by").count())
    n_null = int(t.scan(spark).filter(F.col("license").isNull()).count())
    assert (n_lic, n_null) == (6, _IMG_ROWS + 12)
    assert len(t.constraints()) == 1
    expire_snapshots(t, keep_last=1)
    # the rejected write's task debris (never committed) must not leak
    # into the physical file set the oracle scans
    remove_orphan_files(t, older_than_ms=int(_time.time() * 1000) + 60_000)
    return (
        t.scan(spark)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum("w").alias("sum_w"),
            F.sum((F.col("w") >= 2**40).cast("long")).alias("n_wide"),
            F.sum(F.col("license").isNull().cast("long")).alias("n_null_lic"),
            F.sum(
                _hex15_to_long(F.md5(F.col("image_id"))) % 1000003
            ).alias("id_fp"),
        )
        .orderBy("fmt")
    )


def _sql_image_schema_ops():
    # replay: base 0..399 (license NULL), the rejected batch leaves no
    # trace, widened rows 41000..41011 carry w + 2^40, license rows
    # 42000..42005 carry 'cc-by' (older files read NULL).
    rows = f"""
        SELECT image_id, fmt, CAST(w AS BIGINT) AS w,
               CAST(NULL AS VARCHAR) AS license
          FROM ({_sql_img_rows(0, _IMG_ROWS - 1)})
        UNION ALL
        SELECT image_id, fmt, CAST(w AS BIGINT) + 1099511627776 AS w,
               CAST(NULL AS VARCHAR) AS license
          FROM ({_sql_img_rows(41000, 41011)})
        UNION ALL
        SELECT image_id, fmt, CAST(w AS BIGINT) AS w, 'cc-by' AS license
          FROM ({_sql_img_rows(42000, 42005)})
    """
    return f"""
        SELECT fmt, count(*) AS n, sum(w) AS sum_w,
               sum(CASE WHEN w >= 1099511627776 THEN 1 ELSE 0 END) AS n_wide,
               sum(CASE WHEN license IS NULL THEN 1 ELSE 0 END) AS n_null_lic,
               sum(CAST('0x' || substr(md5(image_id), 1, 15) AS BIGINT)
                   % 1000003) AS id_fp
        FROM ({rows})
        GROUP BY fmt
        ORDER BY fmt
    """


def q_image_live_pipeline(spark, sf_dir):
    """End-to-end LIVE medallion pipeline (the reference's
    EventBridge→Glue→gold daily loop as one streaming composition):
    parquet files land → Structured Streaming appends exactly-once
    (txnAppId contract) → a MERGE applies corrections → the CDC
    changelog feeds the incremental gold rollup (O(changes) per
    refresh, never O(table)) — verified EQUAL to a full recompute
    after every stage (asserted inline). Hard oracle: the base table's
    final-state aggregate is hard-checked by a DuckDB pure-SQL replay —
    exactly-once streaming + the merge must leave exactly 160 logical
    rows with the 20 corrected widths, which the per-partition sum_w
    and content fingerprint witness (see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.operators.merge import merge_into
    from aws_medallion_datalake_spark.pipeline.incremental import (
        create_agg_table,
        refresh_agg,
    )
    from aws_medallion_datalake_spark.sources.generator import generate_images
    from aws_medallion_datalake_spark.sources.tableformat import Table as _Tbl
    from aws_medallion_datalake_spark.streaming.ingest import stream_append

    root = _oracle_root("image_live_pipeline")
    from aws_medallion_datalake_spark.sources.generator import SCHEMA as _S

    t = _Tbl.create(
        os.path.join(root, "t"), _S, partition_cols=["ingest_date"],
        stats_cols=["phash", "image_id", "w"],
    )
    landing = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    groups = ["fmt"]
    measures = {"n_images": ("image_id", "count"), "total_w": ("w", "sum")}

    def _diff(gold):
        got = gold.scan(spark).select("fmt", "n_images", "total_w").filter(
            F.col("n_images") != 0
        )
        want = t.scan(spark).groupBy("fmt").agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.sum("w").cast("double").alias("total_w"),
        )
        return got.exceptAll(want).count() + want.exceptAll(got).count()

    generate_images(spark, 120, n_files=2).write.parquet(landing)
    stream_append(spark, t, landing, ckpt).awaitTermination()
    gold = create_agg_table(
        os.path.join(root, "gold"), t, spark, groups, measures
    )
    agg_ckpt = os.path.join(root, "agg.jsonl")
    r1 = refresh_agg(gold, t, spark, agg_ckpt, groups, measures)
    d1 = _diff(gold)

    generate_images(spark, 40, n_files=1, start=9000).write.mode(
        "append"
    ).parquet(landing)
    stream_append(spark, t, landing, ckpt).awaitTermination()
    upd = generate_images(spark, 20, n_files=1, start=50).withColumn(
        "w", F.col("w") + F.lit(7)
    )
    merge_into(t, spark, upd, key="image_id")
    r2 = refresh_agg(gold, t, spark, agg_ckpt, groups, measures)
    d2 = _diff(gold)

    assert int(r1["result"]) > 0  # first refresh adjusted >= 1 group
    assert int(d1) == 0  # incremental gold == full recompute (batch 1)
    assert int(r2["result"]) > 0
    assert int(d2) == 0  # still equal after stream batch 2 + MERGE
    assert int(t.scan(spark).count()) == 160  # exactly-once appends
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_bucketed_join(spark, sf_dir):
    """Storage-partitioned (co-located) join: two engine tables bucketed
    ``bucket(8, image_id)`` join WITHOUT shuffling either full side —
    per-bucket broadcast hash joins over manifest-listed file groups
    (operators/joins.py bucketed_join; Iceberg SPJ shape). Plan shape
    (no SortMergeJoin, per-bucket broadcasts) and SPJ == plain-join row
    count are asserted inline; the returned join CONTENT (per-fmt
    counts, dim sums, image_id fingerprint) is hard-checked by a DuckDB
    replay — both tables are generator rows, so the match set is
    exactly the id overlap, recomputable in pure SQL."""
    from aws_medallion_datalake_spark.operators.cluster import route_exact
    from aws_medallion_datalake_spark.operators.joins import bucketed_join
    from aws_medallion_datalake_spark.sources import transforms
    from aws_medallion_datalake_spark.sources.generator import (
        SCHEMA,
        generate_images,
    )
    from aws_medallion_datalake_spark.sources.tableformat import Table

    root = _oracle_root("image_bucketed_join")
    tf = transforms.parse("bucket(8, image_id)")

    def _mk(name, n, start):
        t = Table.create(
            os.path.join(root, name),
            SCHEMA,
            partition_cols=["bucket(8, image_id)"],
            stats_cols=["phash", "image_id"],
        )
        df = generate_images(spark, n, n_files=4, start=start)
        t.commit("append", t.write_files(route_exact(df, tf.expr(), 8)))
        return t

    ta = _mk("a", _IMG_ROWS, 0)
    tb = _mk("b", _IMG_ROWS // 2, _IMG_ROWS // 4)
    spj = bucketed_join(
        ta, tb, spark, key="image_id",
        columns_a=["image_id", "w", "h"], columns_b=["image_id", "fmt"],
    )
    n_spj = spj.count()
    n_plain = (
        ta.scan(spark, columns=["image_id"])
        .join(tb.scan(spark, columns=["image_id"]), "image_id")
        .count()
    )
    plan = spj._jdf.queryExecution().executedPlan().toString()
    assert n_spj == n_plain  # SPJ result = plain shuffled join
    assert "SortMergeJoin" not in plan  # neither side shuffled/sorted
    assert plan.count("BroadcastHashJoin") > 0  # per-bucket broadcasts
    fp = _hex15_to_long(F.md5(F.col("image_id")))
    return (
        spj.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("sum_w"),
            F.sum("h").alias("sum_h"),
            F.sum(fp % 1000003).alias("id_fp"),
        )
        .orderBy("fmt")
    )


def _sql_image_bucketed_join():
    # replay: both tables are generator rows (a: 0..399, b: 100..299
    # with identical per-id attributes), so the SPJ match set is
    # exactly the id overlap 100..299 — recomputable in pure SQL.
    return f"""
        SELECT fmt, count(*) AS n, sum(w) AS sum_w, sum(h) AS sum_h,
               sum(CAST('0x' || substr(md5(image_id), 1, 15) AS BIGINT)
                   % 1000003) AS id_fp
        FROM ({_sql_img_rows(100, 299)})
        GROUP BY fmt
        ORDER BY fmt
    """


def q_image_sql_dml(spark, sf_dir):
    """SQL command surface (aws_medallion_datalake_spark/sqlcmd.py): the
    Delta/Iceberg write-side SQL a reference user types — UPDATE /
    DELETE / MERGE / OPTIMIZE ZORDER / ANALYZE — dispatched to the
    engine operators, plus SELECT passthrough at the current snapshot
    (reference consumption layer is pure SQL:
    /root/reference/sql/athena_gold_queries.sql:8-95). Per-statement
    accounting is asserted inline; the returned final-state aggregate is
    hard-checked by a DuckDB pure-SQL replay of the flow — the
    uppercased / merged captions and the deleted row are witnessed by
    the content fingerprint (see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import generate_images
    from aws_medallion_datalake_spark.sqlcmd import EngineSQL

    root = _oracle_root("image_sql_dml")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=4)
    eng = EngineSQL(spark, {"images": t})

    upd = eng.sql(
        "UPDATE images SET caption = upper(caption) WHERE w >= 96"
    ).first()
    # fixed literal key (round-4 VERDICT task 7: head() without an
    # order made "which row gets deleted" manifest-order-dependent)
    one_id = "img-%012d" % 7
    dele = eng.sql(f"DELETE FROM images WHERE image_id = '{one_id}'").first()
    generate_images(spark, 40, n_files=1, start=_IMG_ROWS - 20).createOrReplaceTempView(
        "fixes"
    )
    mrg = eng.sql("MERGE INTO images USING fixes ON image_id").first()
    opt = eng.sql("OPTIMIZE images ZORDER BY (phash, w, h)").first()
    stats = eng.sql(
        "ANALYZE TABLE images COMPUTE STATISTICS FOR COLUMNS image_id"
    ).collect()
    sel = eng.sql("SELECT count(*) AS n FROM images").first()
    assert int(upd["rows_updated"]) > 0
    assert int(dele["rows_deleted"]) == 1
    assert int(mrg["rows_updated"]) + int(mrg["rows_inserted"]) == 40
    assert opt["snapshot_id"] is not None
    assert len(stats) == 1
    assert int(sel["n"]) == _IMG_ROWS - 1 + int(mrg["rows_inserted"])
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_wap(spark, sf_dir):
    """Write-audit-publish ingestion gate: a clean batch stages, passes
    the audit (metadata profile + full decode probe) and publishes; a
    corrupt batch (truncated payloads) is caught by the decode probe and
    never becomes visible to readers. Per-batch gate verdicts and audit
    counters are asserted inline; the corrupt batch is dropped and never
    becomes visible, so the final logical state holds EXACTLY base +
    clean rows — which the returned final-state aggregate witnesses and
    DuckDB hard-checks via a pure-SQL replay (a leaked corrupt row
    would shift both counts and the content fingerprint)."""
    import time as _time

    from aws_medallion_datalake_spark.operators.expire import (
        expire_snapshots,
        remove_orphan_files,
    )
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.pipeline.wap import (
        gated_append,
        image_audit_gate,
    )
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_wap")
    t = bronze_ingest(spark, os.path.join(root, "t"), 200, n_files=4)
    strict = lambda d: image_audit_gate(d, decode_sample_fraction=1.0)  # noqa: E731
    clean = generate_images(spark, 60, n_files=2, start=50_000)
    corrupt = generate_images(spark, 60, n_files=2, start=60_000).withColumn(
        "bytes",
        F.when(
            F.pmod(F.xxhash64("image_id"), F.lit(3)) == 0,
            F.expr("substring(bytes, 1, 16)"),
        ).otherwise(F.col("bytes")),
    )
    ok = gated_append(t, spark, clean, wap_id="clean", gate=strict)
    assert ok["passed"] and ok["published"]
    assert int(ok["metrics"]["rows"]) == 60
    assert int(ok["metrics"]["decode_failures"]) == 0
    bad = gated_append(
        t, spark, corrupt, wap_id="corrupt", gate=strict, drop_on_fail=True
    )
    assert not bad["passed"] and not bad["published"]
    assert int(bad["metrics"]["decode_failures"]) > 0
    assert int(t.scan(spark).count()) == 260  # corrupt batch invisible
    expire_snapshots(t, keep_last=1)
    # the dropped batch's staged files are unreferenced debris — sweep
    # them so the data dirs hold exactly the live file set
    remove_orphan_files(t, older_than_ms=int(_time.time() * 1000) + 60_000)
    return _final_state_frame(t, spark)


def q_image_mor_delete(spark, sf_dir):
    """Merge-on-read DELETE: a sparse predicate delete writes positional
    delete files (zero data files rewritten, zero manifest bytes — the
    snapshot shares the parent's manifest list), scans anti-join the
    suppressed rows out, and apply_deletes later materializes the set
    back to copy-on-write form. Phase accounting is asserted inline; the
    returned final-state aggregate is hard-checked by a DuckDB pure-SQL
    replay of the flow — the suppressed rows must be gone from the
    logical state (see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators import apply_deletes, delete_where
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest

    root = _oracle_root("image_mor_delete")
    t = bronze_ingest(spark, os.path.join(root, "t"), 200, n_files=8)
    # deterministic SQL-replayable predicate on a stats column (h)
    preds = [("h", "=", 32)]
    mor = delete_where(t, spark, preds, mode="merge-on-read")
    n_after_mor = int(t.scan(spark).count())
    assert int(mor.summary["files_rewritten"]) == 0  # zero data IO
    assert len(t.pending_delete_paths()) >= 1
    assert n_after_mor == 200 - int(mor.summary["rows_deleted"])
    app = apply_deletes(t, spark)
    assert int(t.scan(spark).count()) == n_after_mor  # state unchanged
    assert int(app.summary["rows_removed"]) == int(mor.summary["rows_deleted"])
    assert not t.pending_delete_paths()
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_eq_delete(spark, sf_dir):
    """EQUALITY delete (Iceberg v2's second merge-on-read flavor, the
    GDPR/forget-these-keys shape): write only the key-value file —
    O(|keys|) IO, zero data files touched, zero manifest bytes — then
    re-insert one deleted key (sequence rule: files appended after the
    delete are exempt, so the new copy survives), then apply_deletes
    materializes the suppression. Phase accounting is asserted inline;
    the returned final-state aggregate is hard-checked by a DuckDB
    pure-SQL replay of the flow — exactly one copy of the re-inserted
    key, none of the other deleted keys (see the oracle section
    comment)."""
    from aws_medallion_datalake_spark.operators import apply_deletes, equality_delete
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest

    root = _oracle_root("image_eq_delete")
    t = bronze_ingest(spark, os.path.join(root, "t"), 200, n_files=8)
    # fixed literal key set (was an order-free limit(5) — round-4
    # VERDICT task 7): generator ids 0..4
    ids = ["img-%012d" % i for i in range(5)]
    saved = t.scan(spark).filter(F.col("image_id") == ids[0])
    eq = equality_delete(t, spark, ids, cols=["image_id"])

    def counts():
        return (
            int(t.scan(spark).count()),
            int(t.scan(spark).filter(F.col("image_id").isin(ids)).count()),
        )

    assert int(eq.summary["delete_values"]) == 5
    assert counts() == (195, 0) and len(t.pending_eq_deletes()) >= 1
    t.commit("append", t.write_files(saved))  # re-insert one deleted key
    assert counts() == (196, 1)  # sequence rule: the new copy survives
    apply_deletes(t, spark)
    assert counts() == (196, 1) and not t.pending_eq_deletes()
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_image_evolution(spark, sf_dir):
    """Schema + partition-spec evolution, no rewrites: add a column (old
    files read NULL), evolve the partition spec ingest_date → fmt (old
    files keep old stats, new files prune on the new spec). Per-phase
    accounting (visible rows, null counts for the added column, the
    manifest file count a fmt-predicate scan plans) is asserted inline;
    the final logical state — old rows reading NULL for the added
    column, new-spec rows carrying it — is hard-checked by a DuckDB
    pure-SQL replay of the flow (see the oracle section comment)."""
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import generate_images
    from aws_medallion_datalake_spark.sources.tableformat import prune_manifest

    root = _oracle_root("image_evolution")
    t = bronze_ingest(spark, os.path.join(root, "t"), 200, n_files=8)

    def phase():
        meta = t.metadata()
        statable = list(meta.partition_cols) + list(meta.stats_cols)
        planned = len(prune_manifest(t.manifest_pdf(), [("fmt", "=", "png")], statable))
        df = t.scan(spark)
        nulls = (
            df.filter(F.col("quality_score").isNull()).count()
            if "quality_score" in df.columns
            else -1
        )
        return (int(df.count()), int(nulls), int(planned), len(t.manifest_pdf()))

    assert phase()[:2] == (200, -1)  # no quality_score column yet
    t.add_columns("quality_score double")
    n, nulls, _planned, total0 = phase()
    assert (n, nulls) == (200, 200)  # metadata-only add: all NULL
    t.set_partition_spec(["fmt"])
    new = (
        generate_images(spark, 80, n_files=2, start=70_000)
        .filter(F.col("fmt") == "png")
        .withColumn("quality_score", F.lit(0.5))
    )
    t.commit("append", t.write_files(new))
    n, nulls, planned, total = phase()
    n_png_new = n - 200
    assert n_png_new > 0 and nulls == 200  # old rows still NULL
    # new-spec files all prune to fmt='png'; old-spec files lack fmt
    # stats so they stay planned — pruning never drops the new files
    assert total0 < total and planned >= total - total0
    expire_snapshots(t, keep_last=1)
    return (
        t.scan(spark)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("quality_score").isNull().cast("long")).alias("n_null_qs"),
            F.sum("w").alias("sum_w"),
            F.round(F.sum(F.coalesce(F.col("quality_score"), F.lit(0.0))), 3).alias(
                "sum_qs"
            ),
        )
        .orderBy("fmt")
    )


def _sql_image_evolution():
    # replay: base 0..199 read NULL for the added quality_score; the
    # new-spec append is rows 70000..70079 filtered to png (i%5 != 0)
    # each carrying quality_score = 0.5.
    rows = f"""
        SELECT fmt, w, CAST(NULL AS DOUBLE) AS quality_score
          FROM ({_sql_img_rows(0, 199)})
        UNION ALL
        SELECT fmt, w, 0.5 AS quality_score
          FROM ({_sql_img_rows(70000, 70079)}) WHERE fmt = 'png'
    """
    return f"""
        SELECT fmt, count(*) AS n,
               sum(CASE WHEN quality_score IS NULL THEN 1 ELSE 0 END) AS n_null_qs,
               sum(w) AS sum_w,
               round(sum(coalesce(quality_score, 0.0)), 3) AS sum_qs
        FROM ({rows})
        GROUP BY fmt
        ORDER BY fmt
    """


def q_image_rename(spark, sf_dir):
    """Column rename/drop as metadata-only ops over plain parquet.

    Iceberg does this with field ids; the engine keeps a name-mapping
    (`schema.name-mapping` table property) and reads through
    `Table.read_data`, which coalesces a column's name generations.
    Phases: rename caption→caption_text (zero rewrites, old files still
    carry the old physical name), append new-generation files, compact
    (physical migration), drop a column. Per-phase accounting (visible
    rows, non-null caption_text rows, how many live files physically
    carry the NEW name — 0 right after the rename, all after
    compaction) is asserted inline; after expiry the live files all
    carry the migrated name, so DuckDB hard-checks the final logical
    state — per-ingest_date counts and an (image_id, caption_text)
    content fingerprint — straight over the physical files (the dropped
    ``fmt`` column merely goes unselected)."""
    import pyarrow.parquet as _pq

    from aws_medallion_datalake_spark.operators.compact import compact
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_rename")
    t = bronze_ingest(spark, os.path.join(root, "t"), 200, n_files=8)

    def phase():
        df = t.scan(spark)
        cap = (
            df.filter(F.col("caption_text").isNotNull()).count()
            if "caption_text" in df.columns
            else -1
        )
        man = t.manifest_pdf()
        migrated = sum(
            "caption_text"
            in _pq.read_schema(os.path.join(t.root, p)).names
            for p in man["path"]
        )
        return (int(df.count()), int(cap), int(migrated), len(man))

    assert phase() == (200, -1, 0, 8)  # initial: old name everywhere
    t.rename_column("caption", "caption_text")
    n, cap, migrated, total = phase()
    assert (n, cap, migrated) == (200, 200, 0)  # metadata-only rename
    new = generate_images(spark, 60, n_files=2, start=80_000).withColumnRenamed(
        "caption", "caption_text"
    )
    t.commit("append", t.write_files(new))
    n, cap, migrated, total = phase()
    assert (n, cap) == (260, 260) and 0 < migrated < total
    compact(t, spark, target_file_size_bytes=1 << 22)
    n, cap, migrated, total = phase()
    assert (n, cap) == (260, 260) and migrated == total  # all migrated
    t.drop_column("fmt")
    assert "fmt" not in t.scan(spark).columns
    expire_snapshots(t, keep_last=1)
    fp = _hex15_to_long(
        F.md5(
            F.concat_ws(
                "|",
                F.col("image_id"),
                F.coalesce(F.col("caption_text"), F.lit("<null>")),
            )
        )
    )
    return (
        t.scan(spark)
        .groupBy("ingest_date")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("image_id").alias("n_ids"),
            F.sum("w").alias("sum_w"),
            F.sum(fp % 1000003).alias("content_fp"),
        )
        .orderBy("ingest_date")
    )


def _sql_image_rename():
    # replay: rename caption→caption_text is metadata-only (values
    # unchanged); rows are base 0..199 plus the new-generation append
    # 80000..80059; compaction/drop-column don't change these columns.
    rows = f"""
        SELECT image_id, w, caption AS caption_text, ingest_date
          FROM ({_sql_img_rows(0, 199)})
        UNION ALL
        SELECT image_id, w, caption AS caption_text, ingest_date
          FROM ({_sql_img_rows(80000, 80059)})
    """
    return f"""
        SELECT ingest_date, count(*) AS n,
               count(DISTINCT image_id) AS n_ids,
               sum(w) AS sum_w,
               sum(CAST('0x' || substr(md5(image_id || '|' ||
                     coalesce(caption_text, '<null>')), 1, 15) AS BIGINT)
                   % 1000003) AS content_fp
        FROM ({rows})
        GROUP BY ingest_date
        ORDER BY ingest_date
    """


def q_image_features_ann(spark, sf_dir):
    """Multimodal chain: decode → grid-feature embedding (Arrow UDF) →
    brute-force cosine top-10 against image 0 — the image analogue of
    embedding_topk.

    Hard oracle: the engine-computed 48-dim embeddings are landed at a
    fixed root (the decode step is engine-only, but the SEARCH over the
    landed vectors is pure math), and DuckDB recomputes the cosine
    top-10 from the same stored floats — ranking, rounding, and
    tie-break must match exactly."""
    from aws_medallion_datalake_spark.functions.multimodal import image_features_udf
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_features_ann")
    generate_images(spark, 300, n_files=4).select(
        "image_id", image_features_udf(F.col("bytes"), grid=4).alias("emb")
    ).write.parquet(os.path.join(root, "features"))
    df = spark.read.parquet(os.path.join(root, "features"))
    qrow = df.filter(F.col("image_id") == "img-000000000000").select(
        F.transform("emb", lambda x: x.cast("double")).alias("qemb")
    )
    return (
        df.crossJoin(F.broadcast(qrow))
        .select(
            "image_id",
            F.round(_cosine(F.col("emb"), F.col("qemb")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("image_id"))
        .limit(10)
    )


def _sql_image_features_ann():
    root = os.path.join(_ORACLE_STATE_ROOT, "image_features_ann")
    feat = f"read_parquet('{root}/features/*.parquet')"
    return f"""
        WITH q AS (
            SELECT i,
                   (SELECT emb FROM {feat}
                    WHERE image_id = 'img-000000000000')[i]::DOUBLE AS v
            FROM generate_series(1, 48) g(i)),
        e AS (SELECT image_id, i, emb[i]::DOUBLE AS v
              FROM {feat}, generate_series(1, 48) g(i))
        SELECT e.image_id,
               round(sum(e.v * q.v) /
                     (sqrt(sum(e.v * e.v)) * sqrt(sum(q.v * q.v))), 4) AS cos_sim
        FROM e JOIN q USING (i)
        GROUP BY e.image_id
        ORDER BY cos_sim DESC, image_id ASC LIMIT 10
    """


def q_image_phash_neardup(spark, sf_dir):
    """Near-duplicate IMAGE detection via banded Hamming join over the
    stored 64-bit phash column (input_hint schema) — the image analogue
    of simhash_hamming_pairs. The generator plants a hot-phash tail
    (~10% of rows collapse into 4 exact-dup buckets, FIXTURES.md §1),
    so the pair graph is dominated by distance-0 cliques; returns the
    deterministic (hamming, n_pairs) histogram.

    Hard oracle — LSH recall vs GROUND TRUTH: with max_distance=8 the
    banded join uses 9 bands and no bucket cap, so pigeonhole recall is
    exact; the (image_id, phash) projection is landed at a fixed root
    and DuckDB brute-forces the all-pairs bit_count(xor()) histogram
    over it. Any pair the banding misses (or invents) breaks the match."""
    from aws_medallion_datalake_spark.functions.hamming import hamming_pairs
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_phash_neardup")
    generate_images(spark, 600, n_files=4).select("image_id", "phash").write.parquet(
        os.path.join(root, "input")
    )
    df = spark.read.parquet(os.path.join(root, "input"))
    pairs = hamming_pairs(df, "image_id", "phash", max_distance=8)
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


def _sql_image_phash_neardup():
    root = os.path.join(_ORACLE_STATE_ROOT, "image_phash_neardup")
    return f"""
        SELECT hamming, count(*) AS n_pairs
        FROM (
            SELECT CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
            FROM read_parquet('{root}/input/*.parquet') a
            JOIN read_parquet('{root}/input/*.parquet') b
              ON a.image_id < b.image_id
        )
        WHERE hamming <= 8
        GROUP BY hamming
        ORDER BY hamming
    """


def q_image_quality_filter(spark, sf_dir):
    """Decoded-pixel quality gating — the image-side twin of doc_quality:
    Laplacian-variance blur score + brightness/contrast per image
    (functions/multimodal.image_quality_udf, Arrow-batched numpy — no
    per-row Python), thresholds classify keep / too_blurry /
    low_contrast. At 10^12 images this is one map-only decode pass
    feeding a tiny agg — the standard pretraining quality-filter stage.

    Partial oracle (round-4 VERDICT task 6): the returned frame carries
    the DECODE-INDEPENDENT invariants — per-fmt row counts, distinct
    ids, and n_decoded (every synthetic payload must decode, so
    n_decoded == n) — which DuckDB replays from the generator row
    function. The decode-DEPENDENT histogram (per-class counts + float
    score stats) is asserted inline: every class populated, no
    undecodable rows, scores in range."""
    from aws_medallion_datalake_spark.functions.multimodal import (
        image_quality_udf,
    )
    from aws_medallion_datalake_spark.sources.generator import generate_images

    df = generate_images(spark, 600, n_files=4)
    q = df.select("image_id", "fmt", image_quality_udf(F.col("bytes")).alias("q"))
    q = q.select("image_id", "fmt", "q.blur", "q.brightness", "q.contrast")
    status = (
        F.when(F.col("blur").isNull(), "undecodable")
        .when(F.col("blur") < 2000.0, "too_blurry")
        .when(F.col("contrast") < 30.0, "low_contrast")
        .otherwise("keep")
    )
    hist = {
        r["status"]: int(r["n"])
        for r in q.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # decode-dependent half, inline: all classes populated, nothing
    # undecodable, classification total preserved
    assert hist.get("undecodable", 0) == 0, hist
    assert min(hist.get(k, 0) for k in ("keep", "too_blurry", "low_contrast")) > 0, hist
    assert sum(hist.values()) == 600, hist
    return (
        q.groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("blur").isNotNull().cast("long")).alias("n_decoded"),
            F.countDistinct("image_id").alias("n_ids"),
        )
        .orderBy("fmt")
    )


def _sql_image_quality_filter():
    # decode-independent invariants replayed from the generator row
    # function; n_decoded == n because every synthetic payload decodes
    return f"""
        SELECT fmt, count(*) AS n, count(*) AS n_decoded,
               count(DISTINCT image_id) AS n_ids
        FROM ({_sql_img_rows(0, 599)})
        GROUP BY fmt
        ORDER BY fmt
    """


def q_image_dedup_verified(spark, sf_dir):
    """Candidate→verify image dedup — the two-stage shape a 10^12-image
    pipeline actually runs: banded Hamming join over the 64-bit phash
    emits CANDIDATE pairs (bucketed, never all-pairs), then only those
    pairs decode their payloads for pixel-level PSNR verification
    (psnr_udf; >= 40 dB = duplicate, the north_rule threshold). The
    expensive decode runs on O(candidates), not O(n²) — the same
    economics as MinHash→Jaccard for text.

    Partial oracle (round-4 VERDICT task 6): the (image_id, phash)
    projection is landed at a fixed root (the pattern the driver-green
    image_phash_neardup uses) and DuckDB brute-forces the all-pairs
    candidate histogram as ground truth; the returned frame carries
    (hamming, n_pairs, n_scored) where n_scored — pairs whose PSNR
    verification actually produced a score — must equal n_pairs (every
    payload decodes). The decode-DEPENDENT verdict split is asserted
    inline: identical hot-tail rows (distance 0, same dims) verify as
    duplicates, and no pair scores NULL."""
    from aws_medallion_datalake_spark.functions.hamming import hamming_pairs
    from aws_medallion_datalake_spark.functions.udfs import psnr_udf
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_dedup_verified")
    df = generate_images(spark, 600, n_files=4).select(
        "image_id", "phash", "bytes"
    )
    df.select("image_id", "phash").write.parquet(os.path.join(root, "input"))
    keys = spark.read.parquet(os.path.join(root, "input"))
    pairs = hamming_pairs(keys, "image_id", "phash", max_distance=8)
    a = df.select(
        F.col("image_id").alias("image_id_a"),
        F.col("bytes").alias("bytes_a"),
    )
    b = df.select(
        F.col("image_id").alias("image_id_b"),
        F.col("bytes").alias("bytes_b"),
    )
    j = pairs.join(a, "image_id_a").join(b, "image_id_b")
    scored = j.select(
        "hamming", psnr_udf(F.col("bytes_a"), F.col("bytes_b")).alias("psnr")
    ).persist()
    verdicts = scored.agg(
        F.count("*").alias("n"),
        F.sum(F.col("psnr").isNull().cast("long")).alias("n_null"),
        F.sum((F.col("psnr") >= 40.0).cast("long")).alias("n_dup"),
        F.sum(
            ((F.col("hamming") == 0) & (F.col("psnr") >= 40.0)).cast("long")
        ).alias("n_dup_d0"),
    ).first()
    # decode-dependent half, inline: every candidate scored; the exact
    # hot-tail duplicates (same seed AND same dims) verify at >= 40 dB
    assert int(verdicts["n_null"]) == 0, verdicts
    assert int(verdicts["n_dup_d0"]) >= 1, verdicts
    assert int(verdicts["n_dup"]) >= int(verdicts["n_dup_d0"]), verdicts
    out = (
        scored.groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("psnr").isNotNull().cast("long")).alias("n_scored"),
        )
        .orderBy("hamming")
    )
    rows = out.collect()
    scored.unpersist()
    return spark.createDataFrame(rows, out.schema)


def _sql_image_dedup_verified():
    # ground truth by brute force over the landed (image_id, phash)
    # projection — any pair the banding misses (or invents) breaks the
    # match; n_scored == n_pairs because every payload decodes
    root = os.path.join(_ORACLE_STATE_ROOT, "image_dedup_verified")
    return f"""
        SELECT hamming, count(*) AS n_pairs, count(*) AS n_scored
        FROM (
            SELECT CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
            FROM read_parquet('{root}/input/*.parquet') a
            JOIN read_parquet('{root}/input/*.parquet') b
              ON a.image_id < b.image_id
        )
        WHERE hamming <= 8
        GROUP BY hamming
        ORDER BY hamming
    """


def q_image_dup_caption_audit(spark, sf_dir):
    """Cross-modal dedup audit: pixel-duplicate groups (exact phash
    match) whose CAPTIONS diverge — the training-data contamination case
    where one image recurs under many labels (hot-tail rows share 4 base
    patterns but every row's caption is unique). Returns the
    deterministic (n_images, n_captions, n_groups) histogram of dup
    groups. Hard oracle: the (phash, caption) projection is landed at a
    fixed root and DuckDB recomputes the identical two-level histogram
    over it."""
    from aws_medallion_datalake_spark.sources.generator import generate_images

    root = _oracle_root("image_dup_caption_audit")
    generate_images(spark, 600, n_files=4).select("phash", "caption").write.parquet(
        os.path.join(root, "input")
    )
    df = spark.read.parquet(os.path.join(root, "input"))
    groups = df.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.countDistinct("caption").alias("n_captions"),
    )
    return (
        groups.filter(F.col("n_images") > 1)
        .groupBy("n_images", "n_captions")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .orderBy("n_images", "n_captions")
    )


def _sql_image_dup_caption_audit():
    root = os.path.join(_ORACLE_STATE_ROOT, "image_dup_caption_audit")
    return f"""
        SELECT n_images, n_captions, count(*) AS n_groups
        FROM (
            SELECT phash, count(*) AS n_images,
                   count(DISTINCT caption) AS n_captions
            FROM read_parquet('{root}/input/*.parquet')
            GROUP BY phash
        )
        WHERE n_images > 1
        GROUP BY n_images, n_captions
        ORDER BY n_images, n_captions
    """


def q_image_medallion(spark, sf_dir):
    """bronze→silver→gold medallion pipeline over the synthetic
    image+caption table (BASELINE.json input_hint shape); returns the
    gold fact's SQL-recomputable measures read back through the
    engine's gold table. Hard oracle: DuckDB replays the gold aggregate
    from the generator row function — proving the bronze→silver→gold
    build and the gold table round-trip (the codec-dependent gold
    measures, n_distinct_phash / total_bytes, stay pytest-verified)."""
    from aws_medallion_datalake_spark.pipeline.medallion import (
        bronze_ingest,
        gold_build,
        silver_refine,
    )

    root = _oracle_root("image_medallion")
    bronze = bronze_ingest(spark, os.path.join(root, "bronze"), _IMG_ROWS, n_files=8)
    silver = silver_refine(bronze, spark, os.path.join(root, "silver"))
    gold = gold_build(silver, spark, os.path.join(root, "gold"))
    return (
        gold.scan(spark)
        .select(
            "ingest_date",
            "fmt",
            "n_images",
            F.round("avg_pixels", 4).alias("avg_pixels"),
            "min_w",
            "max_w",
        )
        .orderBy("ingest_date", "fmt")
    )


def q_image_maintenance(spark, sf_dir):
    """compact → cluster(hilbert) → merge → delete → expire on the image
    table, then the post-maintenance scan aggregate (deterministic
    invariants + content fingerprint per partition). The delete stage
    removes a deterministic height class via stats-pruned copy-on-write
    (operators/delete.py — h is a stats column, so untouched files
    prune out), so the final aggregate also witnesses row-level delete
    correctness. Hard oracle: DuckDB replays the full flow from the
    generator row function (pure SQL, no filesystem coupling)."""
    from aws_medallion_datalake_spark.operators.cluster import cluster
    from aws_medallion_datalake_spark.operators.compact import compact
    from aws_medallion_datalake_spark.operators.delete import delete_where
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.operators.merge import merge_into
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import generate_updates

    root = _oracle_root("image_maintenance")
    t = bronze_ingest(spark, os.path.join(root, "t"), _IMG_ROWS, n_files=8)
    compact(t, spark, target_file_size_bytes=1 << 22)
    cluster(t, spark, curve="hilbert", target_file_size_bytes=1 << 22)
    src = generate_updates(spark, _IMG_ROWS, 40, 20, n_files=4)
    merge_into(t, spark, src, key="image_id", target_file_size_bytes=1 << 22)
    delete_where(t, spark, [("h", "=", 32)])  # deterministic height class
    expire_snapshots(t, keep_last=1)
    return _final_state_frame(t, spark)


def q_orders_rollup(spark, sf_dir):
    """Hierarchical ROLLUP aggregation (subtotals + grand total).

    Beyond the reference (SURVEY §2.4 notes it has no grouping sets);
    the engine exposes Spark's native ``rollup`` — partial aggregation
    per grouping set, one shuffle, no repeated scans. NULL grouping
    markers are normalized to 'ALL' so the oracle repr matches.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


def _sql_orders_rollup():
    return """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """


def q_rank_topn_per_group(spark, sf_dir):
    """Top-N per group via dense_rank (the "latest/biggest K per key"
    workhorse, SURVEY §2.5): top-2 orders by price per customer segment.
    One shuffle on the partition key; the rank filter prunes before any
    further join. Ties broken by o_orderkey for engine-stable output."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    from pyspark.sql import Window

    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == c["c_custkey"],
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 2)
        .select(
            "c_mktsegment",
            "rnk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("c_mktsegment", "rnk")
    )


def _sql_rank_topn_per_group():
    return """
        SELECT c_mktsegment, rnk, o_orderkey,
               round(o_totalprice, 2) AS total_price
        FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   dense_rank() OVER (
                       PARTITION BY c.c_mktsegment
                       ORDER BY o.o_totalprice DESC, o.o_orderkey
                   ) AS rnk
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        )
        WHERE rnk <= 2
        ORDER BY c_mktsegment, rnk
    """


def q_moving_avg(spark, sf_dir):
    """Sliding-frame window aggregate (SURVEY §2.5): 7-day moving
    average of daily order revenue.

    The window is PARTITIONED BY YEAR with the previous year's last six
    rows carried into each partition as frame-only padding (standard
    overlap-padding for cross-partition sliding frames), so no
    single-partition WindowExec ever materializes: at 10^12 orders the
    daily rollup is bounded (~10^4 rows) but the plan shape stays
    parallel and the WindowExec single-partition warning is gone. Carried
    rows feed frames only and are dropped from the output."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    base = daily.select(
        F.year("d").alias("part"), "d", "revenue", F.lit(False).alias("carry")
    )
    wy = Window.partitionBy(F.year("d")).orderBy(F.desc("d"))
    pad = (
        daily.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= 6)
        .select(
            (F.year("d") + 1).alias("part"),
            "d",
            "revenue",
            F.lit(True).alias("carry"),
        )
    )
    w = Window.partitionBy("part").orderBy("d").rowsBetween(-6, 0)
    return (
        base.unionByName(pad)
        .select(
            "part",
            "d",
            "revenue",
            F.round(F.avg("revenue").over(w), 2).alias("ma7"),
            "carry",
        )
        .filter(~F.col("carry"))
        .select("d", "revenue", "ma7")
        .orderBy("d")
        .limit(200)
    )


def _sql_moving_avg():
    return """
        SELECT d, revenue,
               round(avg(revenue) OVER (
                   ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ), 2) AS ma7
        FROM (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        )
        ORDER BY d LIMIT 200
    """


def q_cube_agg(spark, sf_dir):
    """CUBE aggregation (all grouping-set combinations, SURVEY §2.4):
    lineitem counts and quantity by (returnflag, linestatus) with every
    subtotal — one shuffle for all four grouping sets via Spark's
    native ``cube`` (the reference recomputes each rollup as a separate
    Athena query)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def _sql_cube_agg():
    return """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """


def q_except_customers(spark, sf_dir):
    """Set difference (SURVEY §2.7 beyond UNION): customers with a
    finished ('F') order who never placed an open ('O') one — EXCEPT
    compiles to distinct + anti-join in one plan, no driver
    set-building; both branches are one column-pruned scan each."""
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    # subtract = SQL EXCEPT (set semantics: distinct minus distinct)
    return f.subtract(op).orderBy("o_custkey")


def _sql_except_customers():
    return """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey
    """


def q_asof_join(spark, sf_dir):
    """Backward AS-OF join (attribution): every purchase event matched
    to the user's latest view event at or before it.

    Beyond the reference (equi-joins only); Spark lacks ASOF JOIN, so
    ``operators/joins.py::asof_join`` composes it as union-tag + one
    running ``last(ignorenulls)`` window — ONE key shuffle, linear
    per-partition scan, no inequality-join blowup (plan shape and the
    hot-key note in that module's docstring). Ties on the view
    timestamp resolve to the greatest (event_id) payload, matching the
    oracle's max-at-max-ts subquery exactly.
    """
    from aws_medallion_datalake_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("last_view_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        right_time="ts",
        payload_cols=["last_view_id"],
    ).select("purchase_id", "user_id", "last_view_id")


def _sql_asof_join():
    return """
        WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
             p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        SELECT p.event_id AS purchase_id, p.user_id,
               (SELECT max(v.event_id) FROM v
                WHERE v.user_id = p.user_id AND v.ts =
                  (SELECT max(v2.ts) FROM v v2
                   WHERE v2.user_id = p.user_id AND v2.ts <= p.ts)) AS last_view_id
        FROM p
    """


def q_range_join(spark, sf_dir):
    """Point-in-interval RANGE join: lineitems shipped inside each
    order's first week ([o_orderdate, +7 days)), counted per order.

    Beyond the reference; a naive inequality join is an O(n·m) cross
    product, so ``operators/joins.py::range_join`` reduces it to an
    equi-join on 7-day buckets (intervals explode to ≤2 buckets, points
    map to 1) + exact filter — the bucket is the shuffle key that keeps
    the join linear at 100 TB, and hot buckets are ordinary equi-join
    skew that AQE splits.

    Aggregate pushdown: every overlapping window matches ~nM lineitems,
    so the joined relation is |lineitem| × window_days rows — ~250M at
    sf0.1 — while the JOIN KEY (l_shipdate, a date) has ~2.5k distinct
    values at any scale. Since the final aggregate only needs per-date
    partial sums, lineitem is pre-aggregated BY DATE before the range
    join and the partials combined after: the join shrinks from
    rows × days to dates × days pairs (~1M) with identical results —
    the standard partial-aggregation push through a range join on a
    low-cardinality point column, and the only plan that survives
    10^12 lineitems.
    """
    from aws_medallion_datalake_spark.operators.joins import range_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").alias("win_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("win_end"),
    )
    l = (  # noqa: E741
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_shipdate")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("_qty"),
        )
    )
    joined = range_join(
        l,
        o,
        point_col="l_shipdate",
        start_col="win_start",
        end_col="win_end",
        bucket_width=7 * 86400,
    )
    return joined.groupBy("o_orderkey").agg(
        F.sum("_cnt").alias("n_ship"),
        F.sum("_qty").alias("sum_qty"),
    )


def _sql_range_join():
    return """
        SELECT o.o_orderkey, count(*) AS n_ship,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM orders o
        JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o.o_orderkey
    """


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf_dir):
    """PIVOT: hour-of-day × event-type count matrix.

    Beyond the reference. The pivot VALUE LIST is fixed (no
    discover-distinct-values pre-job): the plan is a single partial+
    final hash aggregate with one conditional-count column per type —
    static plan width, one shuffle, scale-independent.
    """
    e = _t(spark, sf_dir, "events")
    piv = (
        e.groupBy(F.hour("ts").cast("int").alias("hora"))
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "hora", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _PIVOT_TYPES]
    )


def _sql_events_pivot():
    cols = ",\n               ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS {t}"
        for t in _PIVOT_TYPES
    )
    return f"""
        SELECT CAST(hour(ts) AS INTEGER) AS hora,
               {cols}
        FROM events GROUP BY 1
    """


def q_customers_no_orders(spark, sf_dir):
    """LEFT ANTI join (TPC-H Q22 shape): customers with no orders.

    At 100 TB the anti-join shuffles only the two key columns
    (projection first), and positive-acctbal filtering happens before
    the shuffle so dead rows never move.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def _sql_customers_no_orders():
    return """
        SELECT c_mktsegment, count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c_acctbal > 0.0
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
    """


def q_returned_orders_semi(spark, sf_dir):
    """LEFT SEMI join (TPC-H Q4 shape): orders with >= 1 returned item.

    The semi join deduplicates the probe side inside the join (no
    distinct pre-agg needed) and shuffles only l_orderkey.
    """
    o = _t(spark, sf_dir, "orders")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def _sql_returned_orders_semi():
    return """
        SELECT o_orderpriority, count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
    """


def q_quantity_quartiles(spark, sf_dir):
    """Exact interpolated quartiles per group (Spark `percentile`).

    Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    linear-interpolation definition rank = q*(n-1), lerp(lo, hi, frac).
    Probs 0.25/0.5/0.75 are exact binary fractions and l_quantity is
    integer-valued, so the interpolation arithmetic is EXACT in IEEE
    doubles — the oracle comparison is bit-stable, not
    rounding-boundary-lucky. At scale the approximate sketch
    (`approx_percentile`) is the drop-in; this entry pins the exact
    semantics it approximates.
    """
    li = _t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").alias("qs"),
        F.count("*").alias("n_items"),
    )
    return q.select(
        "l_returnflag",
        "l_linestatus",
        "n_items",
        F.col("qs")[0].alias("q1"),
        F.col("qs")[1].alias("median"),
        F.col("qs")[2].alias("q3"),
    )


def _sql_quantity_quartiles():
    return """
        SELECT l_returnflag, l_linestatus, count(*) AS n_items,
               quantile_cont(l_quantity, 0.25) AS q1,
               quantile_cont(l_quantity, 0.5) AS median,
               quantile_cont(l_quantity, 0.75) AS q3
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """


_NSALT = 8


def q_salted_supplier_revenue(spark, sf_dir):
    """Skew-salted fact⋈dim join with identical semantics to the plain join.

    Demonstrates the documented hot-key recipe (SURVEY §2.3): the fact
    side derives a deterministic salt from its own key, the dim side is
    exploded x NSALT, and the join key becomes (suppkey, salt) — a hot
    supplier's rows spread over NSALT reducers instead of one. The
    oracle is the UNSALTED join: same rows, proving the rewrite is
    semantics-preserving. (With a broadcastable dim Spark would skip the
    shuffle entirely; the salt path is the non-broadcastable-dim story.)
    """
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_orderkey"), F.lit(_NSALT)).cast("int")
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(_NSALT)])))
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (li.salt == sup.salt),
            "inner",
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def _sql_salted_supplier_revenue():
    return """
        SELECT n_name, count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """


def q_small_qty_revenue(spark, sf_dir):
    """Correlated scalar subquery, decorrelated (TPC-H Q17 shape):
    revenue from line items whose quantity is below 20% of the part's
    own average quantity.

    Spark-first decorrelation: the per-row subquery becomes a WINDOW
    average over l_partkey — strictly better than the
    grouped-agg-join-back plan Catalyst's own decorrelation produces,
    because the fact subtree is scanned ONCE (the join-back form plans
    the filtered fact twice: once for the probe sort, once under the
    aggregate — measured as 3 exchanges vs this plan's 2). At 100 TB
    the brand filter broadcasts (small part dim) so the fact is
    filtered at the scan, then exactly one hash exchange on l_partkey
    feeds both the window and the comparison.

    Exactness: l_quantity is integer-valued, so sum/avg are exact in
    IEEE doubles regardless of partial-agg order; the 0.2*avg threshold
    comparison is therefore bit-stable against the oracle.
    Reference parity: the correlated-subquery consumption pattern the
    Athena layer supports (sql/athena_gold_queries.sql consumers).
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    flt = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        flt.withColumn("qty_lim", F.avg("l_quantity").over(w) * F.lit(0.2))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


def _sql_small_qty_revenue():
    return """
        SELECT count(*) AS n_items,
               round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#12'
          AND l.l_quantity < (SELECT avg(l2.l_quantity) * 0.2
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """


def q_big_orders(spark, sf_dir):
    """IN-subquery with aggregate HAVING (TPC-H Q18 shape): the top
    orders whose line items total more than 180 units.

    Spark-first: the IN (SELECT … GROUP BY … HAVING …) membership test
    decorrelates to one grouped aggregate + an equi-join — the
    aggregate is computed ONCE and reused both as the filter and as the
    output measure (the oracle's subquery recomputes it). Top-10
    compiles to TakeOrderedAndProject: no global sort materializes.
    sum(l_quantity) over integer-valued doubles is exact, so the
    HAVING boundary is bit-stable.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180.0)
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


def _sql_big_orders():
    return """
        SELECT o.o_orderkey, o.o_totalprice, sum(l.l_quantity) AS total_qty
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey
                               HAVING sum(l_quantity) > 180.0)
        GROUP BY o.o_orderkey, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 10
    """


def q_disjunctive_parts(spark, sf_dir):
    """Disjunctive multi-clause join predicate (TPC-H Q19 shape):
    revenue over OR-ed (brand, size-range, quantity-range) clause
    groups.

    Spark-first: the brand disjunction is factored into a conjunctive
    part-side pre-filter (p_brand IN …, p_size <= 15) so the dim shrinks
    BEFORE the broadcast and the scan prunes on the pushed IN-list; the
    residual OR evaluates post-join on already-matched rows only. At
    100 TB the win is that the fact side never shuffles — the filtered
    part dim broadcasts.
    """
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size") <= 5)
            & F.col("l_quantity").between(1.0, 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(10.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20.0, 30.0)
        )
    )
    return j.filter(clause).agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


def _sql_disjunctive_parts():
    return """
        SELECT count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1.0 AND 11.0)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10.0 AND 20.0)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20.0 AND 30.0)
    """


def q_above_avg_balance(spark, sf_dir):
    """Uncorrelated scalar subquery (TPC-H Q22 shape): customers whose
    balance exceeds the average positive balance.

    Spark-first: the scalar subquery becomes a 1-row aggregate
    broadcast-cross-joined onto the table — no driver collect, no
    second pass; the threshold rides along as a column and the filter
    stays in whole-stage codegen. (float caveat: avg over doubles is
    partial-agg-order dependent at the last ulp; acctbal granularity
    ~0.01 dwarfs that, so membership is stable.)
    """
    c = _t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("thr"))
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def _sql_above_avg_balance():
    return """
        SELECT c_mktsegment, count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
        GROUP BY c_mktsegment
    """


def q_order_count_distribution(spark, sf_dir):
    """Two-level aggregate over an outer join (TPC-H Q13 shape): the
    distribution of per-customer order counts, zero-order customers
    included.

    Spark-first: the orders side is filtered BEFORE the left join (the
    SQL form must put the predicate in the ON clause to keep
    zero-order customers; pre-filtering the right side is the
    equivalent pushed-down plan). The second aggregate's key
    (c_count) has tiny cardinality, so the second shuffle moves a few
    hundred rows regardless of table size. All-integer measures —
    bit-stable oracle comparison.
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def _sql_order_count_distribution():
    return """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c
              LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                                AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """


def q_cheapest_supplier_per_part(spark, sf_dir):
    """Min-per-group join-back (TPC-H Q2 shape): for every Brand#12
    part, the minimum line-item price and how many line items hit it.

    Spark-first decorrelation: the correlated `= (SELECT min(…) WHERE
    same part)` becomes ONE grouped aggregate joined back on the
    grouping key. The back-join keys on l_partkey, the same column the
    aggregate just shuffled on, so Catalyst reuses the exchange — one
    shuffle total; the brand dim broadcasts before any of it, so at
    100 TB the fact is pre-filtered at the scan. Equality on the min is
    exact: the join-back compares the double against itself (min
    returns one of the inputs bit-for-bit, no arithmetic).
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    flt = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_extendedprice"
    )
    mins = flt.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_p")
    )
    return (
        flt.join(mins, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("min_p"))
        .groupBy("l_partkey")
        .agg(
            F.round(F.min("min_p"), 2).alias("min_price"),
            F.count("*").alias("n_at_min"),
        )
    )


def _sql_cheapest_supplier_per_part():
    return """
        SELECT l.l_partkey,
               round(l.l_extendedprice, 2) AS min_price,
               count(*) AS n_at_min
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#12'
          AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                                   FROM lineitem l2
                                   WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey, l.l_extendedprice
    """


def q_sole_returner(spark, sf_dir):
    """Correlated EXISTS + NOT EXISTS on the same fact (TPC-H Q21
    shape): suppliers whose line item was RETURNED in a multi-supplier
    order where no OTHER supplier's item was returned — top 10.

    Spark-first: both correlated quantifiers decorrelate to self-joins
    on l_orderkey with a residual suppkey-inequality — EXISTS → LEFT
    SEMI, NOT EXISTS → LEFT ANTI. All three legs shuffle on the SAME
    key (l_orderkey), so the exchange is planned once and reused; the
    supplier dim broadcasts for the name lookup; top-10 compiles to
    TakeOrderedAndProject. At 100 TB the semi/anti build sides are the
    returned sliver of the fact, not the whole table.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    ret = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    other = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    other_ret = ret.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    multi = ret.join(
        other,
        (ret.l_orderkey == other.o2) & (ret.l_suppkey != other.s2),
        "left_semi",
    )
    sole = multi.join(
        other_ret,
        (multi.l_orderkey == other_ret.o3)
        & (multi.l_suppkey != other_ret.s3),
        "left_anti",
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(sup), sole.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def _sql_sole_returner():
    return """
        SELECT s.s_name, count(*) AS numwait
        FROM lineitem l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """


def q_promo_revenue(spark, sf_dir):
    """Conditional-share aggregate over a broadcast join (TPC-H Q14
    shape): the percentage of September-1995 revenue from PROMO parts.

    Spark-first: the ship-month filter is a pushed-down timestamp range
    on the fact scan; the part dim broadcasts (no fact shuffle at all —
    the whole query is scan → broadcast-hash-join → one partial+final
    agg); the CASE rides inside the same single-pass aggregate rather
    than a second scan. round(…, 2) on the percentage absorbs
    partial-agg-order ulp noise in the double sums.
    """
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-09-01")
            & (F.col("l_shipdate") < "1995-10-01")
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(rev),
                2,
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


def _sql_promo_revenue():
    return """
        SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 2)
                   AS promo_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate < TIMESTAMP '1995-10-01'
    """


def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between two nations): the
    bidirectional nation-pair join with per-year revenue. Both nation
    dims are pre-FILTERED to the two nations of interest and BROADCAST,
    so the fact scan is pruned by two inner broadcast joins before the
    pair condition runs — one shuffle for the final (pair, year) agg."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") <= "1996-12-31")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("c_nk"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    j = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def _sql_volume_shipping():
    return """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_1', 'NATION_2')
              AND n2.n_name IN ('NATION_1', 'NATION_2')
              AND n1.n_name <> n2.n_name
              AND l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <= TIMESTAMP '1996-12-31'
        )
        GROUP BY 1, 2, 3
    """


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): NATION_1's share of
    PROMO-part revenue among ASIA customers per year — conditional
    share aggregation over a 6-way star join, every dim broadcast, the
    fact never shuffles before the final per-year agg."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    n = _t(spark, sf_dir, "nation")
    r = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nc = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("c_nk"),
            F.col("n_regionkey").alias("c_rk"),
        )
    )
    ns = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(nc, F.col("c_nationkey") == F.col("c_nk"))
        .join(r, F.col("c_rk") == r.r_regionkey)
    )
    return j.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
            / F.sum(vol),
            6,
        ).alias("mkt_share")
    )


def _sql_market_share():
    return """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                              ELSE 0.0 END) / sum(volume), 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <= TIMESTAMP '1996-12-31'
        )
        GROUP BY o_year
    """


def q_returned_customers(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue from returned lineitems in one quarter — fact filtered
    on both dimensions before the join, nation broadcast, one grouped
    agg then TopK (TakeOrderedAndProject, never a full sort)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def _sql_returned_customers():
    return """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1995-10-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """


# ---------------------------------------------------------------------------
# training-data pipeline: decontamination, retrieval scoring, sampling,
# shard export
# ---------------------------------------------------------------------------


def q_contamination_check(spark, sf_dir):
    """Benchmark decontamination — the training-data op that keeps eval
    sets out of the training corpus: flag every training document that
    shares word n-grams with a held-out benchmark set (here the docs
    with ``doc_id % 97 == 0``, ~1%% of the corpus, standing in for a
    small eval suite). 100 TB shape: benchmark n-gram sets are tiny
    (eval suites are KBs–MBs) so the benchmark side BROADCASTS and the
    check is one linear semi-join over the training shingles — no
    shuffle of the big side, no pair explosion."""
    sh = _doc_shingles(spark, sf_dir)
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    )
    train = sh.filter(F.col("doc_id") % 97 != 0)
    totals = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        train.join(F.broadcast(bench), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return hits.join(totals, "doc_id").select(
        "doc_id",
        "n_hits",
        "n_shingles",
        F.round(F.col("n_hits") / F.col("n_shingles"), 4).alias(
            "contamination"
        ),
    )


def _sql_contamination_check():
    return f"""
        WITH sh AS ({_SHINGLE_SQL}),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
        train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        totals AS (SELECT doc_id, count(*) AS n_shingles
                   FROM train GROUP BY 1),
        hits AS (SELECT doc_id, count(*) AS n_hits FROM train
                 WHERE shingle IN (SELECT shingle FROM bench) GROUP BY 1)
        SELECT h.doc_id, n_hits, n_shingles,
               round(n_hits / CAST(n_shingles AS DOUBLE), 4)
                   AS contamination
        FROM hits h JOIN totals t ON h.doc_id = t.doc_id
    """


_BM25_TERMS = ("table", "query", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_bm25_rank(spark, sf_dir):
    """BM25 relevance scoring (Robertson/Sparck-Jones) for a fixed
    query over the corpus — the retrieval-scoring op a data pipeline
    runs to mine topical training subsets. tf per (doc, term) from one
    explode+filter pass; df per term and the corpus stats (N, avgdl)
    are term-count-sized scalars, BROADCAST into the per-doc score, so
    the whole query is one linear scan + one hash agg per side at any
    corpus size. Returns every matching doc (no top-k limit, so no
    float-boundary tie hazard against the oracle)."""
    d = _doc_tokens(spark, sf_dir)
    stats = d.agg(
        F.count("*").alias("n_docs"), F.avg("n_tokens").alias("avgdl")
    )
    tf = (
        d.select("doc_id", "n_tokens", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "n_tokens", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    j = tf.join(F.broadcast(df_), "tok").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("n_tokens") / F.col("avgdl")
    )
    score = idf * (F.col("tf") * (_BM25_K1 + 1.0)) / denom
    return j.groupBy("doc_id").agg(F.round(F.sum(score), 4).alias("bm25"))


def _sql_bm25_rank():
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
        WITH d AS (
            SELECT doc_id, string_split(trim(text), ' ') AS toks,
                   len(string_split(trim(text), ' ')) AS n_tokens
            FROM documents
        ),
        stats AS (SELECT count(*) AS n_docs, avg(n_tokens) AS avgdl FROM d),
        tf AS (
            SELECT doc_id, n_tokens, tok, count(*) AS tf
            FROM (SELECT doc_id, n_tokens, unnest(toks) AS tok FROM d)
            WHERE tok IN ({terms})
            GROUP BY 1, 2, 3
        ),
        df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * ({_BM25_K1} + 1.0))
                   / (tf + {_BM25_K1}
                      * (1.0 - {_BM25_B} + {_BM25_B} * n_tokens / avgdl))
               ), 4) AS bm25
        FROM tf JOIN df USING (tok), stats
        GROUP BY doc_id
    """


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling — take 10%% of each language
    stratum as a pure function of the document id (hash-ordered
    row_number, never ``rand()``), so the sample is reproducible across
    runs, machines and engine versions and proportions hold per
    stratum. 100 TB shape: one shuffle on the stratum key; a window
    per stratum. A skewed stratum bounds a single task only at the
    row_number stage — for truly giant strata the same hash order
    admits a threshold cut (keep md5 < p·2^128) that needs no window
    at all; the windowed form here is exact-count."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    cw = Window.partitionBy("lang")
    return (
        d.select("doc_id", "lang", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(cw))
        .filter(F.col("rn") <= F.ceil(F.col("n") * 0.1))
        .select("doc_id", "lang")
    )


def _sql_stratified_sample():
    return """
        SELECT doc_id, lang
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM documents
        )
        WHERE rn <= ceil(n * 0.1)
    """


def q_repetition_filter(spark, sf_dir):
    """Repetition-based quality filtering (the Gopher/MassiveText rule
    family): per document, the fraction of duplicate 3-grams
    (1 - distinct/total) and the share of the single most frequent
    token; documents over either threshold are flagged repetitive.
    100 TB shape: duplicate-3-gram fraction is computed INSIDE the row
    (array expressions, no explode), so the only shuffle is the
    per-(doc, token) hash agg for the top-token share — linear, no
    joins against anything global."""
    d = _doc_tokens(spark, sf_dir).filter(F.col("n_tokens") >= 3)
    tri = F.expr(_SHINGLE_EXPR)
    d = d.withColumn(
        "dup3",
        F.round(
            1.0 - F.size(F.array_distinct(tri)) / (F.col("n_tokens") - 2), 4
        ),
    )
    top = (
        d.select("doc_id", "n_tokens", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "n_tokens", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_tokens")
        .agg(F.max("c").alias("top_c"))
        .select(
            "doc_id",
            F.round(F.col("top_c") / F.col("n_tokens"), 4).alias("top_tok"),
        )
    )
    j = d.select("doc_id", "lang", "dup3").join(top, "doc_id")
    flagged = (F.col("dup3") > 0.5) | (F.col("top_tok") > 0.2)
    return j.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(flagged.cast("long")).alias("n_repetitive"),
        F.round(F.avg("dup3"), 4).alias("avg_dup3"),
        F.round(F.avg("top_tok"), 4).alias("avg_top_tok"),
    )


def _sql_repetition_filter():
    return """
        WITH d AS (
            SELECT doc_id, lang, string_split(trim(text), ' ') AS toks,
                   len(string_split(trim(text), ' ')) AS n_tokens
            FROM documents
            WHERE len(string_split(trim(text), ' ')) >= 3
        ),
        tri AS (
            SELECT doc_id, lang, n_tokens,
                   round(1.0 - len(list_distinct(
                       [concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                        for i in range(1, len(toks) - 1)]))
                       / CAST(n_tokens - 2 AS DOUBLE), 4) AS dup3
            FROM d
        ),
        top AS (
            SELECT doc_id, round(max(c) / CAST(any_value(n_tokens) AS DOUBLE), 4)
                       AS top_tok
            FROM (
                SELECT doc_id, n_tokens, tok, count(*) AS c
                FROM (SELECT doc_id, n_tokens, unnest(toks) AS tok FROM d)
                GROUP BY 1, 2, 3
            )
            GROUP BY doc_id
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN dup3 > 0.5 OR top_tok > 0.2
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
               round(avg(dup3), 4) AS avg_dup3,
               round(avg(top_tok), 4) AS avg_top_tok
        FROM tri JOIN top USING (doc_id)
        GROUP BY lang
    """


_SHARD_TARGET_CHARS = 4096


def q_dataset_shards(spark, sf_dir):
    """Target-size training-shard assignment (the WebDataset/tar-shard
    export shape): pack documents into ~4 KB shards by running byte
    offset, deterministically ordered by doc_id WITHIN each source so
    shard membership is stable. 100 TB shape: the running sum windows
    per SOURCE (the ingest partition unit), so shard assignment is one
    shuffle on source and each source packs independently in parallel —
    never a global single-partition cumsum; a pathologically hot
    source would be range-split by doc_id first (same two-level
    pattern the cluster operator uses)."""
    d = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    sh = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.floor(prev / _SHARD_TARGET_CHARS).cast("bigint").alias("shard"),
    )
    return sh.groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("shard_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _sql_dataset_shards():
    return f"""
        WITH s AS (
            SELECT source, doc_id, n_chars,
                   CAST(floor(coalesce(sum(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {_SHARD_TARGET_CHARS}) AS BIGINT) AS shard
            FROM documents
        )
        SELECT source, shard, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS shard_chars,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM s GROUP BY 1, 2
    """


def q_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year, minus the
    partsupp cost term this dataset lacks): the fact table joins the
    name-filtered part dim and the supplier→nation chain — all three
    dims BROADCAST (part pre-filtered to the product family, nation is
    tiny), so the lineitem scan is never shuffled before the final
    (nation, year) agg. One fact pass, one exchange."""
    l = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("gear"))
        .select("p_partkey")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    j = (
        l.join(p, l.l_partkey == F.col("p_partkey"))
        .join(s, l.l_suppkey == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").cast("int").alias("o_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("profit")
    )


def _sql_nation_profit():
    return """
        SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2
    """


def q_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock, HAVING over a scalar subquery):
    parts whose revenue exceeds a FRACTION of total revenue. The scalar
    subquery decorrelates to one global agg over the SAME per-part
    aggregate (reused, not a second fact scan) broadcast into the
    HAVING filter — at 100 TB the fact is read once, the threshold is
    one row."""
    l = _t(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        )
    )
    total = per_part.agg(F.sum("rev").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("rev") > 0.0008 * F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("rev", 2).alias("part_value"),
        )
    )


def _sql_important_parts():
    return """
        SELECT l_partkey AS p_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING sum(l_extendedprice * (1 - l_discount)) >
               (SELECT 0.0008 * sum(l_extendedprice * (1 - l_discount))
                FROM lineitem)
    """


def q_top_ship_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier view + scalar max): the supplier(s)
    whose shipped QUANTITY over one quarter equals the maximum. Quantity
    sums are whole numbers (exact in double), so the max-equality join
    is deterministic across engines — the revenue flavor of Q15 has a
    float-tie hazard this sidesteps. The max is a 1-row broadcast onto
    the same aggregate (no second fact scan); ties all return."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    per_supp = l.groupBy("l_suppkey").agg(
        F.sum("l_quantity").alias("total_qty")
    )
    mx = per_supp.agg(F.max("total_qty").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    best = per_supp.crossJoin(F.broadcast(mx)).filter(
        F.col("total_qty") == F.col("mx")
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


def _sql_top_ship_supplier():
    return """
        WITH q AS (
            SELECT l_suppkey, sum(l_quantity) AS total_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_qty AS BIGINT) AS total_qty
        FROM q JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_qty = (SELECT max(total_qty) FROM q)
    """


def q_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (excess-stock suppliers, adapted to shipped
    quantities): suppliers who shipped MORE THAN 15% of some filtered
    part's total quantity. Two nested aggregates over ONE filtered fact
    pass — per (part, supplier) and per part (a re-agg of the first,
    not a rescan) — joined part-locally, then a semi-join-shaped
    DISTINCT onto the supplier dim. Quantity sums are exact integers,
    so the ratio cut is engine-stable."""
    l = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    lp = l.join(p, l.l_partkey == F.col("p_partkey"))
    per_ps = lp.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    per_part = per_ps.groupBy("l_partkey").agg(
        F.sum("qty").alias("part_qty")
    )
    dom = (
        per_ps.join(per_part, "l_partkey")
        .filter(F.col("qty") > 0.15 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    return dom.join(F.broadcast(s), dom.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name"
    )


def _sql_dominant_suppliers():
    return """
        WITH ps AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
            GROUP BY l_partkey, l_suppkey
        ), pt AS (
            SELECT l_partkey, sum(qty) AS part_qty FROM ps GROUP BY l_partkey
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM ps
        JOIN pt USING (l_partkey)
        JOIN supplier ON ps.l_suppkey = s_suppkey
        WHERE qty > 0.15 * part_qty
    """


def q_image_datasource(spark, sf_dir):
    """Python Data Source connector (sources/datasource.py): engine tables
    through the STANDARD Spark entry points — ``spark.read.format(
    "medallion")`` (manifest-planned batch read, one InputPartition per
    data file, pushed filters prune files before listing),
    ``readStream``/``writeStream`` (snapshot-diff micro-batches into an
    exactly-once txnAppId sink), and ``df.write`` (per-task Arrow→parquet
    + one atomic append commit from footer stats). Replication accounting
    is asserted inline; the returned final state of the REPLICA is
    hard-checked by a DuckDB pure-SQL replay — the replica must carry
    exactly the source's logical state (see the oracle section
    comment)."""
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.sources.datasource import register
    from aws_medallion_datalake_spark.sources.generator import (
        SCHEMA as IMG_SCHEMA,
        generate_images,
    )
    from aws_medallion_datalake_spark.sources.tableformat import Table

    register(spark)
    root = _oracle_root("image_datasource")
    stats = ["phash", "w", "h", "image_id", "ingest_date"]
    src = Table.create(
        os.path.join(root, "src"), IMG_SCHEMA,
        partition_cols=["ingest_date"], stats_cols=stats,
    )
    dst = Table.create(
        os.path.join(root, "dst"), IMG_SCHEMA,
        partition_cols=["ingest_date"], stats_cols=stats,
    )
    # batch write through the connector: atomic append commit
    generate_images(spark, _IMG_ROWS, n_files=4).write.format(
        "medallion"
    ).mode("append").save(src.root)

    def pump():
        q = (
            spark.readStream.format("medallion")
            .option("startingOffsets", "earliest")
            .load(src.root)
            .writeStream.format("medallion")
            .option("path", dst.root)
            .option("txnAppId", "entry-repl")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    pump()
    n1 = dst.scan(spark).count()
    # incremental: a second append flows through the SAME checkpoint
    generate_images(spark, _IMG_ROWS // 4, n_files=1, start=10_000).write.format(
        "medallion"
    ).mode("append").save(src.root)
    pump()
    got = spark.read.format("medallion").load(dst.root)
    matched = (
        got.select("image_id", "phash")
        .join(src.scan(spark).select("image_id", "phash"), ["image_id", "phash"])
        .count()
    )
    d0 = src.manifest_pdf()["min_ingest_date"].min()
    pruned = (
        spark.read.format("medallion")
        .load(src.root)
        .filter(F.col("ingest_date") == d0)
        .count()
    )
    n_total = _IMG_ROWS + _IMG_ROWS // 4
    assert int(src.scan(spark).count()) == n_total
    assert int(n1) == _IMG_ROWS  # first pump = first snapshot only
    assert int(got.count()) == n_total == int(matched)
    assert 0 < int(pruned) < n_total
    assert len(dst.metadata().snapshots) == 2  # one commit per pump
    expire_snapshots(dst, keep_last=1)
    return _final_state_frame(dst, spark)


def q_image_matview(spark, sf_dir):
    """Materialized view with incremental refresh (operators/matview.py):
    a per-fmt aggregate MV over the image table, kept fresh by the
    cheapest sound path — append-only base advance folds just the DELTA
    through the defining query (O(new rows), self-mergeable combiners),
    a MERGE in the chain falls back to full recompute, physical-only
    snapshots bump the bookmark with zero IO. Refresh modes + per-state
    Spark-side recompute equality are asserted inline; the returned
    FINAL MV content is hard-checked by DuckDB replaying the defining
    aggregate from scratch over the generator row function — the
    incrementally-maintained state must equal a cold recompute."""
    from aws_medallion_datalake_spark.operators.matview import (
        create_matview,
        refresh_matview,
    )
    from aws_medallion_datalake_spark.operators.compact import compact
    from aws_medallion_datalake_spark.operators.expire import expire_snapshots
    from aws_medallion_datalake_spark.operators.merge import merge_into
    from aws_medallion_datalake_spark.pipeline.medallion import bronze_ingest
    from aws_medallion_datalake_spark.sources.generator import (
        generate_images,
        generate_updates,
    )

    root = _oracle_root("image_matview")
    base = bronze_ingest(spark, os.path.join(root, "base"), _IMG_ROWS, n_files=4)
    # max(image_id) not max(phash): every MV measure stays
    # SQL-recomputable so the DuckDB oracle can replay it cold
    q = (
        "SELECT fmt, count(*) AS n, sum(w) AS total_w, "
        "max(image_id) AS max_id FROM imgs GROUP BY fmt"
    )
    mv = create_matview(
        spark, "imgs_by_fmt", q, os.path.join(root, "mv"), {"imgs": base}
    )

    def ok():
        ref = (
            base.scan(spark)
            .groupBy("fmt")
            .agg(
                F.count("*").alias("n"),
                F.sum("w").alias("total_w"),
                F.max("image_id").alias("max_id"),
            )
        )
        return sorted(map(tuple, mv.scan(spark).collect())) == sorted(
            map(tuple, ref.collect())
        )

    assert ok()  # create = full materialization
    base.append(generate_images(spark, _IMG_ROWS // 4, n_files=1, start=50_000))
    s = refresh_matview(spark, mv, {"imgs": base})
    assert s.summary["refresh"] == "incremental" and ok()
    compact(base, spark)
    s2 = refresh_matview(spark, mv, {"imgs": base})
    assert s2 is None and ok()  # physical-only chain: bookmark bump
    merge_into(
        base, spark, generate_updates(spark, _IMG_ROWS, _IMG_ROWS // 8, 16, n_files=1)
    )
    s3 = refresh_matview(spark, mv, {"imgs": base})
    assert s3.summary["refresh"] == "full" and ok()
    # expire the base so <root>/base/data/** is exactly its live file
    # set; the DuckDB oracle recomputes the defining aggregate there and
    # must match the MV content the engine maintained through
    # incremental / bookmark / full-fallback refreshes
    expire_snapshots(base, keep_last=1)
    return mv.scan(spark).orderBy("fmt")


def q_media_features(spark, sf_dir):
    """Multimodal audio/video columns end-to-end (functions/codec.py
    AUD1/VID1 containers + functions/multimodal.py mapInPandas
    operators): deterministic synthetic media rendered per seed, encoded
    to opaque binary columns, then decoded and feature-extracted
    DISTRIBUTED (Arrow batches, no per-row Python).

    Partial oracle (round-4 VERDICT task 6): the returned frame carries
    only INPUT-DERIVABLE values — audio sample counts/rates are the
    render/encode parameters (clip a_i: 1000+100·i samples at 8 kHz),
    video frame fan-out is
    ceil(n_frames / every_nth) and frame width is the render parameter
    (12) — so DuckDB can state the expected rows without decoding. The
    decode-DEPENDENT signal measures (RMS, zero-crossings) are asserted
    inline: rms in (0, 1], zero_crossings > 0 for every clip."""
    import pandas as pd

    from aws_medallion_datalake_spark.functions.codec import (
        encode_audio,
        encode_video,
        render_audio,
        render_video,
    )
    from aws_medallion_datalake_spark.functions.multimodal import (
        audio_features,
        video_frame_sample,
    )

    audio = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [f"a{i}" for i in range(8)],
                "bytes": [
                    encode_audio(render_audio(i, 1000 + 100 * i, 8000), 8000)
                    for i in range(8)
                ],
            }
        )
    )
    video = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [f"v{i}" for i in range(4)],
                "bytes": [
                    encode_video(render_video(i, 4 + i, 12, 8), fps=4)
                    for i in range(4)
                ],
            }
        )
    )
    afeat = audio_features(audio).persist()
    sig = afeat.agg(
        F.sum(((F.col("rms") <= 0) | (F.col("rms") > 1)).cast("long")).alias("bad_rms"),
        F.sum((F.col("zero_crossings") <= 0).cast("long")).alias("bad_zc"),
    ).first()
    # decode-dependent half, inline: every clip decodes to a sane signal
    assert (int(sig["bad_rms"]), int(sig["bad_zc"])) == (0, 0), sig
    af = afeat.select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.col("n_samples").cast("long").alias("n_units"),
        F.col("sample_rate").cast("double").alias("metric"),
    )
    vf = (
        video_frame_sample(video, every_nth=2)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.round(F.avg("w"), 4).alias("metric"),
        )
        .select("media_id", F.lit("video").alias("kind"), "n_units", "metric")
    )
    out = af.unionByName(vf).orderBy("kind", "media_id")
    rows = out.collect()
    afeat.unpersist()
    return spark.createDataFrame(rows, out.schema)


def _sql_media_features():
    # input-derivable expectations: audio clip a_i renders 1000+100*i
    # samples at 8 kHz; videos v_i hold 4+i frames sampled every 2nd
    # (ceil -> (5+i)//2) of width 12
    return """
        SELECT 'a' || CAST(i AS VARCHAR) AS media_id, 'audio' AS kind,
               CAST(1000 + 100 * i AS BIGINT) AS n_units,
               CAST(8000 AS DOUBLE) AS metric
        FROM generate_series(0, 7) t(i)
        UNION ALL
        SELECT 'v' || CAST(i AS VARCHAR) AS media_id, 'video' AS kind,
               (5 + i) // 2 AS n_units, CAST(12.0 AS DOUBLE) AS metric
        FROM generate_series(0, 3) t(i)
        ORDER BY kind, media_id
    """


def q_rest_bronze(spark, sf_dir):
    """Distributed REST bronze ingestion (SURVEY.md §2.1 S1) driven
    end-to-end through the engine's auth → catalog → paged-fetch path
    against the in-process deterministic endpoint
    (sources/restfixture.py; reference twin scripts/bronze_digit.py:
    28-109, whose driver-side serial loop becomes a one-unit-per-task
    ``mapInPandas`` fetch). Unit u-003's page 1 is served with two
    leading 503s, so a green row also certifies the retry/backoff path
    (those rows land with attempts = 3). Payloads are pure functions of
    (unit, row index), so the oracle replays the whole feed in SQL."""
    from aws_medallion_datalake_spark.sources.restfixture import (
        CREDS,
        FakeRestServer,
    )
    from aws_medallion_datalake_spark.sources.restsource import (
        RestEndpoint,
        normalize_bronze,
        read_bronze,
    )

    with FakeRestServer(n_units=8, faults={("u-003", 1): (503, 2)}) as srv:
        ep = RestEndpoint(
            base_url=srv.base_url,
            credentials=dict(CREDS),
            backoff_base_s=0.01,
        )
        silver = normalize_bronze(
            read_bronze(spark, ep), "rec_id string, metric int, grp string"
        )
        out = (
            silver.groupBy("unit_id", "grp")
            .agg(
                F.count("*").alias("n"),
                F.sum("metric").alias("sum_metric"),
                F.max("attempts").alias("max_attempts"),
            )
            .orderBy("unit_id", "grp")
        )
        # materialize before the server context closes (the frame is
        # lazy; 24 result rows, O(result) driver cost)
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


def _sql_rest_bronze():
    # pure replay of restfixture.record/unit_rows: unit k serves
    # (k % 7) + 12 rows; row j has grp ['alpha','beta','gamma'][j % 3]
    # and metric (k*31 + j*7) % 101; page 1 (j in 5..9) of u-003 needed
    # 3 attempts (two injected 503s), everything else 1.
    return """
        WITH recs AS (
            SELECT k, j,
                   ['alpha','beta','gamma'][(j % 3) + 1] AS grp,
                   (k * 31 + j * 7) % 101 AS metric,
                   CASE WHEN k = 3 AND j BETWEEN 5 AND 9 THEN 3 ELSE 1
                   END AS attempts
            FROM generate_series(0, 7) t(k),
                 generate_series(0, 17) s(j)
            WHERE j <= (k % 7) + 11
        )
        SELECT 'u-' || lpad(CAST(k AS VARCHAR), 3, '0') AS unit_id, grp,
               count(*) AS n, sum(metric) AS sum_metric,
               max(attempts) AS max_attempts
        FROM recs GROUP BY k, grp ORDER BY unit_id, grp
    """


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate checks the FIRST 50
    # entries. Round-5 window, in priority order:
    #   1     oracle_canary — brand-new side-channel diagnostic (see the
    #         oracle section comment),
    #   2     event_funnel — added after the r4 window filled, never
    #         driver-checked,
    #   3-21  the 19 maintenance flows whose oracles were rebuilt this
    #         round as pure-SQL replays (all were hash-red in
    #         CORRECTNESS_r04 under the old /tmp live-file design),
    #   22-24 the three formerly rows-only decode-bound flows, now
    #         returning decode-independent frames with hard oracles,
    #   25-47 the 23 oracle entries whose newest green record is r02
    #         (oldest-record-first rotation; includes
    #         minhash_candidate_pairs, which also gained the max_bucket
    #         hot-band guard this round),
    #   48-50 the three oldest r03 records.
    # Past 50: the r04-green entries (newest records), then the
    # remaining r03 records.
    return {
        # -- brand-new / never driver-checked --
        "oracle_canary": q_oracle_canary,
        "event_funnel": q_event_funnel,
        # -- 19 maintenance flows: oracles rebuilt as pure-SQL replays --
        "image_maintenance": q_image_maintenance,
        "image_update": q_image_update,
        "image_dyn_overwrite": q_image_dyn_overwrite,
        "image_incremental": q_image_incremental,
        "image_medallion": q_image_medallion,
        "image_matview": q_image_matview,
        "image_mor_delete": q_image_mor_delete,
        "image_eq_delete": q_image_eq_delete,
        "image_mor_merge": q_image_mor_merge,
        "image_cdc": q_image_cdc,
        "image_sql_dml": q_image_sql_dml,
        "image_datasource": q_image_datasource,
        "image_gold_star": q_image_gold_star,
        "image_wap": q_image_wap,
        "image_live_pipeline": q_image_live_pipeline,
        "image_rename": q_image_rename,
        "image_evolution": q_image_evolution,
        "image_schema_ops": q_image_schema_ops,
        "image_bucketed_join": q_image_bucketed_join,
        # -- decode-bound flows, restructured to carry hard oracles --
        "media_features": q_media_features,
        "image_quality_filter": q_image_quality_filter,
        "image_dedup_verified": q_image_dedup_verified,
        # -- r02-stale green records (oldest-first rotation) --
        "url_blocklist": q_url_blocklist,
        "tfidf_keywords": q_tfidf_keywords,
        "simhash": q_simhash,
        "simhash_hamming_pairs": q_simhash_hamming_pairs,
        "minhash_signature": q_minhash_signature,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "lsh_buckets": q_lsh_buckets,
        "label_centroid_sim": q_label_centroid_sim,
        "embedding_neardup_pairs": q_embedding_neardup_pairs,
        "gold_star_rollup": q_gold_star_rollup,
        "gold_fact_dim_join": q_gold_fact_dim_join,
        "gold_weekend_split": q_gold_weekend_split,
        "events_json_explode": q_events_json_explode,
        "hidden_partition_scan": q_hidden_partition_scan,
        "minhash_candidate_pairs": q_minhash_candidate_pairs,
        "bm25_rank": q_bm25_rank,
        "stratified_sample": q_stratified_sample,
        "dataset_shards": q_dataset_shards,
        "repetition_filter": q_repetition_filter,
        "bpe_token_stats": q_bpe_token_stats,
        "doc_quality": q_doc_quality,
        "lang_id": q_lang_id,
        "pii_scrub": q_pii_scrub,
        # -- oldest r03 records (window positions 48-50) --
        "neardup_components": q_neardup_components,
        "orders_rollup": q_orders_rollup,
        "rank_topn_per_group": q_rank_topn_per_group,
        # ---- position 51+ (not in the r5 window) ----
        # brand-new this round (pytest-covered; rotate into the next
        # window if one exists):
        "rest_bronze": q_rest_bronze,
        "neardup_retention": q_neardup_retention,
        # r04-green records (newest, rotate last):
        "embedding_topk": q_embedding_topk,
        "image_features_ann": q_image_features_ann,
        "image_phash_neardup": q_image_phash_neardup,
        "image_dup_caption_audit": q_image_dup_caption_audit,
        "unigram_logppl": q_unigram_logppl,
        "dup_ngram_frac": q_dup_ngram_frac,
        "zipf_vocab_stats": q_zipf_vocab_stats,
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "segment_revenue": q_segment_revenue,
        "region_rollup": q_region_rollup,
        "conditional_agg": q_conditional_agg,
        "distinct_agg": q_distinct_agg,
        "table_counts": q_table_counts,
        "segment_share": q_segment_share,
        "monthly_growth": q_monthly_growth,
        "acctbal_bands": q_acctbal_bands,
        "orders_calendar": q_orders_calendar,
        "ship_window": q_ship_window,
        "part_pruned": q_part_pruned,
        "string_cleanup": q_string_cleanup,
        "events_hourly": q_events_hourly,
        "events_json": q_events_json,
        "events_windowed": q_events_windowed,
        "event_sessions": q_event_sessions,
        "quality_profile": q_quality_profile,
        "silver_casts": q_silver_casts,
        "dedup_exact": q_dedup_exact,
        "doc_fingerprint": q_doc_fingerprint,
        "train_val_split": q_train_val_split,
        "contamination_check": q_contamination_check,
        # remaining r03 records:
        "moving_avg": q_moving_avg,
        "cube_agg": q_cube_agg,
        "except_customers": q_except_customers,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "events_pivot": q_events_pivot,
        "semdedup": q_semdedup,
        "customers_no_orders": q_customers_no_orders,
        "returned_orders_semi": q_returned_orders_semi,
        "quantity_quartiles": q_quantity_quartiles,
        "salted_supplier_revenue": q_salted_supplier_revenue,
        "small_qty_revenue": q_small_qty_revenue,
        "big_orders": q_big_orders,
        "disjunctive_parts": q_disjunctive_parts,
        "above_avg_balance": q_above_avg_balance,
        "order_count_distribution": q_order_count_distribution,
        "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
        "sole_returner": q_sole_returner,
        "promo_revenue": q_promo_revenue,
        "volume_shipping": q_volume_shipping,
        "market_share": q_market_share,
        "returned_customers": q_returned_customers,
        "nation_profit": q_nation_profit,
        "important_parts": q_important_parts,
        "top_ship_supplier": q_top_ship_supplier,
        "dominant_suppliers": q_dominant_suppliers,
        "token_stats": q_token_stats,
        "ivf_topk": q_ivf_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": _sql_pricing_summary(),
        "top_orders": _sql_top_orders(),
        "segment_revenue": _sql_segment_revenue(),
        "region_rollup": _sql_region_rollup(),
        "conditional_agg": _sql_conditional_agg(),
        "distinct_agg": _sql_distinct_agg(),
        "table_counts": _sql_table_counts(),
        "segment_share": _sql_segment_share(),
        "monthly_growth": _sql_monthly_growth(),
        "acctbal_bands": _sql_acctbal_bands(),
        "orders_calendar": _sql_orders_calendar(),
        "ship_window": _sql_ship_window(),
        "part_pruned": _sql_part_pruned(),
        "string_cleanup": _sql_string_cleanup(),
        "events_hourly": _sql_events_hourly(),
        "events_json": _sql_events_json(),
        "events_windowed": _sql_events_windowed(),
        "event_sessions": _sql_event_sessions(),
        "event_funnel": _sql_event_funnel(),
        "quality_profile": _sql_quality_profile(),
        "silver_casts": _sql_silver_casts(),
        "dedup_exact": _sql_dedup_exact(),
        "doc_fingerprint": _sql_doc_fingerprint(),
        "train_val_split": _sql_train_val_split(),
        "contamination_check": _sql_contamination_check(),
        "bm25_rank": _sql_bm25_rank(),
        "stratified_sample": _sql_stratified_sample(),
        "dataset_shards": _sql_dataset_shards(),
        "repetition_filter": _sql_repetition_filter(),
        "token_stats": _sql_token_stats(),
        "bpe_token_stats": _sql_bpe_token_stats(),
        "doc_quality": _sql_doc_quality(),
        "lang_id": _sql_lang_id(),
        "unigram_logppl": _sql_unigram_logppl(),
        "dup_ngram_frac": _sql_dup_ngram_frac(),
        "zipf_vocab_stats": _sql_zipf_vocab_stats(),
        "pii_scrub": _sql_pii_scrub(),
        "url_blocklist": _sql_url_blocklist(),
        "tfidf_keywords": _sql_tfidf_keywords(),
        "simhash": _sql_simhash(),
        "simhash_hamming_pairs": _sql_simhash_hamming_pairs(),
        "minhash_signature": _sql_minhash_signature(),
        "ngram_jaccard_pairs": _sql_ngram_jaccard_pairs(),
        # pure-SQL replay oracles for the maintenance flows (round-5
        # redesign — each replays the flow's final logical state from
        # the generator row function; see the oracle section comment)
        "oracle_canary": _sql_oracle_canary(),
        "image_maintenance": _sql_image_maintenance(),
        "image_update": _sql_image_update(),
        "image_dyn_overwrite": _sql_image_dyn_overwrite(),
        "image_incremental": _sql_image_incremental(),
        "image_medallion": _sql_image_medallion(),
        "image_matview": _sql_image_matview(),
        "image_mor_delete": _sql_image_mor_delete(),
        "image_eq_delete": _sql_image_eq_delete(),
        "image_mor_merge": _sql_image_mor_merge(),
        "image_cdc": _sql_image_cdc(),
        "image_sql_dml": _sql_image_sql_dml(),
        "image_datasource": _sql_image_datasource(),
        "image_gold_star": _sql_image_gold_star(),
        "image_wap": _sql_image_wap(),
        "image_live_pipeline": _sql_image_live_pipeline(),
        "image_rename": _sql_image_rename(),
        "image_evolution": _sql_image_evolution(),
        "image_schema_ops": _sql_image_schema_ops(),
        "image_bucketed_join": _sql_image_bucketed_join(),
        "image_phash_neardup": _sql_image_phash_neardup(),
        "image_dup_caption_audit": _sql_image_dup_caption_audit(),
        "image_features_ann": _sql_image_features_ann(),
        "embedding_topk": _sql_embedding_topk(),
        "lsh_buckets": _sql_lsh_buckets(),
        "label_centroid_sim": _sql_label_centroid_sim(),
        "embedding_neardup_pairs": _sql_embedding_neardup_pairs(),
        "ivf_topk": _sql_ivf_topk(),
        "gold_star_rollup": _sql_gold_star_rollup(),
        "gold_fact_dim_join": _sql_gold_fact_dim_join(),
        "gold_weekend_split": _sql_gold_weekend_split(),
        "events_json_explode": _sql_events_json_explode(),
        "hidden_partition_scan": _sql_hidden_partition_scan(),
        "minhash_candidate_pairs": _sql_minhash_candidate_pairs(),
        "neardup_components": _sql_neardup_components(),
        "orders_rollup": _sql_orders_rollup(),
        "rank_topn_per_group": _sql_rank_topn_per_group(),
        "moving_avg": _sql_moving_avg(),
        "cube_agg": _sql_cube_agg(),
        "except_customers": _sql_except_customers(),
        "asof_join": _sql_asof_join(),
        "range_join": _sql_range_join(),
        "events_pivot": _sql_events_pivot(),
        "semdedup": _sql_semdedup(),
        "customers_no_orders": _sql_customers_no_orders(),
        "returned_orders_semi": _sql_returned_orders_semi(),
        "quantity_quartiles": _sql_quantity_quartiles(),
        "salted_supplier_revenue": _sql_salted_supplier_revenue(),
        "small_qty_revenue": _sql_small_qty_revenue(),
        "big_orders": _sql_big_orders(),
        "disjunctive_parts": _sql_disjunctive_parts(),
        "above_avg_balance": _sql_above_avg_balance(),
        "order_count_distribution": _sql_order_count_distribution(),
        "cheapest_supplier_per_part": _sql_cheapest_supplier_per_part(),
        "sole_returner": _sql_sole_returner(),
        "promo_revenue": _sql_promo_revenue(),
        "volume_shipping": _sql_volume_shipping(),
        "market_share": _sql_market_share(),
        "returned_customers": _sql_returned_customers(),
        "nation_profit": _sql_nation_profit(),
        "important_parts": _sql_important_parts(),
        "top_ship_supplier": _sql_top_ship_supplier(),
        "dominant_suppliers": _sql_dominant_suppliers(),
        # formerly rows-only decode-bound flows — now partial oracles
        # (round-4 VERDICT task 6): the driver-compared frame carries
        # only decode-independent / input-derivable invariants; the
        # decode-dependent measures (RMS, blur histogram, PSNR verdicts)
        # are asserted inline and pytest-covered.
        "media_features": _sql_media_features(),
        "image_quality_filter": _sql_image_quality_filter(),
        "image_dedup_verified": _sql_image_dedup_verified(),
        # distributed REST bronze source, replayed in pure SQL from the
        # deterministic fixture endpoint's row function
        "rest_bronze": _sql_rest_bronze(),
        # near-dup retention: components CTE + corpus join + ranking
        "neardup_retention": _sql_neardup_retention(),
    }
