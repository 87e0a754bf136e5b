"""Source-format operators (SURVEY §2.1 S3-S6) + J11.

The reference's file loaders are driver-side row loops; here each
format is parsed *distributed*: the raw line corpus is synthesized
deterministically from the shared parquet (so the oracle can rebuild
the identical lines), then parsed with engine primitives — from_csv
(S3), substring/trim fixed-width slicing with NULL-pad repair (S5),
multi-format date coalescing (S6). At 100 TB these are narrow
scan-local maps: no shuffle, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_TSF = "yyyy-MM-dd HH:mm:ss"


@register(
    "s03_s06_feed_parse_join",
    """
WITH li_lines AS (
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey AS VARCHAR) || '\t' || CAST(l_linenumber AS VARCHAR)
             || '\t' || l_returnflag || '\t' || CAST(round(l_quantity, 2) AS VARCHAR)
             || '\t' || strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS line
    FROM lineitem),
li AS (
    SELECT l_orderkey, l_linenumber,
           string_split(line, '\t')[3] AS returnflag,
           TRY_CAST(string_split(line, '\t')[4] AS DOUBLE) AS quantity,
           strftime(TRY_CAST(string_split(line, '\t')[5] AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS shipdate
    FROM li_lines),
o_lines AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_str
    FROM orders),
od AS (
    SELECT o_orderkey, date_str,
           strftime(coalesce(try_strptime(date_str, '%Y-%m-%d'),
                             try_strptime(date_str, '%d/%m/%Y')), '%Y-%m-%d') AS parsed_date
    FROM o_lines)
SELECT li.l_orderkey, li.l_linenumber, li.returnflag, li.quantity, li.shipdate,
       od.date_str, od.parsed_date
FROM li JOIN od ON od.o_orderkey = li.l_orderkey""",
    doc="S3+S6 (merged round 3 for the driver's 50-row budget): two raw "
    "feeds parsed distributed then joined — tab-delimited records via "
    "from_csv with explicit schema (the reference's TSV zip(header,row) "
    "loaders, /root/reference/pipeline/csv_influx_converter.py:96-374) "
    "and mixed dd/mm/yyyy-vs-ISO date cells via coalesce(try_to_"
    "timestamp f1, f2) (/root/reference/pipeline/csv_mongodb_converter"
    ".py:197-244). Parses are scan-local codegen maps; the join is the "
    "ordinary fact-fact equi-join.",
)
def q_feed_parse_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    line = F.concat_ws(
        "\t",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        "l_returnflag",
        F.round("l_quantity", 2).cast("string"),
        F.date_format("l_shipdate", _TSF),
    )
    lines = li.select("l_orderkey", "l_linenumber", line.alias("line"))
    parsed = lines.withColumn(
        "rec",
        F.from_csv(
            "line",
            "okey long, lineno long, returnflag string, quantity double, shipdate timestamp_ntz",
            {"sep": "\t", "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss"},
        ),
    )
    li_parsed = parsed.select(
        "l_orderkey",
        "l_linenumber",
        F.col("rec.returnflag").alias("returnflag"),
        F.col("rec.quantity").alias("quantity"),
        F.date_format("rec.shipdate", _TSF).alias("shipdate"),
    )
    o = load_table(spark, sf_dir, "orders")
    date_str = F.when(
        F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "dd/MM/yyyy")
    ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    o_lines = o.select("o_orderkey", date_str.alias("date_str"))
    od_parsed = F.coalesce(
        F.try_to_timestamp("date_str", F.lit("yyyy-MM-dd")),
        F.try_to_timestamp("date_str", F.lit("dd/MM/yyyy")),
    )
    od = o_lines.select(
        "o_orderkey", "date_str", F.date_format(od_parsed, "yyyy-MM-dd").alias("parsed_date")
    )
    return li_parsed.join(
        od, li_parsed["l_orderkey"] == od["o_orderkey"]
    ).select(
        "l_orderkey", "l_linenumber", "returnflag", "quantity", "shipdate",
        "date_str", "parsed_date",
    )


@register(
    "j11_latest_asof_pick",
    """
SELECT * FROM (
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
    FROM orders WHERE o_orderdate <= TIMESTAMP '1998-01-01 00:00:00') t
WHERE rk = 1""",
    doc="J11: latest-record-at-or-before-a-date pick per key — the imei→site "
    "resolution over multiple installations "
    "(/root/reference/nmdb/mongo_db.py:20-56) as a ranked window.",
)
def q_latest_asof_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.where(F.col("o_orderdate") <= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") == 1)
    )


@register(
    "s04_s05_station_dim_parse",
    """
WITH tsv_lines AS (
    SELECT CAST(s_suppkey AS VARCHAR) || '\t' || s_name || '\t'
             || CASE WHEN s_suppkey % 50 = 0 THEN 'N/A'
                     ELSE CAST(CAST(floor(s_acctbal * 100) AS BIGINT) AS VARCHAR)
                END AS line
    FROM supplier),
tsv AS (
    SELECT CAST(string_split(line, '\t')[1] AS BIGINT) AS suppkey,
           string_split(line, '\t')[2] AS name,
           TRY_CAST(string_split(line, '\t')[3] AS DECIMAL(18,4)) AS cents
    FROM tsv_lines),
fw_lines AS (
    SELECT s_suppkey,
           rpad(s_name, 28, ' ')
             || rpad(CASE WHEN s_suppkey % 7 = 0 THEN '' ELSE CAST(s_nationkey AS VARCHAR) END, 6, ' ')
             || lpad(CAST(round(s_acctbal, 2) AS VARCHAR), 12, ' ') AS line
    FROM supplier),
fw AS (
    SELECT s_suppkey,
           trim(substr(line, 1, 28)) AS fw_name,
           TRY_CAST(nullif(trim(substr(line, 29, 6)), '') AS INT) AS fw_nationkey,
           TRY_CAST(trim(substr(line, 35, 12)) AS DOUBLE) AS fw_acctbal
    FROM fw_lines)
SELECT t.suppkey, t.name,
       CAST(coalesce(t.cents, CAST(0 AS DECIMAL(18,4))) AS DOUBLE) / 100 AS acctbal,
       CASE WHEN t.cents IS NULL THEN 1 ELSE 0 END AS bad_flag,
       f.fw_name, f.fw_nationkey, f.fw_acctbal
FROM tsv t JOIN fw f ON f.s_suppkey = t.suppkey""",
    doc="S4+S5+F22 (merged round 3 for the driver's 50-row budget): the "
    "station dimension parsed from BOTH raw encodings and reconciled — "
    "(a) TSV with DECIMAL(18,4) typing and 0.0+bad-flag fallback on "
    "corrupt cells (reference Decimal128 calibration dicts, /root/"
    "reference/pipeline/csv_mongodb_converter.py:30-101; float-cast "
    "fallback /root/reference/pipeline/csv_influx_converter.py:76-80,"
    "308-315), (b) fixed-width text with pad-aware NULL repair "
    "(/root/reference/pipeline/csv_mongodb_converter.py:104-195). Both "
    "parses are scan-local; the reconcile join is a tiny dim-dim join.",
)
def q_station_dim_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    tok = (
        F.when(F.col("s_suppkey") % 50 == 0, F.lit("N/A"))
        .otherwise(F.floor(F.col("s_acctbal") * 100).cast("bigint").cast("string"))
    )
    tsv_lines = sup.select(
        F.concat_ws("\t", F.col("s_suppkey").cast("string"), "s_name", tok).alias("line")
    )
    p = F.split("line", "\t")
    tsv = tsv_lines.select(
        p.getItem(0).cast("bigint").alias("suppkey"),
        p.getItem(1).alias("name"),
        F.expr("try_cast(split(line, '\t')[2] AS DECIMAL(18,4))").alias("cents"),
    ).select(
        "suppkey",
        "name",
        (
            F.coalesce(F.col("cents"), F.lit(0).cast("decimal(18,4)")).cast("double")
            / 100
        ).alias("acctbal"),
        F.when(F.col("cents").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("bad_flag"),
    )
    fw_line = F.concat(
        F.rpad("s_name", 28, " "),
        F.rpad(
            F.when(F.col("s_suppkey") % 7 == 0, F.lit("")).otherwise(
                F.col("s_nationkey").cast("string")
            ),
            6,
            " ",
        ),
        F.lpad(F.round("s_acctbal", 2).cast("string"), 12, " "),
    )
    fw = sup.select("s_suppkey", fw_line.alias("line")).select(
        "s_suppkey",
        F.trim(F.substring("line", 1, 28)).alias("fw_name"),
        F.nullif(F.trim(F.substring("line", 29, 6)), F.lit(""))
        .cast("int")
        .alias("fw_nationkey"),
        F.trim(F.substring("line", 35, 12)).cast("double").alias("fw_acctbal"),
    )
    return tsv.join(fw, tsv["suppkey"] == fw["s_suppkey"]).select(
        "suppkey", "name", "acctbal", "bad_flag", "fw_name", "fw_nationkey", "fw_acctbal"
    )
