"""Catalog DDL (SURVEY §2.1 S11 create-database, S13 table drop).

The reference issues ``create_database`` at load time
(/root/reference/pipeline/csv_influx_converter.py:377) and
``drop_measurement("level4")`` before a reload (:291). In Spark these
are catalog statements; the engine's equivalent of "measurement" is a
saved table whose data lives under the database LOCATION.
"""

from __future__ import annotations


def test_create_database_write_drop_roundtrip(spark, tmp_path):
    loc = (tmp_path / "wh").as_posix()
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cosmoz_ddl_test LOCATION '{loc}'")
    try:
        assert any(
            db.name == "cosmoz_ddl_test" for db in spark.catalog.listDatabases()
        )

        # S13: (re)create + drop a measurement-like table
        spark.range(5).write.mode("overwrite").saveAsTable("cosmoz_ddl_test.level4_tmp")
        assert spark.table("cosmoz_ddl_test.level4_tmp").count() == 5
        spark.sql("DROP TABLE cosmoz_ddl_test.level4_tmp")
        assert not any(
            t.name == "level4_tmp"
            for t in spark.catalog.listTables("cosmoz_ddl_test")
        )
    finally:
        spark.sql("DROP DATABASE IF EXISTS cosmoz_ddl_test CASCADE")
