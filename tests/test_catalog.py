"""Catalog / DDL surface: databases, managed tables, INSERT INTO,
views, introspection — the spark.sql catalog path end to end."""

from pyspark.sql import functions as F

from mapreduce_4sl08_spark.sources import load_table


def test_catalog_ddl_roundtrip(spark, sf_smoke_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS engine_test")
    try:
        load_table(spark, sf_smoke_dir, "region").write.mode("overwrite") \
            .saveAsTable("engine_test.region_copy")
        # INSERT INTO appends through the catalog
        spark.sql("""
            INSERT INTO engine_test.region_copy
            VALUES (99, 'TEST_REGION')
        """)
        out = spark.sql("""
            SELECT r_regionkey, r_name FROM engine_test.region_copy
            ORDER BY r_regionkey
        """).collect()
        assert len(out) == 6
        assert out[-1].r_name == "TEST_REGION"
        # temp view over a query
        spark.sql("""
            CREATE OR REPLACE TEMP VIEW big_regions AS
            SELECT * FROM engine_test.region_copy WHERE r_regionkey > 2
        """)
        assert spark.table("big_regions").count() == 3
        # introspection
        tables = {t.name for t in spark.catalog.listTables("engine_test")}
        assert "region_copy" in tables
        cols = [c.name for c in spark.catalog.listColumns("engine_test.region_copy")]
        assert cols == ["r_regionkey", "r_name"]
    finally:
        spark.sql("DROP TABLE IF EXISTS engine_test.region_copy")
        spark.sql("DROP DATABASE IF EXISTS engine_test")
