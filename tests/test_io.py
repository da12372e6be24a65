"""Source/sink coverage (reference S1/S2 + K1/K2 generalized): format
round-trips, partitioned writes, single-file gather mode."""

from pyspark.sql import functions as F

from mapreduce_4sl08_spark.sources import load_table, read_any, write_any


def _nation(spark, sf_smoke_dir):
    return load_table(spark, sf_smoke_dir, "nation")


def test_parquet_roundtrip(spark, sf_smoke_dir, tmp_path):
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "parquet", str(tmp_path / "p"))
    back = read_any(spark, "parquet", str(tmp_path / "p"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_roundtrip_with_schema(spark, sf_smoke_dir, tmp_path):
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "csv", str(tmp_path / "c"))
    back = read_any(spark, "csv", str(tmp_path / "c"), schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, sf_smoke_dir, tmp_path):
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "json", str(tmp_path / "j"))
    back = read_any(spark, "json", str(tmp_path / "j"), schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, sf_smoke_dir, tmp_path):
    """Partitioned parquet sink + partition-pruned scan — the 100 TB sink
    shape. The pruned plan must read only the selected partition."""
    orders = load_table(spark, sf_smoke_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    write_any(orders, "parquet", str(tmp_path / "part"), partition_by=["o_year"])
    back = read_any(spark, "parquet", str(tmp_path / "part"))
    one_year = back.filter(F.col("o_year") == 1997)
    want = orders.filter(F.col("o_year") == 1997).count()
    assert one_year.count() == want
    # partition pruning visible in the physical plan
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan, plan[:500]


def test_single_file_mode(spark, sf_smoke_dir, tmp_path):
    """K2 EXPLICIT-mode equivalent: one output file via coalesce(1)."""
    df = _nation(spark, sf_smoke_dir)
    write_any(df, "csv", str(tmp_path / "single"), single_file=True)
    import glob
    files = glob.glob(str(tmp_path / "single" / "part-*"))
    assert len(files) == 1


def test_text_source(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("alpha beta\ngamma\n", encoding="utf-8")
    df = read_any(spark, "text", str(p))
    assert [r.value for r in df.collect()] == ["alpha beta", "gamma"]
