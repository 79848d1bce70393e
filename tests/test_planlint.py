"""Physical-plan linter (plans/lint.py): each rule fires on a plan built
to trigger it and stays silent on the clean twin; assert_clean's allow
semantics; and the linter applied to a real engine operator."""

import pytest
from pyspark.sql import Window, functions as F

from crawler_spark.plans.lint import assert_clean, lint_plan


def _rules(df):
    return {f["rule"]: f["severity"] for f in lint_plan(df)}


def test_cartesian_fires_on_cross_join(spark):
    a = spark.range(10).withColumnRenamed("id", "x")
    b = spark.range(10).withColumnRenamed("id", "y")
    assert _rules(a.crossJoin(b)).get("cartesian") == "error"
    # keyed join: silent
    assert "cartesian" not in _rules(a.join(b, a.x == b.y))


def test_row_udf_fires_arrow_is_info(spark):
    a = spark.range(10)
    row = F.udf(lambda v: v + 1, "long")
    assert _rules(a.select(row("id"))).get("row_python_udf") == "error"

    @F.pandas_udf("long")
    def vec(s):
        return s + 1

    r = _rules(a.select(vec("id")))
    assert "row_python_udf" not in r
    assert r.get("arrow_udf") == "info"


def test_global_window_and_funnel(spark):
    a = spark.range(100).withColumnRenamed("id", "x")
    g = a.withColumn("r", F.row_number().over(Window.orderBy("x")))
    r = _rules(g)
    assert r.get("global_window") == "warn"
    assert r.get("single_partition_funnel") == "warn"
    p = a.withColumn(
        "r",
        F.row_number().over(Window.partitionBy(F.expr("x % 4")).orderBy("x")),
    )
    rp = _rules(p)
    assert "global_window" not in rp
    assert "single_partition_funnel" not in rp


def test_unpushed_filter(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(1000).withColumn("s", F.expr("cast(id as string)")).write.parquet(path)
    t = spark.read.parquet(path)
    pushed = t.where("id > 10")
    assert "unpushed_filter" not in _rules(pushed)
    derived = t.where("length(s) % 7 = 3")  # not pushable
    assert _rules(derived).get("unpushed_filter") == "warn"


def test_assert_clean_allow_semantics(spark):
    a = spark.range(100).withColumnRenamed("id", "x")
    g = a.withColumn("r", F.row_number().over(Window.orderBy("x")))
    with pytest.raises(AssertionError, match="global_window"):
        assert_clean(g)
    # explicitly allowed (e.g. a documented bounded-rows window)
    findings = assert_clean(
        g, allow=("global_window", "single_partition_funnel")
    )
    assert any(f["rule"] == "exchange_count" for f in findings)


def test_engine_operator_passes_the_linter(spark):
    """The Z-order key projection — the engine's own contract ('zero
    Exchange, zero Python') re-checked through the generic audit."""
    from crawler_spark.sinks.layout import zorder_keys_with

    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("bigint").alias("y"),
    )
    th = {"x": [float(i) for i in range(1, 16)],
          "y": [float(i) for i in range(1, 16)]}
    keyed = zorder_keys_with(grid, [("x", "x"), ("y", "y")], th, bits=4)
    findings = assert_clean(keyed)
    assert dict((f["rule"], f["detail"]) for f in findings)["exchange_count"] == "0"
