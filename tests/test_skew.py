"""Salted-join correctness: equals the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of left rows share one hot key
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(500).select(F.col("id").alias("k"), (F.col("id") * 3).alias("rv"))
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, ["k"], salt=4).select("k", "lv", "rv")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join(spark):
    left = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("lv"))
    right = spark.range(3).select(F.col("id").alias("k"), F.lit("r").alias("rv"))
    plain = left.join(right, "k", "left").select("k", "lv", "rv")
    salted = salted_join(left, right, ["k"], salt=3, how="left").select("k", "lv", "rv")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
