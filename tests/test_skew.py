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


def test_salted_agg_matches_plain(spark):
    """Two-phase salted aggregate must equal the single-phase plan for
    merge-associative aggregates, and reject non-associative kinds."""
    import pytest

    from mindseye_dataframes_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(i, f"k{i % 3}", i * 10) for i in range(100)], "id long, k string, v long"
    )
    got = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            {"n": ("count", F.col("v")), "s": ("sum", F.col("v")),
             "mn": ("min", F.col("v")), "mx": ("max", F.col("v"))},
            salt=4, salt_from="id",
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert got == want

    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"a": ("avg", F.col("v"))}, salt_from="id")
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"n": ("count", F.col("v"))})  # no salt_from
