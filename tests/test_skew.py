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


def test_aqe_skew_join_fires_under_session_config(spark):
    """The session factory enables AQE; this pins that Spark's runtime
    skew-join handling actually activates on a skewed sort-merge join
    (thresholds lowered to test scale, saved and restored): the final
    adaptive plan must carry SortMergeJoin(skew=true) with a skewed
    AQEShuffleRead — the guarantee that a hot key at 100 TB splits
    into parallel subtasks instead of straggling one executor."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 2_000_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        j = left.join(right, "k")
        qe = j._jdf.queryExecution()
        assert qe.executedPlan().execute().count() == 2_000_000
        plan = qe.executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
