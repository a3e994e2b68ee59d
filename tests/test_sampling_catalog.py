"""Property tests for seeded sampling (O3/O4), catalog surface
(S2/S3/S4), the SQL REPL (M6), and csv/json sources (§2B formats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.repl import SqlRepl
from mindseye_dataframes_spark.sources.readers import (
    load_table,
    read_csv,
    read_json,
    register_views,
)


def test_seeded_sample_reproducible(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.sample(fraction=0.1, seed=7).count()
    b = li.sample(fraction=0.1, seed=7).count()
    assert a == b
    n = li.count()
    assert 0.04 * n < a < 0.2 * n  # fraction honored within tolerance


def test_random_split_partition_invariants(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    train, test = li.randomSplit([0.9, 0.1], seed=11)
    n, a, b = li.count(), train.count(), test.count()
    assert a + b == n  # exhaustive
    # multiset equality: union of splits is exactly the input (rows are
    # not unique in this table, so set-intersect would false-positive)
    union = train.unionAll(test)
    assert li.exceptAll(union).count() == 0
    assert union.exceptAll(li).count() == 0
    assert b < 0.3 * n  # roughly honors weights


def test_register_views_and_catalog(spark, sf_dir):
    register_views(spark, sf_dir)
    assert spark.catalog.tableExists("lineitem")
    assert spark.catalog.tableExists("documents")
    assert spark.table("region").count() == 5


def test_sql_repl_staging_flow(spark, sf_dir):
    """Mirror the reference's staging flow (`Trainer.scala:91-121`):
    register → CREATE TEMPORARY VIEW with generated casts → query."""
    register_views(spark, sf_dir)
    repl = SqlRepl(spark, default_cmd="%sql SELECT COUNT(*) AS n FROM lineitem")
    repl.run(
        "%sql CREATE OR REPLACE TEMPORARY VIEW staged AS "
        "SELECT CAST(l_linenumber AS DOUBLE) AS line_d, l_quantity FROM lineitem"
    )
    out = repl.run("%sql SELECT COUNT(*) AS n, MIN(line_d) AS mn FROM staged").collect()
    assert out[0]["n"] > 0 and out[0]["mn"] == 1.0
    default = repl.run("").collect()  # falls back to default command
    assert default[0]["n"] == out[0]["n"]
    assert len(repl.history) == 3


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    csv_path, json_path = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    src.write.mode("overwrite").option("header", "true").csv(csv_path)
    src.write.mode("overwrite").json(json_path)
    back_csv = read_csv(spark, csv_path)
    back_json = read_json(spark, json_path)
    want = {tuple(r) for r in src.collect()}
    assert {tuple(r) for r in back_csv.select(*src.columns).collect()} == want
    assert {tuple(r) for r in back_json.select(*src.columns).collect()} == want


def test_approx_distinct_bounded_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_stratified_sample_fractions_and_determinism(spark):
    from mindseye_dataframes_spark.sources.readers import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    totals = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fracs = {"A": 0.05, "N": 0.05, "R": 0.2}
    a = li.sampleBy("l_returnflag", fractions=fracs, seed=42)
    b = li.sampleBy("l_returnflag", fractions=fracs, seed=42)
    got_a = {
        r["l_returnflag"]: r["n"]
        for r in a.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # same seed → identical sample
    assert sorted(r["l_orderkey"] for r in a.collect()) == sorted(
        r["l_orderkey"] for r in b.collect()
    )
    # per-stratum rate lands near its target fraction
    for flag, frac in fracs.items():
        rate = got_a.get(flag, 0) / totals[flag]
        assert abs(rate - frac) < 0.35 * frac + 0.01, (flag, rate, frac)


def test_compaction_merges_small_files_and_preserves_rows(spark, tmp_path):
    """Fragment a table into many tiny files, compact, and check:
    fewer files, every merged group under ~2x target, zero row loss,
    and large files left untouched."""
    from mindseye_dataframes_spark.operators.compaction import (
        compact,
        compaction_plan,
        file_row_stats,
    )

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    # 20 tiny files of 50 rows + 1 large file of 5000
    spark.range(0, 1000).repartition(20).write.parquet(src)
    spark.range(1000, 6000).coalesce(1).write.mode("append").parquet(src)

    stats = file_row_stats(spark, src)
    n_files_before = stats.count()
    assert n_files_before >= 21

    plan = compaction_plan(stats, target_rows=400)
    rows = plan.collect()
    assert all(r.merge_group is None for r in rows if r.n_rows >= 400)
    assert all(r.merge_group is not None for r in rows if r.n_rows < 400)
    # greedy packing: per-group totals land in (0, target + max_small]
    per_group: dict = {}
    for r in rows:
        if r.merge_group is not None:
            per_group[r.merge_group] = per_group.get(r.merge_group, 0) + r.n_rows
    assert all(total <= 400 + 50 for total in per_group.values())

    compact(spark, src, out, target_rows=400)
    after = file_row_stats(spark, out)
    assert after.count() < n_files_before
    assert spark.read.parquet(out).count() == 6000
    # the compacted layout still contains a ~5000-row (untouched) file
    assert after.filter(F.col("n_rows") >= 5000).count() == 1


def test_robust_json_read_quarantines_malformed_lines(spark, tmp_path):
    """Malformed JSONL lines must be captured (not dropped, not fatal)
    and split into an auditable quarantine frame."""
    from mindseye_dataframes_spark.sources.readers import (
        read_json_robust,
        quarantine_split,
    )

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "this is not json\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": "NaN-ish", "v": 3}\n'  # wrong types -> corrupt under schema
    )
    df = read_json_robust(spark, str(p), "id long, v string")
    good, bad = quarantine_split(df)
    assert {(r.id, r.v) for r in good.collect()} == {(1, "a"), (2, "b")}
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 2 and "not json" in bad_lines[0]
    assert "_corrupt_record" not in good.columns
