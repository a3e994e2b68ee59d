"""Cross-session standing tables for the shared dedup stage
(VERDICT r6 item 7): the verified-pair / cluster stage persists as
bucketed files + sidecar under the warehouse, and a NEW session
(simulated by dropping the catalog entry — in-memory catalogs hold
metadata per-session, files survive) warm-starts by re-registering
the table with one metadata-only DDL instead of rebuilding."""

from __future__ import annotations

import os
from urllib.parse import urlparse

from mindseye_dataframes_spark.sources.bucketing import (
    dataset_fingerprint,
    standing_table,
)


def _wh(spark) -> str:
    uri = spark.conf.get("spark.sql.warehouse.dir")
    return urlparse(uri).path or uri


def test_standing_table_cold_build_then_catalogless_warm_start(spark):
    base, fp = "msdf_test_stage", "fp01"
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(200).selectExpr(
            "id AS id_a", "id * 2 AS id_b", "CAST(id AS DOUBLE) / 7 AS jaccard"
        )

    try:
        t1 = standing_table(spark, base, fp, build, ["id_a"], 8, ["id_a", "id_b"])
        assert calls["n"] == 1
        assert t1.count() == 200
        # repeat call in the SAME session: catalog hit, no rebuild
        t2 = standing_table(spark, base, fp, build, ["id_a"], 8)
        assert calls["n"] == 1
        assert t2.count() == 200

        # simulate a NEW session: the external catalog entry vanishes
        # (in-memory catalog), the files + sidecar survive
        spark.sql(f"DROP TABLE `{base}_{fp}`")
        assert os.path.exists(os.path.join(_wh(spark), f"{base}_{fp}"))
        t3 = standing_table(spark, base, fp, build, ["id_a"], 8)
        assert calls["n"] == 1  # NO rebuild — re-registered from sidecar
        rows = sorted(map(tuple, t3.collect()))
        assert rows == sorted(map(tuple, build().collect()))
        calls["n"] = 1

        # warm-read keeps the full bucketed contract: groupBy on the
        # bucket key needs NO exchange
        plan = (
            t3.groupBy("id_a")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{base}_{fp}`")
        import shutil

        shutil.rmtree(os.path.join(_wh(spark), f"{base}_{fp}"), ignore_errors=True)


def test_standing_table_fingerprint_invalidation_gc(spark):
    base = "msdf_test_stage_inv"
    built = []

    def mk(tag):
        def build():
            built.append(tag)
            return spark.range(10).selectExpr("id AS id_a", f"id + {len(built)} AS v")

        return build

    try:
        standing_table(spark, base, "aaaa", mk("a"), ["id_a"], 4)
        assert built == ["a"]
        # source changed → new fingerprint → rebuild + stale dir GC'd
        standing_table(spark, base, "bbbb", mk("b"), ["id_a"], 4)
        assert built == ["a", "b"]
        wh = _wh(spark)
        assert os.path.exists(os.path.join(wh, f"{base}_bbbb"))
        assert not os.path.exists(os.path.join(wh, f"{base}_aaaa"))
    finally:
        import shutil

        for fp in ("aaaa", "bbbb"):
            spark.sql(f"DROP TABLE IF EXISTS `{base}_{fp}`")
            shutil.rmtree(os.path.join(_wh(spark), f"{base}_{fp}"), ignore_errors=True)


def test_dataset_fingerprint_tracks_content(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"aaa")
    f1 = dataset_fingerprint(str(d))
    assert f1 == dataset_fingerprint(str(d))  # stable
    (d / "b.parquet").write_bytes(b"bbb")
    f2 = dataset_fingerprint(str(d))
    assert f2 != f1  # add invalidates
    os.utime(d / "a.parquet", ns=(1, 1))
    assert dataset_fingerprint(str(d)) != f2  # rewrite invalidates
    # single-file datasets fingerprint too
    assert dataset_fingerprint(str(d / "a.parquet"))
