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
        wh = _wh(spark)
        # age the sidecar past the grace window: the GC compares
        # last-use mtime, and a just-built table is inside the window
        os.utime(os.path.join(wh, f"{base}_aaaa", "_msdf_stage_meta.json"), (1, 1))
        # source changed → new fingerprint → rebuild + stale dir GC'd
        standing_table(spark, base, "bbbb", mk("b"), ["id_a"], 4)
        assert built == ["a", "b"]
        assert os.path.exists(os.path.join(wh, f"{base}_bbbb"))
        assert not os.path.exists(os.path.join(wh, f"{base}_aaaa"))
    finally:
        import shutil

        for fp in ("aaaa", "bbbb"):
            spark.sql(f"DROP TABLE IF EXISTS `{base}_{fp}`")
            shutil.rmtree(os.path.join(_wh(spark), f"{base}_{fp}"), ignore_errors=True)


def test_standing_table_gc_grace_protects_concurrent_reader(spark):
    """The GC race close (VERDICT r7 item 6): a stale-fingerprint
    table whose sidecar was used RECENTLY (inside the grace window)
    must survive a competing build's GC pass — a concurrent session
    that resolved the old fingerprint moments ago may still be
    scanning those files."""
    base = "msdf_test_stage_race"

    def mk(v):
        def build():
            return spark.range(10).selectExpr("id AS id_a", f"id + {v} AS v")

        return build

    wh = _wh(spark)
    try:
        # session A resolves (and thereby touches) the old-fp table
        old = standing_table(spark, base, "oldfp", mk(1), ["id_a"], 4)
        old_rows = sorted(map(tuple, old.collect()))
        # session B publishes a new fingerprint and runs GC: the
        # old-fp table is inside the grace window → left alone
        standing_table(spark, base, "newfp", mk(2), ["id_a"], 4)
        assert os.path.exists(os.path.join(wh, f"{base}_oldfp"))
        # the concurrent reader's in-flight frame still scans fine
        assert sorted(map(tuple, old.collect())) == old_rows
        # grace elapses (backdate last-use) → the next GC collects it
        os.utime(
            os.path.join(wh, f"{base}_oldfp", "_msdf_stage_meta.json"), (1, 1)
        )
        spark.sql(f"DROP TABLE IF EXISTS `{base}_newfp`")
        import shutil

        shutil.rmtree(os.path.join(wh, f"{base}_newfp"), ignore_errors=True)
        standing_table(spark, base, "newfp", mk(3), ["id_a"], 4)
        assert not os.path.exists(os.path.join(wh, f"{base}_oldfp"))
    finally:
        import shutil

        for fp in ("oldfp", "newfp"):
            spark.sql(f"DROP TABLE IF EXISTS `{base}_{fp}`")
            shutil.rmtree(os.path.join(wh, f"{base}_{fp}"), ignore_errors=True)


def test_dataset_fingerprint_pluggable_lister():
    """Object-store listers plug in as (path) -> (name, size, version)
    (VERDICT r7 item 5): ETag-style versions fingerprint without any
    filesystem access, and a version bump invalidates exactly like an
    mtime bump does for the local lister."""
    listing = {
        "s3://bucket/ds": [
            ("part-0.parquet", 100, "etag-aaa"),
            ("part-1.parquet", 200, "etag-bbb"),
        ]
    }

    def s3_lister(path):
        return listing[path]

    f1 = dataset_fingerprint("s3://bucket/ds", lister=s3_lister)
    assert f1 == dataset_fingerprint("s3://bucket/ds", lister=s3_lister)
    # rewrite: same name/size, new ETag → new fingerprint
    listing["s3://bucket/ds"][0] = ("part-0.parquet", 100, "etag-ccc")
    f2 = dataset_fingerprint("s3://bucket/ds", lister=s3_lister)
    assert f2 != f1
    # add → new fingerprint
    listing["s3://bucket/ds"].append(("part-2.parquet", 1, "etag-ddd"))
    assert dataset_fingerprint("s3://bucket/ds", lister=s3_lister) != f2


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


def test_hadoop_lister_fingerprints_through_filesystem_api(spark, tmp_path):
    """The Hadoop-FS lister (the object-store path of the pluggable
    listing) must agree with the local lister's change-detection
    semantics when pointed at the same files via file:// — stable on
    re-list, invalidated by add and by rewrite."""
    from mindseye_dataframes_spark.sources.bucketing import hadoop_lister

    d = tmp_path / "ds"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"aaa")
    lister = hadoop_lister(spark)
    uri = f"file://{d}"
    f1 = dataset_fingerprint(uri, lister=lister)
    assert f1 == dataset_fingerprint(uri, lister=lister)  # stable
    (d / "b.parquet").write_bytes(b"bbb")
    f2 = dataset_fingerprint(uri, lister=lister)
    assert f2 != f1  # add invalidates
    os.utime(d / "a.parquet", (1, 1))
    assert dataset_fingerprint(uri, lister=lister) != f2  # rewrite invalidates
    # listing is relative-name based: the same content under a
    # different root fingerprint-matches (portable staging)
    d2 = tmp_path / "ds_copy"
    d2.mkdir()
    for fn in ("a.parquet", "b.parquet"):
        (d2 / fn).write_bytes((d / fn).read_bytes())
        st = os.stat(d / fn)
        os.utime(d2 / fn, (st.st_atime, st.st_mtime))
    assert dataset_fingerprint(f"file://{d2}", lister=lister) == dataset_fingerprint(uri, lister=lister)
