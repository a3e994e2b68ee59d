"""Source-format queries: CSV and JSON scans + sinks (SURVEY §2B
"file formats beyond Parquet").

Each query round-trips a testdata table through the format and reads
it back with an explicit schema (no inference pass), so the oracle —
DuckDB over the original parquet — value-checks writer and reader
together. Types chosen to be format-exact: ints/strings for CSV;
JSON adds a double column (Jackson emits shortest-roundtrip doubles,
so read-back is bit-exact).
"""

from __future__ import annotations

import os
import tempfile

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table, read_csv, read_json
from mindseye_dataframes_spark.sources.sinks import write_csv, write_json, write_orc


def _scratch(sf_dir: str, name: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), "msdf_roundtrip", tag, name)


@query(
    "q68_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    tags=("sources", "parity:csv"),
)
def q68_csv_roundtrip(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    path = _scratch(sf_dir, "nation_csv")
    write_csv(nation, path)
    return read_csv(spark, path, header=True, schema=nation.schema).orderBy(
        "n_nationkey"
    )


@query(
    "q69_json_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier ORDER BY s_suppkey
    """,
    tags=("sources", "parity:json"),
)
def q69_json_roundtrip(spark, sf_dir):
    supplier = load_table(spark, sf_dir, "supplier")
    path = _scratch(sf_dir, "supplier_json")
    write_json(supplier, path)
    return read_json(spark, path, schema=supplier.schema).orderBy("s_suppkey")


@query(
    "q72_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders ORDER BY o_orderkey
    """,
    tags=("sources", "parity:orc"),
)
def q72_orc_roundtrip(spark, sf_dir):
    """ORC sink + scan (columnar like parquet: pushdown/pruning apply).
    Doubles and timestamps round-trip bit-exact through ORC's typed
    columns — no text formatting involved."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    path = _scratch(sf_dir, "orders_orc")
    write_orc(orders, path)
    return spark.read.schema(orders.schema).orc(path).orderBy("o_orderkey")


@query(
    "q85_partitioned_layout_roundtrip",
    oracle="""
    SELECT lang, source, doc_id, n_chars
    FROM documents ORDER BY doc_id
    """,
    tags=("sources", "layout", "parity:partitioned-parquet"),
)
def q85_partitioned_layout_roundtrip(spark, sf_dir):
    """Hive-partitioned parquet layout: write documents partitioned by
    ``lang`` with ``sortWithinPartitions(doc_id)`` (partition pruning
    on lang + clustered doc_id ranges for min/max skipping — the
    layout a 100 TB corpus store wants), read back, and value-check
    the round trip. ``lang`` comes back as the partition directory
    column, so the writer/reader pair — not just the scan — is under
    oracle."""
    from mindseye_dataframes_spark.sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "doc_id", "n_chars"
    )
    path = _scratch(sf_dir, "documents_partitioned")
    write_parquet(docs.sortWithinPartitions("doc_id"), path, partition_by=["lang"])
    return (
        spark.read.schema(docs.schema).parquet(path)
        .select("lang", "source", "doc_id", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "q178_schema_evolution",
    oracle="""
    SELECT n_nationkey, n_name, CAST(NULL AS INT) AS n_regionkey
    FROM nation
    UNION ALL
    SELECT n_nationkey + 100, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey
    """,
    tags=("sources", "lakehouse", "parity:schema-evolution"),
)
def q178_schema_evolution(spark, sf_dir):
    """Parquet schema evolution: an old batch written before a column
    existed and a new batch carrying it are read back as ONE table via
    ``mergeSchema`` — the additive-evolution contract every long-lived
    lakehouse table needs (old files yield NULL for columns they
    predate; no rewrite of history). The oracle replays the union with
    an explicit NULL, value-checking both the merged schema and the
    per-batch column fill. At scale mergeSchema's footer sweep is the
    cost — production tables pin the merged schema in a catalog; the
    READ semantics verified here are identical."""
    from pyspark.sql import functions as F

    nation = load_table(spark, sf_dir, "nation")
    root = _scratch(sf_dir, "nation_evolved")
    nation.select("n_nationkey", "n_name").write.mode("overwrite").parquet(
        os.path.join(root, "batch=1")
    )
    nation.select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"), "n_name", "n_regionkey"
    ).write.mode("overwrite").parquet(os.path.join(root, "batch=2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(root, "batch=1"), os.path.join(root, "batch=2"))
    )
    return merged.select("n_nationkey", "n_name", "n_regionkey").orderBy(
        "n_nationkey"
    )


_SYNTH_N = 100_000
_SYNTH_MD5 = "md5(CAST(row_id AS VARCHAR))"


@query(
    "q229_python_datasource",
    oracle=f"""
    WITH ids AS (
      SELECT unnest(generate_series(0, {_SYNTH_N - 1})) AS row_id),
    r AS (
      SELECT row_id,
             CAST(('0x' || substr({_SYNTH_MD5}, 1, 8)) AS BIGINT)
               % 1000 AS user_id,
             CAST(('0x' || substr({_SYNTH_MD5}, 9, 8)) AS BIGINT)
               % 5000 AS item_id,
             CAST(('0x' || substr({_SYNTH_MD5}, 17, 8)) AS BIGINT)
               % 100000 AS amount_cents,
             CAST(('0x' || substr({_SYNTH_MD5}, 25, 8)) AS BIGINT)
               % 365 AS day
      FROM ids)
    SELECT CAST(day % 7 AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(amount_cents) AS BIGINT) AS sum_cents,
           CAST(sum(user_id) AS BIGINT) AS sum_user,
           CAST(sum(item_id) AS BIGINT) AS sum_item,
           CAST(max(row_id) AS BIGINT) AS max_row
    FROM r GROUP BY 1 ORDER BY 1
    """,
    tags=("sources", "datasource-api", "parity:python-datasource"),
)
def q229_python_datasource(spark, sf_dir):
    """Custom PYTHON DATA SOURCE under the driver's hash check
    (`sources/synth_source.py`): a pyspark.sql.datasource.DataSource
    registered by name, scanned as 16 range InputPartitions whose
    reader emits Arrow RecordBatches; every field is a pure md5
    function of row_id, so the DuckDB oracle regenerates the WHOLE
    relation with generate_series + the identical hex-window
    arithmetic and the per-dow rollup hash-pins that the source
    produced exactly the declared rows — source extensibility
    verified by value, not just by row count. Fields never depend on
    the partition, so any re-split (the 100 TB knob) leaves every
    aggregate invariant; worker memory is O(Arrow batch)."""
    from mindseye_dataframes_spark.sources.synth_source import (
        register_synth_source,
    )

    from pyspark.sql import functions as F

    register_synth_source(spark)
    df = (
        spark.read.format("msdf_synth")
        .option("n_rows", _SYNTH_N)
        .option("n_parts", 16)
        .load()
    )
    return (
        df.groupBy((F.col("day") % 7).cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount_cents").alias("sum_cents"),
            F.sum("user_id").alias("sum_user"),
            F.sum("item_id").alias("sum_item"),
            F.max("row_id").alias("max_row"),
        )
        .orderBy("dow")
    )


_SYNTH_STREAM_N = 20_000


@query(
    "q230_python_stream_datasource",
    oracle=f"""
    WITH ids AS (
      SELECT unnest(generate_series(0, {_SYNTH_STREAM_N - 1})) AS row_id),
    r AS (
      SELECT row_id,
             CAST(('0x' || substr({_SYNTH_MD5}, 1, 8)) AS BIGINT)
               % 1000 AS user_id,
             CAST(('0x' || substr({_SYNTH_MD5}, 9, 8)) AS BIGINT)
               % 5000 AS item_id,
             CAST(('0x' || substr({_SYNTH_MD5}, 17, 8)) AS BIGINT)
               % 100000 AS amount_cents,
             CAST(('0x' || substr({_SYNTH_MD5}, 25, 8)) AS BIGINT)
               % 365 AS day
      FROM ids)
    SELECT CAST(day % 7 AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(amount_cents) AS BIGINT) AS sum_cents,
           CAST(sum(user_id) AS BIGINT) AS sum_user,
           CAST(sum(item_id) AS BIGINT) AS sum_item,
           CAST(max(row_id) AS BIGINT) AS max_row
    FROM r GROUP BY 1 ORDER BY 1
    """,
    tags=("sources", "streaming", "datasource-api", "parity:python-stream-source"),
)
def q230_python_stream_datasource(spark, sf_dir):
    """STREAMING side of the custom Python DataSource (q229's twin):
    a DataSourceStreamReader whose driver-side state is ONE integer
    offset — latestOffset() advances it 5 000 rows per trigger (4 data
    micro-batches), partitions(start, end) splits each offset range
    into 4 range partitions, and rows are generated ON EXECUTORS.
    The drain appends into a memory sink until the source goes idle
    (offset clamped at n_rows), and the rollup must equal the oracle's
    one-shot generate_series relation — i.e. the union of all
    micro-batches is exactly-once and gap-free across offset
    boundaries. Offsets are checkpointable dicts and every field is a
    pure function of row_id, so replaying any offset range is
    bit-identical (the property that makes source-side recovery free
    at scale); driver memory is O(1)."""
    import uuid

    from pyspark.sql import functions as F

    from mindseye_dataframes_spark.sources.synth_source import (
        register_synth_stream_source,
    )

    register_synth_stream_source(spark)
    stream = (
        spark.readStream.format("msdf_synth_stream")
        .option("n_rows", _SYNTH_STREAM_N)
        .option("rows_per_batch", 5_000)
        .option("n_parts", 4)
        .load()
    )
    table = f"q230_synth_{uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rollup = (
        spark.table(table)
        .groupBy((F.col("day") % 7).cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount_cents").alias("sum_cents"),
            F.sum("user_id").alias("sum_user"),
            F.sum("item_id").alias("sum_item"),
            F.max("row_id").alias("max_row"),
        )
        .orderBy("dow")
    )
    snap = spark.createDataFrame(rollup.collect(), schema=rollup.schema)
    spark.catalog.dropTempView(table)
    return snap.orderBy("dow")
