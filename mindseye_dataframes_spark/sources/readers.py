"""Sources: parquet/csv/json scans + temp-view catalog registration.

Parity surface (SURVEY §2A): S1 parquet scan (`Trainer.scala:94`),
S2 temp-view registration (`Trainer.scala:95`), S4 catalog lookup
(`Trainer.scala:207`). Reads go through ``spark.read`` so predicate
pushdown / column pruning / partition pruning into the scan are
Catalyst's job — do not pre-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the driver's testdata star schema (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1: parquet scan. Schema inferred from footers (`Trainer.scala:94`)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, header: bool = True, schema=None
) -> DataFrame:
    """Schema may be a DDL string or a StructType; None → infer (an
    extra pass — always pass the schema on large inputs)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# (applicationId, sf_dir, name) -> DataFrame. spark.read.parquet
# re-reads footers and rebuilds the file index on every call (~120ms
# measured even for a single local file); DataFrames are immutable
# plan handles, so sharing one per (session, table) is safe and makes
# repeated query construction O(py4j-call) instead of O(footer-read).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table from an sf directory (memoized per
    session — see ``_TABLE_CACHE``).

    ``events.parquet`` stores TIMESTAMP(NANOS); handling is version
    dependent — see ``_load_table`` for the dual NTZ/legacy path.
    """
    from mindseye_dataframes_spark.compat import session_key

    key = (session_key(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table(spark, sf_dir, name)
    _TABLE_CACHE[key] = df
    return df


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return read_parquet(spark, path)

    # The driver's current events.parquet stores TIMESTAMP(MICROS) and
    # reads directly. Older drops stored TIMESTAMP(NANOS); keep a compat
    # path: some Spark builds read NANOS natively (as NTZ or LTZ micros,
    # FLOORING sub-microsecond values — verified empirically on a
    # pre-1970 fixture: -999ns → -1µs), others reject it unless the
    # legacy nanosAsLong conf re-types the column as raw int64. DuckDB's
    # nanos→micros conversion TRUNCATES toward zero (-999ns → 0µs), so
    # the two engines diverge on pre-1970 sub-µs NANOS values — only on
    # the native path, which we can't intercept. The legacy path below
    # truncates to match DuckDB. Post-1970 values agree on every path
    # (floor == trunc for non-negatives). Session tz is pinned UTC, so
    # the NTZ→LTZ cast is value-exact.
    try:
        df = read_parquet(spark, path)
        ts_type = dict(df.dtypes).get("ts")
    except Exception as exc:  # narrow: only the nanos rejection falls through
        msg = str(exc)
        if "Illegal Parquet type" not in msg and "NANOS" not in msg:
            raise  # missing file / corrupt footer / permissions: surface now
        df, ts_type = None, None
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if df is not None and ts_type != "bigint":
        return df

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(conf_key)
    except Exception:
        prev = None
    spark.conf.set(conf_key, "true")
    try:
        df = read_parquet(spark, path)
        if dict(df.dtypes).get("ts") == "bigint":
            # ``div`` truncates toward zero, matching DuckDB's
            # nanos→micros truncation (-999ns → 0µs, verified)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S2/S4: register every testdata table as a temp view so the full
    SQL surface (`spark.sql`) can address them, mirroring the
    reference's staging handoff (`Trainer.scala:91-99`)."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_json_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """PERMISSIVE JSON read that CAPTURES malformed lines instead of
    nulling them silently or failing the job: rows that don't parse
    land with all data columns NULL and the raw line in
    ``corrupt_col``. At 100 TB a feed always contains garbage; the
    scan must neither die (FAILFAST) nor silently drop (DROPMALFORMED
    hides data loss) — capture + quarantine is the auditable mode.
    ``schema`` is a DDL string of the DATA columns; the corrupt
    column is appended here."""
    full = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def quarantine_split(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantined_raw_lines).

    Spark refuses queries that reference ONLY the internal corrupt
    column on the raw scan (SPARK-21610) — the documented workaround
    is persisting the parsed relation first, which also means the
    parse pays once for both outputs."""
    cached = df.persist()
    good = cached.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = cached.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Spark's ``binaryFile`` source: one row per file with (path,
    modificationTime, length, content) — the ingestion scan for
    multimodal corpora (images/audio/video as opaque bytes + typed
    metadata, SURVEY 2B ★ multimodal). Partition parallelism comes
    from the file listing, and ``pathGlobFilter`` prunes at the
    listing, never reading filtered files."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_packed_binary(spark: SparkSession, path: str) -> DataFrame:
    """Read container shards written by ``sinks.pack_binary_objects``:
    ``(name, *meta, content)`` — the same logical surface as the
    ``binaryFile`` source (an id and opaque bytes per object) but with
    per-SHARD listing/open cost instead of per-object, so a 100 TB
    image corpus scans as tens of thousands of splittable parquet
    shards rather than billions of file opens. Existing decode kernels
    (operators/multimodal.py) consume the ``content`` column
    unchanged."""
    return spark.read.parquet(path)
