"""Featurization-calculus queries (SURVEY §2A F1/F2/F4/F5/F6).

The relational faces of the featurize/ package: z-score
standardization with exact-decimal moments, one-hot expansion, and
deterministic parameter identity (name-UUID v3) — each with a DuckDB
oracle twin. The full differentiable pipeline (embeddings + network
forward) is exercised as a rows-only query (q40) plus unit tests —
numpy matmul is not SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_MOMENTS = """
      SELECT
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          / CAST(COUNT(l_quantity) AS DOUBLE) AS mean_q,
        SQRT(ABS(
          CAST(SUM(CAST(l_quantity AS DECIMAL(14,4)) * CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE)
            / CAST(COUNT(l_quantity) AS DOUBLE)
          - (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE))
            * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE))
        )) AS std_q
      FROM lineitem
"""


@query(
    "q37_zscore_expansion",
    oracle=f"""
    WITH m AS ({_MOMENTS})
    SELECT l_orderkey, l_linenumber,
           (l_quantity - m.mean_q) / m.std_q AS z,
           ((l_quantity - m.mean_q) / m.std_q) * ((l_quantity - m.mean_q) / m.std_q) AS z2
    FROM lineitem, m
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("featurize", "parity:F2,F6"),
)
def q37_zscore_expansion(spark, sf_dir):
    """F2: frozen affine z-score + polynomial expansion, computed from
    exact-decimal moments (engine-identical doubles), as a relational
    query: broadcast the 1-row moments — no per-row shuffle."""
    from mindseye_dataframes_spark.functions.exact import davg, dec

    li = load_table(spark, sf_dir, "lineitem")
    x = dec("l_quantity", 4, 14)
    m = li.agg(
        davg("l_quantity").alias("mean_q"),
        F.sqrt(
            F.abs(
                F.sum(x * x).cast("double") / F.count("l_quantity").cast("double")
                - davg("l_quantity") * davg("l_quantity")
            )
        ).alias("std_q"),
    )
    z = (F.col("l_quantity") - F.col("mean_q")) / F.col("std_q")
    return (
        li.crossJoin(F.broadcast(m))
        .select(
            "l_orderkey",
            "l_linenumber",
            z.alias("z"),
            (z * z).alias("z2"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q38_onehot_labels",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CASE WHEN l_returnflag = 'A' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS flag_a,
           CAST(CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS flag_n,
           CAST(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS flag_r
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("featurize", "parity:F4"),
)
def q38_onehot_labels(spark, sf_dir):
    """F4: one-hot target encoding, flattened to columns
    (`CategorizingModelingStrategy.scala:27-41`)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = [
        F.when(F.col("l_returnflag") == v, 1.0).otherwise(0.0).alias(f"flag_{v.lower()}")
        for v in ("A", "N", "R")
    ]
    return li.select("l_orderkey", "l_linenumber", *cols).orderBy(
        "l_orderkey", "l_linenumber"
    )


@query(
    "q39_param_identity",
    oracle="""
    WITH keys AS (
      SELECT DISTINCT 'lineitem/l_returnflag=' || l_returnflag AS key FROM lineitem
      UNION
      SELECT DISTINCT 'lineitem/l_linestatus=' || l_linestatus AS key FROM lineitem
    ), hashed AS (SELECT key, md5(key) AS h FROM keys)
    SELECT key,
           concat(
             substr(h, 1, 8), '-', substr(h, 9, 4), '-3', substr(h, 14, 3), '-',
             substr('89ab', (strpos('0123456789abcdef', substr(h, 17, 1)) - 1) % 4 + 1, 1),
             substr(h, 18, 3), '-', substr(h, 21, 12)
           ) AS param_uuid
    FROM hashed
    ORDER BY key
    """,
    tags=("featurize", "parity:F5"),
)
def q39_param_identity(spark, sf_dir):
    """F5: deterministic name-based (MD5 v3) parameter UUIDs, the
    Java ``UUID.nameUUIDFromBytes`` scheme rebuilt as pure SQL on both
    engines (version nibble := '3', variant nibble := (v & 3) | 8)."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        li.select(F.concat(F.lit("lineitem/l_returnflag="), F.col("l_returnflag")).alias("key"))
        .union(
            li.select(
                F.concat(F.lit("lineitem/l_linestatus="), F.col("l_linestatus")).alias("key")
            )
        )
        .distinct()
    )
    h = F.md5("key")
    variant = F.substring(
        F.lit("89ab"),
        ((F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4) + 1).cast("int"),
        1,
    )
    uuid = F.concat(
        F.substring(h, 1, 8), F.lit("-"), F.substring(h, 9, 4), F.lit("-3"),
        F.substring(h, 14, 3), F.lit("-"), variant, F.substring(h, 18, 3),
        F.lit("-"), F.substring(h, 21, 12),
    )
    return keys.select("key", uuid.alias("param_uuid")).orderBy("key")


@query(
    "q40_featurize_pipeline",
    oracle=None,  # numpy matmul inside mapInPandas — not SQL-expressible
    tags=("featurize", "parity:M1,F1,F2,F3"),
)
def q40_featurize_pipeline(spark, sf_dir):
    """M1 end-to-end: schema-recursive featurization of lineitem
    measures + categoricals into a dense feature column via broadcast
    params + Arrow-batched mapInPandas (rows-only driver check; value
    semantics covered by tests/test_featurize.py)."""
    from mindseye_dataframes_spark.featurize import DataframeModeler, ModelingStrategy

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus"
    )
    modeler = DataframeModeler(ModelingStrategy(default_size=8))
    modeler.init_keys(li)
    out = modeler.eval_to_dataframe(li, "features")
    # rounded JSON digest keeps the rows-only check canonicalizable
    return out.withColumn(
        "features", F.to_json(F.transform(F.col("features"), lambda x: F.round(x, 6)))
    )


@query(
    "q78_eval_identity",
    oracle=f"""
    WITH m AS ({_MOMENTS})
    SELECT l_orderkey, l_linenumber,
           (l_quantity - m.mean_q) / m.std_q
             + CASE l_returnflag WHEN 'A' THEN 10.0 WHEN 'N' THEN 20.0
                                 ELSE 30.0 END AS feat
    FROM lineitem, m
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("featurize", "parity:M1,F1,F2,F3"),
)
def q78_eval_identity(spark, sf_dir):
    """M1 batch inference (`ModelingStrategy.scala:167-186`) made
    SQL-checkable: run the REAL ``eval_to_dataframe`` path (broadcast
    params → Arrow mapInPandas → featurize → array<double> column) with
    a degenerate pinned configuration — numeric transform [[0],[1]]
    makes the z-score channel an identity, and the categorical
    embeddings are pinned scalars — so the summed feature equals a
    plain SQL expression over the exact-decimal moments."""
    import numpy as np

    from mindseye_dataframes_spark.featurize import DataframeModeler, ModelingStrategy

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    modeler = DataframeModeler(ModelingStrategy(default_size=1))
    modeler.init_keys(li.select("l_quantity", "l_returnflag"))
    modeler.context.transforms["transform/l_quantity"] = np.array([[0.0], [1.0]])
    for v, c in (("A", 10.0), ("N", 20.0), ("R", 30.0)):
        modeler.context.representations[f"l_returnflag={v}"] = np.array([c])
    out = modeler.eval_to_dataframe(
        li, "features", passthrough=["l_orderkey", "l_linenumber"]
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at("features", 1).alias("feat"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q65_featurize_temporal_embedding",
    oracle=None,  # numpy matmul inside mapInPandas — not SQL-expressible
    tags=("featurize", "parity:type-extension"),
)
def q65_featurize_temporal_embedding(spark, sf_dir):
    """Type-matrix extension end-to-end (SURVEY §1.2): timestamp →
    epoch-seconds z-score channel (events.ts) joined with an
    embedding-vector channel (embeddings.embedding → learned affine
    map), featurized in one pass. Rows-only driver check; channel
    value semantics covered by tests/test_featurize.py."""
    from mindseye_dataframes_spark.featurize import DataframeModeler, ModelingStrategy

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .filter(F.col("event_id") % 100 < 10)  # bounded slice for the gate
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("event_id"), "embedding"
    )
    joined = ev.join(emb, "event_id", "left")
    modeler = DataframeModeler(ModelingStrategy(default_size=8))
    modeler.init_keys(joined.drop("event_id"))
    out = modeler.eval_to_dataframe(joined, "features", passthrough=["event_id"])
    # rounded JSON digest: the driver's rows-only canonicalizer cannot
    # lexsort list cells (round 1 crash)
    return out.withColumn(
        "features", F.to_json(F.transform(F.col("features"), lambda x: F.round(x, 6)))
    )
