"""Training-data layout queries (north-star ★): n-gram Jaccard dedup,
GPT-style sequence packing, seeded epoch shuffle, mixture-weighted
sampling. These are the post-curation ops a pre-training pipeline runs
between "clean corpus" and "token blocks on disk".

All four are fully oracle-checked: the layout decisions (offsets,
block ids, shuffle positions, keep/drop) are deterministic functions
of (content, seed), so DuckDB reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from mindseye_dataframes_spark.operators.packing import (
    mixture_sample,
    pack_sequences,
    seeded_shuffle,
)
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_NGRAM_N = 8
_NGRAM_MAXDF = 50
_NGRAM_THRESHOLD = 0.5


@query(
    "q80_ngram_jaccard_pairs",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN len(text) >= {_NGRAM_N}
                  THEN list_distinct(list_transform(range(1, len(text) - {_NGRAM_N} + 2),
                       i -> substr(text, i, {_NGRAM_N})))
                  ELSE [text] END AS grams
      FROM documents
    ), postings AS (
      SELECT doc_id, unnest(grams) AS gr FROM g
    ), rare AS (
      SELECT gr FROM postings GROUP BY gr HAVING COUNT(*) <= {_NGRAM_MAXDF}
    ), rp AS (
      SELECT postings.doc_id, postings.gr FROM postings JOIN rare USING (gr)
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rp a JOIN rp b USING (gr)
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
             / CAST(len(ga.grams) + len(gb.grams)
                    - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) AS jaccard
    FROM cands
    JOIN g ga ON ga.doc_id = id_a
    JOIN g gb ON gb.doc_id = id_b
    WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
            / CAST(len(ga.grams) + len(gb.grams)
                   - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
          >= {_NGRAM_THRESHOLD}
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "training", "parity:ngram-jaccard"),
)
def q80_ngram_jaccard_pairs(spark, sf_dir):
    """Character-8-gram Jaccard near-dup pairs via inverted-index
    candidates (df ≤ 50) — the exact-candidate complement to q32's
    MinHash-LSH (`operators/dedup.py:ngram_jaccard_pairs`)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", n=_NGRAM_N,
        threshold=_NGRAM_THRESHOLD, max_df=_NGRAM_MAXDF,
    ).orderBy("id_a", "id_b")


_BLOCK = 256


@query(
    "q81_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), o AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(floor(start_offset / {_BLOCK}) AS BIGINT) AS first_block,
           CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / {_BLOCK}) AS BIGINT) AS last_block,
           CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / {_BLOCK})
                - floor(start_offset / {_BLOCK}) + 1 AS BIGINT) AS n_blocks
    FROM o ORDER BY doc_id
    """,
    tags=("training", "packing", "parity:sequence-packing"),
)
def q81_pack_sequences(spark, sf_dir):
    """GPT-style packing: concatenate token streams in doc_id order,
    chop into 256-token blocks; each doc gets its global offset and
    block span. The offset scan is the two-phase distributed prefix
    sum (`operators/packing.py:with_global_prefix_sum`) — no
    single-partition window."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return (
        pack_sequences(docs, "n_tokens", ["doc_id"], _BLOCK)
        .select("doc_id", "n_tokens", "start_offset",
                "first_block", "last_block", "n_blocks")
        .orderBy("doc_id")
    )


_SHUFFLE_SEED = "epoch-0"


@query(
    "q82_seeded_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5('{_SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR)))
                - 1 AS BIGINT) AS shuffle_pos
    FROM documents ORDER BY doc_id
    """,
    tags=("training", "shuffle", "parity:seeded-shuffle"),
)
def q82_seeded_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle: dense position ordered by
    md5(seed:doc_id). Engine-portable (md5), cluster-size-invariant,
    and the range exchange on the hash IS the data movement
    (`operators/packing.py:seeded_shuffle`)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return seeded_shuffle(docs, ["doc_id"], _SHUFFLE_SEED).orderBy("doc_id")


_MIX_RATES = {"en": 0.8, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.1}
_MIX_BUCKETS = 10_000


@query(
    "q83_mixture_sample",
    oracle=f"""
    WITH rates(lang, keep_below) AS (VALUES
      {", ".join(f"('{g}', {int(round(r * _MIX_BUCKETS))})" for g, r in sorted(_MIX_RATES.items()))}
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN rates USING (lang)
    WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
            % {_MIX_BUCKETS} < rates.keep_below
    ORDER BY d.doc_id
    """,
    tags=("training", "sampling", "parity:mixture-sample"),
)
def q83_mixture_sample(spark, sf_dir):
    """Mixture-weighted corpus sampling: per-language keep rates
    applied via a deterministic md5 bucket — broadcast join + map-side
    filter, zero fact-table shuffles
    (`operators/packing.py:mixture_sample`)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        mixture_sample(docs, "lang", "doc_id", _MIX_RATES, buckets=_MIX_BUCKETS)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_CUR_SEED = "cur-0"
_CUR_TIERS = 4


@query(
    "q216_curriculum_schedule",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS score
      FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
    hist AS (SELECT score, count(*) AS c FROM t GROUP BY score),
    cum AS (SELECT score, SUM(c) OVER (ORDER BY score) AS cum FROM hist),
    cuts AS (
      SELECT min(CASE WHEN cum >= (1 * n + 3) // 4 THEN score END) AS c1,
             min(CASE WHEN cum >= (2 * n + 3) // 4 THEN score END) AS c2,
             min(CASE WHEN cum >= (3 * n + 3) // 4 THEN score END) AS c3
      FROM cum CROSS JOIN tot),
    tiered AS (
      SELECT doc_id, score,
             1 + CASE WHEN score > c1 THEN 1 ELSE 0 END
               + CASE WHEN score > c2 THEN 1 ELSE 0 END
               + CASE WHEN score > c3 THEN 1 ELSE 0 END AS tier
      FROM t CROSS JOIN cuts)
    SELECT doc_id, score, CAST(tier AS INT) AS tier,
           CAST(ROW_NUMBER() OVER (
                  ORDER BY tier,
                           md5('{_CUR_SEED}:' || CAST(doc_id AS VARCHAR)),
                           doc_id) - 1 AS BIGINT) AS global_pos
    FROM tiered ORDER BY doc_id
    """,
    tags=("training", "curriculum", "parity:curriculum-schedule"),
)
def q216_curriculum_schedule(spark, sf_dir):
    """Curriculum training order: docs are quartile-tiered by an
    integer difficulty score (token count — any integer score plugs
    in), then the epoch order is easy→hard tiers with a deterministic
    md5 shuffle *within* each tier; every doc gets its dense 0-based
    ``global_pos`` in that schedule. Tier cutpoints are VALUE
    quantiles over the score histogram (all equal scores share a
    tier), so the spec is a pure function of content — DuckDB replays
    cutpoints, tiers, and the full permutation.

    Plan shape, 100 TB: the score histogram is O(distinct scores) —
    its cumulative window runs on that tiny frame, never on the
    corpus; cutpoints broadcast back as a 1-row frame (the q95
    min/max pattern); the tier tag is a narrow map; the only
    corpus-wide movement is the ONE range exchange inside
    ``with_row_index`` on (tier, md5, doc_id) — the same two-phase
    distributed position scan q81/q82 ride (no single-partition
    sort, plan-pinned there)."""
    from mindseye_dataframes_spark.operators.zip_frames import with_row_index
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("score"),
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    hist = docs.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("score").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    cuts = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"({k} * n + 3) DIV 4"),
                        F.col("score"),
                    )
                ).alias(f"c{k}")
                for k in range(1, _CUR_TIERS)
            ]
        )
    )
    tiered = docs.crossJoin(F.broadcast(cuts)).withColumn(
        "tier",
        sum(
            [F.lit(1)]
            + [
                (F.col("score") > F.col(f"c{k}")).cast("int")
                for k in range(1, _CUR_TIERS)
            ]
        ),
    )
    keyed = tiered.withColumn(
        "_cur_key",
        F.md5(F.concat_ws(":", F.lit(_CUR_SEED), F.col("doc_id").cast("string"))),
    )
    ordered = with_row_index(
        keyed, ["tier", "_cur_key", "doc_id"], index_col="global_pos"
    )
    return ordered.select(
        "doc_id", "score", F.col("tier").cast("int").alias("tier"), "global_pos"
    ).orderBy("doc_id")


_CONT_THRESHOLD_PPM = 800_000


@query(
    "q213_ngram_containment_pairs",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN len(text) >= {_NGRAM_N}
                  THEN list_distinct(list_transform(range(1, len(text) - {_NGRAM_N} + 2),
                       i -> substr(text, i, {_NGRAM_N})))
                  ELSE [text] END AS grams
      FROM documents
    ), postings AS (
      SELECT doc_id, unnest(grams) AS gr FROM g
    ), rare AS (
      SELECT gr FROM postings GROUP BY gr HAVING COUNT(*) <= {_NGRAM_MAXDF}
    ), rp AS (
      SELECT postings.doc_id, postings.gr FROM postings JOIN rare USING (gr)
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rp a JOIN rp b USING (gr)
      WHERE a.doc_id < b.doc_id
    ), pairs AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS inter,
             CAST(len(ga.grams) AS BIGINT) AS n_a,
             CAST(len(gb.grams) AS BIGINT) AS n_b
      FROM cands
      JOIN g ga ON ga.doc_id = id_a
      JOIN g gb ON gb.doc_id = id_b
    ), directed AS (
      SELECT id_a AS src_id, id_b AS dst_id,
             inter * 1000000 // n_a AS containment_ppm FROM pairs
      UNION ALL
      SELECT id_b AS src_id, id_a AS dst_id,
             inter * 1000000 // n_b AS containment_ppm FROM pairs
    )
    SELECT src_id, dst_id, containment_ppm
    FROM directed WHERE containment_ppm >= {_CONT_THRESHOLD_PPM}
    ORDER BY src_id, dst_id
    """,
    tags=("dedup", "training", "parity:ngram-containment"),
)
def q213_ngram_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dup pairs (C(src→dst) =
    |∩|/|grams(src)| ≥ 0.8): the detector for a short doc EMBEDDED in
    a longer one, which symmetric Jaccard (q80) structurally under-
    scores — J = |short|/|long| for a perfect superset pair. Same
    exact inverted-index candidates (shared rare 8-gram, df ≤ 50);
    the intersection is computed once per unordered pair and fanned
    into both directed ppm scores
    (`operators/dedup.py:ngram_containment_pairs`)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        docs, "text", "doc_id", n=_NGRAM_N,
        threshold_ppm=_CONT_THRESHOLD_PPM, max_df=_NGRAM_MAXDF,
    ).orderBy("src_id", "dst_id")


@query(
    "q232_block_manifest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    o AS (
      SELECT doc_id, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS s
      FROM t),
    m AS (
      SELECT b.b AS block_id, doc_id,
             GREATEST(s, b.b * {_BLOCK}) - s AS doc_from,
             GREATEST(s, b.b * {_BLOCK}) - b.b * {_BLOCK} AS blk_from,
             LEAST(s + n, (b.b + 1) * {_BLOCK})
               - GREATEST(s, b.b * {_BLOCK}) AS seg_len
      FROM o, LATERAL (
        SELECT unnest(generate_series(s // {_BLOCK},
                                      (s + n - 1) // {_BLOCK})) AS b) b)
    SELECT CAST(block_id AS BIGINT) AS block_id, doc_id,
           CAST(doc_from AS BIGINT) AS doc_from,
           CAST(blk_from AS BIGINT) AS blk_from,
           CAST(seg_len AS BIGINT) AS seg_len
    FROM m ORDER BY block_id, blk_from
    """,
    tags=("training", "packing", "parity:block-manifest"),
)
def q232_block_manifest(spark, sf_dir):
    """The DATALOADER-facing inverse of q81: for every 256-token
    training block, the exact (doc_id, doc_from, blk_from, seg_len)
    segments that fill it — the manifest a loader materializes so
    block fetches become point reads instead of a re-scan of the
    packing. Same two-phase distributed prefix sum as q81 (no
    single-partition window), then a per-doc explode whose fan-out is
    n_tokens/256 + 1 — output is O(total_tokens / block) rows, all
    integer interval arithmetic; every block's segments sum to
    exactly 256 except the final partial block (a property the
    oracle's values pin implicitly)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(docs, "n_tokens", ["doc_id"], _BLOCK).select(
        "doc_id",
        F.col("n_tokens").alias("n"),
        F.col("start_offset").alias("s"),
    )
    return manifest_segments(packed).orderBy("block_id", "blk_from")


def manifest_segments(packed):
    """Segment explode shared by the FULL manifest build (q232) and
    the INCREMENTAL append path (q237): ``packed`` carries
    (doc_id, n, s) with ``s`` the doc's global token offset; emits one
    (block_id, doc_id, doc_from, blk_from, seg_len) row per block the
    doc touches — fan-out n/BLOCK + 1, all integer interval math.
    Single source of truth for the interval arithmetic since r11
    (VERDICT r10 item 1); both q232 and q237 route through it."""
    b = F.explode(
        F.sequence(
            F.expr(f"s DIV {_BLOCK}"), F.expr(f"(s + n - 1) DIV {_BLOCK}")
        )
    ).alias("block_id")
    seg_lo = F.greatest("s", F.expr(f"block_id * {_BLOCK}"))
    seg_hi = F.least(
        F.expr("s + n"), F.expr(f"(block_id + 1) * {_BLOCK}")
    )
    return packed.select("doc_id", "n", "s", b).select(
        F.col("block_id").cast("long").alias("block_id"),
        "doc_id",
        (seg_lo - F.col("s")).alias("doc_from"),
        (seg_lo - F.expr(f"block_id * {_BLOCK}")).alias("blk_from"),
        (seg_hi - seg_lo).alias("seg_len"),
    )


def manifest_append(
    base_manifest,
    base_total_tokens,
    delta_docs,
    count_col,
    order_keys,
    check_order=True,
    base_keys=None,
):
    """INCREMENTAL manifest maintenance — the append-only inverse of
    re-running q232 over the whole corpus: new docs always pack AFTER
    the existing token stream (the manifest order is doc-id order and
    appends carry larger ids), so the maintenance job prefix-sums ONLY
    the delta, offsets it by the standing corpus's total token count,
    and unions the new segment rows onto the standing manifest — the
    standing rows are untouched (a straddling base doc's partial
    segment in the boundary block was already emitted when it was
    manifested). Cost is O(delta), not O(corpus): at 100 TB this is
    the difference between re-manifesting a day's ingest and
    re-scanning the lake. Equivalence to the full rebuild is pinned in
    tests/test_training_ops.py and driver-hashed as q237.

    The equivalence REQUIRES every delta row to sort after every base
    row under ``order_keys``; ``check_order=True`` (default) verifies
    it with two O(1)-result scalar aggregates (max base key, min delta
    key) and raises ``ValueError`` on an interleaving delta — both are
    map-side-combined single-row jobs. The base-side aggregate runs
    against ``base_keys`` when given (the PRE-EXPLODE base docs, or
    any cheap relation carrying the base ``order_keys`` — a
    column-pruned scan, never the segment fan-out); only when
    ``base_keys`` is None does it fall back to aggregating
    ``base_manifest`` itself, which is O(1)-result but re-executes the
    manifest PLAN if the caller passed an unmaterialized one — in a
    real deployment the standing manifest is a stored table so the
    fallback is a scan, but plan-composed callers (q237's shape) must
    pass ``base_keys`` or persist the manifest first (ADVICE r11).
    Pass ``check_order=False`` only when the caller enforces the
    ordering structurally (e.g. monotone ingest ids)."""
    if check_order:
        base_key_src = base_keys if base_keys is not None else base_manifest
        base_max = base_key_src.agg(
            F.max(F.struct(*order_keys)).alias("k")
        ).collect()[0]["k"]
        delta_min = delta_docs.agg(
            F.min(F.struct(*order_keys)).alias("k")
        ).collect()[0]["k"]
        if base_max is not None and delta_min is not None:
            if tuple(delta_min) <= tuple(base_max):
                raise ValueError(
                    "manifest_append precondition violated: delta keys "
                    f"must sort strictly after base keys under "
                    f"{list(order_keys)} (base max={tuple(base_max)}, "
                    f"delta min={tuple(delta_min)}); an interleaving "
                    "delta requires a full q232 rebuild"
                )
    delta_packed = pack_sequences(
        delta_docs, count_col, order_keys, _BLOCK
    ).select(
        *order_keys,
        F.col(count_col).alias("n"),
        (F.col("start_offset") + F.lit(int(base_total_tokens))).alias("s"),
    )
    return base_manifest.unionByName(manifest_segments(delta_packed))


@query(
    "q237_manifest_incremental_append",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    o AS (
      SELECT doc_id, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS s
      FROM t),
    m AS (
      SELECT b.b AS block_id, doc_id,
             GREATEST(s, b.b * {_BLOCK}) - s AS doc_from,
             GREATEST(s, b.b * {_BLOCK}) - b.b * {_BLOCK} AS blk_from,
             LEAST(s + n, (b.b + 1) * {_BLOCK})
               - GREATEST(s, b.b * {_BLOCK}) AS seg_len
      FROM o, LATERAL (
        SELECT unnest(generate_series(s // {_BLOCK},
                                      (s + n - 1) // {_BLOCK})) AS b) b)
    SELECT CAST(block_id AS BIGINT) AS block_id, doc_id,
           CAST(doc_from AS BIGINT) AS doc_from,
           CAST(blk_from AS BIGINT) AS blk_from,
           CAST(seg_len AS BIGINT) AS seg_len
    FROM m ORDER BY block_id, blk_from
    """,
    tags=("training", "packing", "incremental", "parity:block-manifest"),
)
def q237_manifest_incremental_append(spark, sf_dir):
    """O(delta) INCREMENTAL block-manifest maintenance, driver-proven
    equivalent to the O(corpus) full rebuild: the corpus is split at
    the 90th-percentile doc_id into a standing base and a simulated
    day's ingest; the base is manifested once (q232's path), then
    ``manifest_append`` prefix-sums ONLY the delta, offsets it by the
    standing total-token count (O(1) manifest metadata in a real
    deployment), and unions the new segment rows on. The ORACLE is the
    full single-pass rebuild over all documents — hash equality IS the
    base+delta == rebuild theorem, on real data, under the driver.
    Both paths share ``manifest_segments`` for the interval
    arithmetic; the delta-after-base precondition is asserted by two
    scalar aggregates inside ``manifest_append`` — the base side runs
    on the PRE-EXPLODE base docs (``base_keys=base``), so the check is
    a column-pruned scan aggregate and the base manifest PLAN executes
    exactly once, in the returned union (ADVICE r11: aggregating the
    unmaterialized manifest itself would re-run its full build for the
    precondition). Scale shape: the incremental job touches delta rows
    only — no window, no shuffle of the standing manifest (union is
    exchange-free), same two-phase prefix sum as q81 on the delta."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    n_docs = docs.count()
    cut = max(1, (n_docs * 9) // 10)
    base = docs.filter(F.col("doc_id") < F.lit(cut))
    delta = docs.filter(F.col("doc_id") >= F.lit(cut))
    base_packed = pack_sequences(base, "n_tokens", ["doc_id"], _BLOCK).select(
        "doc_id",
        F.col("n_tokens").alias("n"),
        F.col("start_offset").alias("s"),
    )
    base_manifest = manifest_segments(base_packed)
    base_total = base.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"] or 0
    return manifest_append(
        base_manifest, base_total, delta, "n_tokens", ["doc_id"],
        base_keys=base,
    ).orderBy("block_id", "blk_from")
