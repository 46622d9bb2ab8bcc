"""Set operations + the epoch-repeat / deterministic-shuffle / batching family.

Covers SURVEY §2.3: the reference's distribution operators re-expressed
relationally. Randomness is always derived from data (md5 of a key), never
from row position, so results are retry-stable on a cluster and identical in
the DuckDB oracle (SURVEY §7.6 risk 2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipelines_spark.catalog import query
from datapipelines_spark.sources.parquet import load_table
from datapipelines_spark.functions.hashing import portable_hash64


@query(
    "setop_union_customer_supplier_nations",
    oracle="""
    SELECT n_nationkey FROM (
        SELECT c_nationkey AS n_nationkey FROM customer
        UNION
        SELECT s_nationkey AS n_nationkey FROM supplier
    ) ORDER BY n_nationkey
    """,
)
def setop_union_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) via unionByName + distinct."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    return c.unionByName(s).distinct().orderBy("n_nationkey")


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    ORDER BY nationkey
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer nations with no high-balance supplier (the filter
    keeps the difference non-empty across scale factors)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s).orderBy("nationkey")


@query(
    "mix_weighted_sources",
    oracle="""
    SELECT src, COUNT(*) AS n_rows FROM (
        SELECT 'orders' AS src, o_orderkey AS k FROM orders
        WHERE CAST('0x' || substr(md5('mix-' || o_orderkey), 1, 8) AS BIGINT) % 100 < 80
        UNION ALL
        SELECT 'lineitem' AS src, l_orderkey * 10 + l_linenumber AS k FROM lineitem
        WHERE CAST('0x' || substr(md5('mix-' || (l_orderkey * 10 + l_linenumber)), 1, 8) AS BIGINT) % 100 < 20
    ) GROUP BY src ORDER BY src
    """,
)
def mix_weighted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing (D3, PrefixResampler parity —
    /root/reference/sdata/custom_datapipes.py:177-281): per-source
    deterministic sampling at normalized probabilities, then unionByName.

    The reference draws shard-granular categorical samples from FIFO buffers
    (drop-on-overflow); relationally we take an exact per-source fraction
    with data-derived hashing — retry-stable, no buffers, no drops.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("src"), F.col("o_orderkey").alias("k")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("src"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
    )
    o_kept = o.where(portable_hash64(F.concat(F.lit("mix-"), F.col("k"))) % 100 < 80)
    l_kept = l.where(portable_hash64(F.concat(F.lit("mix-"), F.col("k"))) % 100 < 20)
    return (
        o_kept.unionByName(l_kept).groupBy("src").agg(F.count(F.lit(1)).alias("n_rows")).orderBy("src")
    )


@query(
    "shuffle_deterministic_rank",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY md5('shuf42-' || doc_id), doc_id) AS shuffle_pos
    FROM documents
    ORDER BY doc_id
    """,
)
def shuffle_deterministic_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded sample shuffle (D1/D2 parity): a global permutation keyed by
    md5(seed || key) — same seed ⇒ identical order, across engines and across
    Spark task retries. At scale, prefer repartition(n, hash_col) +
    sortWithinPartitions on the same hash for a shuffle that never needs a
    single global sort; the global row_number here exists to be oracle-exact.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.concat(F.lit("shuf42-"), F.col("doc_id"))), F.col("doc_id"))
    return d.select("doc_id", F.row_number().over(w).alias("shuffle_pos")).orderBy("doc_id")


@query(
    "epoch_repeat_cycle",
    oracle="""
    SELECT epoch, COUNT(*) AS n_rows, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents, (SELECT UNNEST(generate_series(0, 2)) AS epoch)
    GROUP BY epoch ORDER BY epoch
    """,
)
def epoch_repeat_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch repetition (D7 `.cycle(count)` parity): cross-join with a small
    epoch range instead of re-iterating a stream; each epoch is an identical,
    independently-processable copy of the plan."""
    d = load_table(spark, sf_dir, "documents")
    epochs = spark.range(3).select(F.col("id").cast("long").alias("epoch"))
    return (
        d.crossJoin(epochs)
        .groupBy("epoch")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("epoch")
    )


@query(
    "batch_fixed_size_groups",
    oracle="""
    WITH seq AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS pos FROM documents
    )
    SELECT CAST(floor(pos / 64.0) AS BIGINT) AS batch_id,
           COUNT(*) AS batch_rows,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM seq GROUP BY batch_id ORDER BY batch_id
    """,
)
def batch_fixed_size_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size batching (B1 `.batched(batch_size, partial=True)` parity):
    batch id = floor(position / batch_size); the trailing partial batch
    survives, matching partial=True. The collate sink (sinks/loader.py) does
    this physically with Arrow batches; this query proves the semantics."""
    d = load_table(spark, sf_dir, "documents")
    pos = F.row_number().over(Window.orderBy("doc_id")) - 1
    return (
        d.select("doc_id", pos.alias("pos"))
        .groupBy(F.floor(F.col("pos") / 64).cast("long").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("batch_rows"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("batch_id")
    )


@query(
    "stratified_sample_by_lang",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST('0x' || substr(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          % 1000000
          < CASE lang
                WHEN 'en' THEN 500000
                WHEN 'de' THEN 250000
                WHEN 'fr' THEN 100000
                ELSE 50000
            END
    ORDER BY doc_id
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (operators/mixing.py:
    stratified_sample — df.sampleBy's retry-stable cousin): keep 50% of en,
    25% of de, 10% of fr, 5% of everything else, keyed on doc_id so the
    sample is identical across retries/repartitionings/engines. One narrow
    pushed-down filter, no shuffle. Extends D3/D6 (weighted mixing + seeded
    determinism, custom_datapipes.py:177-281) to per-stratum rebalancing."""
    from datapipelines_spark.operators.mixing import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        d,
        strata_col="lang",
        key_col="doc_id",
        fractions={"en": 0.5, "de": 0.25, "fr": 0.1},
        seed=42,
        default_fraction=0.05,
    )
    return out.select("doc_id", "lang", "source").orderBy("doc_id")


@query(
    "sample_n_per_lang",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST('0x' || substr(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8)
                                 AS BIGINT) ASC,
                            doc_id ASC
               ) AS rn
        FROM documents
    ) WHERE rn <= 10
    ORDER BY doc_id
    """,
)
def sample_n_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum reservoir (operators/mixing.py:
    sample_n_per_group): exactly <=10 documents per language, chosen by
    portable key-hash rank so the same rows win on every engine, retry,
    and partitioning — the "N examples per class" primitive of training
    set construction."""
    from datapipelines_spark.operators.mixing import sample_n_per_group

    d = load_table(spark, sf_dir, "documents")
    return sample_n_per_group(d, strata_col="lang", key_col="doc_id", n=10).select(
        "doc_id", "lang"
    ).orderBy("doc_id")


@query(
    "sample_weighted_topk",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               round(ln((CAST('0x' || substr(md5('42-' || CAST(doc_id AS VARCHAR)), 1, 8)
                              AS BIGINT) + 1) / 4294967296.0)
                     / CAST(n_chars AS DOUBLE), 12) AS sample_key
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, sample_key
    FROM keyed
    ORDER BY sample_key DESC, doc_id ASC
    LIMIT 50
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, operators/mixing.py:weighted_sample_topk): 50 documents
    drawn with probability proportional to length. The data-derived uniform
    makes the draw retry-stable and SQL-replicable; the top-k is a
    TakeOrderedAndProject, so the corpus never shuffles."""
    from datapipelines_spark.operators.mixing import weighted_sample_topk

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_topk(d, "n_chars", "doc_id", k=50, seed=42).select(
        "doc_id", "n_chars", "sample_key"
    )


@query(
    "mix_temperature_sources",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (
        SELECT source, n,
               CAST(round(pow(CAST(n AS DOUBLE) / SUM(n) OVER (), 0.5), 9)
                    AS DECIMAL(18,9)) AS w
        FROM c
    ),
    f AS (
        SELECT source,
               CAST(floor(least(
                   CAST(1.0 AS DOUBLE),
                   150.0 * (CAST(w AS DOUBLE)
                            / CAST(CAST(SUM(w) OVER () AS DECIMAL(28,9))
                                   AS DOUBLE))
                   / n
               ) * 1000000) AS BIGINT) AS thresh
        FROM w
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN f USING (source)
    WHERE CAST('0x' || substr(md5('42-' || CAST(d.doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 1000000 < thresh
    ORDER BY doc_id
    """,
)
def mix_temperature_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced source sampling (operators/mixing.py:
    temperature_mix, the multilingual alpha-mixing recipe): a ~150-doc
    subset drawn with per-source quotas proportional to p_s^0.5 —
    low-resource sources upweighted relative to their share. Weight
    rounding into DECIMAL before the normalizing sum plus the data-derived
    keep hash make the exact row set SQL-reproducible."""
    from datapipelines_spark.operators.mixing import temperature_mix

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_mix(
        d, "source", "doc_id", alpha=0.5, target_rows=150, seed=42
    ).orderBy("doc_id")
