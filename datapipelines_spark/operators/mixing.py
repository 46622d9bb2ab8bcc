"""Distribution operators: seeded shuffle, weighted mixing, epoch repeat
(SURVEY §2.3 D1-D7, re-expressed relationally).

All randomness is a pure function of row data (portable md5-derived hashing),
so every operator is deterministic under task retries, repartitioning, and
across engines — the property the reference approximates with per-worker RNG
seeding (D6, custom_datapipes.py:108-141), obtained here by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from datapipelines_spark.functions.hashing import (
    deterministic_sample_pred,
    portable_hash_seeded,
)


def deterministic_shuffle(df: DataFrame, seed: int | str = 42, key_cols: Sequence[str] | None = None) -> DataFrame:
    """D1/D2 parity: a seeded global permutation — order by a data-derived
    hash. Same seed ⇒ same order, on any cluster, after any retry.

    At 100 TB a *global* sort is one range-partitioned shuffle (Spark's sort
    is distributed); when only decorrelation is needed, prefer
    ``repartition(n, hash)`` + ``sortWithinPartitions`` which skips the
    global range exchange.
    """
    keys = [F.col(c) for c in (key_cols or df.columns)]
    h = portable_hash_seeded(F.concat_ws("\x1f", *[k.cast("string") for k in keys]), seed)
    return df.orderBy(h, *keys)


def weighted_mix(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    key_col: str,
    seed: int | str = 42,
) -> DataFrame:
    """D3 PrefixResampler parity (custom_datapipes.py:177-281): mix datasets
    at normalized probabilities. The reference buffers shards per prefix and
    draws categorically (dropping on overflow); relationally each source
    contributes an exact, deterministic fraction — no buffers, no drops.

    Weights are normalized to the max weight so the heaviest source is taken
    whole and lighter sources are subsampled proportionally, preserving the
    requested ratios while maximizing data retention.
    """
    total = max(weights.get(name, 0.0) for name in sources)
    if total <= 0:
        raise ValueError("at least one source needs a positive weight")
    parts: list[DataFrame] = []
    for name, df in sources.items():
        frac = weights.get(name, 0.0) / total
        if frac <= 0:
            continue
        tagged = df.withColumn("__source", F.lit(name))
        if frac < 1.0:
            pred = (
                portable_hash_seeded(F.col(key_col), f"{seed}-{name}") % 1_000_000
                < int(frac * 1_000_000)
            )
            tagged = tagged.where(pred)
        parts.append(tagged)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def epoch_repeat(df: DataFrame, count: int) -> DataFrame:
    """D7 ``.cycle(count)`` parity: materialized repetition with an ``epoch``
    column (each epoch independently shuffle-able by seeding with epoch)."""
    spark = df.sparkSession
    epochs = spark.range(count).select(F.col("id").cast("long").alias("epoch"))
    return df.crossJoin(epochs)


def split_proportions(df: DataFrame, key_col: str, fractions: Sequence[float], seed: int | str = 42) -> list[DataFrame]:
    """Deterministic train/val/test-style split on a data-derived hash —
    stable across runs and engines (unlike randomSplit)."""
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = portable_hash_seeded(F.col(key_col), seed) % 1_000_000
    bounds = []
    acc = 0.0
    for f in fractions:
        acc += f
        bounds.append(int(acc * 1_000_000))
    out = []
    lo = 0
    for hi in bounds:
        out.append(df.where((h >= lo) & (h < hi)))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    seed: int | str = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling — ``df.sampleBy``'s
    retry-stable cousin (the rebalancing primitive a training mix needs:
    "keep 50% of en, 25% of de, drop the rest").

    The keep decision is a pure function of the row key (portable md5 hash,
    functions/hashing.py) and the stratum's fraction, so results are
    identical across retries, repartitionings, and engines — ``df.sampleBy``
    is position-dependent and loses all three. Strata absent from
    ``fractions`` get ``default_fraction``. Single narrow filter, no
    shuffle; the predicate pushes down to the scan.
    """
    for name, frac in fractions.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"fraction for stratum {name!r} must be in [0, 1], got {frac}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    # round, don't truncate: int(0.29 * 1e6) is 289999 (binary float), which
    # would silently shift the keep boundary one ppm below the spec'd value
    thr = F.lit(round(default_fraction * 1_000_000))
    for name, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == name, F.lit(round(frac * 1_000_000))).otherwise(thr)
    h = portable_hash_seeded(F.col(key_col), seed) % 1_000_000
    return df.where(h < thr)


def sample_n_per_group(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n: int,
    seed: int | str = 42,
) -> DataFrame:
    """Deterministic "reservoir" of exactly ≤n rows per stratum: rank rows
    inside each stratum by their portable key hash and keep the first n.
    Retry/repartition/engine-stable for the same reason stratified_sample
    is — the rank is a pure function of the data. One hash shuffle on the
    stratum key; at 100 TB pair it with AQE skew handling if one stratum
    dominates."""
    w = Window.partitionBy(strata_col).orderBy(
        portable_hash_seeded(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    seed: int | str = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): the k rows with the largest ``u^(1/w)`` — equivalently
    the largest ``ln(u)/w`` — where u is a data-derived uniform in (0, 1].
    Each row's inclusion probability is proportional to its weight, the
    classic primitive for quality-weighted corpus subsampling and mixture
    construction.

    Scale shape: one JVM-side expression per row and a global top-k
    (TakeOrderedAndProject: per-partition k-row heaps, driver merge) —
    no shuffle of the corpus, no RNG state. The uniform comes from
    ``portable_hash_seeded`` (functions/hashing.py), so the sample is
    retry-stable, partitioning-independent, and replicable in SQL; the sort
    key is rounded to 12 decimals to make the cross-engine ordering immune
    to 1-ulp libm differences in ln(). Rows with non-positive weight are
    excluded (their inclusion probability is zero).

    Emits the input columns plus ``sample_key`` (the rounded order key).
    """
    u = (portable_hash_seeded(F.col(key_col), seed) + 1) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 12)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.asc(key_col))
        .limit(k)
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fraction: float,
    seed: int | str = 42,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Input rows plus (group_id, in_split): a deterministic ~``fraction``
    split in which every NEAR-DUPLICATE CLUSTER lands wholly on one side.

    A plain hash split leaks: a document in train and its near-duplicate
    in eval is the same text on both sides. Splitting on the similarity
    CLUSTER id instead (connected components over ``pairs``; singletons
    are their own group) makes leakage structurally impossible for any
    duplicate relation the pair graph captures. The split stays data-
    derived (portable hash of the group id), so it is retry-stable and
    reproducible across engines.
    """
    from datapipelines_spark.operators.components import connected_components

    comp = connected_components(pairs, src, dst).withColumnRenamed(
        "node", id_col
    )
    labeled = df.join(comp, id_col, "left")
    group = F.coalesce(F.col("component"), F.col(id_col))
    return labeled.select(
        *df.columns,
        group.alias("group_id"),
        deterministic_sample_pred(group, fraction, seed).alias("in_split"),
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_rows: int = 100_000,
    seed: int | str = 42,
) -> DataFrame:
    """Temperature-balanced source sampling — the multilingual/source
    rebalancing recipe (sample source s with probability proportional to
    p_s^alpha; alpha < 1 upweights low-resource sources): keep a
    deterministic hash-Bernoulli subset of each source sized toward
    ``target_rows`` total with quota q_s = w_s / sum(w), w_s = p_s^alpha.

    Cross-engine exactness discipline: per-source weights round to 9
    decimals into DECIMAL before the normalizing sum (order-independent),
    and the keep threshold is floor(f_s * 1e6) compared against the
    portable row hash — for alpha = 0.5 the whole computation is
    correctly-rounded IEEE ops (sqrt/div), so a SQL oracle reproduces the
    exact row set. Per-source keep fractions cap at 1 (a small source is
    taken whole; the realized total then undershoots ``target_rows`` —
    the standard behavior, not silently re-normalized).

    One count aggregate over sources + a broadcast join of ~|sources|
    rows; the corpus itself never shuffles.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    # the per-source table is tiny (already aggregated): totals come from
    # unpartitioned windows over it — one partition of |sources| rows, no
    # self-join of the aggregate against itself
    wall = Window.partitionBy()
    weights = counts.select(
        source_col,
        "__n",
        # w_s on the RATIO p_s = n_s/N keeps the 9-decimal rounding scale
        # uniform across sources
        F.round(
            F.pow(
                F.col("__n").cast("double") / F.sum("__n").over(wall),
                F.lit(float(alpha)),
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("__w"),
    )
    frac = weights.select(
        source_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * (
                    F.col("__w").cast("double")
                    / F.sum("__w").over(wall).cast("decimal(28,9)").cast("double")
                )
                / F.col("__n"),
            )
            * 1_000_000
        ).alias("__thresh"),
    )
    keyed = df.join(F.broadcast(frac), source_col)
    keep = (
        portable_hash_seeded(F.col(id_col), seed) % 1_000_000 < F.col("__thresh")
    )
    return keyed.where(keep).drop("__thresh")


def token_budget_select(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    id_col: str,
    budget: int,
    bucket_scale: int = 1000,
) -> DataFrame:
    """Quality-first corpus selection under a token budget: keep exactly
    the prefix of the ``(score DESC, id ASC)`` ordering whose running token
    sum stays <= ``budget`` — the standard "take the best data until the
    budget is spent" recipe — WITHOUT a global sort of the corpus.

    Scale shape: a single aggregate over ``floor(score * bucket_scale)``
    buckets (for scores in [0, 1] that is at most ``bucket_scale + 1``
    groups) is collected to the driver; every bucket strictly above the
    boundary bucket is kept by a shuffle-free filter, and only the
    BOUNDARY bucket — expected corpus/bucket_scale of the rows — pays an
    ordered running-sum window. The split is exact, not approximate:
    floor() is monotonic, so the bucket order refines the score order;
    rows above the boundary have running sums <= the pre-boundary
    cumulative <= budget, and rows below it start past a cumulative that
    already exceeds the budget. Rows with NULL score are excluded (they
    have no place in the ordering).

    Returns the kept rows with input columns unchanged.
    """
    bucket = F.floor(F.col(score_col) * F.lit(bucket_scale)).cast("long")
    d = df.where(F.col(score_col).isNotNull())
    # The driver-side histogram is bounded ONLY because scores live in
    # [0, 1] (<= bucket_scale + 1 groups). Guard it: collect at most one
    # row past that cap and fail loudly rather than let an unbounded score
    # column turn this into an O(range * scale) driver transfer.
    cap = bucket_scale + 1
    hist = (
        d.groupBy(bucket.alias("__b"))
        .agg(F.sum(F.col(tokens_col).cast("bigint")).alias("__t"))
        .limit(cap + 1)
        .collect()
    )
    if len(hist) > cap:
        raise ValueError(
            f"token_budget_select: {score_col!r} produced more than {cap} "
            f"histogram buckets — scores must lie in [0, 1] (normalize "
            f"them, or raise bucket_scale deliberately)"
        )
    cum = 0
    boundary = None
    remaining = 0
    for row in sorted(hist, key=lambda r: -r["__b"]):
        if cum + row["__t"] <= budget:
            cum += row["__t"]
        else:
            boundary, remaining = row["__b"], budget - cum
            break
    if boundary is None:
        return d  # everything fits
    kept_full = d.where(bucket > boundary)
    w = (
        Window.orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary_kept = (
        d.where(bucket == boundary)
        .withColumn("__cum", F.sum(F.col(tokens_col).cast("bigint")).over(w))
        .where(F.col("__cum") <= remaining)
        .drop("__cum")
    )
    return kept_full.unionByName(boundary_kept)


def oversample_to_parity(
    df: DataFrame, label_col: str, max_factor: int = 1000
) -> DataFrame:
    """Class-imbalance repair by deterministic oversampling: each row is
    repeated ``floor(majority_count / class_count)`` times, bringing every
    class to within one natural multiple of the majority — the standard
    minority-upweighting step before classifier training, with no RNG (a
    duplicate count, not a Bernoulli draw, so it is retry-stable and
    exactly reproducible).

    The per-class counts aggregate first (map-side combined); the factor
    joins back broadcast (|classes| rows); the repeat itself is
    ``explode(sequence(1, factor))`` — row multiplication happens where
    the row lives, no shuffle of the corpus. ``max_factor`` caps runaway
    imbalance (a 10^6:1 class would otherwise explode storage); capped
    classes stay under-represented and should be reported, not silently
    amplified.

    Returns the input columns plus ``__copy`` (1..factor) so downstream
    dedup-sensitive stages can tell copies apart.
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__n"))
    wall = Window.partitionBy()
    # `div` is INTEGER division on the bigint counts: double `/` + floor()
    # can round 1 ulp below an exact quotient at large counts and flip the
    # factor off by one, diverging from the floor(majority/class) contract
    factors = counts.select(
        label_col,
        F.max("__n").over(wall).alias("__max"),
        F.col("__n"),
    ).select(
        label_col,
        F.least(F.expr("__max div __n"), F.lit(max_factor))
        .cast("int")
        .alias("__factor"),
    )
    return (
        df.join(F.broadcast(factors), label_col)
        .withColumn("__copy", F.explode(F.sequence(F.lit(1), F.col("__factor"))))
        .drop("__factor")
    )
