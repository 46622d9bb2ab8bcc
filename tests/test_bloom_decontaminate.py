"""Bloom-filtered decontamination (operators/bloom.py): one-sided error —
always a superset of the exact broadcast path, equal at tight fpp — plus
filter-math sanity on synthetic hashes."""

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from datapipelines_spark.operators.bloom import (
    build_bloom,
    contamination_overlap_bloom,
    might_contain,
    optimal_bits,
    optimal_hashes,
)
from datapipelines_spark.operators.text import contamination_overlap
from datapipelines_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


def _split(spark):
    d = load_table(spark, SF_DIR, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return d.where(~is_eval), d.where(is_eval)


@pytest.fixture(scope="module")
def exact_result(spark):
    train, ev = _split(spark)
    return {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_overlap(
            train, ev, "text", "doc_id", n=5, min_overlap=1
        ).collect()
    }


def test_bloom_is_superset_of_exact(spark, exact_result):
    train, ev = _split(spark)
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_overlap_bloom(
            train, ev, "text", "doc_id", n=5, min_overlap=1, fpp=0.01
        ).collect()
    }
    assert set(exact_result) <= set(got)
    # a false positive can only INCREASE a doc's overlap count
    for doc, n in exact_result.items():
        assert got[doc] >= n


def test_bloom_equals_exact_at_tight_fpp(spark, exact_result):
    # fpp=1e-8: ~3e-3 expected false positives over this fixture's ~300k
    # probes (at 1e-6 the deterministic xxhash64 layout happens to produce
    # exactly one FP doc — observed, and fine per the superset contract)
    train, ev = _split(spark)
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_overlap_bloom(
            train, ev, "text", "doc_id", n=5, min_overlap=1, fpp=1e-8
        ).collect()
    }
    assert got == exact_result


def test_false_positive_rate_near_nominal(spark):
    """1M absent probes against a filter of 100k members: the measured FP
    rate must sit near the configured 1% (generous 3x ceiling)."""
    members = spark.range(100_000).select(F.concat(F.lit("m"), "id").alias("s"))
    nbits = optimal_bits(100_000, 0.01)
    k = optimal_hashes(nbits, 100_000)
    bits = build_bloom(members, "s", nbits, k)
    absent = spark.range(1_000_000).select(F.concat(F.lit("absent"), "id").alias("s"))
    hits = absent.where(
        might_contain(bits, F.xxhash64(F.col("s")), nbits, k, spark)
    ).count()
    rate = hits / 1_000_000
    assert rate < 0.03, rate
    # and zero false negatives, by construction
    present = members.where(
        might_contain(bits, F.xxhash64(F.col("s")), nbits, k, spark)
    ).count()
    assert present == 100_000


def test_sizing_formulas():
    assert optimal_bits(1_000_000, 0.01) == pytest.approx(9_585_088, rel=0.01)
    assert optimal_hashes(9_585_088, 1_000_000) == 7
    assert optimal_bits(1, 0.01) >= 64
    assert np.uint64(optimal_bits(123, 0.05)) % 64 == 0


def test_probe_positions_cover_whole_array_past_2_32_bits():
    """Both double-hashing bases are full 64-bit: at multi-GB filter sizes
    (num_bits > 2**32) the i=0 probe must be able to land in the upper
    region — the 32-bit-halves derivation could not."""
    import numpy as np

    from datapipelines_spark.operators.bloom import _probe_positions

    rng = np.random.default_rng(0)
    h = rng.integers(-(2**63), 2**63, 4096, dtype=np.int64)
    num_bits = 2**36
    pos = _probe_positions(h, num_bits, 1)  # i=0 probe alone
    assert pos.max() >= 2**32
    # and the stepped probes stay uniform-ish across 8 octants
    pos_k = _probe_positions(h, num_bits, 8).ravel()
    counts, _ = np.histogram(pos_k, bins=8, range=(0, num_bits))
    assert counts.min() > 0.8 * counts.mean()


def test_build_bloom_tree_merge_equals_driver_or(spark):
    """A budget small enough to force the executor-side OR level must
    produce the bit-identical filter the plain driver OR builds."""
    rows = [(f"gram-{i}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string").repartition(16)
    num_bits = optimal_bits(5000, 0.01)
    k = optimal_hashes(num_bits, 5000)
    direct = build_bloom(df, "g", num_bits, k)
    # bitmap is ~6 KB; a 2-bitmap budget forces n_groups=2 < 16 partitions
    treed = build_bloom(
        df, "g", num_bits, k, driver_or_budget_bytes=2 * (num_bits // 8)
    )
    assert np.array_equal(direct, treed)
