"""Shape contracts of the two accuracy harnesses (queries/recall.py):
the ANN harness's IVF arms must show recall monotone non-decreasing in
probe count (VERDICT r11 next #3 — more probes is strictly more scoring
work, so it must never buy LESS recall on the same fixture), and the
dedup harness's tuned banding arm must clear its choose_banding target
where the default banding measurably misses."""

import pyspark.sql.functions as F

from datapipelines_spark.catalog import all_queries


def test_ivf_recall_monotone_in_probes(spark, sf_dir):
    rows = (
        all_queries()["sim_recall_harness"]
        .builder(spark, sf_dir)
        .where(F.col("family").startswith("ivf_p"))
        .collect()
    )
    by_probe = {
        int(r["family"].removeprefix("ivf_p")): r["recall_bp"] for r in rows
    }
    assert sorted(by_probe) == [1, 2, 4]
    assert by_probe[1] <= by_probe[2] <= by_probe[4]
    # probing every relevant cell must find something on this fixture
    assert by_probe[4] > 0


def test_tuned_banding_clears_target_where_default_misses(spark, sf_dir):
    rows = {
        r["stage"]: r
        for r in all_queries()["dedup_recall_harness"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {
        "exact_jaccard",
        "lsh_bands",
        "lsh_bands_tuned",
        "lsh_verified",
        "lsh_verified_tuned",
    }
    # the tuner's measured promise: >= 90% band recall at j >= 0.5
    assert rows["lsh_bands_tuned"]["recall_bp"] >= 9000
    # and it must actually dominate the default banding on this fixture
    assert rows["lsh_bands_tuned"]["recall_bp"] > rows["lsh_bands"]["recall_bp"]
    # verification restores exact precision in both arms
    assert rows["lsh_verified"]["precision_bp"] == 10000
    assert rows["lsh_verified_tuned"]["precision_bp"] == 10000
    # verified recall equals band recall: verification never drops a TRUE pair
    assert rows["lsh_verified"]["recall_bp"] == rows["lsh_bands"]["recall_bp"]
    assert (
        rows["lsh_verified_tuned"]["recall_bp"]
        == rows["lsh_bands_tuned"]["recall_bp"]
    )
