"""Product-analytics tour: the event/customer analytics surface in one run.

cohort retention -> event-type transition matrix -> MAD anomaly rate ->
daily OLS trend per type -> sweep-line order backlog -> RFM segmentation ->
equi-depth price histogram -> join-key skew report.

Every stage is an oracle-checked catalog query (datapipelines_spark.catalog)
— this script just drives them the way an analyst session would, printing
one compact readout per stage.

Run:  python examples/analytics_tour.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelines_spark.catalog import all_queries
from datapipelines_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="analytics_tour", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    ret = q["events_cohort_retention"].builder(spark, sf_dir)
    day1 = ret.where("day_offset = 1").agg(F.max("retention_permille")).first()[0]
    print(f"cohort retention:   day-1 retention up to {day1}‰")

    tm = q["events_transition_matrix"].builder(spark, sf_dir)
    top = tm.orderBy(F.desc("n_transitions")).first()
    print(
        f"transitions:        most common {top['prev_type']} -> {top['next_type']}"
        f" ({top['n_transitions']}x)"
    )

    mad = q["events_anomaly_mad"].builder(spark, sf_dir)
    n_anom = mad.where("is_anomaly").count()
    print(f"MAD anomalies:      {n_anom} of {mad.count()} events flagged")

    slope = q["events_daily_trend_slope"].builder(spark, sf_dir)
    rows = slope.collect()
    trending = max(rows, key=lambda r: abs(r["slope_milli"]))
    print(
        f"daily trend:        steepest slope {trending['event_type']}"
        f" ({trending['slope_milli']} milli-units/day over {trending['n_days']} days)"
    )

    sweep = q["interval_open_orders_sweep"].builder(spark, sf_dir)
    peak = sweep.orderBy(F.desc("n_open")).first()
    print(f"order backlog:      peak {peak['n_open']} open lineitems on {peak['day']}")

    rfm = q["customer_rfm_segments"].builder(spark, sf_dir)
    champions = rfm.where("r_score = 4 AND f_score = 4 AND m_score = 4").count()
    print(f"RFM segments:       {champions} champion customers (4/4/4)")

    hist = q["histogram_equidepth_price"].builder(spark, sf_dir)
    print(f"price histogram:    {hist.count()} equi-depth buckets")

    skew = q["diag_join_key_skew"].builder(spark, sf_dir)
    heavy = skew.first()
    print(
        f"join-key skew:      heaviest o_custkey {heavy['key']} at"
        f" {heavy['skew_x_milli'] / 1000:.1f}x the mean key weight"
    )


if __name__ == "__main__":
    main()
