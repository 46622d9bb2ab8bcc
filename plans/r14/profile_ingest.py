"""Profile stream_ingest_dedup_replay (VERDICT r13 next #5): break the
one-run wall into fixture staging, per-tick sink time, and the final
verdict read, with job counts per phase from the status tracker.
Usage: python plans/r14/profile_ingest.py [sf_dir]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from datapipelines_spark.queries import ingest as qi  # noqa: E402
from datapipelines_spark.session import get_spark  # noqa: E402
from datapipelines_spark.streaming import ingest as si  # noqa: E402

spark = get_spark(app_name="profile-ingest")
st = spark.sparkContext.statusTracker()


def jobs():
    return len(st.getJobIdsForGroup(None))


# fresh state: nuke the whole base dir so staging is included in the run
base = qi._ingest_base_dir(sf_dir)
shutil.rmtree(base, ignore_errors=True)
qi._REPLAYED.clear()

orig_sink = si.ingest_dedup_sink
tick_times = []


def timed_sink(*a, **kw):
    proc = orig_sink(*a, **kw)

    def wrapped(batch_df, epoch_id):
        t0 = time.time()
        proc(batch_df, epoch_id)
        tick_times.append((int(epoch_id), time.time() - t0))

    wrapped.release_standing = proc.release_standing
    return wrapped


# the query imports the sink from the streaming module inside its body
si.ingest_dedup_sink = timed_sink

for run in range(3):
    shutil.rmtree(base, ignore_errors=True)
    qi._REPLAYED.clear()
    tick_times.clear()
    t0 = time.time()
    df = qi.stream_ingest_dedup_replay(spark, sf_dir)
    t1 = time.time()
    n = df.count()
    t2 = time.time()
    print(f"run {run}: TOTAL replay wall {t1 - t0:.2f}s")
    for e, dt in tick_times:
        print(f"  tick e={e}: {dt:.2f}s")
    stage_wall = (t1 - t0) - sum(t for _, t in tick_times)
    print(f"  staging+stream overhead (non-tick): {stage_wall:.2f}s")
    print(f"  final read: {t2 - t1:.2f}s rows={n}")
spark.stop()
