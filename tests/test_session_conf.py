"""Session factory posture: the confs that encode scale/timeout policy must
actually be set on the live session (VERDICT r2 #7 — coarse E4 equivalent)."""


def test_task_reaper_and_core_confs(spark):
    conf = spark.sparkContext.getConf()
    # E4 coarse equivalent: hung-JVM-stage containment via the task reaper.
    assert conf.get("spark.task.reaper.enabled") == "true"
    assert conf.get("spark.task.reaper.killTimeout") == "120s"
    # Scale posture that every plan in this repo assumes.
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
