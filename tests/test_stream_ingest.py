"""Streaming corpus ingest (streaming/ingest.py): replay equivalence —
one tick equals the batch pipeline verbatim — and crash-safety of the
atomic index+verdicts swap at every filesystem step."""

import builtins
import os
import shutil

import pyspark.sql.functions as F

from datapipelines_spark.queries.dedup import _MINHASH, staged_dup_docs
from datapipelines_spark.queries.ingest import _QUOTA_CAP
from datapipelines_spark.queries.urls import BLOCKLIST, _planted_urls
from datapipelines_spark.streaming.ingest import ingest_dedup_sink


def _crawl(spark, sf_dir):
    staged = staged_dup_docs(spark, sf_dir)
    corpus = staged.where(F.col("doc_id") % 4 != 0)
    crawl = staged.where(F.col("doc_id") % 4 == 0).join(
        _planted_urls(spark, sf_dir), "doc_id"
    )
    return corpus, crawl


def _sink(corpus, state):
    return ingest_dedup_sink(
        corpus,
        state,
        blocklist=BLOCKLIST,
        quota_cap=_QUOTA_CAP,
        config=_MINHASH,
    )


def _verdicts(spark, state):
    return sorted(
        (
            r["doc_id"],
            r["verdict"],
            r["match_id"],
            r["domain"],
            int(r["quota_rank"]),
        )
        for r in spark.read.parquet(os.path.join(state, "verdicts")).collect()
    )


def test_single_tick_equals_batch_pipeline(spark, sf_dir, tmp_path):
    """The whole crawl slice delivered as ONE micro-batch must produce
    exactly corpus_ingest_pipeline's decision table: with one tick the
    standing-count quota degenerates to the batch quota's (hash, id)
    rank, and 'prior admissions' is empty — so any disagreement would be
    a real semantic drift between the loop and the batch operator."""
    from datapipelines_spark.catalog import all_queries

    corpus, crawl = _crawl(spark, sf_dir)
    state = str(tmp_path / "state1")
    _sink(corpus, state)(crawl, 0)
    got = _verdicts(spark, state)
    want = sorted(
        (
            r["doc_id"],
            r["verdict"],
            r["match_id"],
            r["domain"],
            int(r["quota_rank"]),
        )
        for r in all_queries()["corpus_ingest_pipeline"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert got == want


def test_two_ticks_marker_and_index(spark, sf_dir, tmp_path):
    corpus, crawl = _crawl(spark, sf_dir)
    mid = crawl.approxQuantile("doc_id", [0.5], 0.0)[0]
    state = str(tmp_path / "state2")
    sink = _sink(corpus, state)
    sink(crawl.where(F.col("doc_id") <= mid), 0)
    sink(crawl.where(F.col("doc_id") > mid), 1)
    assert os.path.exists(os.path.join(state, "_applied-1"))
    idx = spark.read.parquet(os.path.join(state, "index"))
    v = spark.read.parquet(os.path.join(state, "verdicts"))
    # one verdict per admitted doc, index rows = admitted rows
    assert idx.count() == v.count()
    assert idx.where(F.col("quota_rank") > _QUOTA_CAP).count() == 0
    # re-delivery of a folded epoch is a no-op
    before = _verdicts(spark, state)
    sink(crawl.where(F.col("doc_id") > mid), 1)
    assert _verdicts(spark, state) == before


def test_crash_at_every_swap_step_recovers_exactly_once(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Kill the sink at EVERY filesystem mutation of the second tick's
    commit (staging rmtree, the two marker/_SUCCESS writes, rename aside,
    rename in, old delete), restart with a fresh sink instance, re-deliver
    the epoch, and require the exact no-crash verdict log — no loss, no
    double-ingest, and verdicts never disagreeing with the index."""
    corpus, crawl = _crawl(spark, sf_dir)
    mid = crawl.approxQuantile("doc_id", [0.5], 0.0)[0]
    b0 = crawl.where(F.col("doc_id") <= mid).localCheckpoint()
    b1 = crawl.where(F.col("doc_id") > mid).localCheckpoint()

    ref_state = str(tmp_path / "ref")
    ref_sink = _sink(corpus, ref_state)
    ref_sink(b0, 0)
    ref_sink(b1, 1)
    expected = _verdicts(spark, ref_state)

    real_rename, real_rmtree, real_open = os.rename, shutil.rmtree, builtins.open

    for crash_at in range(1, 10):
        state = str(tmp_path / f"state-{crash_at}")
        _sink(corpus, state)(b0, 0)

        calls = {"n": 0}

        def counting(fn, *a, **kw):
            calls["n"] += 1
            if calls["n"] == crash_at:
                raise RuntimeError(f"simulated crash at fs-op {crash_at}")
            return fn(*a, **kw)

        def counted_open(path, *a, **kw):
            if isinstance(path, str) and (
                "_applied-" in os.path.basename(path)
                or os.path.basename(path) == "_SUCCESS"
            ) and ".staging-" in path:
                return counting(real_open, path, *a, **kw)
            return real_open(path, *a, **kw)

        monkeypatch.setattr(os, "rename", lambda *a: counting(real_rename, *a))
        monkeypatch.setattr(
            shutil, "rmtree", lambda *a, **kw: counting(real_rmtree, *a, **kw)
        )
        monkeypatch.setattr(builtins, "open", counted_open)
        crashed = False
        try:
            _sink(corpus, state)(b1, 1)
        except RuntimeError:
            crashed = True
        monkeypatch.undo()

        _sink(corpus, state)(b1, 1)  # restart + re-delivery
        assert _verdicts(spark, state) == expected, (
            f"crash point {crash_at} (crashed={crashed}) broke exactly-once"
        )
        if not crashed:
            break  # fewer fs-ops than crash points: protocol fully swept
