"""Streaming web-corpus ingest: the composed batch pipeline
(queries/ingest.py — URL gate -> per-domain quota -> incremental dedup
verdicts) run as a foreachBatch loop with durable, crash-safe state.

This is the production shape of day-2 ingest (VERDICT r11 next #5): the
batch query proves one tick; this module proves the LOOP — each
micro-batch is URL-gated (map-only), quota'd against STANDING per-domain
admission counts, verdicted against the standing corpus AND everything
previously admitted, and then the verdict log and the updated standing
index commit ATOMICALLY through the same staged-swap protocol as the IVM
state sink (operators/incremental.py): staging dir with _SUCCESS +
``_applied-E`` marker, rename aside, rename in, delete last. A crash at
any filesystem step leaves a recoverable state, re-delivered epochs are
no-ops, and verdicts can never disagree with the index they were computed
against (one rename commits both).

Quota semantics under streaming: a document is admitted iff its domain's
admission count so far plus its (portable-hash, id) rank within the tick
stays within the cap — "first N per domain in arrival order". When ticks
arrive in ascending-id order this equals a global rank over (tick, hash,
id), which is how the driver oracle replays it in SQL; a single tick
equals the batch pipeline's quota exactly (tests/test_stream_ingest.py).

State layout under ``state_dir``::

    index/     (id, text, domain, quota_rank) of every ADMITTED document
    verdicts/  the cumulative verdict log (id, verdict, match_id,
               domain, quota_rank)
    _applied-E highest epoch folded in (rides the atomic swap)

Scale notes: per tick the standing corpus pays one md5 + one signature
scan and never self-joins (persist those as a real index at 100 TB); the
admitted index is re-read and re-written per tick — admitted-volume
bounded, and the rewrite is the price of atomic index+verdict commits on
a filesystem without multi-dir transactions (an object-store deployment
would commit a manifest instead, like sinks/upsert.py)."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from datapipelines_spark.functions.hashing import portable_hash_seeded
from datapipelines_spark.operators.dedup import MinHashConfig, ingest_tick_verdicts
from datapipelines_spark.operators.incremental import (
    _APPLIED_PREFIX,
    _applied_epoch,
    _recover_state,
)
from datapipelines_spark.operators.urls import (
    domain_blocklist_flag,
    parse_urls,
    registrable_domain,
)


def ingest_dedup_sink(
    corpus: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str = "url",
    blocklist: tuple[str, ...] = (),
    quota_cap: int = 25,
    config: MinHashConfig = MinHashConfig(),
    threshold: float = 0.5,
    max_bucket_size: int | None = 512,
):
    """Build the foreachBatch callback. ``corpus`` is the immutable
    standing corpus (never self-joined, never rewritten); each incoming
    micro-batch must carry (id_col, text_col, url_col). Reset
    ``state_dir`` and the stream's checkpointLocation together — they are
    one unit (a fresh checkpoint replays the source, so pairing it with
    existing state would double-ingest)."""
    root = state_dir.rstrip("/")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch = int(epoch_id)
        _recover_state(root)
        prior = old_verdicts = None
        if os.path.isdir(root):
            last = _applied_epoch(root)
            if last is not None and epoch <= last:
                return  # re-delivery of an epoch already folded in
            prior = spark.read.parquet(os.path.join(root, "index"))
            old_verdicts = spark.read.parquet(os.path.join(root, "verdicts"))

        # 1. URL gate: parse -> registrable domain -> blocklist (map-only)
        parsed = parse_urls(batch_df, url_col).withColumn(
            "domain", registrable_domain(F.col("host"))
        )
        gate = parsed.transform(
            lambda df: domain_blocklist_flag(df, "domain", blocklist)
        ).where(~F.col("is_blocked"))

        # 2. quota vs STANDING admission counts: rank within the tick by
        # the portable quota hash, offset by how many this domain already
        # admitted — "first cap per domain in arrival order"
        if prior is not None:
            counts = prior.groupBy("domain").agg(
                F.count(F.lit(1)).alias("__n_before")
            )
        else:
            counts = None
        w = Window.partitionBy("domain").orderBy(
            portable_hash_seeded(F.col(id_col), "quota"), F.col(id_col)
        )
        ranked = gate.withColumn("__r", F.row_number().over(w))
        if counts is not None:
            ranked = ranked.join(F.broadcast(counts), "domain", "left").na.fill(
                {"__n_before": 0}
            )
        else:
            ranked = ranked.withColumn("__n_before", F.lit(0))
        admitted = (
            ranked.withColumn(
                "quota_rank",
                (F.col("__r") + F.col("__n_before")).cast("bigint"),
            )
            .where(F.col("quota_rank") <= quota_cap)
            .select(id_col, text_col, "domain", "quota_rank")
        )

        # 3. dedup verdicts vs corpus + prior admissions + within tick
        prior_docs = (
            prior.select(id_col, text_col)
            if prior is not None
            else admitted.select(id_col, text_col).limit(0)
        )
        v = ingest_tick_verdicts(
            corpus,
            prior_docs,
            admitted.select(id_col, text_col),
            text_col,
            id_col,
            config,
            threshold,
            max_bucket_size=max_bucket_size,
        ).join(admitted.select(id_col, "domain", "quota_rank"), id_col)

        new_index = (
            prior.unionByName(admitted) if prior is not None else admitted
        )
        new_verdicts = (
            old_verdicts.unionByName(v) if old_verdicts is not None else v
        )

        # 4. atomic commit: verdicts + index land in ONE rename. Writing
        # the staging materializes every read of the old state BEFORE the
        # old dir moves aside; _SUCCESS + the epoch marker make a torn
        # staging detectable and a re-delivered epoch idempotent.
        staging = f"{root}.staging-{epoch}"
        shutil.rmtree(staging, ignore_errors=True)
        new_index.write.parquet(os.path.join(staging, "index"))
        new_verdicts.write.parquet(os.path.join(staging, "verdicts"))
        open(os.path.join(staging, "_SUCCESS"), "w").close()
        open(os.path.join(staging, f"{_APPLIED_PREFIX}{epoch}"), "w").close()
        if os.path.isdir(root):
            old = f"{root}.old-{epoch}"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(root, old)
        os.rename(staging, root)
        shutil.rmtree(f"{root}.old-{epoch}", ignore_errors=True)

    return process
