"""The composed web-corpus ingest pipeline, driver-gated end-to-end:
URL parse -> registrable domain -> blocklist gate -> per-domain quota ->
incremental dedup verdicts against the standing corpus.

This is the day-2 story ``examples/corpus_prep.py`` tells, promoted to an
oracle-checked query (VERDICT r10 "Next" #7): each stage is an operator
already benchmarked alone (queries/urls.py, queries/dedup.py); the
composition adds only doc_id-keyed joins. The 100 TB shape is the sum of
its parts — URL gating is map-only codegen, the quota is one domain-keyed
shuffle, and the dedup stage probes the batch's band keys against the
standing corpus index without ever self-joining the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipelines_spark.catalog import query
from datapipelines_spark.operators import dedup as ops
from datapipelines_spark.queries.dedup import (
    _MINHASH,
    _incremental_oracle,
    staged_dup_docs,
)
from datapipelines_spark.queries.urls import _URL_SQL, BLOCKLIST, _planted_urls

_QUOTA_CAP = 25

#: URL-gating CTEs spliced into the incremental-dedup replay: the crawl
#: slice (doc_id % 4 = 0) keeps only unblocked registrable domains, then
#: at most _QUOTA_CAP docs per domain by the portable quota hash — the
#: same SQL as the url_parse_documents / domain_quota_sample_docs oracles.
_GATE_CTES = f"""{_URL_SQL},
    gate AS (
        SELECT doc_id, domain FROM dom
        WHERE doc_id % 4 = 0
          AND domain NOT IN ({", ".join(f"'{b}'" for b in BLOCKLIST)})
    ),
    ranked AS (
        SELECT doc_id, domain,
               ROW_NUMBER() OVER (
                   PARTITION BY domain
                   ORDER BY CAST('0x' || substr(
                            md5('quota-' || CAST(doc_id AS VARCHAR)),
                            1, 8) AS BIGINT),
                            doc_id
               ) AS quota_rank
        FROM gate
    ),
    gated AS (
        SELECT doc_id, domain, quota_rank FROM ranked
        WHERE quota_rank <= {_QUOTA_CAP}
    ),"""


@query(
    "corpus_ingest_pipeline",
    oracle=_incremental_oracle(
        batch_member="{d} % 4 = 0 AND {d} IN (SELECT doc_id FROM gated)",
        prefix_ctes=_GATE_CTES,
        extra_select=(
            ",\n           g.domain AS domain,"
            "\n           CAST(g.quota_rank AS BIGINT) AS quota_rank"
        ),
        extra_joins="\n    JOIN gated g ON g.doc_id = e.doc_id",
    ),
)
def corpus_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ingest tick of a web-corpus pipeline, composed from the
    governance and dedup operators and checked as a single unit:

    1. the crawl slice (doc_id % 4 == 0, duplicate-salted like
       dedup_incremental_batch) gets its planted URL parsed and reduced
       to a registrable domain (operators/urls.py — map-only codegen);
    2. docs whose domain is blocklisted are dropped;
    3. at most 25 docs per domain survive the deterministic quota
       (portable hash order — retry- and partitioning-stable);
    4. the survivors are verdicted against the standing corpus
       (doc_id % 4 != 0) and each other
       (operators/dedup.py:incremental_dedup_verdicts).

    Output: (doc_id, verdict, match_id, domain, quota_rank) per surviving
    batch doc. The oracle replays all four stages in one SQL chain —
    gating changes WHICH docs are batch members, which changes the
    within-batch verdicts too, so the composition is a real integration
    check, not a union of the parts."""
    from datapipelines_spark.operators.urls import (
        domain_blocklist_flag,
        domain_quota_sample,
        parse_urls,
        registrable_domain,
    )

    staged = staged_dup_docs(spark, sf_dir)
    corpus = staged.where(F.col("doc_id") % 4 != 0)
    crawl = staged.where(F.col("doc_id") % 4 == 0)

    parsed = parse_urls(_planted_urls(spark, sf_dir), "url").withColumn(
        "domain", registrable_domain(F.col("host"))
    )
    gate = (
        crawl.join(parsed.select("doc_id", "domain"), "doc_id")
        .transform(lambda df: domain_blocklist_flag(df, "domain", BLOCKLIST))
        .where(~F.col("is_blocked"))
    )
    batch = domain_quota_sample(gate, "domain", "doc_id", cap=_QUOTA_CAP)

    verdicts = ops.incremental_dedup_verdicts(
        corpus, batch, "text", "doc_id", _MINHASH, threshold=0.5
    )
    return (
        verdicts.join(
            batch.select(
                "doc_id",
                "domain",
                F.col("quota_rank").cast("bigint").alias("quota_rank"),
            ),
            "doc_id",
        )
        .orderBy("doc_id")
    )
