"""URL handling for web-corpus pipelines: parse, registrable domain,
blocklist gating, and per-domain quota sampling.

Web-scale training corpora are keyed by URL long before they are keyed by
content: dedup works per page, quality and licensing work per DOMAIN, and
corpus balance caps any single domain's share. The reference has no URL
surface (its sources are tar shards); this extends the LLM-pipeline
mandate (SURVEY §2.10) with the standard four:

  parse      scheme/host/path/query via anchored regexes — all JVM-side
             codegen (``regexp_extract``), map-only at any scale;
  domain     registrable domain by the public-suffix HEURISTIC (last two
             labels, or last three under a compound second-level like
             ``co.uk``) — a deterministic rule, NOT the full PSL: the
             real list is a 10k-line moving target; the heuristic covers
             the dominant patterns and is exactly SQL-replayable, and the
             operator takes the suffix set as a parameter so a vendored
             PSL slice can widen it without code changes;
  blocklist  registrable-domain membership against a broadcast dim —
             an O(|corpus|) map pass, never a shuffle;
  quota      deterministic per-domain cap: rank by the portable data
             hash (functions/hashing.py) inside each domain partition and
             keep the first N — retry-stable, partitioning-invariant, and
             the shuffle is keyed on domain (the only key the operator
             needs to co-locate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from datapipelines_spark.functions.hashing import portable_hash_seeded

#: Compound second-level labels under which the registrable domain keeps
#: THREE labels (shop.retail.co.uk -> retail.co.uk). A pragmatic slice of
#: the public-suffix list's dominant pattern; extend per deployment.
SUFFIX_SECOND_LEVELS: tuple[str, ...] = (
    "co", "com", "net", "org", "ac", "gov", "edu",
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_HOST_RE = "^(?:[^@]*@)?([^:]+)"  # strip userinfo@ and :port
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = "[?]([^#]*)"


def parse_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Add ``scheme``, ``host`` (lowercased, userinfo/port stripped),
    ``path`` and ``query`` columns parsed from ``url_col``. Pure anchored
    ``regexp_extract`` — non-matching components come back as '' (both
    engines' convention), so a relative or malformed URL yields empty
    parts rather than an error; gate upstream if the domain requires
    well-formed URLs."""
    u = F.col(url_col)
    authority = F.regexp_extract(u, _AUTHORITY_RE, 1)
    return df.withColumns(
        {
            "scheme": F.lower(F.regexp_extract(u, _SCHEME_RE, 1)),
            "host": F.lower(F.regexp_extract(authority, _HOST_RE, 1)),
            "path": F.regexp_extract(u, _PATH_RE, 1),
            "query": F.regexp_extract(u, _QUERY_RE, 1),
        }
    )


def registrable_domain(
    host: Column, suffix_second_levels: tuple[str, ...] = SUFFIX_SECOND_LEVELS
) -> Column:
    """The registrable domain of a lowercased host: last two labels, or
    last three when the second-to-last is a compound public-suffix label
    (``co.uk`` style). Single-label hosts pass through unchanged."""
    labels = F.split(host, "[.]")
    n = F.size(labels)
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    return (
        F.when(n <= 1, host)
        .when(
            (n >= 3) & F.element_at(labels, -2).isin(*suffix_second_levels),
            last3,
        )
        .otherwise(last2)
    )


def domain_blocklist_flag(
    df: DataFrame, domain_col: str, blocked: tuple[str, ...]
) -> DataFrame:
    """Add ``is_blocked``: registrable-domain membership in ``blocked``.
    An isin over a literal set compiles to a codegen'd lookup — map-only;
    for blocklists beyond literal size, broadcast-join a blocklist dim
    instead (same plan shape, one broadcast)."""
    return df.withColumn("is_blocked", F.col(domain_col).isin(*blocked))


def domain_quota_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    seed: int | str = "quota",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain — the corpus-balance pass that
    stops one domain from dominating a web corpus. Selection is a
    row_number over (portable data hash, id) WITHIN each domain: a pure
    function of row data, so retries, repartitioning, and engines agree
    on exactly which rows survive (functions/hashing.py discipline).
    Emits the surviving rows plus their ``quota_rank``. One shuffle keyed
    on domain; per-domain work is a bounded heap, not a global sort."""
    w = Window.partitionBy(domain_col).orderBy(
        portable_hash_seeded(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.withColumn("quota_rank", F.row_number().over(w))
        .where(F.col("quota_rank") <= cap)
    )
