"""Web-crawl corpus operators: URL canonicalization and domain rollups.

A crawl-scale training pipeline dedups and throttles BY URL before it ever
looks at content (the same fetched page appears under scheme/case/param
variants), and balances BY registered domain. Both are pure string
column transforms here — no UDFs, no driver loops — so they run inside
whole-stage codegen and replay in any SQL engine:

- ``canonicalize_url_expr`` — lowercase scheme+host, strip a leading
  ``www.``, drop default ports (:80 http / :443 https), drop the
  fragment, drop tracking query params (utm_*, gclid, fbclid, ref),
  sort the surviving params, and strip a trailing slash from non-root
  paths. The result is the dedup key: ``HTTP://WWW.Ex.com:80/a/?b=2&a=1``
  and ``http://ex.com/a?a=1&b=2`` collide.
- ``registered_domain_expr`` — the quota/balance key: last-two host
  labels, or last-three under common two-part public suffixes
  (``co.uk``-style; a HEURISTIC subset of the Public Suffix List — swap
  in the full PSL as a broadcast table for production).

Reference scope note: the reference has no crawl module (its sources are
document stores); this family is part of the beyond-reference
training-pipeline suite, next to dedup/sampling/textstats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameter names (exact) and prefixes dropped during
# canonicalization — the common cross-site tracking set.
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAM_NAMES = ("gclid", "fbclid", "ref", "mc_cid", "mc_eid")

# Two-part public-suffix second labels (heuristic PSL subset): a host
# ending in one of these + a 2-3 letter TLD keeps THREE labels.
_TWO_PART_SUFFIX_SECONDS = ("co", "com", "org", "net", "ac", "gov", "edu")


def canonicalize_url_expr(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring). URLs with
    no scheme are treated as http. Pure native expressions."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    hostport = F.lower(
        F.regexp_extract(url, r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?([^/?#]*)", 1)
    )
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(
        url, r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.split(p, "=")[0].isin(*TRACKING_PARAM_NAMES)
        & ~F.exists(
            F.array(*[F.lit(pre) for pre in TRACKING_PARAM_PREFIXES]),
            lambda pre: F.split(p, "=")[0].startswith(pre),
        ),
    )
    qstr = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )


def registered_domain_expr(host_or_url: Column) -> Column:
    """Registered (quota) domain from a host or URL column: last two
    labels, or last three when the second-to-last is a common two-part
    public-suffix second label (co/com/org/net/ac/gov/edu) under a
    short TLD. Heuristic PSL subset — see module docstring."""
    host = F.lower(
        F.regexp_extract(host_or_url, r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?([^/?#:]*)", 1)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    three = (
        (n >= 3)
        & second.isin(*_TWO_PART_SUFFIX_SECONDS)
        & (F.length(tld) <= 3)
    )
    take = F.when(three, F.lit(3)).otherwise(F.lit(2))
    take = F.when(n < take, n).otherwise(take)
    return F.array_join(F.slice(labels, n - take + 1, take), ".")


def canonical_urls(
    df: DataFrame, url_col: str, out_col: str = "canonical_url",
    domain_col: str = "domain",
) -> DataFrame:
    """Attach canonical URL and registered domain columns."""
    canon = canonicalize_url_expr(F.col(url_col))
    return df.withColumn(out_col, canon).withColumn(
        domain_col, registered_domain_expr(canon)
    )


def url_dedup(
    df: DataFrame, url_col: str, id_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly one row per canonical URL — the smallest ``id_col``
    wins (content-addressed, partitioning-independent). One hash
    aggregation on the canonical key."""
    canon = canonicalize_url_expr(F.col(url_col)).alias("_canon")
    keep = (
        df.select(canon, F.col(id_col).alias("_kid"))
        .groupBy("_canon")
        .agg(F.min("_kid").alias("_keep"))
    )
    return (
        df.withColumn("_canon", canonicalize_url_expr(F.col(url_col)))
        .join(keep, "_canon")
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_canon", "_keep")
    )
