"""URL → registered-domain extraction and blocklist filtering.

The first gate of every web-crawl pipeline: C4 dropped pages from a
badwords blocklist by URL, RefinedWeb (Penedo et al. 2023 §3.1) runs a
curated blocklist of 4.6M domains plus URL-substring scoring — all public.
The operator the engine owes is the distributed shape:

- ``url_host``: pure-JVM host extraction (one regexp — scheme-less,
  port/path/query tolerant, casefolded). Deliberately NOT parse_url():
  a plain anchored regexp is portable to the DuckDB oracle character for
  character, and hosts in crawl data are dirty enough that the simple
  rule is the defensible one.
- ``registered_domain``: host → eTLD+1 by the last-two-labels rule with
  a multi-part public-suffix override list (co.uk, com.au, …). The full
  public-suffix list is a data file a deployment ships; the ENGINE
  mechanism — split labels, check the tail against a broadcast set,
  keep 2 or 3 labels — is what's built and tested here.
- ``blocklist_filter``: registered-domain equi-join against a blocklist
  DataFrame. The blocklist (even RefinedWeb's 4.6M rows ≈ tens of MB)
  broadcasts; the corpus never shuffles. Subdomains are covered by
  construction because matching happens on the REGISTERED domain.

Scale shape: host/domain extraction is scan-stage JVM string work; the
only join is a broadcast semi/anti join — zero exchanges on the corpus
side at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-part public suffixes where eTLD+1 is three labels, not two — the
# mechanism-exercising subset; swap in the full PSL file in deployment.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)"


def url_host(url_col: Column) -> Column:
    """Casefolded host of a URL (scheme and userinfo optional, port/path/
    query/fragment stripped). NULL/empty URLs yield NULL."""
    host = F.lower(F.regexp_extract(url_col, _HOST_RE, 1))
    return F.when(host == "", None).otherwise(host)


def registered_domain(
    url_col: Column,
    multipart: tuple[str, ...] = MULTIPART_SUFFIXES,
) -> Column:
    """eTLD+1: last two host labels, or last three when the two-label tail
    is a known multi-part public suffix. Single-label hosts (localhost,
    bare TLDs) pass through unchanged."""
    host = url_host(url_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(host.isNull() | (n <= 1), host).otherwise(
        F.when((n >= 3) & last2.isin(*multipart), last3).otherwise(last2)
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    blocked_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """docs with a ``domain`` column, filtered by a broadcast
    (anti-)join against ``blocklist``: default drops blocked domains
    (left_anti); ``keep_blocked=True`` returns ONLY the blocked rows
    (left_semi — the audit view)."""
    with_dom = docs.withColumn(
        "domain", registered_domain(F.col(url_col))
    )
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(blocked_col)).alias("domain")).distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return with_dom.join(bl, ["domain"], how)
