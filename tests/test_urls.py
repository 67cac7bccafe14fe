"""URL host / registered-domain extraction + blocklist filter
(functions/urls.py): edge-case parity, subdomain coverage, plan pin."""

from pyspark.sql import functions as F


def _dom(spark, urls):
    from corpusama_spark.functions.urls import registered_domain, url_host

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        r.url: (r.h, r.d)
        for r in df.select(
            "url",
            url_host(F.col("url")).alias("h"),
            registered_domain(F.col("url")).alias("d"),
        ).collect()
    }


def test_host_and_registered_domain_edges(spark):
    got = _dom(
        spark,
        [
            "https://news.bbc.co.uk/article?id=1",
            "http://user:pw@Ads.Example.COM:8080/x",
            "tracker.spam.net/p",               # schemeless
            "HTTPS://WWW.SITE.ORG/a#frag",
            "ftp://files.archive.org/pub",
            "https://localhost/admin",
            "https://deep.sub.shop.com.au/item",
            "svc+v2://api.vendor.io/q",          # exotic scheme chars
        ],
    )
    assert got["https://news.bbc.co.uk/article?id=1"] == (
        "news.bbc.co.uk", "bbc.co.uk")
    assert got["http://user:pw@Ads.Example.COM:8080/x"] == (
        "ads.example.com", "example.com")
    assert got["tracker.spam.net/p"] == ("tracker.spam.net", "spam.net")
    assert got["HTTPS://WWW.SITE.ORG/a#frag"] == ("www.site.org", "site.org")
    assert got["ftp://files.archive.org/pub"] == (
        "files.archive.org", "archive.org")
    assert got["https://localhost/admin"] == ("localhost", "localhost")
    assert got["https://deep.sub.shop.com.au/item"] == (
        "deep.sub.shop.com.au", "shop.com.au")
    assert got["svc+v2://api.vendor.io/q"] == ("api.vendor.io", "vendor.io")


def test_null_and_empty_urls(spark):
    from corpusama_spark.functions.urls import registered_domain, url_host

    df = spark.createDataFrame([(None,), ("",)], "url string")
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    assert all(r.h is None and r.d is None for r in rows)


def test_blocklist_filter_drops_subdomains_and_audits(spark):
    from corpusama_spark.functions.urls import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://ads.tracker.com/x"),
            (2, "https://sub.deep.tracker.com/y"),
            (3, "https://fine.example.org/z"),
            (4, "https://TRACKER.com/plain"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("Tracker.COM",)], "domain string")
    kept = blocklist_filter(docs, bl)
    assert [r.doc_id for r in kept.collect()] == [3]
    audit = blocklist_filter(docs, bl, keep_blocked=True)
    assert sorted(r.doc_id for r in audit.collect()) == [1, 2, 4]
    # the corpus side must not shuffle: the join is broadcast, and the only
    # hash exchange in the plan is the blocklist's own dedup (domain-only
    # projection), never the docs relation
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchanges and all("domain" in ln for ln in exchanges)
    assert not any("doc_id" in ln or "url" in ln for ln in exchanges)
