"""robots.txt compliance gate (X232): RFC 9309 longest-match precedence,
allow-wins-ties, wildcard/$-anchor compilation, unknown-host default,
LIKE-metachar paths, duplicate-URL consistency."""

from pyspark.sql import functions as F


def _frames(spark):
    rules = spark.createDataFrame(
        [
            ("ex.org", "/private", False),
            ("ex.org", "/private/files", True),
            ("ex.org", "/*.pdf$", False),
            ("ex.org", "/tmp", False),
            ("ex.org", "/tmp", True),  # same length, Allow wins the tie
            ("strict.net", "/", False),
            ("strict.net", "/pub", True),
            ("meta.io", "/a!b_c%d", False),  # LIKE metachars are literals
        ],
        "host string, rule string, allow boolean",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://ex.org/public/page"),
            (2, "https://ex.org/private/page"),
            (3, "https://ex.org/private/files/ok"),
            (4, "https://ex.org/private/files/doc.pdf"),
            (5, "http://EX.ORG:8080/docs/paper.pdf"),
            (6, "https://ex.org/docs/paper.pdf?x=1"),
            (7, "https://ex.org/tmp/x"),
            (8, "https://strict.net/"),
            (9, "https://strict.net/pub/data"),
            (10, "https://unknown.host/whatever"),
            (11, "https://meta.io/a!b_c%d/e"),
            (12, "https://meta.io/aXbYcZd/e"),
            (13, "https://ex.org"),  # empty path -> '/'
            (14, "https://ex.org/private/page"),  # duplicate of 2
        ],
        "id long, url string",
    )
    return urls, rules


def test_robots_gate_semantics(spark):
    from corpusama_spark.functions.urls import robots_gate

    urls, rules = _frames(spark)
    out = {r.id: r for r in robots_gate(urls, rules).collect()}

    assert out[1].crawl_ok and out[1].rule is None  # no rule matches
    assert not out[2].crawl_ok and out[2].rule == "/private"
    # longest match: Allow /private/files beats Disallow /private
    assert out[3].crawl_ok and out[3].rule == "/private/files"
    # precedence is raw-rule OCTET length (RFC 9309 / Google): the
    # 14-octet Allow /private/files outranks the 7-octet /*.pdf$ even
    # though the wildcard also matches this pdf
    assert out[4].crawl_ok and out[4].rule == "/private/files"
    # host casefolds, port stripped; path matching stays case-sensitive
    assert not out[5].crawl_ok and out[5].host == "ex.org"
    # the match target is path+query (Google parser): '?x=1' breaks
    # the '$' anchor, so the pdf rule no longer applies
    assert out[6].crawl_ok and out[6].path == "/docs/paper.pdf?x=1"
    # equal-length Allow/Disallow -> Allow wins (RFC 9309)
    assert out[7].crawl_ok and out[7].rule == "/tmp"
    # root Disallow '/' blocks the root itself; longer Allow rescues /pub
    assert not out[8].crawl_ok
    assert out[9].crawl_ok and out[9].rule == "/pub"
    # unknown host -> allow, no rule
    assert out[10].crawl_ok and out[10].rule is None
    # LIKE metachars in rules are literals, not wildcards
    assert not out[11].crawl_ok
    assert out[12].crawl_ok
    # bare host normalizes to path '/'
    assert out[13].path == "/"
    # duplicate URLs decide identically
    assert out[14].crawl_ok == out[2].crawl_ok and out[14].rule == out[2].rule


def test_robots_gate_wildcard_middle_and_broadcast_off(spark):
    from corpusama_spark.functions.urls import robots_gate

    rules = spark.createDataFrame(
        [("w.com", "/a/*/secret", False)], "host string, rule string, allow boolean"
    )
    urls = spark.createDataFrame(
        [(1, "https://w.com/a/x/secret/f"), (2, "https://w.com/a/secret")],
        "id long, url string",
    )
    out = {
        r.id: r
        for r in robots_gate(urls, rules, broadcast_rules=False).collect()
    }
    assert not out[1].crawl_ok  # '*' spans the middle segment
    assert out[2].crawl_ok  # '*' must consume at least the '/x' here? no:
    # '*' may match empty — but '/a/*/secret' needs '/a/' + anything + '/secret';
    # '/a/secret' lacks the middle '/', LIKE '/a/%/secret%' fails. Pinned.


def test_robots_gate_partition_invariance(spark):
    from corpusama_spark.functions.urls import robots_gate

    urls, rules = _frames(spark)
    a = sorted(map(tuple, robots_gate(urls.repartition(7), rules).collect()))
    b = sorted(map(tuple, robots_gate(urls.coalesce(1), rules).collect()))
    assert a == b


def test_degenerate_inputs(spark):
    from corpusama_spark.functions.urls import robots_gate

    empty_rules = spark.createDataFrame([], "host string, rule string, allow boolean")
    urls = spark.createDataFrame(
        [(1, "not a url at all"), (2, ""), (3, None)], "id long, url string"
    )
    out = robots_gate(urls, empty_rules).collect()
    # no rules -> RFC default allow, even for unparseable/NULL URLs
    assert len(out) == 3 and all(r.crawl_ok for r in out)
