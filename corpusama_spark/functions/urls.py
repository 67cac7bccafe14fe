"""URL → registered-domain extraction and blocklist filtering.

The first gate of every web-crawl pipeline: C4 dropped pages from a
badwords blocklist by URL, RefinedWeb (Penedo et al. 2023 §3.1) runs a
curated blocklist of 4.6M domains plus URL-substring scoring — all public.
The operator the engine owes is the distributed shape:

- ``url_host``: pure-JVM host extraction (one regexp — scheme-less,
  port/path/query tolerant, casefolded, bracketed-IPv6 aware).
  Deliberately NOT parse_url(): a plain anchored regexp is portable to
  the DuckDB oracle character for character, and hosts in crawl data are
  dirty enough that the simple rule is the defensible one.
- ``registered_domain``: host → eTLD+1 by the last-two-labels rule with
  a multi-part public-suffix override list (co.uk, com.au, …). IP-literal
  hosts (dotted-quad, IPv6) pass through whole — label slicing of an IP
  produces garbage like "3.4" and breaks blocklist matching.
- ``with_registered_domain``: the FULL public-suffix-list algorithm
  (publicsuffix.org/list/) over a rules DataFrame/file — exact rules,
  ``*.`` wildcard rules, ``!`` exceptions, unknown-TLD default. Rule
  depth is bounded (≤5 labels in the published PSL), so matching is a
  fixed chain of per-depth BROADCAST left joins: zero exchanges on the
  corpus side at any size, no explode, no groupBy.
- ``blocklist_filter``: registered-domain equi-join against a blocklist
  DataFrame. The blocklist (even RefinedWeb's 4.6M rows ≈ tens of MB)
  broadcasts; the corpus never shuffles. Subdomains are covered by
  construction because matching happens on the REGISTERED domain.

Scale shape: host/domain extraction is scan-stage JVM string work; the
only joins are broadcast — zero exchanges on the corpus side at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-part public suffixes where eTLD+1 is three labels, not two.
# Round-5 widening: the default now covers the high-traffic multi-part
# ccTLD second levels plus the major hosted-platform suffixes (all
# public facts from the publicsuffix.org registry's common entries) —
# enough that crawl-scale host grouping is right for the overwhelming
# share of real URLs out of the box. Still a SUBSET by design:
# deployments with the full publicsuffix.org file (wildcard and
# exception rules included) should pass it to
# ``with_registered_domain`` / ``psl_registered_domain``.
MULTIPART_SUFFIXES = (
    # UK / Ireland
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "nhs.uk", "police.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    # Japan / Korea / China / Taiwan / Hong Kong / Singapore
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ed.jp", "lg.jp",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
    # South Asia
    "co.in", "net.in", "org.in", "ac.in", "gov.in", "res.in", "edu.in",
    "com.pk", "org.pk", "com.bd", "com.lk",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "org.co", "gov.co", "edu.co",
    "com.pe", "com.ve", "com.ec", "com.uy", "com.bo", "com.py",
    "com.gt", "com.do", "com.sv", "com.ni", "com.pa", "com.hn",
    "co.cr", "com.cu", "com.jm",
    # Europe (multi-part registries)
    "co.at", "or.at", "ac.at", "gv.at",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.pt", "org.pt", "edu.pt", "gov.pt",
    "com.gr", "org.gr", "net.gr", "edu.gr", "gov.gr",
    "com.ro", "org.ro", "com.ua", "net.ua", "org.ua", "gov.ua",
    "in.ua", "kiev.ua", "com.ru", "net.ru", "org.ru", "msk.ru",
    "spb.ru", "com.tr", "org.tr", "net.tr", "gov.tr", "edu.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "co.hu", "org.hu",
    # Africa / Middle East
    "co.za", "org.za", "net.za", "web.za", "gov.za", "ac.za",
    "com.ng", "org.ng", "gov.ng", "edu.ng",
    "com.eg", "org.eg", "gov.eg", "edu.eg",
    "co.ke", "or.ke", "ac.ke", "go.ke",
    "com.gh", "com.et", "co.tz", "co.ug", "co.zw", "co.bw",
    "com.sa", "org.sa", "gov.sa", "edu.sa",
    "com.ae", "org.ae", "gov.ae", "ac.ae",
    "com.kw", "com.qa", "com.bh", "com.om", "com.jo", "com.lb",
    "com.ma", "co.ma", "com.tn", "com.dz", "com.ly",
    # Southeast Asia
    "co.th", "or.th", "ac.th", "go.th", "in.th",
    "com.my", "org.my", "net.my", "edu.my", "gov.my",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "my.id",
    "com.ph", "org.ph", "net.ph", "gov.ph", "edu.ph",
    "com.vn", "org.vn", "net.vn", "edu.vn", "gov.vn",
    "com.kh", "com.mm", "com.np",
    # hosted-platform private-registry suffixes (PSL "private" section
    # heads every crawl pipeline groups by — each user site is an
    # independent publisher)
    "github.io", "gitlab.io", "pages.dev", "netlify.app", "vercel.app",
    "herokuapp.com", "appspot.com", "web.app", "firebaseapp.com",
    "blogspot.com", "wordpress.com", "tumblr.com", "wixsite.com",
    "weebly.com", "squarespace.com", "neocities.org", "readthedocs.io",
    "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
    "cloudapp.net", "fastly.net", "workers.dev", "repl.co", "glitch.me",
)

# Bracketed IPv6 literal first (the generic class stops at ':' and would
# truncate "[::1]" to "[" — ADVICE r3), then the generic host class.
_HOST_RE = (
    r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@]*@)?"
    r"(\[[^\]/]*\]|[^/:?#]+)"
)

_IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"

# deepest rule in the published PSL is 5 labels; exact-matching beyond
# that depth would always miss, so the join chain stops here.
_MAX_RULE_DEPTH = 5


def url_host(url_col: Column) -> Column:
    """Casefolded host of a URL (scheme and userinfo optional, port/path/
    query/fragment stripped). Bracketed IPv6 literals yield the address
    inside the brackets ("http://[::1]:8080/x" → "::1"). NULL/empty URLs
    yield NULL."""
    host = F.lower(F.regexp_extract(url_col, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^\[|\]$", "")
    return F.when(host == "", None).otherwise(host)


def is_ip_host(host: Column) -> Column:
    """True for hosts that are IP literals: dotted-quad IPv4 or anything
    containing ':' (IPv6 — impossible in a registered name, whose labels
    are [a-z0-9-])."""
    return host.rlike(_IPV4_RE) | host.contains(":")


def registered_domain(
    url_col: Column,
    multipart: tuple[str, ...] = MULTIPART_SUFFIXES,
) -> Column:
    """eTLD+1: last two host labels, or last three when the two-label tail
    is a known multi-part public suffix. Single-label hosts (localhost,
    bare TLDs) and IP-literal hosts pass through unchanged — slicing an
    IP's "labels" yields nonsense ("1.2.3.4" → "3.4") and defeats
    blocklist matching (ADVICE r3)."""
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
    return F.when(host.isNull() | (n <= 1) | is_ip_host(host), host).otherwise(
        F.when((n >= 3) & last2.isin(*multipart), last3).otherwise(last2)
    )


def parse_psl(lines: list[str]) -> list[tuple[str, bool, bool]]:
    """publicsuffix.org file lines → (rule, is_wildcard, is_exception)
    rows. Comments (//) and blanks drop; '*.' and '!' prefixes strip into
    flags; rules casefold. The wildcard row stores the PARENT ('*.ck' →
    'ck', wildcard=True): matching tests "some label + parent"."""
    out = []
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0].lower()  # spec: ignore trailing text
        is_exc = line.startswith("!")
        if is_exc:
            line = line[1:]
        is_wc = line.startswith("*.")
        if is_wc:
            line = line[2:]
        if line:
            out.append((line, is_wc, is_exc))
    return out


def psl_rules_df(spark, source) -> DataFrame:
    """Rules DataFrame from a PSL file path or an iterable of lines:
    (rule string, wildcard boolean, exception boolean), one row per rule,
    de-duplicated with OR-merged flags (a name can be both an exact rule
    and a wildcard parent — e.g. 'kobe.jp' under '*.kobe.jp')."""
    if isinstance(source, str):
        with open(source, encoding="utf-8") as fh:
            lines = fh.readlines()
    else:
        lines = list(source)
    rows = parse_psl(lines)
    df = spark.createDataFrame(rows, "rule string, wildcard boolean, exception boolean")
    return df.groupBy("rule").agg(
        F.max(~F.col("wildcard") & ~F.col("exception")).alias("exact"),
        F.max("wildcard").alias("wildcard"),
        F.max("exception").alias("exception"),
    )


def with_registered_domain(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
) -> DataFrame:
    """``df`` plus ``out_col`` = eTLD+1 under the FULL PSL algorithm
    (publicsuffix.org/list/): the prevailing rule is the longest match,
    exception rules win outright (their own name IS the registered
    domain — '!city.kobe.jp'), wildcard rules make every child of the
    parent a public suffix ('*.ck', 'github.io'-style private
    registries are plain exact rules), and unknown TLDs fall back to the
    implicit '*' rule (suffix = last label). A host that IS a public
    suffix has no registered domain → NULL. IP-literal hosts pass
    through whole.

    Distributed shape: one broadcast LEFT join per rule depth (≤5 — the
    deepest published rule), each on a scan-stage tail expression; the
    corpus side never shuffles, nothing explodes, and the final pick is
    a pure ``when`` cascade. Rules (~9k rows) broadcast trivially."""
    host = url_host(F.col(url_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def tail(d: int) -> Column:
        return F.when(
            n >= d,
            F.concat_ws(
                ".", *[F.element_at(labels, -(d - i)) for i in range(d)]
            ),
        )

    out = df.withColumn("_psl_host", host).withColumn("_psl_n", n)
    for d in range(1, _MAX_RULE_DEPTH + 1):
        r = F.broadcast(
            rules.select(
                F.col("rule").alias(f"_r{d}"),
                F.col("exact").alias(f"_x{d}"),
                F.col("wildcard").alias(f"_w{d}"),
                F.col("exception").alias(f"_e{d}"),
            )
        )
        out = out.withColumn(f"_t{d}", tail(d)).join(
            r, F.col(f"_t{d}") == F.col(f"_r{d}"), "left"
        )

    n = F.col("_psl_n")
    host = F.col("_psl_host")

    # exception rule: its own name is the registered domain (deepest wins,
    # though the published list never nests exceptions)
    exc = None
    for d in range(_MAX_RULE_DEPTH, 0, -1):
        hit = F.col(f"_e{d}") & F.col(f"_t{d}").isNotNull()
        exc = F.when(hit, F.col(f"_t{d}")) if exc is None else exc.when(
            hit, F.col(f"_t{d}")
        )

    # public-suffix depth: longest of exact matches (depth d) and wildcard
    # matches (parent at depth d → suffix depth d+1); implicit '*' → 1.
    # FLAT greatest() over per-depth candidates — a nested when-cascade
    # doubles the expression tree per depth and blows the codegen 64KB
    # method limit at depth 5.
    candidates = [F.lit(1)]
    for d in range(1, _MAX_RULE_DEPTH + 1):
        exact_hit = F.coalesce(F.col(f"_x{d}"), F.lit(False))
        candidates.append(F.when(exact_hit, F.lit(d)).otherwise(F.lit(1)))
        wc_hit = F.coalesce(F.col(f"_w{d}"), F.lit(False))
        candidates.append(
            F.when(wc_hit & (n > d), F.lit(d + 1)).otherwise(F.lit(1))
        )
    ps_depth = F.greatest(*candidates)

    reg_depth = ps_depth + 1
    reg = None
    for d in range(2, _MAX_RULE_DEPTH + 2):
        pick = reg_depth == d
        val = F.when(
            n >= d,
            F.concat_ws(
                ".", *[F.element_at(F.split(host, r"\."), -(d - i)) for i in range(d)]
            ),
        )
        reg = F.when(pick, val) if reg is None else reg.when(pick, val)

    domain = (
        F.when(host.isNull() | is_ip_host(host), host)
        .when(exc.isNotNull(), exc)
        .otherwise(reg)
    )
    out = out.withColumn(out_col, domain)
    drop = ["_psl_host", "_psl_n"] + [
        c
        for d in range(1, _MAX_RULE_DEPTH + 1)
        for c in (f"_t{d}", f"_r{d}", f"_x{d}", f"_w{d}", f"_e{d}")
    ]
    return out.drop(*drop)


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    blocked_col: str = "domain",
    keep_blocked: bool = False,
    psl_rules: DataFrame | None = None,
) -> DataFrame:
    """docs with a ``domain`` column, filtered by a broadcast
    (anti-)join against ``blocklist``: default drops blocked domains
    (left_anti); ``keep_blocked=True`` returns ONLY the blocked rows
    (left_semi — the audit view). With ``psl_rules`` the domain comes
    from the full-PSL matcher instead of the built-in suffix subset."""
    if psl_rules is not None:
        with_dom = with_registered_domain(docs, psl_rules, url_col=url_col)
    else:
        with_dom = docs.withColumn(
            "domain", registered_domain(F.col(url_col))
        )
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(blocked_col)).alias("domain")).distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return with_dom.join(bl, ["domain"], how)


def canonical_url(url_col: Column) -> Column:
    """RFC-3986-flavored URL canonicalization for crawl dedup — the
    normalization CommonCrawl/C4-style pipelines apply before URL-level
    dedup so `HTTP://Ex.COM:80/a?utm_source=x#f` and `http://ex.com/a`
    collapse to one key. Pure scan-stage regexp folds (RE2-compatible, so
    the op is oracle-checkable):

    - scheme + host lowercased (path/query case preserved)
    - default ports stripped (:80 for http, :443 for https)
    - fragment dropped
    - tracking params removed (utm_*, fbclid, gclid, msclkid, mc_eid),
      with separator repair and trailing ?/& cleanup
    - trailing slashes trimmed (a bare host and host+'/' collapse together)
    """
    u = F.trim(url_col)
    # lowercase scheme://host[:port] prefix only
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""),
    )
    u = F.regexp_replace(u, r"^(http://[^/?#:]+):80(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]+):443(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    # tracking params (leading separator captured; repair below)
    u = F.regexp_replace(
        u, r"[?&](utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_eid)=[^&#]*", ""
    )
    # if the first surviving param lost its '?', promote the '&'
    u = F.regexp_replace(u, r"^([^?]*)&", r"$1?")
    u = F.regexp_replace(u, r"[?&]$", "")  # dangling separator
    u = F.regexp_replace(u, r"^(.+?)/+$", r"$1")  # trailing slashes, keep root
    return u


# ---------------------------------------------------------------------------
# X232: robots.txt compliance gate (RFC 9309). A crawl-derived corpus that
# ignores robots rules is a liability at any scale; at 10^12 pages the gate
# must be a JOIN, not a per-URL parser call. The rules table is the already-
# parsed per-host rule set for YOUR user agent (group resolution happens at
# fetch time, once per robots.txt, not once per page) — this operator is the
# page-side decision: longest matching rule wins, allow wins length ties,
# no match / unknown host ⇒ allow (RFC: absent rules imply full access).
# ---------------------------------------------------------------------------


def url_path(url_col: Column) -> Column:
    """Robots match target of a URL: path plus '?query' when present
    (Google's reference robots.txt parser matches against path+query —
    that's what makes '/*?' rules work), fragment excluded, port
    stripped; empty or authority-only → '/'."""
    tail = F.regexp_replace(url_col, _HOST_RE, "")
    path = F.regexp_extract(tail, r"^(?::\d*)?([^#]*)", 1)
    return F.when(
        (path == "") | ~path.startswith("/"), F.lit("/")
    ).otherwise(path)


def _robots_like_pattern(rule: Column) -> Column:
    """Compile a robots path rule ('*' any-chars wildcard, trailing '$'
    end anchor) into a SQL LIKE pattern with escape '!'. Chosen over a
    regex compile because LIKE semantics are bit-identical across Spark
    and DuckDB (the oracle mirrors this expression), while regex escape
    grammars differ."""
    anchored = rule.endswith("$")
    esc = F.when(anchored, F.regexp_replace(rule, r"\$$", "")).otherwise(rule)
    for ch in ("!", "%", "_"):
        esc = F.replace(esc, F.lit(ch), F.lit("!" + ch))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, esc).otherwise(F.concat(esc, F.lit("%")))


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Per-URL robots.txt decision: input columns + host, path, rule,
    rule_allow (the winning rule, NULL when none matched) and crawl_ok.

    ``rules`` is (host, rule, allow): host casefolded, rule a path
    pattern supporting '*' and a trailing '$' anchor, allow True for
    Allow lines. Empty-valued Disallow lines mean "allow all" in
    robots.txt — the upstream parser must DROP them (an empty rule here
    would length-0-match every path), which is also RFC 9309's parse.

    Precedence: longest rule (octet length of the raw rule, the de-facto
    Google/RFC tiebreak) wins; equal length → Allow wins; remaining ties
    broken lexicographically so the reported rule is deterministic.

    Scale shape: rules are |hosts|·(rules per host) — orders of magnitude
    smaller than the corpus — so the default is a broadcast hash join on
    host (set ``broadcast_rules=False`` to let AQE pick for a huge rule
    set); candidates per URL are bounded by that host's rule count, and
    the winner is a per-URL-id window over those few rows, never a
    corpus-wide exchange beyond the join itself.
    """
    from pyspark.sql import Window

    # _uid = md5(url): deterministic under any partitioning (unlike
    # monotonically_increasing_id across a self-join), and identical
    # URLs collapse to one candidate window — same URL, same decision
    u = urls.select(
        "*",
        url_host(F.col(url_col)).alias("host"),
        url_path(F.col(url_col)).alias("path"),
        F.md5(F.coalesce(F.col(url_col), F.lit(""))).alias("_uid"),
    )
    compiled = rules.select(
        F.col("host").alias("_rhost"),
        F.col("rule"),
        F.col("allow"),
        _robots_like_pattern(F.col("rule")).alias("_pat"),
    )
    if broadcast_rules:
        compiled = F.broadcast(compiled)
    cand = u.select("_uid", "host", "path").join(
        compiled, F.col("host") == F.col("_rhost"), "inner"
    ).where(F.expr("path LIKE _pat ESCAPE '!'"))
    w = Window.partitionBy("_uid").orderBy(
        F.octet_length("rule").desc(), F.col("allow").desc(), F.col("rule").asc()
    )
    best = (
        cand.select("_uid", "rule", "allow", F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
    return u.join(best, "_uid", "left").select(
        *[c for c in urls.columns],  # host/path/rule names must be free
        "host",
        "path",
        "rule",
        F.col("allow").alias("rule_allow"),
        F.coalesce(F.col("allow"), F.lit(True)).alias("crawl_ok"),
    )


# ---------------------------------------------------------------------------
# X244: host spam signals. Crawl-frontier triage before any fetch happens:
# spammy link farms telegraph themselves in the HOSTNAME — deep subdomain
# chains (a.b.c.d.spam.tk), digit-stuffed labels, hyphen floods, punycode
# (IDN homograph vector), free-registration TLDs with documented abuse
# rates. Five integer/boolean signals and a vote, all scan-stage JVM — the
# URL-side twin of the X233 code-detection vote.
# ---------------------------------------------------------------------------

# free-registration TLDs with persistently documented abuse shares
# (public Spamhaus/APWG reporting); a deployment swaps in its own list
_SPAMMY_TLDS = ("tk", "ml", "ga", "cf", "gq", "top", "icu")


def host_spam_signals(host: Column) -> Column:
    """struct(n_labels, digit_share, n_hyphens, is_punycode, spammy_tld,
    spam_points) for a casefolded hostname column. digit_share is over
    the host's non-dot characters, 6dp. The vote: depth ≥ 5 labels /
    digit share ≥ .25 / ≥ 3 hyphens / punycode / spammy TLD — one point
    each."""
    h = F.coalesce(host, F.lit(""))
    n_labels = F.size(F.filter(F.split(h, r"\."), lambda x: F.length(x) > 0))
    nondot = F.regexp_replace(h, r"\.", "")
    digits = F.length(nondot) - F.length(F.regexp_replace(nondot, r"[0-9]", ""))
    digit_share = F.when(
        F.length(nondot) > 0,
        F.round(digits / F.length(nondot).cast("double"), 6),
    ).otherwise(F.lit(0.0))
    # count hyphens with the punycode marker removed — 'xn--' is already
    # the punycode signal; letting its hyphens trip the hyphen signal
    # would double-count the same evidence
    dehyph_base = F.regexp_replace(h, r"xn--", "")
    n_hyphens = F.length(dehyph_base) - F.length(
        F.regexp_replace(dehyph_base, r"-", "")
    )
    puny = h.contains("xn--")
    tld = F.regexp_extract(h, r"([^.]+)$", 1)
    spammy = tld.isin(*_SPAMMY_TLDS)
    points = (
        (n_labels >= 5).cast("int")
        + (digit_share >= 0.25).cast("int")
        + (n_hyphens >= 3).cast("int")
        + puny.cast("int")
        + spammy.cast("int")
    )
    return F.struct(
        n_labels.cast("long").alias("n_labels"),
        digit_share.alias("digit_share"),
        n_hyphens.cast("long").alias("n_hyphens"),
        puny.alias("is_punycode"),
        spammy.alias("spammy_tld"),
        points.alias("spam_points"),
    )


def url_spam_score(
    urls: DataFrame, url_col: str = "url", min_points: int = 2
) -> DataFrame:
    """Input columns + host + the five signals + is_spammy_host at
    ``min_points`` of 5. Pure scan stage, zero joins — runs on the
    frontier BEFORE robots/politeness spend anything on the host."""
    out = urls.select(
        "*",
        url_host(F.col(url_col)).alias("host"),
    ).select("*", host_spam_signals(F.col("host")).alias("_s"))
    return out.select(
        *[c for c in out.columns if c != "_s"],
        F.col("_s.n_labels").alias("n_labels"),
        F.col("_s.digit_share").alias("digit_share"),
        F.col("_s.n_hyphens").alias("n_hyphens"),
        F.col("_s.is_punycode").alias("is_punycode"),
        F.col("_s.spammy_tld").alias("spammy_tld"),
        F.col("_s.spam_points").alias("spam_points"),
        (F.col("_s.spam_points") >= min_points).alias("is_spammy_host"),
    )
