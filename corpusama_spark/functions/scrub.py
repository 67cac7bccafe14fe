"""PII / toxicity scrub → `caption_scrubbed` (north_rule stage).

The reference has no direct scrub implementation; its precedents for ordered
regex-rewrite operators are wrap_lines dehyphenation
(pipeline/stanza/base_pipeline.py:100-112), pdf.clean_text
(corpusama/source/pdf.py:16-33) and the drop_all translate
(corpusama/util/langid.py:73-77). This stage is a deterministic, ordered
``regexp_replace`` chain — 100% JVM expressions, no UDF, golden-tested.

Order is load-bearing and fixed: EMAIL → URL → IP → PHONE → ID → toxicity.
Emails before URLs so `mailto:`-ish text scrubs as email; IPs before phones so
dotted quads don't half-match phone digits; IDs last among PII so scrubbed
tokens aren't re-matched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from corpusama_spark.functions.seedtext import TOXIC_TERMS

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"(?i)\b(?:https?://|www\.)[^\s<>\"]+"
IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"(?<![\w.])\+?\d[\d ()./-]{6,}\d(?![\w])"
ID_RE = r"\b[A-Z]{1,3}\d{6,9}\b"

SCRUB_CHAIN: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (URL_RE, "<URL>"),
    (IP_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
    (ID_RE, "<ID>"),
]


def toxicity_pattern(terms: list[str] | None = None) -> str:
    terms = TOXIC_TERMS if terms is None else terms
    return r"(?i)\b(?:" + "|".join(terms) + r")\b"


def scrub_caption(col: Column | str, terms: list[str] | None = None) -> Column:
    """Apply the ordered scrub chain; NULL passes through untouched."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, token in SCRUB_CHAIN:
        out = F.regexp_replace(out, pattern, token)
    out = F.regexp_replace(out, toxicity_pattern(terms), "<TOX>")
    return out


def scrub_count(col: Column | str) -> Column:
    """Number of scrub tokens present post-scrub (metrics column)."""
    return F.regexp_count(
        scrub_caption(col), F.lit(r"<(EMAIL|URL|IP|PHONE|ID|TOX)>")
    )


AUDIT_NAMES = ("n_email", "n_url", "n_ip", "n_phone", "n_id")


def scrub_audit(col: Column | str, terms: list[str] | None = None) -> Column:
    """struct(scrubbed, n_email, n_url, n_ip, n_phone, n_id, n_tox): the
    scrubbed text plus per-rule hit counts — the observability row a
    PII-scrub lane owes its audit log (which rules fire, how often, per
    document; corpus rollup is a plain sum downstream).

    Counts are measured ON THE CHAIN: each category is counted on the
    text AFTER the earlier categories replaced, so the numbers are
    exactly the occurrences the chain rewrote (an email never double-
    counts as a URL). Pure JVM — the nested regexp expressions stay
    inside whole-stage codegen and Catalyst's subexpression elimination
    shares the chain prefixes across the struct fields."""
    cur = F.col(col) if isinstance(col, str) else col
    counts: list[Column] = []
    for (pattern, token), name in zip(SCRUB_CHAIN, AUDIT_NAMES):
        counts.append(
            F.regexp_count(cur, F.lit(pattern)).cast("long").alias(name)
        )
        cur = F.regexp_replace(cur, pattern, token)
    tox = toxicity_pattern(terms)
    counts.append(F.regexp_count(cur, F.lit(tox)).cast("long").alias("n_tox"))
    cur = F.regexp_replace(cur, tox, "<TOX>")
    return F.struct(cur.alias("scrubbed"), *counts)


def scrub_caption_py(text: str, terms: list[str] | None = None) -> str:
    """Pure-Python oracle twin of scrub_caption for tests (same chain)."""
    import re

    if text is None:
        return None
    for pattern, token in SCRUB_CHAIN:
        text = re.sub(pattern, token, text)
    return re.sub(toxicity_pattern(terms), "<TOX>", text)
