"""Checksum-VERIFIED PII scrub: credit cards (Luhn) and IBANs (mod-97).

The regex-only scrub chain (functions/scrub.py) redacts every match;
for high-precision PII classes that is over-eager — a 16-digit order id
is not a credit card. The industry rule (and what DLP scanners like
Presidio do) is regex CANDIDATES + CHECKSUM verification: redact only
candidates whose check digit validates (Luhn mod-10 for PAN numbers,
ISO 7064 mod-97 for IBANs — both public algorithms).

Everything stays JVM-side with higher-order functions — no UDF:

- candidates: ``regexp_extract_all`` (one entry per occurrence);
- Luhn: reverse the digit array, double every second digit (index-aware
  ``transform``), fold with ``aggregate``;
- IBAN: rearrange (first 4 chars to the end), then fold the char array
  keeping a running mod-97 accumulator — letters fold as two digits
  (A=10..Z=35), so no big-integer materializes (the textbook streaming
  mod);
- redaction: fold-``replace`` the VERIFIED candidates over the text
  (``aggregate`` with the string as accumulator). A verified candidate
  replaces ALL its literal occurrences — correct here, the same string
  IS the same PII.

Order is load-bearing: IBAN before CC, because an IBAN's digit tail
(e.g. GB82WEST12345698765432 → 14 digits) is a credit-card CANDIDATE
that can accidentally pass Luhn. Counts are measured on the chain,
like scrub_audit.

Scale shape: pure scan-stage expressions inside whole-stage codegen;
per-row cost is O(len + candidates·digits). No shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 13-19 digits, optional single space/dash separators. \b (not
# lookbehind — the DuckDB oracle's RE2 has none) rejects embedding in a
# longer digit run: interior digit-digit positions are never a word
# boundary, so a 20+-digit run has no 13-19-digit match at all
CC_RE = r"\b(?:\d[ -]?){12,18}\d\b"
IBAN_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{10,30}\b"


def luhn_valid(cand: Column) -> Column:
    """True iff the candidate's digits pass the Luhn mod-10 check and
    the digit count is a plausible PAN length (13-19)."""
    clean = F.regexp_replace(cand, r"[ -]", "")
    digits = F.reverse(F.regexp_extract_all(clean, F.lit("[0-9]"), 0))
    mapped = F.transform(
        digits,
        lambda c, i: F.when(
            i % 2 == 1,
            # doubled digit, digit-summed: 2d if d<5 else 2d-9
            F.when(c.cast("int") < 5, c.cast("int") * 2).otherwise(
                c.cast("int") * 2 - 9
            ),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(mapped, F.lit(0), lambda a, x: a + x)
    return F.length(clean).between(13, 19) & (total % 10 == 0)


def iban_valid(cand: Column) -> Column:
    """True iff the candidate passes ISO 7064 mod-97 == 1 (streaming
    fold — letters contribute two digits A=10..Z=35, no bignum)."""
    rearr = F.concat(F.substring(cand, 5, 1000), F.substring(cand, 1, 4))
    chars = F.regexp_extract_all(rearr, F.lit("[A-Z0-9]"), 0)
    acc = F.aggregate(
        chars,
        F.lit(0),
        lambda a, c: F.when(
            c.rlike("[A-Z]"),
            (a * 100 + (F.ascii(c) - 55)) % 97,
        ).otherwise((a * 10 + c.cast("int")) % 97),
    )
    return acc == 1


def _fold_replace(text: Column, verified: Column, token: str) -> Column:
    return F.aggregate(
        verified, text, lambda a, x: F.replace(a, x, F.lit(token))
    )


def scrub_checksum(col: Column | str) -> Column:
    """struct(scrubbed, n_iban, n_cc): text with checksum-verified IBANs
    then credit cards redacted, plus per-class verified-occurrence
    counts (regex candidates failing their checksum are left in place).
    NULL text passes through as NULL (counts NULL too)."""
    text = F.col(col) if isinstance(col, str) else col
    iban_cands = F.regexp_extract_all(text, F.lit(IBAN_RE), 0)
    iban_ok = F.filter(iban_cands, iban_valid)
    after_iban = _fold_replace(text, iban_ok, "<IBAN>")
    cc_cands = F.regexp_extract_all(after_iban, F.lit(CC_RE), 0)
    cc_ok = F.filter(cc_cands, luhn_valid)
    scrubbed = _fold_replace(after_iban, cc_ok, "<CC>")
    return F.struct(
        scrubbed.alias("scrubbed"),
        F.size(iban_ok).cast("long").alias("n_iban"),
        F.size(cc_ok).cast("long").alias("n_cc"),
    )
