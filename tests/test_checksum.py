"""Checksum-verified PII scrub (functions/checksum.py): Luhn and
mod-97 acceptance/rejection against python-stdlib recomputation,
ordering (IBAN before CC), long-run rejection, NULLs, plan shape.
Contract query `checksum_scrub` is value-exact vs a full DuckDB
re-implementation of both checksums (scripts/selfcheck.py)."""

from pyspark.sql import functions as F

from corpusama_spark.functions.checksum import (
    CC_RE,
    IBAN_RE,
    iban_valid,
    luhn_valid,
    scrub_checksum,
)
from corpusama_spark.plans.audit import report


def _py_luhn(num: str) -> bool:
    digits = [int(c) for c in num if c.isdigit()]
    if not 13 <= len(digits) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _py_iban(iban: str) -> bool:
    rearr = iban[4:] + iban[:4]
    num = "".join(
        str(ord(c) - 55) if c.isalpha() else c for c in rearr
    )
    return int(num) % 97 == 1


CARDS_VALID = ["4111111111111111", "5500 0000 0000 0004", "340000000000009"]
CARDS_INVALID = ["4111111111111112", "1234 5678 1234 5678"]
IBANS_VALID = [
    "DE89370400440532013000",
    "GB82WEST12345698765432",
    "FR1420041010050500013M02606",
]
IBANS_INVALID = ["DE89370400440532013001", "GB82WEST12345698765431"]


def test_python_reference_agrees_with_itself():
    for c in CARDS_VALID:
        assert _py_luhn(c)
    for c in CARDS_INVALID:
        assert not _py_luhn(c)
    for i in IBANS_VALID:
        assert _py_iban(i)
    for i in IBANS_INVALID:
        assert not _py_iban(i)


def test_validators_match_python(spark):
    rows = [(c,) for c in CARDS_VALID + CARDS_INVALID]
    got = {
        r.c: r.ok
        for r in spark.createDataFrame(rows, "c string")
        .select("c", luhn_valid(F.col("c")).alias("ok"))
        .collect()
    }
    assert got == {c: _py_luhn(c) for c, in rows}
    rows = [(i,) for i in IBANS_VALID + IBANS_INVALID]
    got = {
        r.c: r.ok
        for r in spark.createDataFrame(rows, "c string")
        .select("c", iban_valid(F.col("c")).alias("ok"))
        .collect()
    }
    assert got == {i: _py_iban(i) for i, in rows}


def test_scrub_redacts_only_verified(spark):
    rows = [
        (1, "pay 4111111111111111 or 4111111111111112 today"),
        (2, "wire DE89370400440532013000 not DE89370400440532013001"),
        (3, "run 12345678901234567890123 is an id, not a card"),
        (4, None),
    ]
    got = {
        r.doc_id: (r.scrubbed, r.n_iban, r.n_cc)
        for r in spark.createDataFrame(rows, "doc_id long, text string")
        .select("doc_id", scrub_checksum("text").alias("s"))
        .select("doc_id", "s.*")
        .collect()
    }
    assert got[1] == ("pay <CC> or 4111111111111112 today", 0, 1)
    assert got[2] == ("wire <IBAN> not DE89370400440532013001", 1, 0)
    assert got[3] == (rows[2][1], 0, 0)  # 23-digit run untouched
    assert got[4] == (None, None, None)


def test_iban_scrubbed_before_cc_candidate_tail(spark):
    # GB82WEST...'s 14-digit tail is a CC candidate; the IBAN pass must
    # consume it first so it can never be half-redacted as a card
    rows = [(1, "acct GB82WEST12345698765432 end")]
    r = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select(scrub_checksum("text").alias("s"))
        .select("s.*")
        .collect()[0]
    )
    assert r.scrubbed == "acct <IBAN> end"
    assert (r.n_iban, r.n_cc) == (1, 0)


def test_plan_scan_stage(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string").select(
        scrub_checksum("text").alias("s")
    )
    report(df).assert_no_row_python().assert_max_shuffles(0)
