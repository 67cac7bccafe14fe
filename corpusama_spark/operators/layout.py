"""Data-layout planning: Z-order (Morton) interleave + range bucketing.

At 100 TB the dominant query cost is SCAN PRUNING: a table laid out so
that each file covers a narrow range of BOTH common filter columns lets
the reader skip most files from parquet min/max footer stats alone.
Sorting by (a, b) prunes perfectly on `a` and barely on `b`; the Z-order
curve interleaves the BITS of both keys so every contiguous z-range is a
small rectangle in (a, b) space — the layout trick behind Delta Lake's
OPTIMIZE ZORDER and Iceberg's sort-order z-curves (both public).

Two tiers, same key:

- ``zorder_key`` — the pure 32-bit Morton interleave of two 16-bit keys,
  a scan-stage JVM bit expression (no UDF, no shuffle);
- ``zorder_buckets`` — the oracle-checkable contract twin: assigns each
  row an ntile bucket in z order, which is exactly the file assignment
  ``df.repartitionByRange(nbuckets, zorder_key(...))`` + write produces
  (repartitionByRange samples range boundaries non-deterministically, so
  the window twin is what a cross-engine contract can pin; the WRITE
  path should use repartitionByRange — one range exchange, no global
  sort).

Scale shape: the key is computed per row in the scan stage; the only
wide operation is the range exchange (or the contract twin's global
ntile window — which orders by a 32-bit integer, the cheapest possible
sort key). Bucket stats collapse to nbuckets rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_buckets"]


def zorder_key(k1: Column, k2: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer keys: bit i of k1 lands at position 2i+1, bit i of k2 at
    position 2i. Keys are clamped to the bit budget first (values above
    2^bits-1 saturate — the top of the curve, preserving order at the
    clamp boundary). Pure JVM shifts/masks, whole-stage-codegen
    friendly."""
    bits = int(bits)
    cap = F.lit((1 << bits) - 1)
    a = F.least(F.greatest(k1.cast("long"), F.lit(0)), cap)
    b = F.least(F.greatest(k2.cast("long"), F.lit(0)), cap)
    terms = [
        F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        .bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        for i in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), terms).alias("zval")


def zorder_buckets(
    df: DataFrame,
    id_col: str,
    k1: Column,
    k2: Column,
    nbuckets: int = 16,
    bits: int = 16,
) -> DataFrame:
    """(id, zval, bucket): each row's Morton key and its z-order file
    bucket (ntile over z, ties broken by id — deterministic). This is
    the CONTRACT twin of the write-path layout job; see module
    docstring for why the deployment path is repartitionByRange on the
    same key instead of this window."""
    z = zorder_key(k1, k2, bits=bits)
    w = Window.orderBy(F.asc("zval"), F.asc(F.col(id_col)))
    return df.select(F.col(id_col), z).withColumn(
        "bucket", F.ntile(int(nbuckets)).over(w).cast("long")
    )
