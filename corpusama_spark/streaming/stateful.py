"""Custom stateful streaming operator: cross-batch exact dedup.

The batch dedup family (operators/dedup.py) answers "which rows duplicate
each other" within one table; a CONTINUOUSLY INGESTED corpus needs the
streaming form — "has this text ever been seen before, across all previous
micro-batches and job restarts". That is per-key mutable state, which
Structured Streaming expresses as ``applyInPandasWithState``: rows group by
content hash, each group's state holds (canonical id, seen count), and the
state store persists in the stream checkpoint — a restarted job keeps its
memory of every hash it has ever admitted (S2's resumability contract
extended to dedup).

Scale shape: state is ~40 bytes per DISTINCT document, keyed by the same
hash the shuffle uses, so the state store partitions with the exchange and
grows with corpus cardinality, not stream length. The hash is computed
JVM-side (md5) before the stateful exchange; only (hash, id) pairs shuffle,
never text or image bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "text_hash string, image_id string, is_first boolean, dupe_of string"
)
STATE_SCHEMA = "canonical string, n long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        canonical, n = state.get
    else:
        canonical, n = None, 0
    rows = []
    for pdf in pdfs:
        # deterministic admission order within a batch
        for image_id in pdf.sort_values("image_id")["image_id"]:
            if canonical is None:
                canonical = image_id
                rows.append((key[0], image_id, True, None))
            else:
                rows.append((key[0], image_id, False, canonical))
            n += 1
    state.update((canonical, n))
    yield pd.DataFrame(
        rows, columns=["text_hash", "image_id", "is_first", "dupe_of"]
    )


NEAR_OUTPUT_SCHEMA = (
    "band int, band_key long, id string, match_id string, hamming int"
)
NEAR_STATE_SCHEMA = "ids array<string>, codes array<long>"


def _near_dedup_fn(hamming_k: int, max_state: int):
    import numpy as np

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, codes = list(state.get[0]), list(state.get[1])
        else:
            ids, codes = [], []
        stored = np.array(codes, dtype=np.int64).astype(np.uint64)
        rows = []
        for pdf in pdfs:
            batch = sorted(
                zip(pdf["id"], pdf["code"]), key=lambda t: str(t[0])
            )
            for id_, code in batch:
                code_u = np.uint64(np.int64(int(code)))
                match, mh = None, None
                if len(stored):
                    x = np.bitwise_xor(stored, code_u)
                    pc = (
                        np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
                        .sum(axis=1)
                        .astype(int)
                    )
                    i = int(pc.argmin())
                    if pc[i] <= hamming_k:
                        match, mh = ids[i], int(pc[i])
                rows.append((int(key[0]), int(key[1]), id_, match, mh))
                if len(ids) < max_state:
                    ids.append(id_)
                    codes.append(int(code))
                    stored = np.append(stored, code_u)
        state.update((ids, codes))
        yield pd.DataFrame(
            rows, columns=["band", "band_key", "id", "match_id", "hamming"]
        )

    return fn


def streaming_near_dedup(
    stream: DataFrame,
    text_col: str = "caption",
    id_col: str = "image_id",
    bands: int = 4,
    hamming_k: int = 3,
    max_state: int = 1024,
) -> DataFrame:
    """Cross-batch NEAR-duplicate detection: banded simhash state.

    Composes the batch hamming-band kernel (operators/dedup.py
    hamming_band_pairs) with the streaming state model above: each row's
    64-bit simhash splits into ``bands`` 16-bit band keys (JVM shift+mask,
    computed BEFORE the stateful exchange — only (band_key, id, code)
    shuffles, never text); state per (band, band_key) bucket holds the ids
    and codes seen so far, and each arriving row reports its closest stored
    code when within ``hamming_k``. For k < bands the banding is
    pigeonhole-complete, so a row emits a match in AT LEAST one band
    whenever a near-dup was ever admitted — across micro-batches and job
    restarts (state lives in the stream checkpoint). Downstream, a per-id
    any-band reduction gives the keep/drop decision (foreachBatch or a
    second aggregation stage).

    Scale shape: state is (id + 8-byte code) x distinct codes per bucket,
    capped at ``max_state`` per bucket (the flood guard — beyond the cap a
    boilerplate bucket stops ADMITTING new codes but keeps matching
    against the stored ones, the same bounded-recall tradeoff as the batch
    max_bucket guard). The per-row match is one vectorized xor+popcount
    over the bucket's stored codes.
    """
    from corpusama_spark.operators.dedup import simhash_codes

    band_bits = 64 // bands
    mask = (1 << band_bits) - 1
    codes = simhash_codes(stream, text_col, id_col).select(
        F.col(id_col).cast("string").alias("id"), F.col("sim").alias("code")
    )
    banded = codes.select(
        "id",
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("code", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("id", "code", F.col("_b.band").alias("band"), F.col("_b.band_key").alias("band_key"))
    return banded.groupBy("band", "band_key").applyInPandasWithState(
        _near_dedup_fn(hamming_k, max_state),
        outputStructType=NEAR_OUTPUT_SCHEMA,
        stateStructType=NEAR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STATE_TTL_SCHEMA = "canonical string, n long, last_ms long"


def _dedup_fn_ttl(ttl_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import time

        now_ms = int(time.time() * 1000)
        canonical, n = None, 0
        if state.exists:
            canonical, n, last_ms = state.get
            if now_ms - last_ms > ttl_ms:
                canonical, n = None, 0  # lazily expire: first-seen again
        rows = []
        for pdf in pdfs:
            for image_id in pdf.sort_values("image_id")["image_id"]:
                if canonical is None:
                    canonical = image_id
                    rows.append((key[0], image_id, True, None))
                else:
                    rows.append((key[0], image_id, False, canonical))
                n += 1
        state.update((canonical, n, now_ms))
        yield pd.DataFrame(
            rows, columns=["text_hash", "image_id", "is_first", "dupe_of"]
        )

    return fn


def streaming_dedup(
    stream: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    ttl_minutes: float | None = None,
) -> DataFrame:
    """first-seen/duplicate decision per row, stateful across batches AND
    restarts (state lives in the stream checkpoint).

    ``ttl_minutes=None`` (default): state is permanent — corpus dedup
    remembers every hash forever, growing with corpus CARDINALITY.
    ``ttl_minutes=N``: bounded-window dedup — a hash whose last occurrence
    is older than N minutes counts as never-seen again (the TTL slides on
    every new occurrence). Expiry is LAZY: the timestamp lives in the
    state row and is checked when the hash recurs, so the semantics hold
    deterministically with NoTimeout. (ProcessingTimeTimeout sweeps would
    also reclaim idle state storage, but this Spark build spins empty
    micro-batches when a processing-time timeout is pending under
    Trigger.AvailableNow — measured to a StackOverflowError — so storage
    reclamation of idle keys is left to an offline state-store compaction.)
    Use the TTL form for feeds where only recent repeats matter (scraper
    retry storms, mirror bursts), permanent for training-corpus admission."""
    hashed = stream.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("text_hash"),
        F.col(id_col).alias("image_id"),
    )
    if ttl_minutes is None:
        return hashed.groupBy("text_hash").applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn_ttl(int(ttl_minutes * 60_000)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_TTL_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
