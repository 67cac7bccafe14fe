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


def streaming_dedup(
    stream: DataFrame, id_col: str = "image_id", text_col: str = "caption"
) -> DataFrame:
    """first-seen/duplicate decision per row, stateful across batches AND
    restarts (state lives in the stream checkpoint). No timeout: corpus
    dedup state is permanent by design; pass a TTL'd variant for
    bounded-window dedup."""
    hashed = stream.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("text_hash"),
        F.col(id_col).alias("image_id"),
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
