"""Custom stateful streaming operator: per-conversation progress tracking via
applyInPandasWithState.

The batch pipeline's per-conv aggregates (aggregate.sink_summary per_conv) have
a streaming twin with watermarked windows (streaming/pipeline.py); this module
is the *arbitrary-state* variant — the Spark surface for operators whose state
outlives any window: running per-conversation record/claim totals that update
every micro-batch (the streaming analog of the reference accumulating
per-conversation pipeline usage, /root/reference/factcheck/utils/data_class.py:7-20).

State per conv_id: (n_records, n_claims, n_checkworthy). Each micro-batch emits
the updated totals for every conversation it touched (outputMode=update).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "n_records long, n_claims long, n_checkworthy long"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_claims", T.LongType(), False),
        T.StructField("n_checkworthy", T.LongType(), False),
    ]
)


def _update_conv(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n_records, n_claims, n_checkworthy = (
        state.get if state.exists else (0, 0, 0)
    )
    for pdf in pdfs:
        n_records += len(pdf)
        is_claim = pdf["record_kind"] == "claim"
        n_claims += int(is_claim.sum())
        n_checkworthy += int((is_claim & pdf["checkworthy"].fillna(False)).sum())
    state.update((n_records, n_claims, n_checkworthy))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_records": n_records,
                "n_claims": n_claims,
                "n_checkworthy": n_checkworthy,
            }
        ]
    )


def conv_progress(routed_stream: DataFrame) -> DataFrame:
    """routed (stream) -> running per-conversation totals, one row per touched
    conversation per micro-batch. State is partitioned by conv_id, so scale-out
    is the shuffle on conv_id; a mega-conversation is one hot key — upstream
    salting (operators/skew.py) applies if per-conv emission can be sharded."""
    return (
        routed_stream.select("conv_id", "record_kind", "checkworthy")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
