"""Custom stateful streaming operators via ``applyInPandasWithState``.

Exemplar: streaming EMA. Per-series state is the last smoothed value; each
micro-batch folds its (ts-sorted) points into the state and emits the
smoothed rows. This is the pattern for any reference-style sequential
operator (counters, gap detection, session-ization) in a streaming setting:
state is O(1) per series, partitioned by series_id, checkpointed by Spark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("series_id", LongType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
        StructField("ema", DoubleType(), True),
    ]
)
EMA_STATE_SCHEMA = StructType([StructField("last_ema", DoubleType(), True)])


def streaming_ema(points_stream: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(series_id, ts, value, ema) with EMA state carried across micro-batches.

    Input: a *streaming* DataFrame with (series_id, ts, value). Rows within a
    batch are folded in ts order; cross-batch continuity comes from the
    stored state. (Out-of-order arrivals across batches are smoothed in
    arrival order — same contract as the reference, which has no late-data
    reordering.)
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "value"], kind="mergesort")
            emas = []
            for v in pdf["value"]:
                last = v if last is None else alpha * v + (1.0 - alpha) * last
                emas.append(last)
            out = pdf[["series_id", "ts", "value"]].copy()
            out["ema"] = emas
            yield out
        state.update((last,))

    return points_stream.groupBy("series_id").applyInPandasWithState(
        fold,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
