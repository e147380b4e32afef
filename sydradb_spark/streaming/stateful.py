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
        import math

        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "value"], kind="mergesort")
            emas = []
            for v in pdf["value"]:
                if v is None or math.isnan(float(v)):
                    # a null/NaN observation neither folds nor resets: one
                    # NaN in the recursion would poison the CHECKPOINTED
                    # state to NaN — every later ema silently NaN forever
                    # (r14 review; the same guard the Welford kernel got in
                    # r13, and the batch twin's contract: chunked.py's EMA
                    # recursion is defined over OBSERVED values only, null
                    # rows emit a null ema)
                    emas.append(None)
                    continue
                v = float(v)
                last = v if last is None else alpha * v + (1.0 - alpha) * last
                emas.append(last)
            out = pdf[["series_id", "ts", "value"]].copy()
            # nullable Float64: None must reach Spark as NULL, not NaN —
            # a float64 ndarray would silently turn None into NaN
            out["ema"] = pd.array(emas, dtype="Float64")
            yield out
        state.update((last,))

    return points_stream.groupBy("series_id").applyInPandasWithState(
        fold,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("series_id", LongType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
        StructField("zscore", DoubleType(), True),
        StructField("n_seen", LongType(), False),
    ]
)
ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("mean", DoubleType(), True),
        StructField("m2", DoubleType(), True),
    ]
)


def streaming_anomalies(
    points_stream: DataFrame,
    threshold: float = 3.0,
    min_points: int = 10,
) -> DataFrame:
    """Online per-series anomaly detection: emit points whose value is more
    than ``threshold`` standard deviations from the series' RUNNING mean —
    Welford's algorithm carried in checkpointed state (O(1) doubles per
    series), the streaming twin of `timeseries.anomalies_zscore`.

    Each point is scored against the state BEFORE it is folded in (a spike
    must not dilute the baseline it is judged by), and the first
    ``min_points`` per series only warm the state (no stable baseline to
    score against yet). State survives restarts via the checkpoint, like
    the EMA exemplar above.
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "value"], kind="mergesort")
            rows = []
            for ts, v in zip(pdf["ts"], pdf["value"]):
                v = float(v)
                if math.isnan(v):
                    # a null/NaN reading must neither be scored nor folded:
                    # one NaN in the Welford update would poison mean/m2 to
                    # NaN in CHECKPOINTED state, silently disabling the
                    # series' monitoring forever (the batch twin's avg/
                    # stddev skip nulls — keep the twins aligned)
                    continue
                if n >= min_points and m2 > 0:
                    sd = math.sqrt(m2 / n)  # population variance of seen points
                    z = (v - mean) / sd if sd > 0 else 0.0
                    if abs(z) > threshold:
                        # RAW z, not round(z, 6) (r14, caught by the sf10
                        # oracle gate): pre-rounding in the kernel put a
                        # second rounding stage in front of the contract's
                        # r6 stabilizer — python round (banker's) vs the
                        # oracle's single r6 of the raw value flipped the
                        # last digit on boundary z's. Rounding is the
                        # presentation layer's job, one stage, both sides.
                        rows.append((int(key[0]), int(ts), v, z, n))
                # Welford update (after scoring)
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
            if rows:
                yield pd.DataFrame(
                    rows, columns=["series_id", "ts", "value", "zscore", "n_seen"]
                )
        state.update((n, mean, m2))

    return points_stream.groupBy("series_id").applyInPandasWithState(
        fold,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
