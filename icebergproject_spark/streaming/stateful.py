"""Custom stateful streaming operator: gap-based session aggregation.

The reference's only keyed state is a create-once flag
(dim/DimDataToHBase.scala:48,67-74 — SURVEY §2.8 T5); it has no session
operator. This is the general-purpose replacement pattern: Arrow-batched
``applyInPandasWithState`` keeps one open session per key across
micro-batches and emits a session row the moment a gap closes it.

Scale shape: state is O(1) per key (three longs), grouped state is hash-
partitioned on the key — the same shuffle a streaming aggregate pays; no
additional exchanges. Batch-mode sessionization (operators/temporal.py)
answers the historical query; this operator answers the live one.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", LongType()),  # epoch seconds
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_STATE = StructType(
    [
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("cnt", LongType()),
    ]
)


def _session_fn(gap_seconds: int, use_timeout: bool):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[Any, int, int, int]] = []
        k = key[0]
        if use_timeout and state.hasTimedOut:
            # idle key: flush the open session and drop the state
            start, end, cnt = state.get
            closed.append((k, start, end, cnt))
            state.remove()
        else:
            ts_all = (
                pd.concat([p["ts"] for p in pdfs]).sort_values().astype("int64")
            )
            start, end, cnt = state.get if state.exists else (None, None, 0)
            for t in ts_all:
                t = int(t)
                if start is None:
                    start, end, cnt = t, t, 1
                elif t - end > gap_seconds:
                    closed.append((k, start, end, cnt))
                    start, end, cnt = t, t, 1
                else:
                    end, cnt = t, cnt + 1
            state.update((start, end, cnt))
            if use_timeout:
                # close the open session automatically after one idle gap
                state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            closed, columns=["key", "session_start", "session_end", "n_events"]
        )

    return fn


def sessionize_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    idle_timeout: bool = False,
) -> DataFrame:
    """Streaming gap sessionization: emits one row per CLOSED session
    (key, session_start, session_end, n_events; epoch seconds).

    An open session closes when a later event of the same key arrives
    past the gap — or, with ``idle_timeout=True``, when the key stays
    idle for one gap (processing-time timeout). Leave the timeout OFF
    for bounded replays: a pending processing-time timeout keeps
    scheduling micro-batches, so a ``trigger(availableNow=True)`` query
    would never terminate; open sessions simply stay in state. Turn it
    ON for continuous deployments so idle keys flush and release state.

    Input needs ``key_col`` (string-castable) and ``ts_col`` (timestamp);
    out-of-order rows within a batch are sorted, late rows across batches
    extend the open session if within gap.
    """
    import pyspark.sql.functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.unix_timestamp(F.col(ts_col)).alias("ts"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _session_fn(gap_seconds, idle_timeout),
        outputStructType=SESSION_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


# --- transformWithState: streaming exact dedup with state TTL --------------
#
# The Spark 4 StatefulProcessor API (transformWithStateInPandas) is the
# successor to applyInPandasWithState: typed named state, per-state TTL,
# timers. Used here for the LLM-ingest shape applyInPandasWithState can't
# express cleanly: EXACT streaming dedup whose per-key state expires after
# a TTL — dropDuplicates needs a watermark column and unbounded state
# otherwise; TTL'd value state is the production pattern for "dedup
# against the recent past with bounded state".

try:  # pragma: no cover - import surface differs across minor versions
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    # the state-server protocol between the Python worker and the JVM is
    # protobuf-framed; without google.protobuf the driver worker crashes
    # at init (observed in-env), so gate on BOTH imports
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False

DEDUP_OUTPUT = StructType(
    [
        StructField("digest", StringType()),
        StructField("doc_id", LongType()),
    ]
)


class SeenDigestProcessor(StatefulProcessor):
    """Keyed by content digest: the FIRST document bearing a digest is
    emitted as the survivor; later arrivals (same batch or later batches)
    are dropped while the digest stays in state.  ``ttl_ms`` bounds state:
    a digest IDLE past the TTL is forgotten and its next arrival survives
    again — the deliberate accuracy/state tradeoff.  Idle means no
    arrivals at all: duplicates re-write the state value, which resets
    the TTL clock, so a continuously-arriving digest never expires."""

    def __init__(self, ttl_ms: int | None = None):
        self.ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._seen = handle.getValueState(
            "seen", "first_id long", ttlDurationMs=self.ttl_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            # refresh the TTL clock: state TTL runs from the last WRITE,
            # so re-writing the surviving id keeps an actively-duplicated
            # digest alive (only truly idle digests expire)
            self._seen.update(tuple(self._seen.get()))
            return
        best = None
        for pdf in rows:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is not None:
            self._seen.update((best,))
            yield pd.DataFrame({"digest": [key[0]], "doc_id": [best]})

    def close(self) -> None:
        pass


def dedup_stream_ttl(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    ttl_ms: int | None = 24 * 3600 * 1000,
) -> DataFrame:
    """Streaming exact dedup via content digest with TTL'd state: emits
    (digest, doc_id) survivors; duplicates within the TTL horizon are
    dropped. State is one long per live digest, hash-partitioned on the
    digest — the same shuffle a streaming aggregate pays."""
    import pyspark.sql.functions as F

    prepared = docs.select(
        F.sha2(F.col(content_col).cast("binary"), 256).alias("digest"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return prepared.groupBy("digest").transformWithStateInPandas(
        SeenDigestProcessor(ttl_ms),
        outputStructType=DEDUP_OUTPUT,
        outputMode="append",
        timeMode="ProcessingTime",
    )
