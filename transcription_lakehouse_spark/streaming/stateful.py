"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window`` (streaming/ingest.py) covers gap-based sessionization
declaratively, but the reference's span semantics (W2,
`/root/reference/src/lakehouse/aggregation/spans.py:113-249`) break a span
on speaker change OR time gap and carry running aggregates — the shape that
needs an explicit per-key state machine once it must run continuously over
a stream. This module is that state machine: per ``(episode_id, speaker)``
key, utterances accumulate into an open span held in GroupState; a gap
larger than ``gap_sec`` closes the span and emits it downstream.

Scale properties: state is O(open spans) = O(active keys), not O(rows);
keys shard across executors by groupBy hash; ``ProcessingTimeTimeout``
flushes idle keys so state cannot grow without bound on a 1000-executor
cluster ingesting indefinitely.

Late-data semantics: rows are sorted within each micro-batch, and a row
older than the OPEN span merges into it (start/end expand, no corruption);
a row arriving after its span already CLOSED starts a new span instead —
the batch pipeline (operators/sessionization.py) over the same rows is the
exact-answer backfill for that case.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["stateful_sessionize", "SESSION_OUTPUT_SCHEMA"]

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("episode_id", StringType()),
        StructField("speaker", StringType()),
        StructField("session_start", DoubleType()),
        StructField("session_end", DoubleType()),
        StructField("n_utterances", LongType()),
    ]
)

# open-span state carried between micro-batches
_STATE_SCHEMA = StructType(
    [
        StructField("start", DoubleType()),
        StructField("end", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _make_session_fn(gap_sec: float, idle_timeout_ms: int | None):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        episode_id, speaker = key

        if state.hasTimedOut:
            # idle key: flush the open span and drop the state
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "episode_id": [episode_id],
                    "speaker": [speaker],
                    "session_start": [start],
                    "session_end": [end],
                    "n_utterances": [n],
                }
            )
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["start", "end"], kind="mergesort"
        )
        if state.exists:
            cur_start, cur_end, cur_n = state.get
        else:
            cur_start = cur_end = None  # type: ignore[assignment]
            cur_n = 0

        closed_start, closed_end, closed_n = [], [], []
        for row in batch.itertuples(index=False):
            s, e = float(row.start), float(row.end)
            if cur_start is None:
                cur_start, cur_end, cur_n = s, e, 1
            elif s - cur_end > gap_sec:
                closed_start.append(cur_start)
                closed_end.append(cur_end)
                closed_n.append(cur_n)
                cur_start, cur_end, cur_n = s, e, 1
            else:
                # a cross-batch late row can start BEFORE the open span
                # (batches sort locally, not globally) — expand both ends
                cur_start = min(cur_start, s)
                cur_end = max(cur_end, e)
                cur_n += 1

        state.update((cur_start, cur_end, cur_n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if closed_start:
            yield pd.DataFrame(
                {
                    "episode_id": [episode_id] * len(closed_start),
                    "speaker": [speaker] * len(closed_start),
                    "session_start": closed_start,
                    "session_end": closed_end,
                    "n_utterances": closed_n,
                }
            )

    return fn


def stateful_sessionize(
    stream: DataFrame,
    gap_sec: float = 0.5,
    idle_timeout_ms: int | None = 30_000,
) -> DataFrame:
    """W2's continuous twin: per-(episode, speaker) gap sessionization with
    explicit carried state. `stream` must have columns
    (episode_id, speaker, start, end); returns a streaming DataFrame of
    CLOSED spans.

    With the default idle timeout, open spans flush once a key goes quiet
    (bounds state on a continuous cluster run; note that an availableNow
    drain then keeps scheduling micro-batches until pending timeouts fire).
    ``idle_timeout_ms=None`` disables the timeout — closure happens only
    via gap arrival, which is the deterministic mode batch-style tests and
    bounded replays want."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.select("episode_id", "speaker", "start", "end")
        .groupBy("episode_id", "speaker")
        .applyInPandasWithState(
            _make_session_fn(gap_sec, idle_timeout_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
