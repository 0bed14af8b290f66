"""Incremental marker-based interval identification
(``applyInPandasWithState``) — the streaming variant of the batch
``IntervalIdentifier`` for its default config (last start → first end,
enumerated).

Per-group state machine:

- a start marker opens (or, on repeat, *re-opens* — last-start
  semantics) a candidate interval; rows since the candidate start are
  buffered because their ids are unknowable until the interval resolves;
- an end marker resolves the open interval: the buffer (plus the end
  row) is emitted with the next interval number;
- a repeated start resolves the previous buffer as invalid (0);
- noise outside any open interval is emitted immediately with id 0.

Rows of an unresolved trailing interval remain in state — exactly the
rows whose ids a batch run could still change with more data. This is
the honest streaming contract: emitted rows are **final** (append
mode), so nothing is emitted that later data could retract.

Constraints (documented, asserted nowhere): events must arrive in
per-group event-time order across micro-batches (e.g. a log shipper per
user); within a batch they are sorted. Buffered state is bounded by the
longest unresolved interval.

State is carried as (counter, JSON-encoded buffer) — buffers are small
(one open interval) and the Arrow transfer stays batched.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_identify_intervals(
    marker_column: str,
    marker_start: Any,
    marker_end: Any,
    groupby_column: str,
    ts_column: str,
    target_column_name: str = "iids",
) -> Callable[[DataFrame], DataFrame]:
    """Streaming interval ids. Output schema: (group, ts, marker,
    iids) — emitted only once resolved (append semantics)."""

    state_schema = T.StructType(
        [
            T.StructField("counter", T.LongType()),
            T.StructField("buffer", T.StringType()),
        ]
    )

    def _transform(sdf: DataFrame) -> DataFrame:
        out_schema = T.StructType(
            [
                sdf.schema[groupby_column],
                sdf.schema[ts_column],
                sdf.schema[marker_column],
                T.StructField(target_column_name, T.LongType()),
            ]
        )
        group_f, ts_f, marker_f = (
            groupby_column,
            ts_column,
            marker_column,
        )

        def process(
            key: Tuple,
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            counter, buffer = 0, []
            if state.exists:
                counter, buf_json = state.get
                buffer = json.loads(buf_json)

            out_rows = []

            def emit(ts_us: int, marker: Any, iid: int) -> None:
                out_rows.append((key[0], ts_us, marker, iid))

            for pdf in pdfs:
                pdf = pdf.sort_values(ts_f)
                ts_us = (
                    pdf[ts_f].astype("datetime64[us]").astype("int64")
                )
                for ts_val, marker in zip(ts_us, pdf[marker_f]):
                    marker = None if pd.isna(marker) else marker
                    if marker == marker_start:
                        for b_ts, b_m in buffer:  # previous candidate dies
                            emit(b_ts, b_m, 0)
                        buffer = [(int(ts_val), marker)]
                    elif marker == marker_end:
                        if buffer:
                            counter += 1
                            for b_ts, b_m in buffer:
                                emit(b_ts, b_m, counter)
                            emit(int(ts_val), marker, counter)
                            buffer = []
                        else:
                            emit(int(ts_val), marker, 0)
                    else:  # noise
                        if buffer:
                            buffer.append((int(ts_val), marker))
                        else:
                            emit(int(ts_val), marker, 0)

            state.update((counter, json.dumps(buffer)))
            if out_rows:
                out = pd.DataFrame(
                    out_rows,
                    columns=[group_f, ts_f, marker_f, target_column_name],
                )
                out[ts_f] = out[ts_f].astype("datetime64[us]")
                yield out

        return (
            sdf.select(group_f, ts_f, marker_f)
            .groupBy(group_f)
            .applyInPandasWithState(
                process,
                outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    return _transform
