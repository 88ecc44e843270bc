"""Custom connector via the Spark 4 Python DataSource API: a
deterministic synthetic-events source with partition planning, filter
pushdown, and a replayable streaming reader.

The reference ingests only fixed CSV drops (SURVEY §2.1); a complete
engine needs a connector SPI for everything else. This is the idiomatic
PySpark extension point (``spark.dataSource.register`` +
``spark.read.format("synth_events")``) — the same API a user would use
to wrap an internal REST feed or message queue.

Row content is pure md5 arithmetic on the GLOBAL row index, so:

- rows are identical under any partitioning (partition count is a
  parallelism knob, not a semantics knob),
- a batch read, a streaming read, and a DuckDB SQL replay
  (``generate_series`` + the same md5 slices — see
  registry_sinks.synth_source_rollup's oracle) all produce the same
  table — the connector is hard-verifiable cross-engine,
- the stream's ``readBetweenOffsets`` replay is exact, which is what
  checkpoint recovery requires from a source.

Filter pushdown (``pushFilters``): equality on ``event_type`` is
consumed generator-side (rows are never materialized), everything else
is left for Spark to evaluate — the contract a JDBC/REST source follows.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_BASE_TS = datetime(2024, 1, 1)
_N_USERS = 1000


def synth_row(i: int) -> tuple:
    """Row ``i`` of the synthetic event table — pure md5 arithmetic, no
    RNG state, so any subrange can be produced independently (the
    property partition reads and offset replays both rely on)."""
    hx = hashlib.md5(f"synth|{i}".encode()).hexdigest()
    h = int(hx[:15], 16)
    user_id = h % _N_USERS
    event_type = EVENT_TYPES[int(hx[15:17], 16) % len(EVENT_TYPES)]
    value = (int(hx[17:21], 16) % 10000) / 100.0
    ts = _BASE_TS + timedelta(seconds=h % 86400)
    return (i, ts, user_id, event_type, value)


def synth_rows(start: int, end: int, event_type: str | None = None) -> Iterator[tuple]:
    for i in range(start, end):
        row = synth_row(i)
        if event_type is not None and row[3] != event_type:
            continue
        yield row


class _SynthPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        # option keys arrive lowercased
        self.n_partitions = int(options.get("numpartitions", 4))
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))
        self.event_type: str | None = None

    def pushFilters(self, filters):  # noqa: N802 (API name)
        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and isinstance(f.value, str)
            ):
                self.event_type = f.value
            elif isinstance(f, IsNotNull):
                # the generator never emits NULLs in any column, so the
                # implied not-null guard Spark derives from an equality
                # is a no-op here — consume it (leaves a Filter-free plan)
                pass
            else:
                remaining.append(f)
        return remaining

    def partitions(self):
        n = self.rows_per_partition
        return [_SynthPartition(p * n, (p + 1) * n) for p in range(self.n_partitions)]

    def read(self, partition: _SynthPartition):
        # round 15 (guide §4): yield ONE Arrow record batch per
        # partition instead of per-row tuples — the Python DataSource
        # API passes RecordBatches through Arrow directly, skipping the
        # per-row pickle + row-to-columnar conversion that dominated the
        # tuple path (the md5 arithmetic itself is unchanged).
        import pyarrow as pa

        rows = list(synth_rows(partition.start, partition.end, self.event_type))
        cols = list(zip(*rows)) if rows else ([], [], [], [], [])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], type=pa.int64()),
                pa.array(cols[1], type=pa.timestamp("us")),
                pa.array(cols[2], type=pa.int64()),
                pa.array(cols[3], type=pa.string()),
                pa.array(cols[4], type=pa.float64()),
            ],
            names=["event_id", "ts", "user_id", "event_type", "value"],
        )


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset = next global row index. ``read`` advances by
    ``batchsize`` rows per micro-batch; ``readBetweenOffsets`` replays
    any committed range exactly (same closed-form rows), which is what
    makes checkpoint recovery deterministic."""

    def __init__(self, options: dict):
        self.batch = int(options.get("batchsize", 500))

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"next": 0}

    def read(self, start: dict):
        s = int(start["next"])
        e = s + self.batch
        # a LIST, not a generator: the engine's prefetch cache shallow-
        # copies the returned iterator (generators aren't copyable), and
        # a micro-batch is bounded anyway
        return list(synth_rows(s, e)), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return list(synth_rows(int(start["next"]), int(end["next"])))


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthEventsStreamReader:  # noqa: N802
        return SynthEventsStreamReader(self.options)


def register_synth_source(spark) -> None:
    """Idempotent registration of the connector on a session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime-
    settable): a reader that implements ``pushFilters`` FAILS planning
    outright when the conf is off, so a session the engine didn't build
    (e.g. an external harness) must get it here, not only in
    session.py's defaults."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthEventsDataSource)
