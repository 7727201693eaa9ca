"""Custom Python DataSource: the engine-native event-stream connector.

The reference's ingress is a WebSocket channel client
(channel_client.ex:98-157) — a custom transport Spark knows nothing
about. Spark 4's Python DataSource API is the sanctioned way to mount
such a transport as a first-class source: implement
``DataSource``/``DataSourceReader`` (batch) and
``DataSourceStreamReader`` (incremental with offsets), and every Spark
surface — SQL, DataFrame, Structured Streaming — can read it with
pushdown-free but fully partitioned scans.

This module ships a deterministic synthetic implementation
(``hivent_events``): rows derive from (partition, index) hash
arithmetic, so any cluster reading the same options sees identical
data — giving the connector shape real tests without a live socket.
A production transport would replace ``_gen_row`` with channel reads
and offsets with the server's cursor; everything else stays.

Usage::

    spark.dataSource.register(HiventEventsDataSource)
    df = (spark.read.format("hivent_events")
          .option("n_rows", 1000).option("n_partitions", 8).load())
    s = (spark.readStream.format("hivent_events")
         .option("total_rows", 500).option("rows_per_batch", 100).load())
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, partition_id int"
)

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_EPOCH = _dt.datetime(2024, 1, 1)


def _gen_row(i: int, partition_id: int):
    """Deterministic event from a global row index (splitmix-ish mix)."""
    h = (i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 31
    return (
        i,
        _EPOCH + _dt.timedelta(seconds=i * 7 + (h % 5)),
        h % 1000,
        _EVENT_TYPES[h % len(_EVENT_TYPES)],
        round((h % 100_000) / 100.0, 2),
        partition_id,
    )


class _RangePartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid = pid
        self.start = start
        self.end = end


class HiventEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self):
        per = -(-self.n_rows // self.n_partitions)  # ceil division
        return [
            _RangePartition(p, p * per, min((p + 1) * per, self.n_rows))
            for p in range(self.n_partitions)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _gen_row(i, partition.pid)


class HiventEventsStreamReader(DataSourceStreamReader):
    """Finite incremental stream: offsets advance ``rows_per_batch`` per
    trigger up to ``total_rows`` (a live transport would report the
    broker's cursor instead)."""

    def __init__(self, options):
        self.total_rows = int(options.get("total_rows", 500))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_partitions = int(options.get("n_partitions", 2))
        self._latest = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._latest = min(self._latest + self.rows_per_batch, self.total_rows)
        return {"offset": self._latest}

    def partitions(self, start, end):
        # After a checkpoint restart this reader is a fresh instance with
        # _latest=0, but Spark replays from the committed offset — fold
        # every offset Spark shows us back into _latest so latestOffset
        # never regresses below an already-committed position (end <
        # start violates the stream-reader offset contract).
        self._latest = max(self._latest, start["offset"], end["offset"])
        lo, hi = start["offset"], end["offset"]
        per = -(-(hi - lo) // self.n_partitions) if hi > lo else 0
        out = []
        for p in range(self.n_partitions):
            s = lo + p * per
            e = min(lo + (p + 1) * per, hi)
            if s < e:
                out.append(_RangePartition(p, s, e))
        return out

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _gen_row(i, partition.pid)

    def commit(self, end):
        self._latest = max(self._latest, end["offset"])


class HiventEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hivent_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> HiventEventsReader:
        return HiventEventsReader(self.options)

    def streamReader(self, schema) -> HiventEventsStreamReader:
        return HiventEventsStreamReader(self.options)


# ---------------------------------------------------------------------------
# Writer side: the connector's egress half, with the two-phase commit
# protocol every distributed sink needs — tasks stage their output and
# return commit messages; only the driver's commit() publishes, so a
# failed/speculated task can never leave partial data visible. (A real
# transport would push frames on write() and ack offsets on commit().)
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class HiventJsonSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hivent_sink requires .option('path', ...)")
        self.staging = _os.path.join(self.path, "_staging")

    def write(self, iterator) -> _StagedFile:
        """Executor-side: stage one JSON-lines file per partition."""
        _os.makedirs(self.staging, exist_ok=True)
        staged = _os.path.join(self.staging, f"{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged, n)

    def commit(self, messages) -> None:
        """Driver-side: atomically publish every staged file under a
        per-commit unique prefix, then version the manifest — so
        repeated ``.mode('append')`` writes coexist instead of the
        second commit clobbering the first's part files. Readers treat
        _MANIFEST presence as commit; its totals cover ALL commits."""
        commit_id = _uuid.uuid4().hex[:12]
        total = 0
        for i, m in enumerate(messages):
            final = _os.path.join(
                self.path, f"part-{commit_id}-{i:05d}.jsonl"
            )
            _os.replace(m.staged_path, final)
            total += m.n_rows
        manifest_path = _os.path.join(self.path, "_MANIFEST")
        manifest = {"commits": [], "n_files": 0, "n_rows": 0}
        if _os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = _json.load(f)
        manifest["commits"].append(
            {"id": commit_id, "n_files": len(messages), "n_rows": total}
        )
        manifest["n_files"] += len(messages)
        manifest["n_rows"] += total
        tmp = manifest_path + f".{commit_id}.tmp"
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        _os.replace(tmp, manifest_path)
        try:
            _os.rmdir(self.staging)
        except OSError:  # another in-flight commit still staging here
            pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.staged_path):
                _os.remove(m.staged_path)


class HiventJsonSinkDataSource(DataSource):
    """df.write.format('hivent_sink').option('path', d).mode('append').save()"""

    @classmethod
    def name(cls) -> str:
        return "hivent_sink"

    def writer(self, schema, overwrite: bool) -> HiventJsonSinkWriter:
        return HiventJsonSinkWriter(self.options)
