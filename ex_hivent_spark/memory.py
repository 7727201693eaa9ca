"""In-memory emitter/store — the test-harness seam of the engine,
mirroring ``Hivent.Memory`` (lib/support/memory.ex): emit with
enrichment defaults, then query the store as a DataFrame.

Reference semantics (citations per method): events append in insertion
order (memory.ex:50-52, ``cache ++ [value]``); ``emit`` defaults
``version||1, cid||uuid4, uuid=uuid4, created_at=now ISO8601``
(memory.ex:75-97); queries ``all/last/clear/empty?/include?``
(memory.ex:118-141).

The store itself is a driver-side list — exactly like the reference's
GenServer list; the *query surface* is Spark: ``df()`` materializes the
envelope DataFrame (EVENT_SCHEMA + ingest_seq), and ``include?``
compiles to a conjunctive filter. This is also how the engine swaps a
fake transport in tests, mirroring config-injected fake channel clients
(config/test.exs:14, emitter.ex:19).
"""

from __future__ import annotations

import datetime as _dt
import json
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ex_hivent_spark.envelope import (
    EVENT_SCHEMA,
    includes,
    validate_version,
)


@dataclass(frozen=True)
class Meta:
    name: str | None = None
    version: int | None = None
    producer: str | None = None
    cid: str | None = None
    uuid: str | None = None
    key: str | None = None
    created_at: _dt.datetime | None = None


@dataclass(frozen=True)
class Event:
    """The envelope (event.ex:25-33): name + JSON payload + meta."""

    name: str
    payload: Mapping[str, Any] = field(default_factory=dict)
    meta: Meta = field(default_factory=Meta)


_STORE_SCHEMA = T.StructType(
    [T.StructField("ingest_seq", T.LongType()), *EVENT_SCHEMA.fields]
)


class MemoryEmitter:
    """``Hivent.Memory`` twin: emit + query over a local event store."""

    def __init__(self, spark: SparkSession, producer: str = "memory_producer"):
        self.spark = spark
        self.producer = producer
        self._events: list[Event] = []

    # -- emit ----------------------------------------------------------
    def emit(
        self,
        name: str,
        payload: Mapping[str, Any],
        version: int | None = None,
        cid: str | None = None,
        key: str | None = None,
    ) -> Event:
        """Build the enriched envelope and append (memory.ex:75-97:
        defaults version||1, cid||uuid4, uuid4, now). Returns the stored
        event — the synchronous ack of Emitter.emit (emitter.ex:96-100).
        """
        version = validate_version(1 if version is None else version)
        # JSON round-trip: payload keys become strings (memory.ex:77,
        # consumer_test.exs:24).
        payload = json.loads(json.dumps(payload))
        meta = Meta(
            name=name,
            version=version,
            producer=self.producer,
            cid=cid or str(_uuid.uuid4()),
            uuid=str(_uuid.uuid4()),
            key=key,
            created_at=_dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
        )
        event = Event(name=name, payload=payload, meta=meta)
        self._events.append(event)
        return event

    # -- store as DataFrame -------------------------------------------
    def df(self) -> DataFrame:
        rows = [
            (
                seq,
                e.name,
                json.dumps(e.payload, sort_keys=True),
                (
                    e.meta.name,
                    e.meta.version,
                    e.meta.producer,
                    e.meta.cid,
                    e.meta.uuid,
                    e.meta.key,
                    e.meta.created_at,
                ),
            )
            for seq, e in enumerate(self._events)
        ]
        return self.spark.createDataFrame(rows, _STORE_SCHEMA)

    # -- query surface (memory.ex:118-141) ----------------------------
    def all(self) -> list[Event]:
        """All events in insertion order (memory.ex:118)."""
        return list(self._events)

    def last(self) -> Event | None:
        """Most recent event (memory.ex:123). The store is a driver-side
        list in insertion order — no Spark job needed (df() ordering by
        ingest_seq is itself covered in tests)."""
        return self._events[-1] if self._events else None

    def clear(self) -> None:
        """Reset the store (memory.ex:128)."""
        self._events.clear()

    def empty(self) -> bool:
        """count == 0 (memory.ex:133)."""
        return not self._events

    def include(
        self,
        payload: Mapping[str, Any] | None = None,
        meta: Mapping[str, Any] | None = None,
    ) -> bool:
        """Subset-match existence (memory.ex:139-141). Real payload
        matching — the reference's payload arm is vacuous (memory.ex:68);
        documented deviation."""
        if not self._events:
            return False
        return includes(self.df(), payload=payload, meta=meta)
