"""Streaming emitter: the producer path (Hivent.emit, R1) on Spark.

The reference emits one event at a time over a WebSocket and gets a
synchronous ack of the enriched event (emitter.ex:63-68, 96-100;
channel_client push_and_receive). On Spark the ingress is a directory
(or any streaming source) that consumers ``readStream`` from: ``emit``
enriches a batch of events (same projection as the server-side
enrichment, envelope.py) and appends it as parquet; the returned
DataFrame of enriched rows is the ack.

At scale the source directory becomes a Kafka topic / cloud-storage
prefix — the enrichment projection and partition-key derivation are
identical; only the sink format string changes.
"""

from __future__ import annotations

import json
from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from ex_hivent_spark.envelope import (
    DEFAULT_PARTITION_COUNT,
    enrich,
    validate_version,
)


class StreamEmitter:
    """Appends enriched event envelopes to an ingress directory."""

    def __init__(
        self,
        spark: SparkSession,
        ingress_dir: str,
        producer: str,
        partition_count: int = DEFAULT_PARTITION_COUNT,
    ):
        self.spark = spark
        self.ingress_dir = ingress_dir
        self.producer = producer
        self.partition_count = partition_count

    def emit(
        self,
        name: str,
        payload: Mapping[str, Any],
        version: int,
        cid: str | None = None,
        key: str | None = None,
    ) -> DataFrame:
        """Single-event convenience emit (validates version like
        emitter.ex:64); returns the enriched ack row(s)."""
        validate_version(version)
        return self.emit_batch(
            [
                {
                    "name": name,
                    "payload": json.dumps(payload, sort_keys=True),
                    "version": version,
                    "cid": cid,
                    "key": key,
                }
            ]
        )

    def emit_batch(self, events: Sequence[Mapping[str, Any]]) -> DataFrame:
        """Batch emit: enrich + append to the ingress dir; the enriched
        DataFrame is the ack (read back for exact stored form)."""
        df = self.spark.createDataFrame(
            [
                (
                    e["name"],
                    e["payload"],
                    int(e["version"]),
                    e.get("cid"),
                    e.get("key"),
                )
                for e in events
            ],
            "name string, payload string, version int, cid string, key string",
        )
        enriched = enrich(df, self.producer, self.partition_count)
        enriched.write.mode("append").parquet(self.ingress_dir)
        return enriched
