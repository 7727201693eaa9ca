"""Streaming consumer: topic subscription + per-event processing +
quarantine, on Structured Streaming.

Reference lifecycle (lib/hivent/consumer.ex):
- subscribe: join channel ``event:<topic>`` with ``partition_count``
  (consumer.ex:105-107) → here: ``readStream`` + ``filter(name == topic)``
  + ``repartition(partition_count, meta.key)``.
- process: user ``process/1`` callback per event (consumer.ex:25, 68-81);
  ``:ok`` → done, ``{:error, reason}`` → quarantine the ``{event, queue}``
  pair (consumer.ex:98-100).
- consumer identity: ``service`` is the consumer group → one streaming
  query + checkpoint dir per service; queue name = ``service:partition``
  (the (service, partition) claim of the Redis backend).
- delivery: the reference is at-least-once with no success ack
  (consumer.ex:75-77); checkpointed ``foreachBatch`` upgrades sink writes
  to effectively-once — documented deviation (SURVEY.md §3.2).
- restart: bounded reconnect attempts with linearly growing backoff
  (consumer.ex:110-127, emitter.ex:113-139) → ``run_with_restarts``.

Processing supports two callback shapes:
- an *expression* (Column → error-message-or-null): the fast path, stays
  in codegen — use whenever the check is expressible;
- a *Python callable* ``(event_dict) -> None | str``: the literal
  ``process/1`` semantics, applied via a UDF (the slow path, as in the
  reference where every event crosses into user code).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ex_hivent_spark.envelope import DEFAULT_PARTITION_COUNT, EVENT_SCHEMA

INGRESS_SCHEMA = T.StructType(
    [*EVENT_SCHEMA.fields, T.StructField("partition_id", T.IntegerType())]
)

ProcessFn = Callable[[Mapping[str, Any]], "None | str"]


def _error_column(process: "Column | ProcessFn") -> Column:
    if isinstance(process, Column):
        return process

    @F.udf("string")
    def _proc_udf(name, payload, version, uuid):
        try:
            result = process(
                {"name": name, "payload": payload, "version": version, "uuid": uuid}
            )
            return None if result is None else str(result)
        except Exception as ex:  # the reference quarantines on {:error, _}
            return str(ex)

    return _proc_udf(
        F.col("name"), F.col("payload"), F.col("meta.version"), F.col("meta.uuid")
    )


@dataclass
class Consumer:
    """One consumer group (``service``) over one topic."""

    spark: SparkSession
    source_dir: str
    service: str
    topic: str
    process: "Column | ProcessFn"
    checkpoint_dir: str
    processed_dir: str
    quarantine_dir: str
    partition_count: int = DEFAULT_PARTITION_COUNT

    def _stream(self) -> DataFrame:
        raw = (
            self.spark.readStream.schema(INGRESS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.source_dir)
        )
        return raw.filter(F.col("name") == F.lit(self.topic)).repartition(
            self.partition_count, F.col("meta.key")
        )

    def _handle_batch(self, batch: DataFrame, batch_id: int) -> None:
        evaluated = batch.withColumn("error", _error_column(self.process)).withColumn(
            "queue",
            F.concat_ws(":", F.lit(self.service), F.col("partition_id").cast("string")),
        )
        # Single evaluation per row, two filtered writes (the reference's
        # ok/quarantine split, consumer.ex:71-81). localCheckpoint
        # materializes the batch once so a non-deterministic/stateful
        # process callback cannot see a row twice across the two writes
        # (costs one in-memory copy of the micro-batch — bounded by
        # maxFilesPerTrigger).
        evaluated = evaluated.localCheckpoint(eager=True)
        ok = evaluated.filter(F.col("error").isNull()).drop("error")
        failed = evaluated.filter(F.col("error").isNotNull()).withColumn(
            "quarantined_at", F.current_timestamp()
        )
        # Idempotent replay: each write targets a batch_id-keyed partition
        # directory with overwrite. If the stream crashes between the two
        # writes (or before the checkpoint commits), the replayed batch
        # overwrites the same directories instead of appending duplicates
        # — this is what upgrades the source's at-least-once delivery to
        # effectively-once *sink contents*.
        ok.write.mode("overwrite").parquet(
            f"{self.processed_dir}/batch_id={batch_id}"
        )
        failed.write.mode("overwrite").parquet(
            f"{self.quarantine_dir}/batch_id={batch_id}"
        )

    def start(self) -> StreamingQuery:
        return (
            self._stream()
            .writeStream.foreachBatch(self._handle_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )

    def run_available(self) -> None:
        """Process everything currently in the source, then stop —
        the batch-ish drain used by tests and catch-up jobs."""
        q = self.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)


@dataclass
class Subscription:
    """One subscriber's slice of a multiplexed stream: the topic
    filter + process callback + its own sinks (the per-subscription
    {matcher, mapper, callback} triple of the reference's channel
    client, /root/reference/lib/hivent/phoenix/channel_client.ex:363-390)."""

    service: str
    topic: str
    process: "Column | ProcessFn"
    processed_dir: str
    quarantine_dir: str
    partition_count: int = DEFAULT_PARTITION_COUNT


def route(
    spark: SparkSession,
    source_dir: str,
    subscriptions: list[Subscription],
    checkpoint_dir: str,
) -> StreamingQuery:
    """One-pass multi-subscriber dispatch: ONE readStream feeds every
    subscription through a single foreachBatch — the reference's single
    socket fanning out to N subscribers (channel_client.ex:363-390,
    each with its own matcher + callback), where N separate Consumers
    would re-read (and at 100 TB, re-shuffle) the source N times.

    Per micro-batch: the batch is materialized ONCE (localCheckpoint —
    same single-evaluation guarantee as Consumer._handle_batch), then
    each subscription applies its topic filter + process expression and
    writes its own ok/quarantine sinks under batch_id-keyed directories
    (idempotent overwrite on replay → effectively-once per sink, with
    per-topic quarantine isolation). All subscriptions advance on the
    shared checkpoint: one source offset log, N logical consumers.

    r16 OPTIMIZATION (guide §2.6 — overlap independent jobs): the N
    subscription slices are INDEPENDENT jobs over the one materialized
    batch (disjoint topic filters, disjoint sink directories), yet the
    serial loop left the cluster idle through each slice's write tail.
    They now run from a small driver thread pool, so one slice's
    checkpoint/write tail back-fills with the next slice's tasks —
    Spark's scheduler happily runs several jobs at once; actions were
    only sequential because this loop called them sequentially. FIFO
    scheduling keeps the earlier slice prioritized (the back-fill
    behavior the guide recommends); failures propagate via result
    iteration, so a failed slice still fails the micro-batch and the
    checkpoint does not commit (replay semantics unchanged)."""
    from concurrent.futures import ThreadPoolExecutor

    def _dispatch(batch: DataFrame, batch_id: int, sub: Subscription) -> None:
        slice_ = batch.filter(
            F.col("name") == F.lit(sub.topic)
        ).repartition(sub.partition_count, F.col("meta.key"))
        evaluated = (
            slice_.withColumn("error", _error_column(sub.process))
            .withColumn(
                "queue",
                F.concat_ws(
                    ":",
                    F.lit(sub.service),
                    F.col("partition_id").cast("string"),
                ),
            )
            .localCheckpoint(eager=True)
        )
        ok = evaluated.filter(F.col("error").isNull()).drop("error")
        failed = evaluated.filter(F.col("error").isNotNull()).withColumn(
            "quarantined_at", F.current_timestamp()
        )
        ok.write.mode("overwrite").parquet(
            f"{sub.processed_dir}/batch_id={batch_id}"
        )
        failed.write.mode("overwrite").parquet(
            f"{sub.quarantine_dir}/batch_id={batch_id}"
        )

    def _handle(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint(eager=True)
        # 2-3 jobs in flight is plenty (guide §2.6): enough to fill the
        # write tail, not so many that they fight for executors.
        with ThreadPoolExecutor(
            max_workers=min(3, max(1, len(subscriptions)))
        ) as pool:
            for _ in pool.map(
                lambda sub: _dispatch(batch, batch_id, sub), subscriptions
            ):
                pass

    raw = (
        spark.readStream.schema(INGRESS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return (
        raw.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_with_restarts(
    start_query: Callable[[], StreamingQuery],
    max_tries: int = 3,
    backoff_s: float = 1.0,
) -> StreamingQuery:
    """Bounded-restart supervisor for a streaming query: on failure,
    retry after a linearly growing delay; give up (re-raise) after
    ``max_tries`` (emitter.ex:113-139 — including its linear
    ``timer += backoff`` growth; the reference's off-by-one ``<=`` that
    admits an extra attempt is NOT reproduced). Recovery is from the
    query's checkpoint, so no data is lost or reprocessed into sinks."""
    attempt = 0
    while True:
        query = start_query()
        try:
            query.awaitTermination()
            return query
        except Exception:
            attempt += 1
            if attempt >= max_tries:
                raise
            time.sleep(backoff_s * attempt)
