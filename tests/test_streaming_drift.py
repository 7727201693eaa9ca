"""Streaming PSI drift monitor (streaming/drift.py): online scores
must equal the offline batch formula bit-exactly, drift must fire on a
shifted batch and stay quiet on an in-distribution batch, replays must
be idempotent, and a re-committed baseline must be picked up
mid-stream without a restart."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from ex_hivent_spark.streaming.drift import (
    psi_monitor,
    psi_of,
    read_baseline,
    write_baseline,
)


def _e6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _dec6(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _psi_py(batch, base, width=50.0, n_buckets=10):
    def hist(vals):
        h = {}
        for v in vals:
            b = min(int(v // width), n_buckets - 1)
            h[b] = h.get(b, 0) + 1
        return h

    hb, ha = hist(batch), hist(base)
    nb, na = len(batch), len(base)
    total = Decimal(0)
    for b in set(hb) | set(ha):
        pb = (hb.get(b, 0) + 1) / (nb + n_buckets)
        pa = (ha.get(b, 0) + 1) / (na + n_buckets)
        total += _dec6((pb - pa) * _e6(math.log(pb / pa)))
    return float(total)


def _vals_df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "value double")


def _retry_transport_flake(fn):
    """Retry ONLY on py4j/JVM transport errors (socket resets under
    full-suite load — r9 saw test_monitor_scores_batches_and_flags_drift
    fail with a py4j connection error at suite scale yet pass isolated).
    Each attempt gets a fresh workspace subdir so checkpoints/sinks from
    a half-dead attempt can't poison the retry. Assertion failures and
    analysis errors propagate immediately — this never masks a real bug."""
    import functools

    from py4j.protocol import Py4JError, Py4JJavaError, Py4JNetworkError

    @functools.wraps(fn)
    def wrapper(spark, tmp_path):
        last = None
        for attempt in range(3):
            work = tmp_path / f"attempt{attempt}"
            work.mkdir(exist_ok=True)
            try:
                return fn(spark, work)
            except Py4JJavaError:  # real JVM raise — never retry
                raise
            except (Py4JNetworkError, ConnectionError, Py4JError) as exc:
                last = exc  # transport wrap, not a JVM raise
        raise last

    return wrapper


BASE = [float(v % 500) for v in range(0, 5000, 7)]


def test_psi_of_matches_python(spark, tmp_path):
    bpath = str(tmp_path / "baseline")
    write_baseline(_vals_df(spark, BASE), "value", bpath)
    batch = [float((v * 13) % 500) for v in range(400)]
    row = psi_of(
        _vals_df(spark, batch), read_baseline(spark, bpath), "value"
    ).collect()[0]
    assert row["n_events"] == len(batch)
    assert row["psi"] == _psi_py(batch, BASE)


def test_psi_zero_for_identical_distribution(spark, tmp_path):
    bpath = str(tmp_path / "baseline")
    write_baseline(_vals_df(spark, BASE), "value", bpath)
    row = psi_of(
        _vals_df(spark, BASE), read_baseline(spark, bpath), "value"
    ).collect()[0]
    assert abs(row["psi"]) < 1e-9


def test_baseline_commit_is_versioned_and_atomic(spark, tmp_path):
    """A re-commit publishes a NEW snapshot directory and only then
    flips the pointer: the old snapshot stays fully readable
    throughout, so a trigger racing the re-commit can never see a
    torn histogram (the failure mode of mode('overwrite'), which
    deletes before it writes)."""
    from ex_hivent_spark.sources import versioned

    bpath = str(tmp_path / "baseline")
    v0 = write_baseline(_vals_df(spark, BASE), "value", bpath)
    old = sorted(tuple(r) for r in read_baseline(spark, bpath).collect())
    shifted = [480.0 + (i % 20) for i in range(500)]
    v1 = write_baseline(_vals_df(spark, shifted), "value", bpath)
    assert (v0, v1) == (0, 1)
    assert versioned.current_version(spark, bpath) == 1
    # a reader pinned to the pre-commit version still sees intact data
    pinned = versioned.read_snapshot(spark, bpath, version=0)
    assert sorted(tuple(r) for r in pinned.select("bucket", "cnt").collect()) == old
    # and the resolved head is the complete new histogram
    assert read_baseline(spark, bpath).agg({"cnt": "sum"}).collect()[0][0] == len(shifted)


def _start(spark, src, bpath, out, cp, threshold=0.25):
    stream = spark.readStream.schema("value double").parquet(src)
    return psi_monitor(
        spark, stream, bpath, "value", out, cp, threshold=threshold
    )


@_retry_transport_flake
def test_monitor_scores_batches_and_flags_drift(spark, tmp_path):
    src = str(tmp_path / "src")
    bpath = str(tmp_path / "baseline")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    write_baseline(_vals_df(spark, BASE), "value", bpath)

    # batch 0: in-distribution; batch 1: mass shifted into one bucket
    _vals_df(spark, BASE).write.mode("append").parquet(src)
    q = _start(spark, src, bpath, out, cp)
    q.processAllAvailable()
    shifted = [480.0 + (i % 20) for i in range(500)]
    _vals_df(spark, shifted).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    rows = {
        r["batch_id"]: r
        for r in spark.read.parquet(f"{out}/batch_id=*").collect()
    }
    assert len(rows) == 2
    calm, loud = rows[min(rows)], rows[max(rows)]
    assert not calm["drifted"] and abs(calm["psi"]) < 1e-9
    assert loud["drifted"] and loud["psi"] > 0.25
    assert loud["psi"] == _psi_py(shifted, BASE)


@_retry_transport_flake
def test_monitor_replay_idempotent_and_rebaseline(spark, tmp_path):
    src = str(tmp_path / "src")
    bpath = str(tmp_path / "baseline")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    write_baseline(_vals_df(spark, BASE), "value", bpath)

    shifted = [480.0 + (i % 20) for i in range(500)]
    _vals_df(spark, shifted).write.mode("append").parquet(src)
    q = _start(spark, src, bpath, out, cp)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    first = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/batch_id=*").collect()
    )

    # Re-commit the baseline to MATCH the shifted traffic, then feed
    # another shifted batch: the restarted monitor must (a) not
    # duplicate the already-scored batch (same checkpoint), and
    # (b) score the new batch against the NEW baseline -> no drift.
    write_baseline(_vals_df(spark, shifted), "value", bpath)
    _vals_df(spark, shifted).write.mode("append").parquet(src)
    q2 = _start(spark, src, bpath, out, cp)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    rows = {
        r["batch_id"]: r
        for r in spark.read.parquet(f"{out}/batch_id=*").collect()
    }
    assert len(rows) == 2  # no duplicated batch rows after restart
    # the already-scored batch is untouched by the replayed query
    assert len(first) == 1 and tuple(rows[min(rows)]) == first[0]
    fresh = rows[max(rows)]
    assert not fresh["drifted"] and abs(fresh["psi"]) < 1e-9
