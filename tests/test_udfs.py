"""UDF-surface tests: the pandas scalar / grouped-agg / grouped-map
paths produce the same results as their native-expression twins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.udfs import p90_pudf, token_count_pudf, zscore_per_group


def test_token_count_matches_native(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    both = d.select(
        token_count_pudf()("text").alias("pandas_n"),
        F.size(F.split("text", " ")).alias("native_n"),
    )
    assert both.filter(F.col("pandas_n") != F.col("native_n")).count() == 0


def test_p90_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: r.p90
        for r in e.groupBy("event_type").agg(p90_pudf()("value").alias("p90")).collect()
    }
    rows = e.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vals in by_type.items():
        assert got[et] == pytest.approx(float(np.percentile(np.array(vals), 90)))


def test_zscore_matches_window_twin(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    via_pandas = {
        r.event_id: r.zscore for r in zscore_per_group(e, "user_id", "value").collect()
    }
    w = Window.partitionBy("user_id")
    via_window = {
        r.event_id: r.z
        for r in e.select(
            "event_id",
            ((F.col("value") - F.avg("value").over(w)) / F.stddev("value").over(w))
            .alias("z"),
        ).collect()
    }
    assert via_pandas.keys() == via_window.keys()
    for k, v in via_window.items():
        assert _nonvalue(via_pandas[k]) == pytest.approx(_nonvalue(v), rel=1e-9)


def _nonvalue(v):
    """NULL (window twin) and NaN (pandas path) both mean 'no z-score'."""
    import math

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return v


def test_zscore_degenerate_groups(spark):
    """Single-row and constant-value groups yield no z-score on BOTH
    paths (window: NULL via stddev_samp/div-by-zero; pandas: NaN)."""
    e = spark.createDataFrame(
        [(1, "solo", 5.0), (2, "const", 3.0), (3, "const", 3.0),
         (4, "ok", 1.0), (5, "ok", 2.0)],
        "event_id int, user_id string, value double",
    )
    via_pandas = {
        r.event_id: _nonvalue(r.zscore)
        for r in zscore_per_group(e, "user_id", "value").collect()
    }
    w = Window.partitionBy("user_id")
    via_window = {
        r.event_id: _nonvalue(r.z)
        for r in e.select(
            "event_id",
            # try_divide: ANSI-safe NULL for the zero-std group
            F.try_divide(
                F.col("value") - F.avg("value").over(w), F.stddev("value").over(w)
            ).alias("z"),
        ).collect()
    }
    assert via_pandas[1] is None and via_window[1] is None
    assert via_pandas[2] is None and via_window[2] is None
    for k in via_window:
        assert via_pandas[k] == pytest.approx(via_window[k])
