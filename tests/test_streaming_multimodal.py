"""Streaming window parity (stream result == batch result) and
multimodal binary-column plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_framework_spark.multimodal.binary_ops import (
    ASSET_SCHEMA,
    extract_features,
    frame_sample_plan,
    resize_meta,
)
from data_framework_spark.streaming.windows import (
    q_tumbling_window_events,
    run_stream_to_memory,
    stream_tumbling_counts,
)


def test_stream_matches_batch(spark, sf_dir):
    """The streaming tumbling agg must converge to the batch answer
    when the bounded source is fully consumed."""
    sdf = stream_tumbling_counts(spark, sf_dir)
    assert sdf.isStreaming
    run_stream_to_memory(sdf, "stream_out")
    stream_rows = {
        tuple(r) for r in spark.sql("SELECT * FROM stream_out").collect()
    }
    batch_rows = {tuple(r) for r in q_tumbling_window_events(spark, sf_dir).collect()}
    assert stream_rows == batch_rows


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"fake-png-bytes-1", (640, 480, None, None)),
        (2, "image", b"fake-png-bytes-2", (4000, 3000, None, None)),
        (3, "audio", b"fake-wav-bytes", (None, None, 16000, None)),
        (4, "video", b"fake-mp4-bytes", (1920, 1080, None, 10)),
        (5, "image", None, (10, 10, None, None)),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_extract_features_fake(assets):
    out = extract_features(assets, decode="fake").collect()
    assert len(out) == 5
    by_id = {r["asset_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == len(b"fake-png-bytes-1")
    assert by_id[5]["n_bytes"] == 0  # null payload handled
    assert all(len(r["feat"]) == 8 for r in out)
    # deterministic: same payload → same features
    out2 = extract_features(assets, decode="fake").collect()
    assert {r["asset_id"]: r["feat"] for r in out2} == {
        r["asset_id"]: r["feat"] for r in out
    }
    # features are real-valued and centered-ish
    assert all(abs(v) <= 0.5 for r in out for v in r["feat"])


def test_extract_features_strict_raises(assets):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as ei:
        extract_features(assets, decode="strict").collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_resize_meta_pure_columns(assets):
    out = {r["asset_id"]: r["resize_to"] for r in resize_meta(assets, 1024).collect()}
    assert out[1] == (640, 480)  # under the cap: untouched
    assert out[2] == (1024, 768)  # 4000×3000 → bounded, aspect kept
    plan = resize_meta(assets, 1024)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()  # metadata-only: no Python


def test_frame_sample_plan(assets):
    rows = frame_sample_plan(assets.filter(F.col("kind") == "video"), 3).collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6, 9]
