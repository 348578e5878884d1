"""Tests for auxiliary sinks (batch POST, convert) and status callbacks."""

import datetime as dt
import json
import os

from aircan_spark.callbacks import (
    COMPLETE,
    RUNNING,
    StatusReporter,
    build_failure_email,
    redact,
)
from aircan_spark.sinks import chunky, convert_csv_to_json, post_in_batches, rows_to_records


def test_chunky():
    assert list(chunky(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(chunky([], 3)) == []


def test_rows_to_records_serialization(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 2, 3, 4, 5), 2.5)], ["id", "ts", "v"]
    )
    recs = rows_to_records(df.collect())
    assert recs == [{"id": 1, "ts": "2026-01-02T03:04:05", "v": 2.5}]


def test_post_in_batches_batching(spark, tmp_path):
    # poster runs on executors; collect payload sizes via files (no shared
    # memory with the driver in a real cluster — same here)
    outdir = str(tmp_path / "posts")
    os.makedirs(outdir)

    def poster(records, outdir=outdir):
        import os as _os
        import uuid

        with open(_os.path.join(outdir, uuid.uuid4().hex), "w") as fh:
            json.dump(len(records), fh)

    df = spark.range(0, 1100).repartition(2)
    post_in_batches(df, poster, batch_size=250)
    sizes = sorted(
        json.load(open(os.path.join(outdir, f))) for f in os.listdir(outdir)
    )
    assert sum(sizes) == 1100
    assert max(sizes) <= 250  # reference batch size honored


def test_convert_csv_to_json(spark, tmp_path):
    src = str(tmp_path / "in.csv")
    open(src, "w").write("a,b\n1,x\n2,y\n")
    dst = convert_csv_to_json(spark, src, str(tmp_path / "out.json"), multiline_array=True)
    recs = json.load(open(dst))
    assert sorted(recs, key=lambda r: r["a"]) == [
        {"a": 1, "b": "x"},
        {"a": 2, "b": "y"},
    ]


def test_status_reporter_fire_and_forget():
    seen = []
    rep = StatusReporter("res-1", transport=seen.append)
    rep.update(RUNNING, "ingesting")
    rep.update(COMPLETE, rows=42)
    assert [p["state"] for p in seen] == [RUNNING, COMPLETE]
    assert seen[1]["rows"] == 42

    def exploding(_):
        raise RuntimeError("transport down")

    rep2 = StatusReporter("res-2", transport=exploding)
    payload = rep2.update(RUNNING)  # must not raise
    assert payload["state"] == RUNNING


def test_failure_email_redaction():
    mail = build_failure_email(
        "res-9", "load failed at gs://secret-bucket/path with user:pass@db error",
    )
    assert "secret-bucket" not in mail["html"]
    assert "res-9" in mail["subject"]
    assert redact("ok s3a://bucket/k") == "ok s3a://<redacted>"
