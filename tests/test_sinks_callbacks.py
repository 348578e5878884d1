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


# --- K8/J2 COPY fast path -----------------------------------------------------------


def _make_recording_factory(log_dir):
    """Connection factory whose fakes are defined INSIDE the closure so
    cloudpickle ships them by value to executor workers (a module-level
    class would need this test module importable on the worker)."""

    def factory():
        import os
        import uuid

        class Cur:
            def _log(self, kind, payload):
                p = os.path.join(log_dir, f"{kind}_{uuid.uuid4().hex}.log")
                with open(p, "w") as f:
                    f.write(payload)

            def execute(self, sql):
                self._log("execute", sql)

            def copy_expert(self, sql, buf):
                self._log("copy", sql + "\n---\n" + buf.read())

        class Conn:
            def cursor(self):
                return Cur()

            def commit(self):
                pass

            def close(self):
                pass

        return Conn()

    return factory


def _read_logs(log_dir, kind):
    import glob

    return [open(p).read() for p in sorted(glob.glob(f"{log_dir}/{kind}_*.log"))]


def test_copy_to_postgres_insert_path(spark, tmp_path):
    from aircan_spark.sinks import copy_to_postgres

    log_dir = str(tmp_path)
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 2.5), (3, 'quo"te', 3.5)],
        "id int, name string, score double",
    ).coalesce(1)
    copy_to_postgres(df, "target", _make_recording_factory(log_dir))

    copies = _read_logs(log_dir, "copy")
    assert len(copies) == 1
    sql, csv_body = copies[0].split("\n---\n")
    assert 'COPY "target" ("id", "name", "score") FROM STDIN' in sql
    assert "FORMAT csv" in sql and "HEADER 1" in sql
    lines = csv_body.strip().splitlines()
    assert lines[0] == "id,name,score"
    assert len(lines) == 4  # header + 3 rows
    assert any('"quo""te"' in ln for ln in lines)  # csv-quoted embedded quote
    assert any(ln.startswith("1,a,") and ln.endswith(",") for ln in lines)  # NULL -> empty
    # no upsert machinery on the insert path
    assert all("ON CONFLICT" not in e for e in _read_logs(log_dir, "execute"))


def test_copy_to_postgres_upsert_path(spark, tmp_path):
    from aircan_spark.sinks import copy_to_postgres

    log_dir = str(tmp_path)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string").coalesce(1)
    copy_to_postgres(
        df, "target", _make_recording_factory(log_dir), unique_keys=["id"]
    )
    execs = _read_logs(log_dir, "execute")
    assert any('CREATE TEMPORARY TABLE "temp_target" (LIKE "target") ON COMMIT DROP' in e for e in execs)
    assert any(
        'INSERT INTO "target" ("id", "name") SELECT' in e
        and 'ON CONFLICT ("id") DO UPDATE SET "name"=EXCLUDED."name"' in e
        for e in execs
    )
    copies = _read_logs(log_dir, "copy")
    assert len(copies) == 1 and 'COPY "temp_target"' in copies[0]


def test_copy_to_postgres_parallel_partitions(spark, tmp_path):
    """Each partition COPYs independently — the parallel-load shape."""
    from aircan_spark.sinks import copy_to_postgres

    log_dir = str(tmp_path)
    df = spark.range(0, 100).repartition(4)
    copy_to_postgres(df, "t", _make_recording_factory(log_dir))
    copies = _read_logs(log_dir, "copy")
    assert len(copies) == 4
    total = sum(len(c.split("\n---\n")[1].strip().splitlines()) - 1 for c in copies)
    assert total == 100


def test_copy_to_postgres_missing_key_raises(spark, tmp_path):
    import pytest as _pytest

    from aircan_spark.sinks import copy_to_postgres

    df = spark.createDataFrame([(1,)], "id int")
    with _pytest.raises(ValueError, match="unique keys absent"):
        copy_to_postgres(df, "t", _make_recording_factory(str(tmp_path)), unique_keys=["nope"])


def _make_sequenced_factory(log_dir, index_rows):
    """Recording factory whose log filenames carry a system-wide
    monotonic timestamp so driver-side (index DDL) and executor-side
    (COPY) events interleave in true order, and whose cursor answers
    the pg_indexes discovery query with ``index_rows``."""

    def factory():
        import os
        import time

        class Cur:
            _sql = ""

            def _log(self, kind, payload):
                p = os.path.join(log_dir, f"{time.monotonic_ns():020d}_{kind}.log")
                with open(p, "w") as f:
                    f.write(payload)

            def execute(self, sql):
                self._sql = sql
                self._log("execute", sql)

            def fetchall(self):
                if "pg_indexes" in self._sql:
                    return list(index_rows)
                return []

            def copy_expert(self, sql, buf):
                self._log("copy", sql + "\n---\n" + buf.read())

        class Conn:
            def cursor(self):
                return Cur()

            def commit(self):
                pass

            def close(self):
                pass

        return Conn()

    return factory


def _event_sequence(log_dir):
    import glob
    import os

    out = []
    for p in sorted(glob.glob(f"{log_dir}/*_*.log")):
        kind = os.path.basename(p).split("_", 1)[1].removesuffix(".log")
        out.append((kind, open(p).read()))
    return out


def test_copy_to_postgres_manage_indexes_drop_before_copy_create_after(spark, tmp_path):
    """D6: with manage_indexes=True every pre-existing index is dropped
    BEFORE the first COPY and its exact indexdef replayed AFTER the last
    one (reference postgres_loader.py:12-87 intent)."""
    from aircan_spark.sinks import copy_to_postgres

    log_dir = str(tmp_path)
    indexdef = 'CREATE INDEX "idx_name" ON "target" ("name")'
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string").coalesce(1)
    copy_to_postgres(
        df,
        "target",
        _make_sequenced_factory(log_dir, [("idx_name", indexdef)]),
        manage_indexes=True,
    )
    seq = _event_sequence(log_dir)
    drop_at = next(i for i, (k, s) in enumerate(seq) if 'DROP INDEX "idx_name" CASCADE' in s)
    copy_ats = [i for i, (k, s) in enumerate(seq) if k == "copy"]
    create_at = next(i for i, (k, s) in enumerate(seq) if s == indexdef)
    assert copy_ats, "no COPY recorded"
    assert drop_at < min(copy_ats) <= max(copy_ats) < create_at
    # discovery query ran against pg_indexes for the right table
    assert any("pg_indexes" in s and "'target'" in s for _, s in seq)


def test_copy_to_postgres_manage_indexes_pk_fallback(spark, tmp_path):
    """D6: no pre-existing indexes + primary_key -> the reference's
    sha1-named UNIQUE index on the key columns is created post-load."""
    import hashlib

    from aircan_spark.sinks import copy_to_postgres

    log_dir = str(tmp_path)
    df = spark.createDataFrame([(1, "a")], "id int, name string").coalesce(1)
    copy_to_postgres(
        df,
        "target",
        _make_sequenced_factory(log_dir, []),
        manage_indexes=True,
        primary_key=["id"],
    )
    seq = _event_sequence(log_dir)
    name = hashlib.sha1(('target' + '"id"').encode()).hexdigest()
    create_at = next(
        i for i, (k, s) in enumerate(seq)
        if f'CREATE UNIQUE INDEX "{name}" ON "target" ("id")' in s
    )
    copy_ats = [i for i, (k, s) in enumerate(seq) if k == "copy"]
    assert copy_ats and max(copy_ats) < create_at


def test_copy_to_postgres_upsert_path_skips_index_management(spark, tmp_path):
    """ON CONFLICT needs the unique index alive during the merge — the
    upsert path must never drop indexes even with manage_indexes=True."""
    from aircan_spark.sinks import copy_to_postgres

    log_dir = str(tmp_path)
    df = spark.createDataFrame([(1, "a")], "id int, name string").coalesce(1)
    copy_to_postgres(
        df,
        "target",
        _make_sequenced_factory(log_dir, [("idx", 'CREATE INDEX "idx" ON "target" ("name")')]),
        unique_keys=["id"],
        manage_indexes=True,
    )
    seq = _event_sequence(log_dir)
    assert not any("DROP INDEX" in s for _, s in seq)
    assert not any("pg_indexes" in s for _, s in seq)
