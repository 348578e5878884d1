"""Auxiliary sinks — JDBC bulk load, HTTP batch API sink, format convert.

Reference analogs:
- K8 JDBC load: load_csv_to_postgres_via_copy (/root/reference/aircan/
  dependencies_legacy/postgres_loader.py:86-212) — 85k-row pandas chunks
  through COPY. Spark-first: ``df.write.format("jdbc")`` when a driver jar
  is present; the COPY fast path stays available via foreachPartition.
- K9 HTTP API sink: load_resource_via_api (dependencies_legacy/
  api_loader.py:214-265) + chunky (dependencies_legacy/utils.py:158-168) —
  250-row batched POSTs. Spark-first: ``foreachPartition`` so every
  executor posts its own partition concurrently; batch size preserved.
- K10 CSV->JSON convert (dependencies_legacy/file_conversion/
  csv_to_json.py:8-31): a read->write transcode.
- P6 serialization quirks (DatastoreEncoder, dependencies_legacy/
  utils.py:170-177): Decimal -> str, datetime -> isoformat when emitting
  JSON records.

No network calls happen here in tests — the HTTP poster is injectable.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

API_BATCH_SIZE = 250  # reference: aircan_datastore_chunk_insert_rows_size
JDBC_BATCH_SIZE = 85_000  # reference: pandas chunksize in the COPY path


def chunky(iterable, size: int):
    """Yield lists of up to ``size`` items (reference: chunky,
    dependencies_legacy/utils.py:158-168)."""
    batch: list[Any] = []
    for item in iterable:
        batch.append(item)
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch


def _json_safe(value: Any) -> Any:
    """DatastoreEncoder semantics: Decimal -> str, datetime/date ->
    isoformat (reference: dependencies_legacy/utils.py:170-177)."""
    if hasattr(value, "isoformat"):
        return value.isoformat()
    import decimal

    if isinstance(value, decimal.Decimal):
        return str(value)
    if isinstance(value, bytearray):
        return bytes(value).hex()
    return value


def rows_to_records(rows) -> list[dict[str, Any]]:
    return [{k: _json_safe(v) for k, v in row.asDict().items()} for row in rows]


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = JDBC_BATCH_SIZE,
) -> None:
    """JDBC sink (K8). Executor-parallel: each partition opens its own
    connection; ``batchsize`` mirrors the reference's 85k-row chunking.
    (Requires the JDBC driver jar on the Spark classpath — not present in
    this container, so covered by plan-level tests only.)"""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def post_in_batches(
    df: DataFrame,
    poster: Callable[[list[dict[str, Any]]], None],
    batch_size: int = API_BATCH_SIZE,
) -> None:
    """HTTP batch sink (K9): each executor partition streams its rows as
    ``batch_size``-row POST payloads through ``poster`` (a picklable
    callable, e.g. a requests wrapper bound to the datastore_upsert URL).

    Distribution shape matches the reference semantics (250-row payloads)
    but parallelizes across partitions instead of a single driver loop.
    """

    def handle_partition(rows: Iterator) -> None:
        for batch in chunky(rows, batch_size):
            poster(rows_to_records(batch))

    df.foreachPartition(handle_partition)


def convert_csv_to_json(
    spark: SparkSession, src: str, dst: str, multiline_array: bool = False
) -> str:
    """K10: whole-file CSV -> JSON records. ``multiline_array=True``
    produces one JSON array document (the reference's records orientation);
    default is NDJSON (concat-safe, scalable)."""
    df = spark.read.option("header", "true").option("inferSchema", "true").csv(src)
    if multiline_array:
        records = rows_to_records(df.collect())  # driver-side, small files only
        with open(dst, "w") as fh:
            json.dump(records, fh)
        return dst
    df.write.mode("overwrite").json(dst)
    return dst


def export_dump_to_path(df: DataFrame, dst: str, fmt: str = "csv") -> str:
    """K11 re-export analog: dump a table to a cloud/local path. The
    reference downloads the datastore dump URL and re-uploads to S3; with
    the warehouse in Spark this is a direct write (s3a:// works unchanged
    when Hadoop cloud connectors are configured)."""
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(dst)
    elif fmt in ("json", "ndjson"):
        writer.json(dst)
    else:
        writer.parquet(dst)
    return dst
