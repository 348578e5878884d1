"""Thin Airflow DAG over the Spark engine — reference C1 orchestration
parity (/root/reference/aircan/dags/pipeline_ckan_to_bigquery.py:572-591).

The reference's task graph (collect_config >> prepare_and_upload >> branch
>> {append_or_overwrite, upsert} >> publish >> cleanup) exists because each
stage talks to a different service. With the warehouse inside Spark the
whole lifecycle is one driver call, so the DAG is a single task invoking
``aircan_spark.pipeline.run`` — same trigger-params contract, same
callbacks. Import-gated: Airflow is not installed in the build container;
on a deployment it schedules as-is.
"""

from __future__ import annotations

try:
    from airflow.decorators import dag, task
    from pendulum import datetime as pdt

    HAVE_AIRFLOW = True
except ImportError:  # pragma: no cover - container has no airflow
    HAVE_AIRFLOW = False


def run_ingest(params: dict) -> dict:
    """The single task body — also callable directly (tests use this)."""
    from aircan_spark.callbacks import StatusReporter, log_transport
    from aircan_spark.pipeline import run
    from aircan_spark.session import get_spark

    reporter = StatusReporter(
        params.get("resource_id") or params.get("table_name", "resource"),
        transport=log_transport,
    )
    spark = get_spark(app_name=f"ingest_{params.get('table_name', 'resource')}")
    reporter.update("pending", "pipeline starting")
    try:
        result = run(spark, params)
    except Exception as exc:  # noqa: BLE001 - reference reports then re-raises
        reporter.update("error", str(exc))
        raise
    reporter.update("complete", "pipeline finished", rows=result["rows"])
    return result


if HAVE_AIRFLOW:  # pragma: no cover

    @dag(
        dag_id="aircan_spark_ingest",
        schedule=None,  # triggered with conf params, like the reference
        start_date=pdt(2026, 1, 1),  # static (reference used now()-1d, an antipattern)
        catchup=False,
        tags=["aircan_spark"],
    )
    def aircan_spark_ingest():
        @task
        def ingest(**context):
            return run_ingest(dict(context["dag_run"].conf or {}))

        ingest()

    aircan_spark_ingest()
