"""Airflow orchestration entry for the graft Spark engine (SURVEY.md S8).

The reference's production path is an Airflow DAG that wires two database
connections and hands them to its ETL callable
(/root/reference/airflow_setup/dags/pagila_weekly_summary_dag.py:51-68).
This DAG keeps that exact shape — same dag_id, same connection ids, same
connection-dict layout — but the work it launches is the Spark job
``graft.IncrementalRun`` via spark-submit instead of an in-process pandas
script: on a real deployment the PythonOperator below is a thin shim that
shells out to the cluster's spark-submit (swap in
``SparkSubmitOperator`` from the Apache Spark provider if it is
installed; the command built here is exactly what that operator would
assemble).

Everything that decides WHAT runs is in pure functions
(``connection_params``, ``jdbc_url``, ``build_spark_submit``) with no
Airflow import, so the param wiring is unit-testable without an Airflow
installation: ``python3 pagila_weekly_summary_dag.py --selftest`` (run by
AirflowDagSpec in the Scala test suite). The Airflow objects are only
constructed when the module is imported by a scheduler that has Airflow
on its path.
"""

from __future__ import annotations

import os
import subprocess
import sys

# Same connection ids as the reference DAG.
PAGILA_CONN_ID = "pagila_postgres_connection"
ROLLUP_CONN_ID = "rollup_postgres_connection"

DEFAULT_DATA_DIR = os.environ.get("GRAFT_DATA_DIR", "/data/pagila")
DEFAULT_STATE_DIR = os.environ.get("GRAFT_STATE_DIR", "/data/graft_state")
DEFAULT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft-engine.jar")
DEFAULT_MASTER = os.environ.get("GRAFT_SPARK_MASTER", "local[4]")


def connection_params(conn):
    """Airflow Connection -> dict, the exact layout the reference builds
    (reference DAG lines 26-41; in Airflow, 'schema' holds the db name)."""
    return {
        "host": conn.host,
        "port": conn.port,
        "dbname": conn.schema,
        "user": conn.login,
        "password": conn.password,
    }


def jdbc_url(params):
    """Postgres JDBC url from a reference-shaped connection dict."""
    return "jdbc:postgresql://{host}:{port}/{dbname}".format(**params)


def build_spark_submit(pagila_params, rollup_params, *,
                       data_dir=DEFAULT_DATA_DIR,
                       state_dir=DEFAULT_STATE_DIR,
                       mode="faithful",
                       jar=DEFAULT_JAR,
                       spark_submit="spark-submit",
                       master=DEFAULT_MASTER):
    """The spark-submit command + env for one incremental run.

    The source connection rides as JDBC options the engine's cdcJdbc
    reader consumes; the rollup connection rides as the
    SPARK_GRAFT_ROLLUP_* env the IncrementalRun main consumes for its
    keyed JDBC upsert (the reference's rollup load, etl:249-284).
    Returns (argv, extra_env).
    """
    env = {
        "SPARK_GRAFT_SOURCE_JDBC_URL": jdbc_url(pagila_params),
        "SPARK_GRAFT_SOURCE_JDBC_USER": pagila_params["user"],
        "SPARK_GRAFT_SOURCE_JDBC_PASSWORD": pagila_params["password"],
        "SPARK_GRAFT_ROLLUP_JDBC_URL": jdbc_url(rollup_params),
        "SPARK_GRAFT_ROLLUP_JDBC_USER": rollup_params["user"],
        "SPARK_GRAFT_ROLLUP_JDBC_PASSWORD": rollup_params["password"],
    }
    argv = [
        spark_submit,
        "--master", master,
        "--class", "graft.IncrementalRun",
        "--conf", "spark.sql.session.timeZone=UTC",
        jar,
        data_dir,
        state_dir,
        mode,
    ]
    return argv, env


def run_pagila_etl_callable(**kwargs):
    """PythonOperator callable: resolve Airflow connections, build the
    spark-submit command, run it (the reference's run_pagila_etl_callable
    with spark-submit in place of the pandas script)."""
    from airflow.hooks.base import BaseHook

    pagila = connection_params(BaseHook.get_connection(PAGILA_CONN_ID))
    rollup = connection_params(BaseHook.get_connection(ROLLUP_CONN_ID))
    argv, extra_env = build_spark_submit(pagila, rollup)
    print("Launching:", " ".join(argv))
    env = dict(os.environ)
    env.update(extra_env)
    subprocess.run(argv, env=env, check=True)
    print("graft incremental ETL finished.")


def _build_dag():
    import pendulum
    from airflow.models.dag import DAG
    from airflow.providers.standard.operators.python import PythonOperator

    with DAG(
        dag_id="pagila_weekly_summary_etl",  # same id as the reference
        schedule=None,  # manual trigger; "0 0 * * 0" for weekly
        start_date=pendulum.datetime(2023, 1, 1, tz="UTC"),
        catchup=False,
        tags=["pagila", "etl", "analytics_engineering", "spark"],
        doc_md="""
        ### Pagila Weekly Summary ETL (Spark)
        Extracts rental deltas from the Pagila source database, recomputes
        the affected weekly summaries as one Spark job
        (graft.IncrementalRun), and upserts them into the rollup database
        using the watermark approach. Connections are resolved through
        Airflow; credentials never live in the DAG file.
        """,
    ) as dag:
        PythonOperator(
            task_id="run_full_pagila_etl",  # same task id as the reference
            python_callable=run_pagila_etl_callable,
        )
    return dag


def _selftest():
    """Assert the pure wiring builds the contract the engine expects.
    Runs with no Airflow installed (AirflowDagSpec calls this)."""
    class FakeConn:  # duck-typed like airflow.models.Connection
        host, port, schema, login, password = \
            "db.example", 5432, "pagila", "etl", "s3cret"

    pagila = connection_params(FakeConn())
    assert pagila == {"host": "db.example", "port": 5432, "dbname": "pagila",
                      "user": "etl", "password": "s3cret"}, pagila
    assert jdbc_url(pagila) == "jdbc:postgresql://db.example:5432/pagila"

    rollup = dict(pagila, dbname="rollup", user="loader")
    argv, env = build_spark_submit(
        pagila, rollup, data_dir="/d", state_dir="/s", jar="/j.jar",
        master="local[8]")
    assert argv == ["spark-submit", "--master", "local[8]",
                    "--class", "graft.IncrementalRun",
                    "--conf", "spark.sql.session.timeZone=UTC",
                    "/j.jar", "/d", "/s", "faithful"], argv
    assert env["SPARK_GRAFT_ROLLUP_JDBC_URL"] == \
        "jdbc:postgresql://db.example:5432/rollup", env
    assert env["SPARK_GRAFT_ROLLUP_JDBC_USER"] == "loader"
    assert env["SPARK_GRAFT_SOURCE_JDBC_URL"] == \
        "jdbc:postgresql://db.example:5432/pagila", env
    print("selftest ok")


if __name__ == "__main__" and "--selftest" in sys.argv:
    _selftest()
else:
    try:  # scheduler import path: build the DAG only when Airflow exists
        import airflow  # noqa: F401
        dag = _build_dag()
    except ImportError:
        pass
