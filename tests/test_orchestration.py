"""DAG-parity tests for orchestration.build_dag (reference
dags/datalake_pipeline.py:11-21,54 — `@daily`, catchup off, 1 retry /
5 min, unpack >> preprocess >> process).

Airflow is not installed in this container, so both sides of the import
gate are exercised: the absent path must return None, and a minimal fake
airflow module stands in to verify the DAG metadata and task chain the
reference pins.
"""

from __future__ import annotations

import sys
import types
from datetime import timedelta

from datalakes_and_data_integration_spark import orchestration


def test_build_dag_returns_none_without_airflow():
    assert "airflow" not in sys.modules
    assert orchestration.build_dag("/tmp/landing", "/tmp/work") is None


class _FakeDAG:
    def __init__(self, dag_id, schedule=None, catchup=None, default_args=None):
        self.dag_id = dag_id
        self.schedule = schedule
        self.catchup = catchup
        self.default_args = default_args
        self.tasks = []

    def __enter__(self):
        _FakeDAG._current = self
        return self

    def __exit__(self, *exc):
        _FakeDAG._current = None


class _FakeOperator:
    def __init__(self, task_id, python_callable=None, op_args=None):
        self.task_id = task_id
        self.python_callable = python_callable
        self.op_args = op_args or []
        self.downstream = []
        dag = getattr(_FakeDAG, "_current", None)
        if dag is not None:
            dag.tasks.append(self)

    def __rshift__(self, other):
        self.downstream.append(other.task_id)
        return other


def _install_fake_airflow(monkeypatch):
    airflow = types.ModuleType("airflow")
    airflow.DAG = _FakeDAG
    operators = types.ModuleType("airflow.operators")
    python_mod = types.ModuleType("airflow.operators.python")
    python_mod.PythonOperator = _FakeOperator
    operators.python = python_mod
    airflow.operators = operators
    monkeypatch.setitem(sys.modules, "airflow", airflow)
    monkeypatch.setitem(sys.modules, "airflow.operators", operators)
    monkeypatch.setitem(sys.modules, "airflow.operators.python", python_mod)


def test_build_dag_metadata_and_chain(monkeypatch):
    _install_fake_airflow(monkeypatch)
    dag = orchestration.build_dag(
        "/tmp/landing", "/tmp/work", base_url="http://api", api_key="k"
    )
    assert dag is not None
    # Reference schedule/retry policy (datalake_pipeline.py:11-21).
    assert dag.dag_id == "datalake_pipeline"
    assert dag.schedule == "@daily"
    assert dag.catchup is False
    assert dag.default_args == {
        "retries": 1,
        "retry_delay": timedelta(minutes=5),
    }
    # Task chain (datalake_pipeline.py:54): unpack >> preprocess >> process.
    by_id = {t.task_id: t for t in dag.tasks}
    assert list(by_id) == [
        "unpacked_to_raw",
        "preprocess_to_staging",
        "process_to_curated",
    ]
    assert by_id["unpacked_to_raw"].downstream == ["preprocess_to_staging"]
    assert by_id["preprocess_to_staging"].downstream == ["process_to_curated"]
    assert by_id["process_to_curated"].downstream == []
    # The callables are the real pipeline stage functions with their args.
    assert by_id["unpacked_to_raw"].python_callable is orchestration.task_unpack
    assert by_id["unpacked_to_raw"].op_args == ["http://api", "k", "/tmp/landing"]
    assert by_id["preprocess_to_staging"].python_callable is orchestration.task_preprocess
    assert by_id["preprocess_to_staging"].op_args == ["/tmp/landing", "/tmp/work"]
    assert by_id["process_to_curated"].python_callable is orchestration.task_process
    assert by_id["process_to_curated"].op_args == ["/tmp/work"]
