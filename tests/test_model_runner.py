"""Model-runner mechanics: DAG order, cycle/unknown-ref errors, view
inlining (the chain collapses into ONE optimized plan)."""

from __future__ import annotations

import pytest

from dbt_slabbing_spark.catalog import load_tables
from dbt_slabbing_spark.plans.model_runner import ModelError, load_model_dir, run_models, topo_order
from tests.conftest import SF_SMOKE


def test_topo_order_respects_refs():
    models = {
        "c": "SELECT * FROM {{ ref('b') }}",
        "b": "SELECT * FROM {{ ref('a') }}",
        "a": "SELECT 1 AS x",
    }
    order = topo_order(models)
    assert order.index("a") < order.index("b") < order.index("c")


def test_cycle_detected():
    models = {"a": "SELECT * FROM {{ ref('b') }}", "b": "SELECT * FROM {{ ref('a') }}"}
    with pytest.raises(ModelError, match="cycle"):
        topo_order(models)


def test_unknown_ref_detected():
    with pytest.raises(ModelError, match="unknown model"):
        topo_order({"a": "SELECT * FROM {{ ref('ghost') }}"})


def test_models_inline_into_one_plan(spark):
    """Ephemeral (view) materialization: Catalyst must fuse the chain —
    the mart's optimized plan reads the parquet source directly, with
    the staging filter pushed into the scan."""
    tables = load_tables(spark, SF_SMOKE)
    models = {
        "stg": "SELECT o_orderkey, o_totalprice FROM {{ source('orders') }} WHERE o_totalprice > 100000",
        "mart": "SELECT count(*) AS n FROM {{ ref('stg') }}",
    }
    built = run_models(spark, models, {"orders": tables["orders"]})
    plan = built["mart"]._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" in plan and "o_totalprice" in plan
    n = built["mart"].collect()[0]["n"]
    assert n == tables["orders"].filter("o_totalprice > 100000").count()


def test_load_model_dir(tmp_path):
    (tmp_path / "m1.sql").write_text("SELECT 1 AS x")
    (tmp_path / "m2.sql").write_text("SELECT * FROM {{ ref('m1') }}")
    models = load_model_dir(str(tmp_path))
    assert set(models) == {"m1", "m2"}
