"""Pipeline framework tests (plans/): spec parsing, macro substitution, user
code compile/signature errors, deploy-time dry-run, schema compatibility
collection, lineage, and an end-to-end source→transform→sink run — mirroring
the reference's pipeline test shape (``ScalaSparkTest.java:320-367``).
"""

from __future__ import annotations

import os
from tests.conftest import dss_mkdtemp

import pytest

from dynamic_spark_spark.plans import Pipeline, PipelineSpec, substitute_macros
from dynamic_spark_spark.plans.pipeline import PipelineValidationError
from dynamic_spark_spark.plans.spec import MacroError
from dynamic_spark_spark.plans.usercode import UserCodeError, compile_user_code


def test_macro_substitution():
    spec = {"path": "/data/${run_date}/out", "n": 3, "nested": {"k": "${x}"}}
    out = substitute_macros(spec, {"run_date": "2026-08-13", "x": "v"})
    assert out == {"path": "/data/2026-08-13/out", "n": 3, "nested": {"k": "v"}}


def test_macro_missing_raises():
    with pytest.raises(MacroError):
        substitute_macros("${nope}", {})


def test_spec_shape_errors():
    with pytest.raises(PipelineValidationError) as e:
        Pipeline({"stages": [{"name": "t", "type": "transform", "code": "pass"}]})
    assert "must be a source" in str(e.value)


def test_user_code_signature_errors():
    with pytest.raises(UserCodeError) as e:
        compile_user_code("x = 1", stage_name="s1", entry_point="transform")
    assert "must define a function named 'transform'" in str(e.value)
    with pytest.raises(UserCodeError) as e:
        compile_user_code(
            "def transform(a, b, c):\n    return a",
            stage_name="s1",
            entry_point="transform",
        )
    assert "3 positional parameters" in str(e.value)
    with pytest.raises(UserCodeError) as e:
        compile_user_code("def transform(df:\n", stage_name="s1", entry_point="transform")
    assert "failed to compile" in str(e.value)


def _wordcount_spec(sf_dir: str, out_dir: str) -> dict:
    return {
        "name": "wc",
        "stages": [
            {"name": "src", "type": "source", "table": "documents", "sf_dir": sf_dir},
            {
                "name": "split",
                "type": "transform",
                "code": (
                    "def transform(df, ctx):\n"
                    "    return (df.select(F.explode(F.split('text', r'\\s+'))"
                    ".alias('word'))\n"
                    "              .where(F.col('word') != ''))\n"
                ),
            },
            {
                "name": "count",
                "type": "transform",
                "sql": "SELECT word, COUNT(*) AS cnt FROM words GROUP BY word",
                "view": "words",
                "output_schema": "word STRING, cnt BIGINT",
            },
            {"name": "out", "type": "sink", "format": "parquet", "path": out_dir},
        ],
    }


def test_pipeline_end_to_end(spark, sf_dir):
    out_dir = dss_mkdtemp("dss_pipe_")
    pipe = Pipeline(_wordcount_spec(sf_dir, out_dir))
    assert pipe.validate(spark) == []
    result = pipe.run(spark)
    assert result is not None
    back = spark.read.parquet(out_dir)
    assert back.columns == ["word", "cnt"]
    assert back.count() > 0
    ops = [r.operation for r in pipe.lineage]
    assert ops == ["source", "transform:user_code", "transform:sql", "sink:parquet"]
    assert pipe.lineage[-1].reference_name == out_dir


def test_pipeline_schema_incompatibility_collected(spark, sf_dir):
    spec = {
        "name": "bad",
        "stages": [
            {"name": "src", "type": "source", "table": "region", "sf_dir": sf_dir},
            {
                "name": "t",
                "type": "transform",
                "code": "def transform(df):\n    return df.select('r_name')\n",
                # wrong: declares a column the transform dropped + wrong type
                "output_schema": "r_regionkey INT, r_name INT",
            },
        ],
    }
    pipe = Pipeline(spec)
    problems = pipe.validate(spark)
    descr = {(p.field, p.problem.split()[0]) for p in problems}
    assert ("r_regionkey", "missing") in descr
    assert any(p.field == "r_name" and "type" in p.problem for p in problems)


def test_pipeline_user_sink_and_context_args(spark, sf_dir):
    out_dir = dss_mkdtemp("dss_usink_")
    spec = {
        "name": "usink",
        "stages": [
            {"name": "src", "type": "source", "table": "nation", "sf_dir": sf_dir},
            {
                "name": "write",
                "type": "sink",
                "code": (
                    "def sink(df, ctx):\n"
                    "    df.write.mode('overwrite').parquet(ctx.arg('out'))\n"
                ),
            },
        ],
    }
    pipe = Pipeline(spec, runtime_args={"out": out_dir})
    pipe.run(spark)
    assert spark.read.parquet(out_dir).count() == 25 or os.path.exists(out_dir)


def test_observed_stage_metrics(spark, sf_dir, tmp_path):
    """`observe:` stage params ride the sink action as accumulator metrics —
    no second pass: row count, null count, and a sum arrive per stage."""
    from dynamic_spark_spark.plans.pipeline import Pipeline

    spec = {
        "name": "obs-pipe",
        "stages": [
            {"name": "src", "type": "source", "params": {"table": "orders", "sf_dir": sf_dir}},
            {
                "name": "xform",
                "type": "transform",
                "params": {
                    "sql": "SELECT o_orderkey, o_totalprice FROM input WHERE o_orderkey % 2 = 0",
                    "observe": ["null:o_totalprice", "sum:o_totalprice"],
                },
            },
            {"name": "out", "type": "sink", "params": {"path": str(tmp_path / "obs_out")}},
        ],
    }
    p = Pipeline(spec)
    p.run(spark)
    m = p.metrics()["xform"]
    from dynamic_spark_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 2 == 0)
    assert m["rows"] == o.count()
    assert m["null_o_totalprice"] == 0
    assert abs(m["sum_o_totalprice"] - o.agg(F.sum("o_totalprice")).first()[0]) < 1e-6
