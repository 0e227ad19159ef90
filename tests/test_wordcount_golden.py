"""Reference-parity golden wordcount (FIXTURES.md §1): 10 rows "Line 0".."
"Line 9" → 11 distinct words, "Line"→10, each digit→1 — reproducing the
assertions of ``ScalaSparkTest.java:341-345,363-367`` through the pipeline
framework's user-code stage.
"""

from __future__ import annotations

from dynamic_spark_spark.plans import Pipeline


def test_wordcount_golden(spark):
    rows = [(f"Line {i}",) for i in range(10)]
    spark.createDataFrame(rows, "body string").createOrReplaceTempView("wc_input")
    spec = {
        "name": "wc_golden",
        "stages": [
            {"name": "src", "type": "source", "view": "wc_input"},
            {
                "name": "wc",
                "type": "transform",
                "code": (
                    "def transform(df):\n"
                    "    words = df.select(F.explode(F.split('body', r'\\s+'))"
                    ".alias('word'))\n"
                    "    return words.groupBy('word')"
                    ".agg(F.count(F.lit(1)).alias('count'))\n"
                ),
                "output_schema": "word STRING, count BIGINT",
            },
        ],
    }
    pipe = Pipeline(spec)
    assert pipe.validate(spark) == []
    got = {r["word"]: r["count"] for r in pipe.run(spark).collect()}
    # golden assertions (ScalaSparkTest.java:363-367)
    assert len(got) == 11
    assert got["Line"] == 10
    for i in range(10):
        assert got[str(i)] == 1
