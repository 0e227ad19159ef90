"""User-defined function surface (SURVEY.md §2 "UDF / UDAF / UDTF").

The reference's entire raison d'être is user code per stage (A1-A4:
``ScalaSparkCompute.java:99-124``, ``ScalaSparkSink.java:89-99``,
``ScalaSparkProgram.java:108-141``, ``PySparkProgram.java:56``). The native
mapping keeps three tiers, slowest to fastest:

1. row-at-a-time Python UDF (``F.udf``) — the per-record analog of
   ``RecordToRow`` bridging (``RecordToRow.java:28-39``); kept for parity,
   never used in the engine's own hot paths;
2. Arrow-vectorized pandas UDF (``@pandas_udf``) — the sanctioned Python
   escape hatch (~10-100× the row path);
3. grouped pandas (``applyInPandas``) — the UDAF/partial-aggregation analog.

Each is oracle-checked by choosing user functions whose semantics are also
ANSI-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "udf_python",
    "SELECT c_custkey,"
    " CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'mid'"
    " ELSE 'high' END AS tier FROM customer",
    tag="udf",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (slow path, kept for reference parity)."""

    @F.udf(returnType=StringType())
    def tier(bal: float | None) -> str | None:
        if bal is None:
            return None
        if bal < 0:
            return "debt"
        return "mid" if bal < 5000 else "high"

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", tier("c_acctbal").alias("tier"))


@query(
    "udf_pandas",
    "SELECT l_orderkey, l_linenumber,"
    " l_extendedprice * (1 - l_discount) AS disc_price FROM lineitem",
    tag="udf",
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF — per-row double arithmetic is IEEE-
    deterministic, so it hash-matches the SQL oracle exactly."""

    @F.pandas_udf(DoubleType())
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "udaf_grouped",
    "SELECT c_nationkey, COUNT(*) AS n_cust,"
    " MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal"
    " FROM customer GROUP BY c_nationkey",
    tag="udf",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation via ``applyInPandas`` (UDAF analog).
    Emits only order-insensitive exact stats (count/min/max) so the result is
    engine-independent. Scale note: ``applyInPandas`` materializes each group
    in one Python worker — fine for bounded groups; unbounded groups should
    pre-aggregate with built-ins first."""
    c = load_table(spark, sf_dir, "customer")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "n_cust": [len(pdf)],
                "min_bal": [pdf["c_acctbal"].min()],
                "max_bal": [pdf["c_acctbal"].max()],
            }
        )

    return c.groupBy("c_nationkey").applyInPandas(
        stats,
        schema="c_nationkey int, n_cust bigint, min_bal double, max_bal double",
    )


_UDTF_ORACLE = """
SELECT doc_id, word, COUNT(*) AS n
FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS word
      FROM documents)
WHERE word <> '' GROUP BY doc_id, word
"""


@query("udtf_split", _UDTF_ORACLE, tag="udf")
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → many output rows, the
    modern native form of the reference's explode-style user code
    (``df.explode(...){line => line.split("\\\\s+")}``,
    ``ScalaSparkTest.java:276-278``). Registered and applied with LATERAL —
    the planner keeps it partition-parallel; per-doc word counts follow."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            for w in (text or "").split():
                yield (w,)

    spark.udtf.register("dss_split_words", SplitWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("dss_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.word, COUNT(*) AS n"
        " FROM dss_udtf_docs d, LATERAL dss_split_words(d.text) s"
        " GROUP BY d.doc_id, s.word"
    )


@query(
    "udf_arrow",
    "SELECT l_orderkey, l_linenumber,"
    " l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged"
    " FROM lineitem",
    tag="udf",
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``, Spark 3.5+/4): the
    third UDF tier between row-pickle Python (``udf_python``) and pandas
    batches (``udf_pandas``) — scalar Python semantics with Arrow-columnar
    transfer, ~2-10× faster serialization than pickled rows while keeping
    the simple one-value signature. Per-row double arithmetic is IEEE-
    deterministic, so it hash-matches the SQL oracle exactly."""
    from pyspark.sql.types import DoubleType

    @F.udf(returnType=DoubleType(), useArrow=True)
    def charged(price: float, discount: float, tax: float) -> float:
        return price * (1.0 - discount) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@query(
    "udf_map_in_arrow",
    "SELECT l_orderkey, l_linenumber,"
    " l_extendedprice * (1.0 - l_discount) AS net_price"
    " FROM lineitem",
    tag="udf",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the lowest-overhead Python boundary — user code sees
    raw ``pyarrow.RecordBatch``es (no pandas conversion at all) and computes
    with Arrow compute kernels, which are C++ SIMD under the hood. The tier
    below ``mapInPandas`` when the logic is expressible in Arrow kernels;
    IEEE-exact vs the SQL oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def net(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_orderkey"),
                    b.column("l_linenumber"),
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                    ),
                ],
                names=["l_orderkey", "l_linenumber", "net_price"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(
        net, schema="l_orderkey long, l_linenumber int, net_price double"
    )


@query(
    "udf_pandas_iter",
    "SELECT o_orderkey,"
    " CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents"
    " FROM orders WHERE o_orderkey < 2000",
    tag="udf",
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (``Iterator[pd.Series] -> Iterator
    [pd.Series]``): the tier for UDFs with expensive one-time setup (model
    load, dictionary mmap) — the initialization runs once per PARTITION,
    then streams Arrow batches through, instead of paying setup per batch
    like the plain scalar form. The body here is exact integer arithmetic
    so the key stays hash-checked; the shape is what matters."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def to_cents(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-partition setup would go here (e.g. load a model)
        scale = 100
        for prices in batches:
            yield (prices * scale).round(0).astype("int64")

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select("o_orderkey", to_cents("o_totalprice").alias("cents"))


@query(
    "win_pandas_udf",
    "SELECT o_custkey, o_orderkey,"
    " CAST(MIN(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
    "   OVER (PARTITION BY o_custkey) AS BIGINT) AS min_cents"
    " FROM orders WHERE o_custkey < 100",
    tag="udf",
)
def win_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF evaluated OVER A WINDOW — custom Python
    aggregation logic windowed per key without collapsing rows (the
    'attach a model-derived per-group score to every row' pattern). The
    UDF returns an order-insensitive exact statistic (integer min) so the
    live Arrow window path hash-checks against plain SQL MIN OVER."""
    from pyspark.sql import Window
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def min_cents(prices: pd.Series) -> int:
        return int((prices * 100).round(0).astype("int64").min())

    w = Window.partitionBy("o_custkey")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    return o.select(
        "o_custkey",
        "o_orderkey",
        min_cents("o_totalprice").over(w).alias("min_cents"),
    )


_COGROUP_ORACLE = """
SELECT n.n_nationkey AS nation_key,
       CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_suppliers,
       CAST(COALESCE(c.n_cust, 0) - COALESCE(s.n_supp, 0) AS BIGINT) AS cust_minus_supp
FROM nation n
LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
  ON c.c_nationkey = n.n_nationkey
LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  ON s.s_nationkey = n.n_nationkey
WHERE COALESCE(c.n_cust, 0) + COALESCE(s.n_supp, 0) > 0
"""


@query("udf_cogroup", _COGROUP_ORACLE, tag="udf")
def udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas transform (``groupBy().cogroup().applyInPandas``):
    TWO tables grouped on the same key arrive as a pandas frame PAIR per
    key — the arbitrary-Python analog of a join+aggregate, for logic that
    genuinely needs both sides materialized together (custom reconciliation,
    panel alignment). Completes the pandas-UDF family next to scalar
    (``udf_pandas``), grouped-agg (``udaf_grouped``), iterator
    (``udf_pandas_iter``) and window (``win_pandas_udf``).

    Scale note: both sides shuffle on the key and each KEY's pair of frames
    must fit one worker — the same bounded-group contract as
    ``applyInPandas``, fine for dimension-keyed cogroups (25 nations),
    wrong for skewed keys, which is why the relational twin (the oracle's
    join+agg) remains the default plan. Keys present on either side appear
    (cogroup is full-outer); the empty-side frame has 0 rows."""
    import pandas as pd

    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_nationkey", "s_suppkey")

    def reconcile(key, cust: pd.DataFrame, supp: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "nation_key": [int(key[0])],
                "n_customers": [len(cust)],
                "n_suppliers": [len(supp)],
                "cust_minus_supp": [len(cust) - len(supp)],
            }
        )

    return (
        c.groupBy("c_nationkey")
        .cogroup(s.groupBy("s_nationkey"))
        .applyInPandas(
            reconcile,
            "nation_key int, n_customers long, n_suppliers long, cust_minus_supp long",
        )
        .select(
            F.col("nation_key").cast("int"),
            "n_customers",
            "n_suppliers",
            "cust_minus_supp",
        )
    )


_UDTF_DYN_ORACLE = """
SELECT n_nationkey,
       CAST(split_part(n_name, '_', 1) AS VARCHAR) AS part_1,
       CAST(split_part(n_name, '_', 2) AS VARCHAR) AS part_2
FROM nation
"""


@query("udtf_dynamic_schema", _UDTF_DYN_ORACLE, tag="udf")
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a static ``analyze()`` method (Spark 4): the OUTPUT
    SCHEMA is computed at plan time from the call's literal arguments — here
    a requested column count widens the table function to ``part_1..part_N``
    — the polymorphic-table-function contract (one UDTF, many shapes) that a
    fixed ``returnType`` (``udtf_split``) cannot express. The planner sees
    concrete columns, so pruning/codegen work as if the schema were static."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitParts:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"part_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):  # noqa: ANN001
            parts = (text or "").split("_")
            yield tuple((parts[i] if i < len(parts) else "") for i in range(n))

    spark.udtf.register("dss_split_parts", SplitParts)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("dss_udtf_nation")
    return spark.sql(
        "SELECT d.n_nationkey, s.* FROM dss_udtf_nation d,"
        " LATERAL dss_split_parts(d.n_name, 2) s"
    )
