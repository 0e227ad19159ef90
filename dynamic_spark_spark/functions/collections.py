"""Array / map functions, incl. higher-order lambdas (SURVEY.md §2.B B18,
§2.C Scalar functions / Array / Map).

Reference evidence: nested-array ops ``t.map(x => x*x)`` over ``Array(1,2)``
values (``ScalaSparkTest.java:233-239``) — mapped to Spark's higher-order
``transform`` so the lambda runs JVM-side inside codegen, not in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


# Array-valued outputs are emitted as fixed-point (numeric) or plain (string)
# '|'-joined strings: the driver's compare harness cannot canonicalize raw
# array columns (r1 agg_collect lesson), and float→string formatting differs
# between engines, so numeric elements go through the floor(x*1e6+0.5) int
# path before joining.
_FP = 1_000_000


def _fp_join(arr):
    """Spark: numeric array → fixed-point ints → '|' string."""
    return F.array_join(
        F.transform(arr, lambda x: F.floor(x * _FP + F.lit(0.5)).cast("long").cast("string")),
        "|",
    )


def _o_fp_join(arr_sql: str) -> str:
    """DuckDB fragment matching :func:`_fp_join`."""
    return (
        f"array_to_string(list_transform({arr_sql},"
        f" x -> CAST(CAST(FLOOR(x * {_FP} + 0.5) AS BIGINT) AS VARCHAR)), '|')"
    )


@query(
    "fn_array_transform",
    "SELECT l_orderkey, l_linenumber,"
    f" {_o_fp_join('list_transform([l_quantity, l_tax, l_discount], x -> x * 2)')} AS doubled,"
    " CAST(len([l_quantity, l_tax, l_discount]) AS INT) AS arr_len,"
    " list_contains([l_returnflag, l_linestatus], 'N') AS has_n,"
    " array_to_string(list_sort([l_returnflag, l_linestatus]), '|') AS flags_sorted,"
    " list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    "   [l_quantity, l_tax, l_discount]), (acc, x) -> acc + x) AS arr_sum,"
    f" {_o_fp_join('[l_quantity + l_tax, l_tax + l_discount]')} AS pair_sums"
    " FROM lineitem WHERE l_orderkey % 10 = 0",
    tag="function",
)
def fn_array_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / size / contains / sort /
    aggregate (left fold — sequential in both engines) / zip_with. Array
    outputs stringified (see module comment). The 1-in-10 orderkey slice
    bounds compared rows — per-row list building is the oracle engine's
    slow path and was the whole gate's #2 time sink at full width."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    nums = F.array("l_quantity", "l_tax", "l_discount")
    flags = F.array("l_returnflag", "l_linestatus")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _fp_join(F.transform(nums, lambda x: x * 2)).alias("doubled"),
        F.size(nums).alias("arr_len"),
        F.array_contains(flags, "N").alias("has_n"),
        F.array_join(F.sort_array(flags), "|").alias("flags_sorted"),
        F.aggregate(nums, F.lit(0.0), lambda acc, x: acc + x).alias("arr_sum"),
        _fp_join(
            F.zip_with(
                F.array("l_quantity", "l_tax"),
                F.array("l_tax", "l_discount"),
                lambda a, b: a + b,
            )
        ).alias("pair_sums"),
    )


@query(
    "fn_array_embedding",
    "SELECT vec_id,"
    " CAST(len(embedding) AS INT) AS dim,"
    " CAST(embedding[1] AS DOUBLE) AS first_elem,"
    " list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    "   list_transform(embedding, x -> CAST(x AS DOUBLE))),"
    "   (acc, x) -> acc + x) AS vec_sum"
    " FROM embeddings",
    tag="function",
)
def fn_array_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the real float-vector column: length, indexing, and a
    sequential left-fold sum (float→double per element first, so both engines
    add the identical doubles in the identical order)."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_elem"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
    )


@query(
    "fn_map",
    "SELECT p_partkey,"
    " MAP {'brand': p_brand, 'type': p_type}['brand'][1] AS brand_val,"
    " CAST(cardinality(MAP {'brand': p_brand, 'type': p_type}) AS INT) AS n_keys,"
    " array_to_string(list_sort(map_keys(MAP {'brand': p_brand, 'type': p_type})), '|')"
    "   AS keys_sorted"
    " FROM part",
    tag="function",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + extraction + keys (scalar outputs only — sorted
    keys joined to a string — so the comparison depends on neither engine
    map-encoding order nor array canonicalization)."""
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), "|").alias("keys_sorted"),
    )


@query(
    "fn_posexplode",
    "SELECT vec_id, CAST(g.i - 1 AS INT) AS pos, embedding[g.i] AS v"
    " FROM embeddings,"
    " LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g"
    " WHERE vec_id < 20",
    tag="function",
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (``posexplode``): one row per array element with its
    position — the UDTF-style fan-out that keeps element order addressable
    (the oracle's ``unnest WITH ORDINALITY``)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))


@query(
    "fn_struct",
    "SELECT p_partkey,"
    " struct_pack(brand := p_brand, sz := p_size).brand AS brand2,"
    " struct_pack(brand := p_brand, sz := p_size).sz + 1 AS size_plus"
    " FROM part",
    tag="function",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build + field access (``F.struct`` / dotted path) — nested
    records are first-class columns; output is flattened to scalars so both
    engines' struct representations compare exactly."""
    p = load_table(spark, sf_dir, "part")
    s = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("sz"))
    return p.select(
        "p_partkey",
        s.getField("brand").alias("brand2"),
        (s.getField("sz") + 1).alias("size_plus"),
    )


@query(
    "fn_array_setops",
    "SELECT vec_id,"
    " array_to_string(list_transform(list_sort(list_distinct(l)),"
    "   x -> CAST(x AS VARCHAR)), '|') AS dedup_sorted,"
    " len(list_intersect(l, [1, 2, 3])) AS n_common,"
    " list_contains(l, 2) AS has_two,"
    " array_to_string(list_transform(l[2:3], x -> CAST(x AS VARCHAR)), '|') AS middle"
    " FROM (SELECT vec_id,"
    "   [CAST(vec_id % 5 AS BIGINT), CAST(vec_id % 3 AS BIGINT),"
    "    CAST(vec_id % 5 AS BIGINT), 2] AS l"
    "   FROM embeddings WHERE vec_id < 50)",
    tag="function",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (distinct/sort/intersect/contains/slice) over a
    synthesized per-row array — all JVM-side higher-order functions; integer
    array outputs joined to strings (see module comment)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    l = F.array(
        F.pmod("vec_id", F.lit(5)),
        F.pmod("vec_id", F.lit(3)),
        F.pmod("vec_id", F.lit(5)),
        F.lit(2).cast("long"),
    )

    def s_join(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), "|")

    d = e.select("vec_id", l.alias("l"))
    return d.select(
        "vec_id",
        s_join(F.array_sort(F.array_distinct("l"))).alias("dedup_sorted"),
        F.size(F.array_intersect("l", F.array(F.lit(1), F.lit(2), F.lit(3)).cast("array<bigint>"))).alias("n_common"),
        F.array_contains("l", F.lit(2)).alias("has_two"),
        s_join(F.slice("l", 2, 2)).alias("middle"),
    )


@query(
    "fn_array_predicates",
    "SELECT l_orderkey, l_linenumber,"
    " len(list_filter([l_quantity, l_tax, l_discount], x -> x > 0.05)) > 0 AS any_big,"
    " len(list_filter([l_quantity, l_tax, l_discount], x -> x >= 0)) = 3 AS all_nonneg,"
    " CAST(len(list_filter([l_quantity, l_tax, l_discount], x -> x < 0.1)) AS INT)"
    "   AS n_small"
    " FROM lineitem WHERE l_orderkey % 10 = 0",
    tag="function",
)
def fn_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order predicate functions — ``exists`` / ``forall`` / counted
    ``filter`` — all scalar outputs. The oracle re-expresses exists/forall as
    filtered-length comparisons (DuckDB has no direct equivalents), which is
    semantically identical on non-null elements. Same 1-in-10 slice as
    ``fn_array_transform`` to bound per-row list cost in the gate."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    nums = F.array("l_quantity", "l_tax", "l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.exists(nums, lambda x: x > 0.05).alias("any_big"),
        F.forall(nums, lambda x: x >= 0).alias("all_nonneg"),
        F.size(F.filter(nums, lambda x: x < 0.1)).alias("n_small"),
    )


@query(
    "fn_map_higher_order",
    "WITH t AS (SELECT doc_id,"
    "  list_distinct(list_slice(list_filter("
    "    regexp_split_to_array(lower(text), '\\W+'), w -> w <> ''), 1, 6)) AS arr"
    "  FROM documents)"
    " SELECT doc_id,"
    "  array_to_string(list_sort(list_transform("
    "    list_filter(arr, w -> len(w) >= 4), w -> w || ':' || len(w))), '|')"
    "    AS long_toks,"
    "  array_to_string(list_sort(list_transform(arr,"
    "    w -> w || ':' || 2 * len(w))), '|') AS doubled,"
    "  array_to_string(list_sort(list_transform(arr,"
    "    w -> w || ':' || 3 * len(w))), '|') AS zipped"
    " FROM t",
    tag="function",
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions: ``map_from_arrays`` construction, then
    ``map_filter`` / ``transform_values`` / ``map_zip_with`` — all running
    JVM-side in codegen. Each result map is scalarized to a sorted
    'key:value|…' string (see module comment), which the oracle reproduces
    with plain list lambdas — the point being the Spark side exercises the
    real map kernels while the comparison stays representation-neutral."""
    d = load_table(spark, sf_dir, "documents")
    arr = F.array_distinct(
        F.slice(F.filter(F.split(F.lower("text"), r"\W+"), lambda w: w != ""), 1, 6)
    )
    t = d.select("doc_id", arr.alias("arr"))
    m = F.map_from_arrays("arr", F.transform("arr", lambda w: F.length(w)))

    def _entries_str(mcol):
        return F.array_join(
            F.transform(
                F.sort_array(F.map_entries(mcol)),
                lambda e: F.concat_ws(":", e.getField("key"),
                                      e.getField("value").cast("string")),
            ),
            "|",
        )

    mf = F.map_filter(m, lambda k, v: v >= 4)
    tv = F.transform_values(m, lambda k, v: v * 2)
    mz = F.map_zip_with(m, tv, lambda k, v1, v2: v1 + v2)
    return t.select(
        "doc_id",
        _entries_str(mf).alias("long_toks"),
        _entries_str(tv).alias("doubled"),
        _entries_str(mz).alias("zipped"),
    )


@query(
    "fn_explode_outer",
    # DuckDB has no OUTER unnest; [NULL]-substitution on empty lists is the
    # standard emulation and proves the null-row-preserving semantics
    "SELECT vec_id, CAST(unnest(CASE WHEN len(small) = 0 THEN [NULL]"
    "   ELSE small END) AS DOUBLE) AS v"
    " FROM (SELECT vec_id,"
    "   list_filter(embedding, x -> x > 0.18) AS small"
    "   FROM embeddings WHERE vec_id < 200)",
    tag="function",
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving fan-out (``explode_outer``): rows whose array filters
    to empty still emit one NULL row — the LEFT-JOIN-shaped explode. Without
    _outer, rows vanish (inner-join semantics); at 100 TB that silently
    drops every entity with no matching elements, which downstream
    aggregates then miscount. Map-side generator, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    small = F.filter(F.col("embedding"), lambda x: x > 0.18)
    return e.select(
        "vec_id",
        F.explode_outer(small).alias("v0"),
    ).select("vec_id", F.col("v0").cast("double").alias("v"))
