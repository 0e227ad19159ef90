"""Join operators (SURVEY.md §2.B B12, §2.C "Joins").

The reference's declared join use case: "join the input RDD with another
Dataset and select a subset of the join result using Spark SQL"
(``docs/ScalaSparkCompute-sparkcompute.md:10-12``). Here every join type is a
native ``df.join`` with explicit scale posture:

- dimension tables (region/nation/supplier) get ``broadcast()`` hints — no
  shuffle of the fact side;
- fact-fact joins shuffle on the join key and rely on AQE for skew splitting;
- the as-of join avoids the pair-explosion of a naive range join by using the
  union + last-observation-carried-forward window trick: one shuffle, linear
  state, survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "join_inner",
    "SELECT o.o_orderkey, c.c_name, n.n_name AS nation, o.o_totalprice"
    " FROM orders o"
    " JOIN customer c ON o.o_custkey = c.c_custkey"
    " JOIN nation n ON c.c_nationkey = n.n_nationkey"
    " WHERE o.o_totalprice > 100000",
    tag="join",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain fact→dim→dim; dims broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.filter(F.col("o_totalprice") > 100000)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "c_name", F.col("n_name").alias("nation"), "o_totalprice")
    )


@query(
    "join_left",
    "SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice"
    " FROM customer c"
    " LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000",
    tag="join",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a pushed join-side predicate (kept in the ON
    clause so non-matching customers survive)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_right",
    "SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice"
    " FROM orders o"
    " RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000",
    tag="join",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (SURVEY §2.C joins;
    ``docs/ScalaSparkCompute-sparkcompute.md:10-12`` declares the full join
    surface). Mirror of ``join_left`` with the preserved side on the right;
    Catalyst plans it as the same shuffled hash join with build-side swapped."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000)
    return o.join(c, cond, "right").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_full",
    "SELECT c.c_custkey, o.o_orderkey"
    " FROM (SELECT * FROM customer WHERE c_acctbal > 0) c"
    " FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) o"
    " ON o.o_custkey = c.c_custkey",
    tag="join",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (pre-filtered sides so both produce unmatched rows)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, o.o_custkey == c.c_custkey, "full").select("c_custkey", "o_orderkey")


@query(
    "join_semi",
    "SELECT c_custkey, c_name FROM customer c"
    " WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
    "               AND o.o_orderpriority = '1-URGENT')",
    tag="join",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — EXISTS semantics, no row duplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    "SELECT c_custkey, c_name FROM customer c"
    " WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    tag="join",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — NOT EXISTS semantics."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
    tag="join",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane on bounded inputs; the engine keeps
    it legal but every scale-path operator avoids it (see llmops)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_range",
    "SELECT s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal"
    " FROM supplier s JOIN customer c"
    " ON c.c_acctbal >= s.s_acctbal - 50 AND c.c_acctbal <= s.s_acctbal + 50",
    tag="join",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range (non-equi) join. Physically a BroadcastNestedLoopJoin with
    the small side broadcast; at 100 TB the same semantics would be produced
    by bucketing ``c_acctbal`` into bands and equi-joining on band (see
    llmops.similarity for the banding pattern)."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    cond = (c.c_acctbal >= s.s_acctbal - 50) & (c.c_acctbal <= s.s_acctbal + 50)
    return F.broadcast(s).join(c, cond).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


@query(
    "join_asof",
    "SELECT p.event_id, p.user_id, p.ts, c.ts AS prev_click_ts"
    " FROM (SELECT * FROM events WHERE event_type = 'purchase') p"
    " ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c"
    " ON p.user_id = c.user_id AND p.ts >= c.ts",
    tag="join",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest earlier event per key): for each purchase, the most
    recent click by the same user at-or-before its timestamp.

    Implementation is the scalable union + last-value trick — tag both sides,
    union, and carry the last click timestamp forward within each user's
    timeline. One shuffle on ``user_id``, linear per-partition state; no
    pair explosion, unlike the naive ``p×c`` range join. The oracle uses
    DuckDB's native ASOF JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("side"),
    )
    # side=0 sorts clicks before a purchase at the identical timestamp,
    # matching ASOF's inclusive `p.ts >= c.ts` bound.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionAll(purchases)
        .withColumn("prev_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "prev_click_ts")
    )


@query(
    "join_range_banded",
    "SELECT s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal"
    " FROM supplier s JOIN customer c"
    " ON c.c_acctbal >= s.s_acctbal - 50 AND c.c_acctbal <= s.s_acctbal + 50",
    tag="join",
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same range join as ``join_range``, in its 100 TB form: band the
    join value into width-100 buckets (≥ 2× the range radius, so each probe
    row overlaps at most 2 bands), explode the probe side to its covering
    bands, **equi-join on the band**, and post-filter the exact range. The
    nested-loop pair scan becomes a hash/sort-merge join keyed by band —
    shuffle-partitioned and skew-splittable like any equi-join. The oracle is
    the plain range join, proving band+filter ≡ the original predicate."""
    band_w = F.lit(100.0)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s_b = s.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.floor((F.col("s_acctbal") - 50) / band_w),
                F.floor((F.col("s_acctbal") + 50) / band_w),
            )
        ),
    )
    c_b = c.withColumn("band", F.floor(F.col("c_acctbal") / band_w))
    return (
        s_b.join(c_b, "band")
        .where(
            (F.col("c_acctbal") >= F.col("s_acctbal") - 50)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + 50)
        )
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
    )


@query(
    "join_null_safe",
    "WITH l AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg"
    "           FROM customer),"
    " r AS (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg,"
    "       coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS label"
    "       FROM customer)"
    " SELECT r.label, CAST(COUNT(*) AS BIGINT) AS n_cust"
    " FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg"
    " GROUP BY r.label",
    tag="join",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys match
    each other instead of being dropped — the semantics dimension-lookup
    pipelines need when the key is legitimately absent. A plain equi-join
    would silently lose every NULL-key row; here they map to the '(none)'
    dimension row. ``<=>`` is still hashable, so Catalyst plans the same
    broadcast/shuffled hash join as ``=`` (no nested-loop penalty)."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    left = c.select("c_custkey", seg.alias("seg"))
    right = (
        c.select(seg.alias("r_seg"), F.coalesce(seg, F.lit("(none)")).alias("label"))
        .distinct()
    )
    return (
        left.join(F.broadcast(right), left.seg.eqNullSafe(F.col("r_seg")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


_FUZZY_ORACLE = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM names a JOIN names b
  ON a.p_name < b.p_name
 AND abs(length(a.p_name) - length(b.p_name)) <= 2
 AND levenshtein(a.p_name, b.p_name) <= 2
"""


@query("join_fuzzy", _FUZZY_ORACLE, tag="join")
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) self-join — the entity-resolution primitive:
    distinct part names within Levenshtein distance 2 of each other.

    Scale shape: (1) DISTINCT first, so the pair space is over the name
    dictionary, not the fact table; (2) the length band |len_a - len_b| <= 2
    (a *lossless* block: distance <= k forces length delta <= k) is turned
    into a banded EQUI-join — the left side fans out to its 5 admissible
    lengths and the join key is (band length) — so Catalyst plans a hash
    join, never a nested-loop cross product, same device as
    ``join_range_banded``; (3) the exact ``levenshtein`` runs only inside
    surviving buckets. At 100 TB the dictionary join is dominated by bucket
    sizes, and a production run would widen the block key with a cheap
    character-class sketch (first char + length) to cut buckets further."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.sequence(F.length("p_name") - 2, F.length("p_name") + 2)
        ).alias("band_len"),
    )
    b = names.select(F.col("p_name").alias("name_b"), F.length("p_name").alias("band_len"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "band_len")
        .where((F.col("name_a") < F.col("name_b")) & (dist <= 2))
        .select("name_a", "name_b", dist.cast("int").alias("dist"))
    )


#: as-of match tolerance — matches staler than this are dropped to NULL.
ASOF_TOLERANCE_MIN = 30


@query(
    "join_asof_tolerance",
    "SELECT event_id, user_id, ts,"
    " CASE WHEN prev_click_ts >= ts - INTERVAL 30 MINUTE"
    "      THEN prev_click_ts END AS prev_click_ts"
    " FROM ("
    "   SELECT p.event_id, p.user_id, p.ts, c.ts AS prev_click_ts"
    "   FROM (SELECT * FROM events WHERE event_type = 'purchase') p"
    "   ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c"
    "   ON p.user_id = c.user_id AND p.ts >= c.ts)",
    tag="join",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the nearest earlier click per
    user, but only if it happened within the last 30 minutes — the form
    time-series tooling (pandas ``merge_asof(tolerance=...)``, kdb ``wj``)
    exposes, and the right default for sensor/attribution joins where an
    hours-old match is noise. Same single-shuffle union + LOCF carry as
    ``join_asof``; the tolerance is one extra codegen comparison at the end,
    so the 100 TB story is unchanged (no pair fan-out, linear state)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        clicks.unionAll(purchases)
        .withColumn("prev_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    fresh = F.col("prev_click_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTE"
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("prev_click_ts")).alias("prev_click_ts"),
    )


#: spatial radius-join geometry: points live in a 1°×1° micro-degree square,
#: the grid cell edge equals the search radius, so all matches of a point lie
#: in its 3×3 cell neighborhood.
GEO_SPAN = 1_000_000
GEO_RADIUS = 20_000
_GEO_R2 = GEO_RADIUS * GEO_RADIUS

_SPATIAL_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS id,
         (c_custkey * 7919) % {GEO_SPAN} AS lat_u,
         (c_custkey * 104729) % {GEO_SPAN} AS lon_u
  FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
          + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS BIGINT) AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
    + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) <= {_GEO_R2}
"""


@query("join_spatial_radius", _SPATIAL_ORACLE, tag="join")
def join_spatial_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join via grid bucketing: all point pairs within
    distance R, found by keying each point to a grid cell of edge R and
    joining only the 3×3 cell neighborhood — the standard spatial-join
    decomposition (same cost-bounding move as ``join_fuzzy``'s length bands
    and the LSH band buckets: candidates come from an equi-join on a
    locality key, NEVER an all-pairs cross join). The oracle IS the cross
    join, which is exactly the plan this operator exists to avoid: O(n·k)
    with k = neighborhood occupancy vs O(n²).

    Each qualifying pair is found exactly once — the right side fans out to
    its 9 neighbor cells and joins the left side's HOME cell, and the cell
    offset between two fixed points is unique. Coordinates are synthesized
    in integer micro-degrees from customer keys, and the predicate compares
    integer squared distance, so both engines agree bit-exactly (no
    floating-point trig on the cut boundary; a production haversine would
    post-compute on the matched pairs)."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 7919) % GEO_SPAN).alias("lat_u"),
        ((F.col("c_custkey") * 104729) % GEO_SPAN).alias("lon_u"),
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat_u").alias("lat_a"),
        F.col("lon_u").alias("lon_a"),
        F.floor(F.col("lat_u") / GEO_RADIUS).alias("cx"),
        F.floor(F.col("lon_u") / GEO_RADIUS).alias("cy"),
    )
    offsets = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
          for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    )
    b = (
        pts.select(
            F.col("id").alias("id_b"),
            F.col("lat_u").alias("lat_b"),
            F.col("lon_u").alias("lon_b"),
            F.floor(F.col("lat_u") / GEO_RADIUS).alias("bx"),
            F.floor(F.col("lon_u") / GEO_RADIUS).alias("by"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "id_b", "lat_b", "lon_b",
            (F.col("bx") + F.col("o.dx")).alias("cx"),
            (F.col("by") + F.col("o.dy")).alias("cy"),
        )
    )
    dist2 = (
        (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b"))
        + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    )
    return (
        a.join(b, ["cx", "cy"])
        .where((F.col("id_a") < F.col("id_b")) & (dist2 <= _GEO_R2))
        .select("id_a", "id_b", dist2.cast("bigint").alias("dist2"))
    )


#: interval-overlap join bucketing: bucket width in seconds
IVL_BUCKET = 3600

_IVL_ORACLE = f"""
WITH iv AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + (CAST(floor(value * 10) AS BIGINT) % 60 + 1) * 60 AS e
  FROM events WHERE event_type IN ('click', 'purchase')),
a AS (SELECT * FROM iv WHERE event_type = 'click'),
b AS (SELECT * FROM iv WHERE event_type = 'purchase')
SELECT a.event_id AS click_id, b.event_id AS purchase_id,
       CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_s
FROM a JOIN b ON a.user_id = b.user_id
           AND a.s < b.e AND b.s < a.e
"""


@query("join_interval_overlap", _IVL_ORACLE, tag="join")
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: all pairs of time intervals that overlap
    (click activity windows × purchase windows per user), found by
    exploding each interval to the time buckets it covers and equi-joining
    on (user, bucket) — the interval-interval sibling of
    ``join_range_banded``'s point-in-range. The inequality join the oracle
    writes becomes a nested-loop at scale; bucketing makes it a hash join
    whose cost is occupancy, like every banding in this repo.

    A pair overlapping many shared buckets must not duplicate: each pair is
    kept only in the bucket where its overlap BEGINS
    (``floor(max(s_a, s_b) / W)``) — an exact dedup with no distinct
    shuffle, the same first-bucket trick spatial/fuzzy joins use. Interval
    arithmetic stays in integer epoch seconds so both engines agree
    bit-exactly."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    iv = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts")
            + (F.floor(F.col("value") * 10).cast("bigint") % 60 + 1) * 60
        ).alias("e"),
    )
    buckets = F.sequence(
        F.floor(F.col("s") / IVL_BUCKET), F.floor(F.col("e") / IVL_BUCKET)
    )
    a = iv.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
        F.explode(buckets).alias("bkt"),
    )
    b = iv.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
        F.explode(buckets).alias("bkt"),
    )
    overlap_start = F.greatest("s_a", "s_b")
    return (
        a.join(b, ["user_id", "bkt"])
        .where(
            (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
            & (F.floor(overlap_start / IVL_BUCKET) == F.col("bkt"))
        )
        .select(
            "click_id",
            "purchase_id",
            (F.least("e_a", "e_b") - overlap_start).cast("bigint").alias("overlap_s"),
        )
    )


@query(
    "join_asof_nearest",
    "SELECT p.event_id, p.user_id, p.ts,"
    " (SELECT c.ts FROM events c"
    "   WHERE c.event_type = 'click' AND c.user_id = p.user_id"
    "   ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)), c.ts LIMIT 1)"
    " AS nearest_click_ts"
    " FROM events p WHERE p.event_type = 'purchase'",
    tag="join",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-mode as-of join (pandas ``merge_asof(direction='nearest')``):
    for each purchase, the same user's click closest in time on EITHER
    side, ties to the earlier click. The backward-only key
    (``join_asof``) misses a click one second after a purchase in favor
    of one an hour before — nearest mode is what attribution actually
    wants.

    Implementation stays the scalable union trick, run in BOTH
    directions off ONE shuffle: tag and union the sides, carry the last
    click back and the first click forward within each user's timeline,
    and pick whichever neighbor is nearer (equidistant → the earlier,
    matching the oracle's tie rule). Still linear per-partition, no pair
    explosion. The oracle is a genuinely independent implementation —
    a correlated argmin subquery — so the hash match cross-checks the
    window trick against brute force, not against itself."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("side"),
    )
    # side=0 sorts clicks before purchases at identical timestamps, so an
    # exactly-simultaneous click is the backward neighbor (distance 0).
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    us = F.unix_micros("ts")
    prev_us = F.unix_micros("prev_ts")
    next_us = F.unix_micros("next_ts")
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when((us - prev_us) <= (next_us - us), F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    return (
        clicks.unionAll(purchases)
        .withColumn("prev_ts", F.last("click_ts", ignorenulls=True).over(w_back))
        .withColumn("next_ts", F.first("click_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            nearest.alias("nearest_click_ts"),
        )
    )
