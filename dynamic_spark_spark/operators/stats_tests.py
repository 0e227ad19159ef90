"""Statistical tests & distribution-drift diagnostics (data-quality tier).

The reference's surface stops at descriptive aggregates
(``docs/ScalaSparkCompute-sparkcompute.md:16`` declares the full
``groupBy().agg`` summary-statistics path); a production analytics engine
also runs *inferential* checks — is this column correlated with that one,
did the distribution drift between snapshots, do the digits look fabricated,
is the A/B difference significant. These four keys add that tier:

- ``stat_corr_matrix``   — pairwise Pearson correlations, one pass.
- ``stat_ttest_welch``   — Welch two-sample t statistic between groups.
- ``quality_benford``    — first-significant-digit distribution vs Benford's
  law with per-digit chi-square contributions (fraud/synthetic-data screen).
- ``quality_psi_drift``  — Population Stability Index between two time
  windows (the standard ML-monitoring drift score).

Engine-exactness design (shared with ``agg_regression``,
``operators/aggregates.py:355``): float aggregates accumulate in
engine-specific order, so every statistic here is derived from **exact
sufficient statistics** — DECIMAL sums and BIGINT counts that any engine
computes bit-identically — and only the final scalar expressions run in
double, rounded to 6 places. That is what makes a *statistical test*
hash-checkable against DuckDB.

Scale notes: every key is a single scan + one reduce (the corr matrix takes
all 15 sufficient statistics in ONE aggregate — no per-pair passes); the
drift/Benford keys shuffle at most |bins| or 9 rows after the map-side
partial aggregation. Nothing here grows with corpus size past the first
combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# stat_corr_matrix
# ---------------------------------------------------------------------------

#: numeric lineitem columns entering the correlation matrix.
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

# Exactness + speed: every column is 2-dp currency/ratio data, so each value
# becomes an exact int64 "cent" (×100) and every pairwise product is an exact
# int64 (< 10^14 per row). Only the SUM needs more than 64 bits, and
# summing longs cast to DECIMAL(38,0) rides Spark's compact-long decimal
# fast path — ~5× faster than the double→BigDecimal per-row conversion the
# naive DECIMAL(18,6) cast pays, with identical determinism. Pearson
# correlation is invariant under the ×100 rescale, so the final formula is
# unchanged; means are descaled where the statistic isn't scale-free.
_DEC38 = "DECIMAL(38,0)"


def _cents(col: str) -> str:
    return f"CAST(round({col} * 100, 0) AS BIGINT)"


def _corr_oracle() -> str:
    sums = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _CORR_COLS:
        sums.append(
            f"CAST(SUM(CAST({_cents(c)} AS {_DEC38})) AS DOUBLE) AS s_{c}"
        )
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            sums.append(
                f"CAST(SUM(CAST({_cents(a)} * {_cents(b)} AS {_DEC38}))"
                f" AS DOUBLE) AS s_{a}_{b}"
            )
            if a != b:
                pairs.append((a, b))
    rows = [
        f"SELECT '{a}' AS col_x, '{b}' AS col_y,"
        f" ROUND((n * s_{a}_{b} - s_{a} * s_{b})"
        f" / sqrt((n * s_{a}_{a} - s_{a} * s_{a})"
        f" * (n * s_{b}_{b} - s_{b} * s_{b})), 6) AS corr_xy FROM s"
        for a, b in pairs
    ]
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
    )


@query("stat_corr_matrix", _corr_oracle(), tag="stats")
def stat_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (long form) over the lineitem
    numeric columns, computed from exact integer-cent sufficient statistics
    in a **single aggregate** — k columns need k sums + k(k+1)/2 product
    sums in one reduce, not k²/2 separate ``corr()`` passes over the data.
    Products stay in int64 per row (exact); sums widen through
    DECIMAL(38,0) on the compact-long fast path (see module comment). The
    per-pair correlations are then map-side scalar expressions ``stack``-ed
    into rows; the whole key moves one combine's worth of data regardless
    of table size."""
    li = load_table(spark, sf_dir, "lineitem")

    def cents(c: str):
        return F.round(F.col(c) * 100, 0).cast("long")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(
            F.sum(cents(c).cast(_DEC38.lower())).cast("double").alias(f"s_{c}")
        )
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum((cents(a) * cents(b)).cast(_DEC38.lower()))
                .cast("double")
                .alias(f"s_{a}_{b}")
            )
            if a != b:
                pairs.append((a, b))
    s = li.agg(*aggs)
    for a, b in pairs:
        num = F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(
            (F.col("n") * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * (F.col("n") * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        )
        s = s.withColumn(f"corr_{a}_{b}", F.round(num / den, 6))
    stack_args = ", ".join(f"'{a}', '{b}', corr_{a}_{b}" for a, b in pairs)
    return s.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, corr_xy)"
    )


# ---------------------------------------------------------------------------
# stat_ttest_welch
# ---------------------------------------------------------------------------

_TT_CENTS = _cents("l_extendedprice")

_TT_ORACLE = f"""
WITH s AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS n1,
    CAST(COUNT(*) FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS n2,
    CAST(SUM(CAST({_TT_CENTS} AS {_DEC38}))
         FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS sx1,
    CAST(SUM(CAST({_TT_CENTS} AS {_DEC38}))
         FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS sx2,
    CAST(SUM(CAST({_TT_CENTS} * {_TT_CENTS} AS {_DEC38}))
         FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS sxx1,
    CAST(SUM(CAST({_TT_CENTS} * {_TT_CENTS} AS {_DEC38}))
         FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS sxx2
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
), d AS (
  SELECT CAST(n1 AS BIGINT) AS n_r, CAST(n2 AS BIGINT) AS n_a,
         sx1 / n1 AS m1, sx2 / n2 AS m2,
         (sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1 AS se1,
         (sxx2 - sx2 * sx2 / n2) / (n2 - 1) / n2 AS se2
  FROM s
)
SELECT n_r, n_a, ROUND((m1 - m2) / 100, 6) AS mean_diff,
       ROUND((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
       ROUND((se1 + se2) * (se1 + se2)
             / (se1 * se1 / (n_r - 1) + se2 * se2 / (n_a - 1)), 6) AS df_welch
FROM d
"""


@query("stat_ttest_welch", _TT_ORACLE, tag="stats")
def stat_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic ('R' vs 'A' returned
    lineitems on extended price) with the Welch–Satterthwaite degrees of
    freedom. One filtered scan, one global reduce of six conditional DECIMAL
    sums (map-side combine makes the shuffle six numbers per task); the t
    and df formulas are driver-free scalar arithmetic on the single stats
    row. The A/B-test primitive at any scale. Values enter as exact integer
    cents (t and df are scale-invariant; the mean difference descales by
    100 at the end) — see the module comment on the compact-decimal path."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
    )
    x = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    xdec = x.cast(_DEC38.lower())
    xxdec = (x * x).cast(_DEC38.lower())
    r = F.col("l_returnflag") == "R"
    a = F.col("l_returnflag") == "A"
    s = li.agg(
        F.count(F.when(r, 1)).cast("double").alias("n1"),
        F.count(F.when(a, 1)).cast("double").alias("n2"),
        F.sum(F.when(r, xdec)).cast("double").alias("sx1"),
        F.sum(F.when(a, xdec)).cast("double").alias("sx2"),
        F.sum(F.when(r, xxdec)).cast("double").alias("sxx1"),
        F.sum(F.when(a, xxdec)).cast("double").alias("sxx2"),
    )
    m1 = F.col("sx1") / F.col("n1")
    m2 = F.col("sx2") / F.col("n2")
    se1 = (
        (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1"))
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    se2 = (
        (F.col("sxx2") - F.col("sx2") * F.col("sx2") / F.col("n2"))
        / (F.col("n2") - 1)
        / F.col("n2")
    )
    return (
        s.withColumn("se1", se1)
        .withColumn("se2", se2)
        .select(
            F.col("n1").cast("long").alias("n_r"),
            F.col("n2").cast("long").alias("n_a"),
            F.round((m1 - m2) / 100, 6).alias("mean_diff"),
            F.round((m1 - m2) / F.sqrt(F.col("se1") + F.col("se2")), 6).alias(
                "t_stat"
            ),
            F.round(
                (F.col("se1") + F.col("se2")) * (F.col("se1") + F.col("se2"))
                / (
                    F.col("se1") * F.col("se1") / (F.col("n1") - 1)
                    + F.col("se2") * F.col("se2") / (F.col("n2") - 1)
                ),
                6,
            ).alias("df_welch"),
        )
    )


# ---------------------------------------------------------------------------
# quality_benford
# ---------------------------------------------------------------------------

# First significant digit comes from the *integer cents* rendered as a
# string — BIGINT→VARCHAR is canonical in every engine, whereas
# floor(x / 10^floor(log10 x)) risks an off-by-one when x sits within an
# ulp of a power of ten.
_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
), c AS (
  SELECT digit, COUNT(*) AS obs FROM d GROUP BY digit
), t AS (
  SELECT digit, obs, SUM(obs) OVER () AS n FROM c
)
SELECT digit, obs,
       ROUND(n * log10(1.0 + 1.0 / digit), 6) AS expected,
       ROUND((obs - n * log10(1.0 + 1.0 / digit))
             * (obs - n * log10(1.0 + 1.0 / digit))
             / (n * log10(1.0 + 1.0 / digit)), 6) AS chi2_contrib
FROM t
"""


@query("quality_benford", _BENFORD_ORACLE, tag="stats")
def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed count per
    leading digit vs the expected ``N·log10(1+1/d)`` and the per-digit
    chi-square contribution (Σ over the 9 rows is the test statistic). A
    synthetic-or-tampered-data tripwire that costs one map pass + a 9-group
    count; the window total runs over 9 rows, not the table."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("obs")
    )
    n = F.sum("obs").over(Window.partitionBy())
    exp = F.col("n") * F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.withColumn("n", n)
        .select(
            "digit",
            "obs",
            F.round(exp, 6).alias("expected"),
            F.round((F.col("obs") - exp) * (F.col("obs") - exp) / exp, 6).alias(
                "chi2_contrib"
            ),
        )
    )


# ---------------------------------------------------------------------------
# quality_psi_drift
# ---------------------------------------------------------------------------

#: fixed bin width in cents (50 000.00 currency units) — production would
#: freeze baseline-quantile edges instead; fixed edges keep the key
#: deterministic without a second pass.
_PSI_BIN_CENTS = 5_000_000
_PSI_BINS = 10
_PSI_SPLIT = "1998-01-01"

_PSI_ORACLE = f"""
WITH b AS (
  SELECT LEAST({_PSI_BINS - 1},
               CAST(round(o_totalprice * 100, 0) AS BIGINT)
               // {_PSI_BIN_CENTS}) AS bin,
         CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}'
              THEN 'base' ELSE 'curr' END AS era
  FROM orders
), c AS (
  SELECT bin,
         COUNT(*) FILTER (WHERE era = 'base') AS c_base,
         COUNT(*) FILTER (WHERE era = 'curr') AS c_curr
  FROM b GROUP BY bin
), t AS (
  SELECT bin, c_base, c_curr,
         SUM(c_base) OVER () AS n_base, SUM(c_curr) OVER () AS n_curr
  FROM c
)
SELECT bin, c_base, c_curr,
       ROUND((
         (c_base + 1.0) / (n_base + {_PSI_BINS})
         - (c_curr + 1.0) / (n_curr + {_PSI_BINS})
       ) * LN(((c_base + 1.0) / (n_base + {_PSI_BINS}))
              / ((c_curr + 1.0) / (n_curr + {_PSI_BINS}))), 6) AS psi_contrib
FROM t
"""


@query("quality_psi_drift", _PSI_ORACLE, tag="stats")
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre/post-1998 order cohorts
    over fixed-width total-price bins: per-bin ``(p_base - p_curr) ·
    ln(p_base/p_curr)`` with Laplace ``+1`` smoothing so an empty bin on one
    side contributes a finite score instead of ±inf. Σ(psi_contrib) < 0.1 is
    the conventional "no drift" threshold. Plan: one scan, one |bins|-group
    conditional count, windows over ≤10 rows — the monitoring query you can
    afford to run on every snapshot at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    bin_ = F.least(F.lit(_PSI_BINS - 1), F.floor(cents / _PSI_BIN_CENTS)).alias(
        "bin"
    )
    era_base = F.col("o_orderdate") < _PSI_SPLIT
    c = (
        o.select(bin_, era_base.alias("is_base"))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("is_base"), 1)).alias("c_base"),
            F.count(F.when(~F.col("is_base"), 1)).alias("c_curr"),
        )
    )
    w = Window.partitionBy()
    p_base = (F.col("c_base") + 1.0) / (F.sum("c_base").over(w) + _PSI_BINS)
    p_curr = (F.col("c_curr") + 1.0) / (F.sum("c_curr").over(w) + _PSI_BINS)
    return c.select(
        "bin",
        "c_base",
        "c_curr",
        F.round((p_base - p_curr) * F.log(p_base / p_curr), 6).alias(
            "psi_contrib"
        ),
    )


# ---------------------------------------------------------------------------
# stat_moments — exact skewness / kurtosis
# ---------------------------------------------------------------------------

# l_quantity is integer-valued and <= 50, so its power sums stay comfortably
# inside int64 (q^4 <= 6.25e6; x 60M rows ~ 4e14): skewness and excess
# kurtosis derive from four EXACT integer sums — engine-native skewness()/
# kurtosis() accumulate central moments in float, engine-specific order.
_MOM_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS DOUBLE) AS s4
  FROM lineitem GROUP BY l_returnflag
), m AS (
  SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)
           AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM s
)
SELECT l_returnflag, n_rows, ROUND(mu, 6) AS mean_qty,
       ROUND(sqrt(m2), 6) AS stddev_pop,
       ROUND(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3, 6) AS kurtosis_excess
FROM m
"""


@query("stat_moments", _MOM_ORACLE, tag="stats")
def stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population skewness and excess kurtosis per group from four
    integer power sums in one reduce — distribution-shape diagnostics
    (asymmetry, tail weight) without the engine-specific float accumulation
    of native ``skewness()``/``kurtosis()``. Same one-scan/one-combine plan
    as the rest of the stats tier."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(mu, 6).alias("mean_qty"),
        F.round(F.sqrt(m2), 6).alias("stddev_pop"),
        F.round(m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurtosis_excess"),
    )


# ---------------------------------------------------------------------------
# stat_chi2_independence — contingency-table test
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH c AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS obs
  FROM orders GROUP BY 1, 2
), t AS (
  SELECT a, b, obs,
         SUM(obs) OVER (PARTITION BY a) AS row_n,
         SUM(obs) OVER (PARTITION BY b) AS col_n,
         SUM(obs) OVER () AS n
  FROM c
)
SELECT a, b, CAST(obs AS BIGINT) AS obs,
       ROUND(CAST(row_n AS DOUBLE) * col_n / n, 6) AS expected,
       ROUND((obs - CAST(row_n AS DOUBLE) * col_n / n)
             * (obs - CAST(row_n AS DOUBLE) * col_n / n)
             / (CAST(row_n AS DOUBLE) * col_n / n), 6) AS chi2_contrib
FROM t
"""


@query("stat_chi2_independence", _CHI2_ORACLE, tag="stats")
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    (order status × priority): per-cell observed vs ``row·col/N`` expected
    counts and chi-square contributions (Σ over cells is the statistic, df
    = (r-1)(c-1)) — the categorical-association screen for feature
    selection and A/B sanity checks. One |cells|-group count; the margin
    windows run over the contingency table (≤ r·c rows), never the facts."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
    ).agg(F.count(F.lit(1)).alias("obs"))
    row_n = F.sum("obs").over(Window.partitionBy("a"))
    col_n = F.sum("obs").over(Window.partitionBy("b"))
    n = F.sum("obs").over(Window.partitionBy())
    t = c.withColumn("row_n", row_n).withColumn("col_n", col_n).withColumn("n", n)
    exp = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    return t.select(
        "a",
        "b",
        "obs",
        F.round(exp, 6).alias("expected"),
        F.round((F.col("obs") - exp) * (F.col("obs") - exp) / exp, 6).alias(
            "chi2_contrib"
        ),
    )


# ---------------------------------------------------------------------------
# quality_ks_statistic — two-sample Kolmogorov–Smirnov distance
# ---------------------------------------------------------------------------

#: value-range bucket width for the distributed prefix sum (~100 buckets
#: over the price domain; at larger domains the width scales with it).
_KS_BUCKET_CENTS = 500_000

_KS_ORACLE = f"""
WITH v AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END
           AS is_base
  FROM orders
), per_value AS (
  SELECT cents,
         SUM(is_base) AS a,
         SUM(1 - is_base) AS b
  FROM v GROUP BY cents
), cum AS (
  SELECT cents,
         SUM(a) OVER (ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_a,
         SUM(b) OVER (ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_b
  FROM per_value
), totals AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
  FROM per_value
)
SELECT t.n_a, t.n_b,
       CAST(MAX(ABS(CAST(c.cum_a AS BIGINT) * t.n_b
                    - CAST(c.cum_b AS BIGINT) * t.n_a)) AS BIGINT)
         AS d_scaled,
       ROUND(CAST(MAX(ABS(CAST(c.cum_a AS BIGINT) * t.n_b
                          - CAST(c.cum_b AS BIGINT) * t.n_a)) AS DOUBLE)
             / (CAST(t.n_a AS DOUBLE) * t.n_b), 6) AS d_stat
FROM cum c CROSS JOIN totals t
GROUP BY t.n_a, t.n_b
"""


@query("quality_ks_statistic", _KS_ORACLE, tag="stats")
def quality_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the pre/post-1998
    order-price distributions: ``D = max |F_base(x) - F_curr(x)|`` over the
    pooled support — the nonparametric drift test that, unlike PSI, needs
    no binning choice. Exactness: both ECDFs step only at observed values,
    so D is maximized at a data point, and the comparison runs on the
    integer ``|cumA·nB − cumB·nA|`` (cross-multiplied to avoid float
    cumulative fractions) with ONE float division at the very end.

    Scale design — distributed prefix sum, NOT a global-order window (which
    Spark executes on a single reducer): distinct values hash into coarse
    value-range buckets; per-bucket totals (a tiny table) window-cumsum into
    broadcastable prefix offsets, and each bucket's local cumulative sum
    runs in a PARTITIONED window. cum = offset + local. Every shuffle is
    keyed; no operator ever sees more than one bucket's values sorted."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    v = o.select(
        cents.alias("cents"),
        F.when(F.col("o_orderdate") < _PSI_SPLIT, 1).otherwise(0).alias(
            "is_base"
        ),
    )
    per_value = v.groupBy("cents").agg(
        F.sum("is_base").alias("a"), F.sum(1 - F.col("is_base")).alias("b")
    ).withColumn("bucket", F.floor(F.col("cents") / _KS_BUCKET_CENTS))
    bucket_totals = per_value.groupBy("bucket").agg(
        F.sum("a").alias("ba"), F.sum("b").alias("bb")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bucket_totals.select(
        "bucket",
        (F.sum("ba").over(w_off) - F.col("ba")).alias("off_a"),
        (F.sum("bb").over(w_off) - F.col("bb")).alias("off_b"),
    )
    w_local = Window.partitionBy("bucket").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        per_value.join(F.broadcast(offsets), "bucket")
        .select(
            (F.col("off_a") + F.sum("a").over(w_local)).alias("cum_a"),
            (F.col("off_b") + F.sum("b").over(w_local)).alias("cum_b"),
        )
    )
    totals = per_value.agg(
        F.sum("a").cast("long").alias("n_a"), F.sum("b").cast("long").alias("n_b")
    )
    scaled = F.abs(
        F.col("cum_a").cast("long") * F.col("n_b")
        - F.col("cum_b").cast("long") * F.col("n_a")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(scaled).cast("long").alias("d_scaled"),
            F.round(
                F.max(scaled).cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("d_stat"),
        )
    )


# ---------------------------------------------------------------------------
# stat_mannwhitney_u — rank-sum test with tie-averaged ranks
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
  FROM lineitem WHERE l_returnflag IN ('R', 'A')
), per_value AS (
  SELECT cents, SUM(is_r) AS r, SUM(1 - is_r) AS a
  FROM v GROUP BY cents
), cum AS (
  SELECT cents, r, a,
         SUM(r + a) OVER (ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (r + a) AS cum_before
  FROM per_value
), sums AS (
  -- rank2 = twice the tie-averaged rank of every row at this value: an
  -- exact INTEGER (avg rank = cum_before + (cnt+1)/2 can end in .5)
  SELECT CAST(SUM(r) AS BIGINT) AS n_r, CAST(SUM(a) AS BIGINT) AS n_a,
         CAST(SUM(r * (2 * cum_before + (r + a) + 1)) AS BIGINT) AS r1_2
  FROM cum
)
SELECT n_r, n_a,
       -- doubled U: tie-averaged ranks make U a half-integer, and engines
       -- disagree on CAST(x.5 AS BIGINT) (round vs truncate) — 2U is exact
       CAST(r1_2 - n_r * (n_r + 1) AS BIGINT) AS u_stat_x2,
       ROUND(1.0 - (r1_2 - n_r * (n_r + 1))
             / (CAST(n_r AS DOUBLE) * n_a), 6) AS rank_biserial
FROM sums
"""


@query("stat_mannwhitney_u", _MWU_ORACLE, tag="stats")
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the 'R' and 'A' cohorts
    on price, with proper tie-averaged ranks — the nonparametric complement
    to ``stat_ttest_welch`` when normality can't be assumed, plus the
    rank-biserial effect size. Exactness: work on DOUBLED ranks
    (``2·cum_before + cnt + 1``) so tie-averaged .5 ranks stay integers;
    U derives from one exact int64 sum. Same distributed-prefix-sum shape
    as ``quality_ks_statistic`` (bucketed local cumsums, broadcast
    offsets); nothing global-sorts the value domain."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    v = li.select(
        cents.alias("cents"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_r"),
    )
    per_value = v.groupBy("cents").agg(
        F.sum("is_r").alias("r"), F.sum(1 - F.col("is_r")).alias("a")
    ).withColumn("bucket", F.floor(F.col("cents") / _KS_BUCKET_CENTS))
    bucket_totals = per_value.groupBy("bucket").agg(
        F.sum(F.col("r") + F.col("a")).alias("bt")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bucket_totals.select(
        "bucket", (F.sum("bt").over(w_off) - F.col("bt")).alias("off")
    )
    w_local = Window.partitionBy("bucket").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_value.join(F.broadcast(offsets), "bucket").select(
        "r",
        "a",
        (
            F.col("off")
            + F.sum(F.col("r") + F.col("a")).over(w_local)
            - (F.col("r") + F.col("a"))
        ).alias("cum_before"),
    )
    rank2 = 2 * F.col("cum_before") + (F.col("r") + F.col("a")) + 1
    sums = cum.agg(
        F.sum("r").cast("long").alias("n_r"),
        F.sum("a").cast("long").alias("n_a"),
        F.sum(F.col("r") * rank2).cast("long").alias("r1_2"),
    )
    u2 = F.col("r1_2") - F.col("n_r") * (F.col("n_r") + 1)
    return sums.select(
        "n_r",
        "n_a",
        u2.cast("long").alias("u_stat_x2"),
        F.round(
            1.0 - u2 / (F.col("n_r").cast("double") * F.col("n_a")), 6
        ).alias("rank_biserial"),
    )


# ---------------------------------------------------------------------------
# stat_anova_f — one-way ANOVA across the three return-flag groups
# ---------------------------------------------------------------------------

_AN_CENTS = _cents("l_extendedprice")
_AN_GROUPS = ["A", "N", "R"]

_ANOVA_ORACLE = f"""
WITH s AS (
  SELECT
    {", ".join(
        f"CAST(COUNT(*) FILTER (WHERE l_returnflag = '{g}') AS DOUBLE) AS n_{g},"
        f" CAST(SUM(CAST({_AN_CENTS} AS {_DEC38}))"
        f"   FILTER (WHERE l_returnflag = '{g}') AS DOUBLE) AS sx_{g},"
        f" CAST(SUM(CAST({_AN_CENTS} * {_AN_CENTS} AS {_DEC38}))"
        f"   FILTER (WHERE l_returnflag = '{g}') AS DOUBLE) AS sxx_{g}"
        for g in _AN_GROUPS
    )}
  FROM lineitem)
SELECT CAST(n_A + n_N + n_R AS BIGINT) AS n_total,
       ROUND(
         ((sx_A*sx_A/n_A + sx_N*sx_N/n_N + sx_R*sx_R/n_R)
          - (sx_A+sx_N+sx_R)*(sx_A+sx_N+sx_R)/(n_A+n_N+n_R)) / 2
         / (((sxx_A + sxx_N + sxx_R)
             - (sx_A*sx_A/n_A + sx_N*sx_N/n_N + sx_R*sx_R/n_R))
            / (n_A+n_N+n_R - 3)),
         6) AS f_stat,
       ROUND(
         ((sx_A*sx_A/n_A + sx_N*sx_N/n_N + sx_R*sx_R/n_R)
          - (sx_A+sx_N+sx_R)*(sx_A+sx_N+sx_R)/(n_A+n_N+n_R))
         / ((sxx_A + sxx_N + sxx_R)
            - (sx_A+sx_N+sx_R)*(sx_A+sx_N+sx_R)/(n_A+n_N+n_R)),
         6) AS eta_sq
FROM s
"""


@query("stat_anova_f", _ANOVA_ORACLE, tag="stats")
def stat_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic (k=3 return-flag groups on price cents) +
    eta² effect size — the k-group generalization of ``stat_ttest_welch``,
    closing the classical-inference set (t, U, χ², KS, F). Same exact
    sufficient-statistics discipline: per-group count/sum/sum-of-squares as
    int64-cent products through DECIMAL(38,0), ONE aggregate pass, then the
    F ratio as scalar arithmetic — the shuffle carries 9 numbers total
    regardless of table size."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dec = _DEC38.lower()
    aggs = []
    for g in _AN_GROUPS:
        mask = F.col("l_returnflag") == g
        aggs += [
            F.count(F.when(mask, 1)).cast("double").alias(f"n_{g}"),
            F.sum(F.when(mask, cents.cast(dec))).cast("double").alias(f"sx_{g}"),
            F.sum(F.when(mask, (cents * cents).cast(dec)))
            .cast("double")
            .alias(f"sxx_{g}"),
        ]
    s = li.agg(*aggs)
    n = sum(F.col(f"n_{g}") for g in _AN_GROUPS)
    sx = sum(F.col(f"sx_{g}") for g in _AN_GROUPS)
    sxx = sum(F.col(f"sxx_{g}") for g in _AN_GROUPS)
    group_sq = sum(
        F.col(f"sx_{g}") * F.col(f"sx_{g}") / F.col(f"n_{g}") for g in _AN_GROUPS
    )
    ssb = group_sq - sx * sx / n
    ssw = sxx - group_sq
    sst = sxx - sx * sx / n
    k = len(_AN_GROUPS)
    return s.select(
        n.cast("bigint").alias("n_total"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )
