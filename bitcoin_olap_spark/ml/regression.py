"""Log-log OLS regression — the reference's analysis tail
(`sm.OLS(log_y, sm.add_constant(log_x)).fit()`,
btc_logregression_pre.py:80-86) kept in-engine.

Two formulations:

- `loglog_ols_exact`: closed-form simple OLS from exact-decimal moment
  sums (Sx, Sy, Sxx, Sxy, Syy accumulate as DECIMAL — associative, so
  bit-identical across engines and partitionings), final arithmetic in
  double. One aggregation, no iteration, oracle-checkable. This is
  also the 100 TB shape: a map-side partial aggregate of 5 moments, a
  single tiny reduce, closed-form math on the driver row.
- `loglog_ols_ml`: `pyspark.ml.regression.LinearRegression` on the
  same features — the idiomatic MLlib path (distributed WLS/L-BFGS),
  verified in tests against the closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal type for moment accumulation: log-scale magnitudes (<100)
#: with 18 fractional digits; SUM widens to DECIMAL(38,18) — exact.
_MOMENT_DEC = "decimal(28,18)"


def loglog_ols_exact(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """One-row result: (n, slope, intercept, r2) of ln(y) ~ ln(x).

    Rows with x<=0 or y<=0 are dropped (log domain), mirroring the
    reference's dropna (btc_logregression_pre.py:142)."""
    lx = F.log(F.col(x_col))
    ly = F.log(F.col(y_col))
    pts = df.filter((F.col(x_col) > 0) & (F.col(y_col) > 0)).select(
        lx.alias("lx"), ly.alias("ly")
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("lx").cast(_MOMENT_DEC)).alias("sx"),
        F.sum(F.col("ly").cast(_MOMENT_DEC)).alias("sy"),
        F.sum((F.col("lx") * F.col("lx")).cast(_MOMENT_DEC)).alias("sxx"),
        F.sum((F.col("lx") * F.col("ly")).cast(_MOMENT_DEC)).alias("sxy"),
        F.sum((F.col("ly") * F.col("ly")).cast(_MOMENT_DEC)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    # ln() is not bit-specified (JVM Math.log vs libm differ by ~1 ULP),
    # so the statistics are rounded to 6 dp — far above the ULP noise,
    # far below any analytical significance
    return mom.select(
        F.col("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


#: DuckDB twin of `loglog_ols_exact` over a relation named {rel} with
#: columns {x} and {y}.
ORACLE_OLS = """
    SELECT CAST(n AS BIGINT) AS n, ROUND(slope, 6) AS slope,
           ROUND((sy - slope * sx) / n, 6) AS intercept,
           ROUND((cov * cov) / (varx * vary), 6) AS r2
    FROM (
        SELECT n, sx, sy, cov, varx, n * syy - sy * sy AS vary,
               cov / varx AS slope
        FROM (
            SELECT n, sx, sy, sxx, syy, sxy,
                   n * sxy - sx * sy AS cov,
                   n * sxx - sx * sx AS varx
            FROM (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       CAST(SUM(CAST(ln({x}) AS DECIMAL(28,18))) AS DOUBLE) AS sx,
                       CAST(SUM(CAST(ln({y}) AS DECIMAL(28,18))) AS DOUBLE) AS sy,
                       CAST(SUM(CAST(ln({x}) * ln({x}) AS DECIMAL(28,18))) AS DOUBLE) AS sxx,
                       CAST(SUM(CAST(ln({x}) * ln({y}) AS DECIMAL(28,18))) AS DOUBLE) AS sxy,
                       CAST(SUM(CAST(ln({y}) * ln({y}) AS DECIMAL(28,18))) AS DOUBLE) AS syy
                FROM {rel} WHERE {x} > 0 AND {y} > 0
            )
        )
    )
"""


def loglog_ols_ml(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Same regression via pyspark.ml LinearRegression (the MLlib
    path the engine exposes for multi-feature models). One-row result
    with the same schema as `loglog_ols_exact`, rounded to the same
    6 dp.

    solver='normal': for regParam=0 this solves the normal equations
    in closed form (WLS over the Gram matrix) — deterministic, no
    iteration, and numerically within ~1e-12 of the explicit moment
    formula, so the 6-dp rounded output equals `loglog_ols_exact`'s
    and the SAME closed-form SQL oracle (ORACLE_OLS) checks both."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    pts = (
        df.filter((F.col(x_col) > 0) & (F.col(y_col) > 0))
        .select(
            F.log(F.col(x_col)).alias("lx"), F.log(F.col(y_col)).alias("ly")
        )
    )
    assembled = VectorAssembler(
        inputCols=["lx"], outputCol="features"
    ).transform(pts)
    model = LinearRegression(
        featuresCol="features",
        labelCol="ly",
        regParam=0.0,
        solver="normal",
        standardization=False,
    ).fit(assembled)
    # HALF_UP like Spark/DuckDB ROUND (Python round() is banker's)
    from decimal import ROUND_HALF_UP, Decimal

    def r6(v: float) -> float:
        return float(
            Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )

    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                int(assembled.count()),
                r6(float(model.coefficients[0])),
                r6(float(model.intercept)),
                r6(float(model.summary.r2)),
            )
        ],
        "n bigint, slope double, intercept double, r2 double",
    )
