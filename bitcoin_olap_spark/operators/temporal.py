"""Temporal join operators: as-of join and banded range join.

Spark has no native ASOF / interval join (DuckDB and kdb-style engines
do), so these are the canonical distributed formulations:

- `asof_join`: union both sides tagged, one shuffle on the key, sort by
  (ts, side), carry the last-seen right value forward with a running
  `last(ignoreNulls)` window. O(n log n) per key, one shuffle total —
  versus the naive inequality join's quadratic blowup. Right-side rows
  order BEFORE left rows at equal ts, giving inclusive `l.ts >= r.ts`
  semantics (matches DuckDB ASOF).
- `range_join_banded`: interval-containment join (point in [start,
  end)) rewritten as an equi-join on coarse time bands + exact refine
  predicate. A range spanning k bands is replicated k times; with band
  width >= the maximum range length, each range lands in <= 2 bands, so
  the join is linear with constant replication — versus
  BroadcastNestedLoopJoin, which is what Spark plans for a raw
  inequality join.

Skew note (100 TB): both shuffle on the join key / band; a hot key or
dense band is a straggler — compose with operators/skew.salted_join's
strategy or AQE skew splitting as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach `value_cols` from the latest right row
    with right.ts <= left.ts (per key). `right` must be unique per
    (key, ts) — pre-aggregate it otherwise (ties would make the carried
    value nondeterministic in ANY engine).

    The carried payload is ONE struct of all value_cols per right row
    (same shape as asof_join_nearest): every carried field comes from
    the SAME right row even when one of its value columns is genuinely
    NULL there — a per-column last(ignorenulls) would instead fill
    each column from a DIFFERENT right row (a Frankenstein row DuckDB
    ASOF never produces).

    how='left' keeps unmatched left rows (nulls); 'inner' drops only
    rows with NO right row at-or-before (a matched row whose carried
    value is NULL survives, exactly as in SQL ASOF INNER JOIN).
    """
    lcols = left.columns
    r = right.select(
        key,
        ts_col,
        F.struct(*[F.col(vc).alias(vc) for vc in value_cols]).alias(
            "_pack"
        ),
    )
    l = left.withColumn(
        "_pack", F.lit(None).cast(r.schema["_pack"].dataType)
    ).withColumn("_side", F.lit(1))
    rr = r
    for c in lcols:
        if c not in (key, ts_col):
            rr = rr.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rr = rr.withColumn("_side", F.lit(0)).select(*l.columns)

    win = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(rr)
        .select(
            *[c for c in lcols if c not in value_cols],
            F.last("_pack", ignorenulls=True).over(win).alias("_pack"),
            "_side",
        )
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        filled = filled.filter(F.col("_pack").isNotNull())
    return filled.select(
        *[c for c in lcols if c not in value_cols],
        *[F.col("_pack")[vc].alias(vc) for vc in value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """NEAREST as-of: each left row picks the right row minimizing
    |l.ts - r.ts| per key (distance ties break toward the EARLIER
    right row — deterministic). The sibling of `asof_join`'s
    backward-only pick, needed when the reference stream may lag OR
    lead the probe (sensor alignment, quote-to-trade matching both
    directions).

    Same one-shuffle union machinery run in both directions: the
    backward pass carries last-at-or-before values on the (ts, side)
    ordering; the forward pass carries first-at-or-after on the
    mirrored (ts DESC, side) ordering — both windows share ONE key
    exchange (Spark sorts twice within the same partitioning, no
    second shuffle). The carried payload is ONE struct (_rts + all
    value_cols) per right row, so every carried field comes from the
    SAME right row even when a value column is genuinely NULL there —
    last(ignorenulls) skips only left rows (whole-struct NULL), never
    a nearest right row whose field happens to be NULL. This matches
    DuckDB ASOF row semantics exactly. The right ts rides inside the
    struct so the final nearest choice is a map-side integer compare.
    `right` must be unique per (key, ts) — pre-aggregate it otherwise.
    """
    lcols = left.columns
    r = right.select(
        key,
        ts_col,
        F.struct(
            epoch_us(ts_col).alias("_rts"),
            *[F.col(vc).alias(vc) for vc in value_cols],
        ).alias("_pack"),
    )
    l = left.withColumn(
        "_pack", F.lit(None).cast(r.schema["_pack"].dataType)
    ).withColumn("_side", F.lit(1))
    rr = r
    for c in lcols:
        if c not in (key, ts_col):
            rr = rr.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rr = rr.withColumn("_side", F.lit(0)).select(*l.columns)
    u = l.unionByName(rr)

    back = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy(F.desc(ts_col), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "_side",
        F.last("_pack", ignorenulls=True).over(back).alias("_b"),
        F.last("_pack", ignorenulls=True).over(fwd).alias("_f"),
    ).filter(F.col("_side") == 1)
    lus = epoch_us(ts_col)
    use_back = F.col("_f").isNull() | (
        F.col("_b").isNotNull()
        & ((lus - F.col("_b._rts")) <= (F.col("_f._rts") - lus))
    )
    chosen = F.when(use_back, F.col("_b")).otherwise(F.col("_f"))
    return filled.select(
        *lcols,
        *[chosen[vc].alias(vc) for vc in value_cols],
    )


def gap_sessions(
    df: DataFrame,
    key: str,
    ts_col: str,
    order_col: str,
    gap_us: int,
) -> DataFrame:
    """Gap-based sessionization: assign each row a per-key `session_id`
    that increments whenever the gap to the previous row (ordered by
    (ts, order_col) within the key) exceeds `gap_us` microseconds.

    The batch twin of streaming/pipeline.py's session_window query —
    the classic two-window formulation: lag() marks session starts,
    a running sum turns start flags into dense session ids. One shuffle
    on the key; all arithmetic is integer microseconds, so results are
    exact and engine-portable. `order_col` must make (ts, order_col)
    unique per key or session assignment is nondeterministic.
    """
    w = Window.partitionBy(key).orderBy(ts_col, order_col)
    us = epoch_us(ts_col)
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > F.lit(gap_us)), 1
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("_us", us).withColumn(
        "session_id", F.sum(is_new).over(running)
    )


def range_join_banded(
    points: DataFrame,
    ranges: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    band_seconds: int = 30 * 86400,
) -> DataFrame:
    """points ⋈ ranges on `start <= ts < end`, as a banded equi-join.

    `band_seconds` must be >= the maximum range length (each range then
    spans <= 2 bands => <= 2x replication). Points map to one band; the
    join key is the band index; the exact containment predicate refines
    after the hash join. All JVM-side, one shuffle on the band key.
    """
    band_us = F.lit(band_seconds * 1_000_000).cast("long")

    def band_of(c):
        # epoch_us is NTZ-safe; a direct numeric cast of a timestamp
        # is disallowed in Spark 4 (and unix_micros rejects NTZ)
        return F.floor(epoch_us(c) / band_us)

    p = points.withColumn("_band", band_of(ts_col))
    rg = ranges.withColumn(
        "_band",
        F.explode(
            F.sequence(band_of(start_col), band_of(end_col))
        ),
    )
    return (
        p.join(rg, "_band")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_band")
    )


def gapfill_locf(
    series: DataFrame,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Fill holes in a time-bucketed series: regularize to a dense
    `step` spine from the observed min to max bucket, left-join the
    observations, and carry the last observation forward (LOCF) into
    the gaps — the hypertable/timeseries `time_bucket_gapfill +
    locf()` shape.

    The spine is generated from one 2-value aggregate (min/max) via
    `sequence` + explode — no driver round-trip, no literal range.
    The LOCF window is an unpartitioned ORDER BY bucket — correct here
    because the input is POST-AGGREGATION bucket grain whose
    cardinality is bounded by the calendar span, not the data volume
    (same argument as the daily-series windows in queries/windows.py);
    gap-filling a per-key series would add partitionBy(key) and keep
    the same shape.

    Returns (ts, value, filled, is_gap): `value` is null in gaps,
    `filled` is the LOCF value (null before the first observation),
    is_gap is 0/1."""
    bounds = series.agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                "_lo", "_hi", F.expr(f"INTERVAL {step}")
            )
        ).alias(ts_col)
    )
    w = Window.orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    joined = spine.join(series, ts_col, "left")
    return joined.select(
        ts_col,
        F.col(value_col).alias("value"),
        F.last(value_col, ignorenulls=True).over(w).alias("filled"),
        F.when(F.col(value_col).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_gap"),
    )


def ewma_per_group(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Per-group EWMA fold, entirely JVM-side.

    The recurrence y_t = (1-alpha)*y_{t-1} + alpha*x_t is inherently
    sequential — no window FRAME expresses it — but it IS a left fold,
    so the scale-correct formulation stays off the Python path
    entirely: one hash aggregate collects each group's values as an
    ordered array (`array_sort(collect_list(struct(order..., value)))`
    — mergeable partials, one shuffle), then the SQL higher-order
    `aggregate` (foldLeft) runs the recurrence per row in the JVM. The
    fold is the exact multiply/multiply/add sequence DuckDB's
    list_reduce lambda performs on the same ordered list, so values are
    bit-identical before the defensive 6dp round. Output: one row per
    group (key, n_events, ewma).

    The per-group array is bounded by events-per-group (sessions,
    users), not corpus size — the same boundedness argument every
    sessionizer makes. A kernel that cannot be written as a fold (e.g.
    Kalman smoothing) swaps the HOF for `applyInPandas` on the same
    grouped shape; the streaming twin is applyInPandasWithState
    (stream_stateful_seq).
    """
    beta = 1.0 - alpha
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, value_col))
    )
    xs = F.transform(F.col("_seq"), lambda s: s[value_col])
    fold = F.aggregate(
        xs,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.lit(beta) * acc + F.lit(alpha) * x
        ),
    )
    return (
        df.groupBy(key_col)
        .agg(ordered.alias("_seq"))
        .select(
            key_col,
            F.size("_seq").cast("long").alias("n_events"),
            F.round(fold, 6).alias("ewma"),
        )
    )


def _fd2(a: str) -> str:
    """Exact floor division by 2 for a signed BIGINT SQL expression —
    the queries/analytics._fdiv_sql pmod construction specialized to
    divisor 2 with Spark's `div`; the oracle uses the same text with
    `//`. The numerator is made exactly divisible first, so truncating
    and flooring division agree on both engines."""
    return f"((({a}) - (((({a}) % 2) + 2) % 2)) div 2)"


def holt_linear_per_group(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    xq_col: str,
) -> DataFrame:
    """Per-group Holt linear (double-exponential) smoothing with
    alpha = beta = 1/2 in EXACT integer arithmetic, entirely JVM-side.

    The coupled recurrence
        l_t = (x_t + l_{t-1} + b_{t-1}) / 2
        b_t = ((l_t - l_{t-1}) + b_{t-1}) / 2
    is sequential in BOTH states — no window frame and no single-value
    fold expresses it — but it IS a left fold over a 2-field struct
    accumulator, which Spark's higher-order `aggregate` supports
    natively: one hash aggregate collects each group's ordered integer
    series (mergeable partials, one shuffle), then the fold runs the
    recurrence in the JVM with floor divisions (the sign-safe pmod
    form), keeping every state int64-exact. init = (x_1, 0); groups of
    one row return their own value with zero trend. Output: (key,
    n_pts, level_q, trend_q, forecast_q) where forecast_q = level_q +
    trend_q is the one-step-ahead forecast, all on the caller's
    fixed-point scale.

    The per-group array is bounded by points-per-group — ts_holt
    feeds it the post-aggregation DAILY grain (tens of rows per
    group at any corpus scale), the same boundedness argument
    ewma_per_group makes; an unbounded-group caller should
    pre-aggregate first.

    DuckDB's list_reduce cannot carry a struct accumulator (its
    accumulator type must equal the element type), so the oracle twin
    is a recursive CTE walking rn -> rn+1 per group — same recurrence,
    same floor divisions, hash-identical states. The same grouped-
    array shape swaps the HOF for applyInPandas when a kernel stops
    being a fold (ewma_per_group's Kalman note); the streaming twin is
    applyInPandasWithState (stream_stateful_seq)."""
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, xq_col))
    )
    lvl = _fd2(f"x + acc.l + acc.b")
    step = (
        "aggregate("
        "  slice(_xs, 2, greatest(size(_xs) - 1, 0)),"
        "  named_struct('l', _xs[0], 'b', 0L),"
        "  (acc, x) -> named_struct("
        f"    'l', {lvl},"
        f"    'b', {_fd2(lvl + ' - acc.l + acc.b')}))"
    )
    return (
        df.groupBy(key_col)
        .agg(ordered.alias("_seq"))
        .select(
            key_col,
            F.size("_seq").cast("long").alias("n_pts"),
            F.transform(F.col("_seq"), lambda s: s[xq_col]).alias("_xs"),
        )
        .select(
            key_col,
            "n_pts",
            F.expr(step).alias("_st"),
        )
        .select(
            key_col,
            "n_pts",
            F.col("_st.l").alias("level_q"),
            F.col("_st.b").alias("trend_q"),
            (F.col("_st.l") + F.col("_st.b")).alias("forecast_q"),
        )
    )


def holt_winters_per_group(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    xq_col: str,
    m: int = 7,
) -> DataFrame:
    """Per-group ADDITIVE Holt-Winters (triple-exponential) smoothing
    with alpha = beta = gamma = 1/2 and season length `m`, in EXACT
    integer arithmetic, entirely JVM-side — holt_linear_per_group
    extended with a seasonal state:

        l_t = (x_t - s_{t-m} + l_{t-1} + b_{t-1}) / 2
        b_t = ((l_t - l_{t-1}) + b_{t-1}) / 2
        s_t = ((x_t - l_t) + s_{t-m}) / 2

    The seasonal state is a LENGTH-m ARRAY carried inside the fold's
    struct accumulator as a circular buffer (the value for time t
    lives at index (t-1) mod m) — a shape no window frame, no
    single-value fold, and no recursive CTE with a scalar accumulator
    can express, but Spark's higher-order `aggregate` runs natively:
    one hash aggregate collects each group's ordered fixed-point
    series (mergeable partials, one shuffle), the fold walks it in
    the JVM with sign-safe floor divisions, every state int64-exact.

    Init (deterministic, the standard simple scheme): l_0 =
    floor-mean of the first m observations, b_0 = 0, s_j = x_j - l_0
    for j = 1..m; the recurrence starts at t = m+1. Groups with
    n <= m return the floor-mean level, zero trend, zero seasonal
    term, forecast = level (no full season observed — guarded, not
    crashed). Output: (key, n_pts, level_q, trend_q, season_q,
    forecast_q) where season_q = s_{n+1-m} (the seasonal term the
    one-step-ahead forecast consumes) and forecast_q = level_q +
    trend_q + season_q, all on the caller's fixed-point scale.

    Same boundedness contract as holt_linear_per_group: callers feed
    the post-aggregation per-group grain (ts_holt_winters uses the
    DAILY series — tens of rows per group at any corpus scale). The
    oracle twin is a recursive CTE carrying the m seasonal slots as
    m explicit columns updated by CASE on t mod m (DuckDB's
    list_reduce cannot carry a struct accumulator, and its recursive
    CTEs have no array surgery this shape needs) — states
    hash-match exactly."""
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, xq_col))
    )
    g = (
        df.groupBy(key_col)
        .agg(ordered.alias("_seq"))
        .select(
            key_col,
            F.size("_seq").cast("long").alias("n_pts"),
            F.transform(F.col("_seq"), lambda s: s[xq_col]).alias(
                "_xs"
            ),
        )
        .select(
            key_col,
            "n_pts",
            "_xs",
            F.expr(f"least(size(_xs), {m})").alias("_mm"),
            F.expr(
                f"aggregate(slice(_xs, 1, least(size(_xs), {m})), "
                "0L, (a, x) -> a + x)"
            ).alias("_s0"),
        )
        .select(
            key_col,
            "n_pts",
            "_xs",
            "_mm",
            F.expr(
                "((_s0 - ((_s0 % _mm) + _mm) % _mm) div _mm)"
            ).alias("_l0"),
        )
        .select(
            key_col,
            "n_pts",
            "_xs",
            "_l0",
            F.expr("transform(slice(_xs, 1, _mm), x -> x - _l0)").alias(
                "_sinit"
            ),
        )
    )
    # seasonal slot of the CURRENT step: time t = m+1+p -> index
    # (t-1) mod m = p mod m (0-based; element_at is 1-based)
    j = f"int((((acc.p % {m}) + {m}) % {m}))"
    sp = f"element_at(acc.s, {j} + 1)"
    lnew = _fd2(f"x - {sp} + acc.l + acc.b")
    bnew = _fd2(f"{lnew} - acc.l + acc.b")
    snew = _fd2(f"x - {lnew} + {sp}")
    supd = (
        f"concat(slice(acc.s, 1, {j}), array({snew}), "
        f"slice(acc.s, {j} + 2, {m} - 1 - {j}))"
    )
    step = (
        f"aggregate(slice(_xs, {m} + 1, greatest(size(_xs) - {m}, 0)), "
        f"named_struct('l', _l0, 'b', 0L, 's', _sinit, 'p', 0), "
        f"(acc, x) -> named_struct("
        f"'l', {lnew}, 'b', {bnew}, 's', {supd}, 'p', acc.p + 1))"
    )
    # forecast for t = n+1 consumes s_{n+1-m}, last written at index
    # n mod m; below a full season there is no seasonal estimate yet
    season = (
        f"CASE WHEN n_pts >= {m} THEN element_at(_st.s, "
        f"int((((n_pts % {m}) + {m}) % {m}) + 1)) ELSE 0L END"
    )
    return (
        g.select(key_col, "n_pts", F.expr(step).alias("_st"))
        .select(
            key_col,
            "n_pts",
            F.col("_st.l").alias("level_q"),
            F.col("_st.b").alias("trend_q"),
            F.expr(season).alias("season_q"),
        )
        .select(
            key_col,
            "n_pts",
            "level_q",
            "trend_q",
            "season_q",
            (
                F.col("level_q") + F.col("trend_q") + F.col("season_q")
            ).alias("forecast_q"),
        )
    )


def fifo_match(
    buys: DataFrame,
    sells: DataFrame,
    key: str,
    order_col: str,
    qty_col: str,
) -> DataFrame:
    """FIFO lot matching, relationally: each sell consumes the oldest
    unconsumed buy quantity per key. The procedural queue walk is
    rewritten as CUMULATIVE-INTERVAL OVERLAP — each side's running
    sum (one window per side over the same key-partitioned exchange)
    places every row on the key's quantity axis as the interval
    (cum - qty, cum]; a matched lot is exactly a nonempty
    intersection of a buy and a sell interval with quantity
    least(hi_b, hi_s) - greatest(lo_b, lo_s). One equi-join on the
    key with the range predicate refining inside the hash match;
    output is the queue walk's own O(buys + sells) lot count with
    zero iteration — the property that lets FIFO cost-basis
    accounting run at ledger scale where a per-key sequential queue
    cannot. `order_col` must be unique per key (it defines FIFO
    order deterministically); quantities must be non-negative
    integers on the caller's fixed-point grid. Returns (key, buy_id,
    sell_id, qty_q) with buy_id/sell_id = each side's order_col.
    Property-tested lot-for-lot against a literal Python queue walk
    (tests/test_properties.py)."""
    def side(df: DataFrame, out_id: str) -> DataFrame:
        w = (
            Window.partitionBy(key)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn("hi", F.sum(qty_col).over(w)).select(
            key,
            F.col(order_col).alias(out_id),
            "hi",
            (F.col("hi") - F.col(qty_col)).alias("lo"),
        )

    b = side(buys, "buy_id")
    s = side(sells, "sell_id")
    return b.join(
        s,
        (b[key] == s[key]) & (b["lo"] < s["hi"]) & (s["lo"] < b["hi"]),
    ).select(
        b[key],
        "buy_id",
        "sell_id",
        (F.least(b["hi"], s["hi"]) - F.greatest(b["lo"], s["lo"])).alias(
            "qty_q"
        ),
    )


def _fdv(a: str, b: str) -> str:
    """Exact floor division for signed BIGINTs with a VARIABLE
    divisor — queries/analytics._fdiv_sql with Spark's `div`; the
    oracle twin uses the identical text with `//`. Needed by folds
    whose divisor is itself a state expression (Kalman's p + r),
    where _fd2's fixed divisor doesn't apply."""
    return f"((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) div ({b}))"


#: Kalman constants (integer variance units): process noise Q,
#: measurement noise R, initial variance P0 = R. Shared by the fold
#: and the ts_kalman oracle so both engines state the same filter.
KALMAN_Q = 100_000
KALMAN_R = 1_000_000


def kalman_per_group(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    xq_col: str,
) -> DataFrame:
    """Per-group scalar KALMAN FILTER (random-walk state, constant
    process/measurement noise) in EXACT integer arithmetic, entirely
    JVM-side — the stochastic-state sibling of
    holt_linear_per_group's deterministic trend fold:

        p_pred = p + Q
        x' = x + floor(p_pred * (z - x) / (p_pred + R))
        p' = floor(p_pred * R / (p_pred + R))

    The gain k = p_pred/(p_pred+R) never materializes as a float —
    both update equations multiply through by the denominator and
    floor-divide (sign-safe pmod form), so every state is int64-exact
    and the DuckDB recursive-CTE twin hash-matches. p converges to
    the constant-gain fixed point within ~10 steps; x is then an
    exponentially-weighted level whose weight the DATA chose (via
    Q/R), which is exactly what distinguishes the Kalman level from
    ts_ewma's fixed alpha. init = (z_1, R); p is bounded above by
    R + Q, so the products stay within int64 for series up to ~1e12
    on the caller's fixed-point grid (rescale the grid first above
    that). Same boundedness contract as the Holt folds: feed the
    post-aggregation per-group grain."""
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, xq_col))
    )
    pp = f"(acc.p + {KALMAN_Q})"
    den = f"({pp} + {KALMAN_R})"
    step = (
        "aggregate("
        "  slice(_xs, 2, greatest(size(_xs) - 1, 0)),"
        f"  named_struct('x', _xs[0], 'p', CAST({KALMAN_R} AS BIGINT)),"
        "  (acc, z) -> named_struct("
        f"    'x', acc.x + {_fdv(f'{pp} * (z - acc.x)', den)},"
        f"    'p', {_fdv(f'{pp} * CAST({KALMAN_R} AS BIGINT)', den)}))"
    )
    return (
        df.groupBy(key_col)
        .agg(ordered.alias("_seq"))
        .select(
            key_col,
            F.size("_seq").cast("long").alias("n_pts"),
            F.transform(F.col("_seq"), lambda s: s[xq_col]).alias(
                "_xs"
            ),
        )
        .select(key_col, "n_pts", F.expr(step).alias("_st"))
        .select(
            key_col,
            "n_pts",
            F.col("_st.x").alias("x_q"),
            F.col("_st.p").alias("p_q"),
        )
    )


DTW_BIG = 10**17  # +inf stand-in for the DP's out-of-band cell


def dtw_final_row(a_col, b_col):
    """Dynamic-time-warping DP as a JVM array fold: fold over the
    outer series `a_col` carrying the whole DP ROW (array<long>) for
    the inner series `b_col`; returns the final row, whose last
    element is the DTW distance. Integer-exact (costs |a_i - b_j| and
    all sums are int64).

    The within-row recurrence row[j] = e_j + min(m_j, row[j-1])
    (m_j = min(prev[j], prev[j-1])) looks sequential, but factors as
    row[j] = S_j + min_{k<=j}(m_k - S_{k-1}) with S the prefix sums
    of e — so each fold step is pure array ops (transform / slice /
    array_min), no per-element recursion. O(m^2) element touches per
    step via the slices; the series grain is expected DOMAIN-bounded
    (weekly/daily rollups), where m^2 is trivial. Property-tested
    against a naive Python DP (tests/test_properties.py); the ts_dtw
    oracle replays the same factorization as a recursive CTE."""
    big = F.lit(DTW_BIG).cast("long")
    zero = F.lit(0).cast("long")

    def prefix_sums(earr):
        return F.transform(
            F.sequence(F.lit(1), F.size(earr)),
            lambda j: F.aggregate(
                F.slice(earr, F.lit(1), j), zero, lambda p, x: p + x
            ),
        )

    def step(acc, ai, b_arr):
        earr = F.transform(b_arr, lambda x: F.abs(ai - x))
        s = prefix_sums(earr)
        idx = F.sequence(F.lit(1), F.size(b_arr))
        mk = F.transform(
            idx,
            lambda k: F.least(
                F.element_at(acc, k),
                F.when(k > 1, F.element_at(acc, k - 1)).otherwise(big),
            ),
        )
        g = F.transform(
            idx,
            lambda k: F.element_at(mk, k)
            - F.when(k > 1, F.element_at(s, k - 1)).otherwise(zero),
        )
        nxt = F.transform(
            idx,
            lambda j: F.element_at(s, j)
            + F.array_min(F.slice(g, F.lit(1), j)),
        )
        return F.when(F.size(acc) == 0, s).otherwise(nxt)

    return F.aggregate(
        a_col,
        F.array().cast("array<long>"),
        lambda acc, ai: step(acc, ai, b_col),
    )
