"""Boosted-ensemble training on the FEATURE-CELL grain.

Discrete AdaBoost over decision stumps, restated so the boosting loop
never rescans the corpus: with categorical/banded features every row
in the same (f1, f2, f3, y) cell is classified identically by every
candidate stump, so ONE corpus-scale aggregate collapses the fact
table to at most |dom(f1)|*|dom(f2)|*|dom(f3)|*2 cells and all T
rounds run on that domain-bounded relation. This is the 100 TB
boosting architecture: the corpus pass is O(N) once; per-round work is
O(cells x candidates), independent of N.

Weight algebra is INTEGER-EXACT — the textbook multiplicative update
w *= exp(+/-alpha) is replaced by its exact rational equivalent
(misclassified cells scale by (M - E), correct cells by E, which
preserves AdaBoost's relative weights because exp(2*alpha) =
(M-E)/E), followed by a floor-division renormalization onto a fixed
integer simplex of mass S. Every state both engines compare is int64;
alpha itself is computed ONCE PER ROUND at the end as an IEEE double
of the exact (E_t, M_t) integers (the same ln-on-identical-integers
posture as profile_drift_psi).

Overflow contract: after normalization every mass <= S = 1e9 and the
round total M <= S (floor only shrinks), so the pre-normalization
product m * factor <= S^2 = 1e18 < 2^63; the renormalization triple
product m * factor * S runs in decimal(38,0)/HUGEINT. The INITIAL
normalization computes cnt * S in int64, bounding the corpus at
~9e9 rows per training run — sample or widen to decimal first above
that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: integer simplex mass for the normalized weights
ADA_SCALE = 10**9


def stump_candidates(
    spark: SparkSession, domains: dict[int, int]
) -> DataFrame:
    """(feat, thr, pol) candidate relation: thresholds 0..dom-2 per
    feature (a threshold at the domain max splits nothing), both
    polarities. Literal, deterministic, tens of rows."""
    rows = [
        (f, t, p)
        for f, dom in sorted(domains.items())
        for t in range(dom - 1)
        for p in (1, -1)
    ]
    return spark.createDataFrame(rows, "feat long, thr long, pol long")


def _h(feat_val: Column, thr: Column, pol: Column) -> Column:
    """Stump prediction h(x) = pol * (f <= thr ? +1 : -1)."""
    return pol * F.when(feat_val <= thr, 1).otherwise(-1)


def _feat(feat: Column) -> Column:
    """Select the cell's feature value by the stump's feature index."""
    return (
        F.when(feat == 1, F.col("f1"))
        .when(feat == 2, F.col("f2"))
        .otherwise(F.col("f3"))
    )


def adaboost_cells(
    spark: SparkSession,
    cells: DataFrame,
    domains: dict[int, int],
    rounds: int = 3,
) -> DataFrame:
    """Train `rounds` stumps on a (f1, f2, f3, y, cnt) cell relation.

    Control plane per round: one 1-row argmin collect (the chosen
    stump + its exact weighted error E) — M' = 2*E*(M-E) is computed
    ALGEBRAICALLY from the argmin row (the update maps total mass M to
    E*(M-E) on each side of the split), so renormalization needs no
    second aggregation pass. Chosen stumps re-enter the plan as
    literals, keeping every round's mass plan flat (no growing
    lineage).

    Returns one row per round: (round, feat, thr, pol, eps, alpha,
    train_acc) with eps = E/M and train_acc the sign-vote accuracy of
    the final ensemble under integer alpha votes (alpha quantized to
    1e-6 so the vote is an int64 sum)."""
    S = ADA_SCALE
    n_total = cells.agg(F.sum("cnt").alias("n")).collect()[0]["n"]
    m = cells.select(
        "f1",
        "f2",
        "f3",
        "y",
        "cnt",
        F.expr(f"(cnt * {S}) div {n_total}").alias("m"),
    ).localCheckpoint()
    cand = stump_candidates(spark, domains)
    chosen: list[tuple[int, int, int, int, int]] = []
    for _ in range(rounds):
        tot = m.agg(F.sum("m").alias("mm")).collect()[0]["mm"]
        scored = (
            F.broadcast(cand)
            .crossJoin(m)
            .groupBy("feat", "thr", "pol")
            .agg(
                F.sum(
                    F.when(
                        _h(
                            _feat(F.col("feat")),
                            F.col("thr"),
                            F.col("pol"),
                        )
                        != F.col("y"),
                        F.col("m"),
                    ).otherwise(0)
                ).alias("e")
            )
        )
        best = (
            scored.orderBy("e", "feat", "thr", "pol").limit(1).collect()
        )[0]
        feat, thr, pol, err = (
            int(best["feat"]),
            int(best["thr"]),
            int(best["pol"]),
            int(best["e"]),
        )
        if err == 0:
            # a perfectly separating stump would zero every correct
            # cell's mass AND make alpha infinite; impossible as soon
            # as one cell holds both labels, so treat as bad input
            raise ValueError(
                "adaboost_cells: zero weighted error — data is "
                "stump-separable; boosting degenerates"
            )
        chosen.append((feat, thr, pol, err, tot))
        mis = (
            _h(_feat(F.lit(feat)), F.lit(thr), F.lit(pol))
            != F.col("y")
        )
        factor = F.when(mis, F.lit(tot - err)).otherwise(F.lit(err))
        m = (
            m.withColumn(
                "_raw",
                F.col("m").cast("decimal(38,0)") * factor.cast(
                    "decimal(38,0)"
                ),
            )
            .withColumn(
                "m",
                F.expr(
                    f"CAST((_raw * {S}) div "
                    f"(2 * CAST({err} AS DECIMAL(38,0)) "
                    f"* {tot - err}) AS BIGINT)"
                ),
            )
            .drop("_raw")
            .localCheckpoint()
        )
    return _ada_output(spark, cells, chosen)


def _ada_output(
    spark: SparkSession,
    cells: DataFrame,
    chosen: list[tuple[int, int, int, int, int]],
) -> DataFrame:
    """Shared output tail of adaboost_cells / adaboost_cells_fused:
    (round, feat, thr, pol, eps, alpha, train_acc) from the chosen
    (feat, thr, pol, E, M) stumps — integer-quantized alphas drive a
    deterministic sign vote for the ensemble accuracy."""
    vote = F.lit(0).cast("long")
    out_rows = []
    for i, (f, t, p, e, mm) in enumerate(chosen, start=1):
        a_scaled = F.expr(
            f"CAST(round(0.5 * ln(CAST({mm - e} AS DOUBLE) / {e}) "
            f"* 1000000) AS BIGINT)"
        )
        vote = vote + a_scaled * _h(
            _feat(F.lit(f)), F.lit(t), F.lit(p)
        )
        out_rows.append((i, f, t, p, e, mm))
    pred = F.when(vote > 0, 1).otherwise(-1)
    acc = cells.agg(
        F.round(
            F.sum(F.when(pred == F.col("y"), F.col("cnt")).otherwise(0))
            .cast("double")
            / F.sum("cnt"),
            6,
        ).alias("train_acc")
    )
    spec = spark.createDataFrame(
        out_rows, "rnd long, feat long, thr long, pol long, e long, mm long"
    )
    return F.broadcast(spec).crossJoin(acc).select(
        "rnd",
        "feat",
        "thr",
        "pol",
        F.round(F.col("e").cast("double") / F.col("mm"), 6).alias(
            "eps"
        ),
        F.round(
            F.expr(
                "0.5 * ln(CAST(mm - e AS DOUBLE) / e)"
            ),
            6,
        ).alias("alpha"),
        "train_acc",
    )


def gbt_cells(
    spark: SparkSession,
    cells: DataFrame,
    domains: dict[int, int],
    rounds: int = 3,
) -> DataFrame:
    """L2 GRADIENT BOOSTING over regression stumps on the
    (f1, f2, n, sy, syy) cell grain — the squared-loss sibling of
    adaboost_cells, i.e. the GBM everyone actually runs, restated so
    the boosting loop never rescans the corpus: one O(N) aggregate
    collapses the fact table to <= dom(f1)*dom(f2) cells carrying
    (count, sum y, sum y^2), and every round's candidate sweep, leaf
    fit, and prediction update runs on that domain-bounded relation.

    Integer-exact state: predictions start at the floor global mean
    and advance by floor(leaf/2) (learning rate 1/2 as a sign-safe
    floor division — the leaf means never exist as floats), so
    residual sums stay int64 and the unrolled DuckDB oracle
    hash-matches every chosen split and leaf. Split choice maximizes
    the variance-gain surrogate sl^2/nl + sr^2/nr, evaluated as an
    IEEE double of identical int64 inputs, rounded to 4 dp with a
    (feat, thr) tiebreak — deterministic in both engines. Per-round
    control plane: ONE 1-row argmax collect + one sse scalar; chosen
    leaves re-enter the plan as literals (flat lineage, like
    adaboost_cells).

    Returns one row per round: (rnd, feat, thr, leaf_l, leaf_r, sse)
    with sse the post-update sum of squared residuals in value^2
    units (v4^2 / 1e8), rounded 4 dp."""
    rows_cand = [
        (f, t)
        for f, dom in sorted(domains.items())
        for t in range(dom - 1)
    ]
    cand = spark.createDataFrame(rows_cand, "feat long, thr long")
    dec = "decimal(38,0)"
    tot = cells.agg(
        F.sum("sy").cast("long").alias("s"),
        F.sum("n").cast("long").alias("m"),
    ).collect()[0]
    p0 = int(tot["s"]) // int(tot["m"])
    # lazy checkpoints throughout: each round's argmax collect
    # materializes the pending state in the SAME job, so lineage stays
    # flat without a separate barrier job per round
    state = cells.withColumn(
        "pred", F.lit(p0).cast("long")
    ).localCheckpoint(eager=False)
    states: list[DataFrame] = []
    fv = F.when(F.col("feat") == 1, F.col("f1")).otherwise(F.col("f2"))
    out_rows = []
    for rnd in range(1, rounds + 1):
        rs = state.withColumn(
            "rs", F.col("sy") - F.col("n") * F.col("pred")
        )
        sc = (
            F.broadcast(cand)
            .crossJoin(rs)
            .groupBy("feat", "thr")
            .agg(
                F.sum(F.when(fv <= F.col("thr"), F.col("rs")).otherwise(0))
                .cast("long")
                .alias("sl"),
                F.sum(F.when(fv <= F.col("thr"), F.col("n")).otherwise(0))
                .cast("long")
                .alias("nl"),
                F.sum("rs").cast("long").alias("st"),
                F.sum("n").cast("long").alias("nt"),
            )
        )
        gain = F.round(
            F.col("sl").cast("double") * F.col("sl") / F.col("nl")
            + (F.col("st") - F.col("sl")).cast("double")
            * (F.col("st") - F.col("sl"))
            / (F.col("nt") - F.col("nl")),
            4,
        )
        best = (
            sc.filter(
                (F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0)
            )
            .orderBy(gain.desc(), "feat", "thr")
            .limit(1)
            .collect()
        )[0]
        feat, thr = int(best["feat"]), int(best["thr"])
        sl, nl = int(best["sl"]), int(best["nl"])
        sr, nr = int(best["st"]) - sl, int(best["nt"]) - nl
        gl, gr = sl // nl, sr // nr          # exact floor leaf means
        inc_l, inc_r = gl // 2, gr // 2       # learning rate 1/2
        cond = (
            F.col("f1") if feat == 1 else F.col("f2")
        ) <= F.lit(thr)
        state = state.withColumn(
            "pred",
            F.col("pred")
            + F.when(cond, F.lit(inc_l)).otherwise(F.lit(inc_r)),
        ).localCheckpoint(eager=False)
        states.append(state)
        out_rows.append((rnd, feat, thr, gl, gr))
    return _gbt_output(spark, states, out_rows)


def _gbt_output(
    spark: SparkSession,
    states: list[DataFrame],
    out_rows: list[tuple[int, int, int, int, int]],
) -> DataFrame:
    """Shared output tail of gbt_cells / gbt_cells_fused. ONE job
    computes every round's post-update SSE: the per-round states are
    tiny checkpointed cell relations, so a tagged union + one grouped
    aggregate replaces `rounds` separate scalar jobs (measured 1.99 s
    -> fewer sequential barriers on the floor-bound suite run)."""
    dec = "decimal(38,0)"
    tagged = None
    for rnd_i, st in enumerate(states, start=1):
        t = st.select(
            F.lit(rnd_i).cast("long").alias("rnd"),
            "syy", "pred", "sy", "n",
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    sses = {
        int(r["rnd"]): float(r["sse"])
        for r in tagged.groupBy("rnd")
        .agg(
            F.round(
                F.sum(
                    F.col("syy").cast(dec)
                    - 2 * F.col("pred").cast(dec) * F.col("sy")
                    + F.col("n").cast(dec)
                    * F.col("pred")
                    * F.col("pred")
                ).cast("double")
                / 100000000.0,
                4,
            ).alias("sse")
        )
        .collect()
    }
    return spark.createDataFrame(
        [(r, f, t, gl, gr, sses[r]) for (r, f, t, gl, gr) in out_rows],
        "rnd long, feat long, thr long, leaf_l long, leaf_r long, "
        "sse double",
    )


# ------------------------------------------------------- fused variants

#: sign-safe floor-division SQL fragments (Python // semantics; SQL
#: `div` truncates toward zero, which differs on negative numerators —
#: the same guard the v4 fixed-point convention uses everywhere else).
def _fdiv_sql(a: str, b: str) -> str:
    return f"(({a} - ((({a} % {b}) + {b}) % {b})) div {b})"


def adaboost_cells_fused(
    spark: SparkSession,
    cells: DataFrame,
    domains: dict[int, int],
    rounds: int = 3,
    fuse: int = 2,
) -> DataFrame:
    """adaboost_cells with the boosting loop's driver round trips cut
    by fusing `fuse` consecutive rounds into ONE collect job: round
    r+1's stump choice is computed IN-PLAN from round r's 1-row argmin
    relation — the argmin (orderBy + limit 1) stays a RELATION, a
    broadcast crossJoin applies its mass update to the cell grain, and
    the next argmin runs on the updated relation, all inside one plan.
    The per-round total also folds in-plan (one sum aggregate branch),
    so a fused group costs ZERO driver round trips beyond its single
    collect; between groups the collected stumps re-enter as literals
    and the mass relation re-materializes flat (lazy checkpoint), so
    lineage never snowballs past one group. Identical integer algebra
    and output to adaboost_cells (property-tested); a zero weighted
    error raises executor-side via raise_error — the loop form's
    stump-separable guard, kept on the fused path."""
    if fuse < 1:
        raise ValueError(f"adaboost_cells_fused: fuse must be >= 1, got {fuse}")
    S = ADA_SCALE
    dec = "DECIMAL(38,0)"
    cand = stump_candidates(spark, domains)
    n_tot = cells.agg(F.sum("cnt").alias("_n"))
    m = (
        cells.crossJoin(F.broadcast(n_tot))
        .select(
            "f1", "f2", "f3", "y", "cnt",
            F.expr(f"(cnt * {S}) div _n").alias("m"),
        )
        .localCheckpoint()
    )

    def best_of(mrel: DataFrame) -> DataFrame:
        """1-row (feat, thr, pol, _e, _tot) argmin relation."""
        tot = mrel.agg(F.sum("m").alias("_tot"))
        scored = (
            F.broadcast(cand)
            .crossJoin(mrel)
            .groupBy("feat", "thr", "pol")
            .agg(
                F.sum(
                    F.when(
                        _h(
                            _feat(F.col("feat")),
                            F.col("thr"),
                            F.col("pol"),
                        )
                        != F.col("y"),
                        F.col("m"),
                    ).otherwise(0)
                ).alias("_e")
            )
        )
        return (
            scored.orderBy("_e", "feat", "thr", "pol")
            .limit(1)
            .crossJoin(F.broadcast(tot))
        )

    def updated_inplan(mrel: DataFrame, best: DataFrame) -> DataFrame:
        """Mass update with the stump as COLUMNS from the 1-row best
        relation — the fusion seam."""
        mis = (
            _h(_feat(F.col("feat")), F.col("thr"), F.col("pol"))
            != F.col("y")
        )
        return (
            mrel.crossJoin(F.broadcast(best))
            .withColumn(
                "_factor",
                F.when(
                    F.col("_e") == 0,
                    F.raise_error(
                        F.lit(
                            "adaboost_cells: zero weighted error — "
                            "data is stump-separable; boosting "
                            "degenerates"
                        )
                    ).cast("long"),
                ).otherwise(
                    F.when(mis, F.col("_tot") - F.col("_e")).otherwise(
                        F.col("_e")
                    )
                ),
            )
            .withColumn(
                "m",
                F.expr(
                    f"CAST((CAST(m AS {dec}) * CAST(_factor AS {dec})"
                    f" * CAST({S} AS {dec})) div"
                    f" (2 * CAST(_e AS {dec})"
                    f" * CAST(_tot - _e AS {dec})) AS BIGINT)"
                ),
            )
            .select("f1", "f2", "f3", "y", "cnt", "m")
        )

    def updated_lit(
        mrel: DataFrame, feat: int, thr: int, pol: int, e: int, tot: int
    ) -> DataFrame:
        mis = (
            _h(_feat(F.lit(feat)), F.lit(thr), F.lit(pol)) != F.col("y")
        )
        factor = F.when(mis, F.lit(tot - e)).otherwise(F.lit(e))
        return (
            mrel.withColumn(
                "_raw", F.col("m").cast(dec) * factor.cast(dec)
            )
            .withColumn(
                "m",
                F.expr(
                    f"CAST((_raw * {S}) div (2 * CAST({e} AS {dec})"
                    f" * {tot - e}) AS BIGINT)"
                ),
            )
            .drop("_raw")
        )

    chosen: list[tuple[int, int, int, int, int]] = []
    r = 0
    while r < rounds:
        group = min(fuse, rounds - r)
        # chain `group` rounds lazily; union their 1-row bests and
        # collect ONCE
        bests: list[DataFrame] = []
        cur = m
        for g in range(group):
            b = best_of(cur)
            bests.append(b.withColumn("_g", F.lit(g)))
            if g + 1 < group:
                cur = updated_inplan(cur, b)
        pair = bests[0]
        for b in bests[1:]:
            pair = pair.unionByName(b)
        rows = sorted(pair.collect(), key=lambda x: x["_g"])
        for row in rows:
            feat, thr, pol, e, tot = (
                int(row["feat"]),
                int(row["thr"]),
                int(row["pol"]),
                int(row["_e"]),
                int(row["_tot"]),
            )
            if e == 0:
                raise ValueError(
                    "adaboost_cells: zero weighted error — data is "
                    "stump-separable; boosting degenerates"
                )
            chosen.append((feat, thr, pol, e, tot))
        r += group
        if r < rounds:
            # re-materialize the group's updates as flat literals
            for feat, thr, pol, e, tot in chosen[-group:]:
                m = updated_lit(m, feat, thr, pol, e, tot)
            m = m.localCheckpoint(eager=False)
    return _ada_output(spark, cells, chosen)


def gbt_cells_fused(
    spark: SparkSession,
    cells: DataFrame,
    domains: dict[int, int],
    rounds: int = 3,
    fuse: int = 2,
) -> DataFrame:
    """gbt_cells with `fuse` consecutive boosting rounds per collect
    job — the same fusion seam as adaboost_cells_fused: the argmax
    stays a 1-row RELATION (orderBy gain + limit 1), a broadcast
    crossJoin applies its leaf update to the cell grain with SIGN-SAFE
    in-plan floor divisions (SQL `div` truncates toward zero; residual
    sums go negative, so Python's // semantics are restated as
    a - ((a % b + b) % b) over b > 0), and the next argmax runs on the
    updated relation inside the same plan. Between groups the
    collected splits re-enter as literals and the state re-materializes
    flat (lazy checkpoint). Identical integer state and output to
    gbt_cells (property-tested)."""
    if fuse < 1:
        raise ValueError(f"gbt_cells_fused: fuse must be >= 1, got {fuse}")
    rows_cand = [
        (f, t)
        for f, dom in sorted(domains.items())
        for t in range(dom - 1)
    ]
    cand = spark.createDataFrame(rows_cand, "feat long, thr long")
    tot = cells.agg(
        F.sum("sy").cast("long").alias("s"),
        F.sum("n").cast("long").alias("m"),
    ).collect()[0]
    p0 = int(tot["s"]) // int(tot["m"])
    state = cells.withColumn(
        "pred", F.lit(p0).cast("long")
    ).localCheckpoint(eager=False)
    fv = F.when(F.col("feat") == 1, F.col("f1")).otherwise(F.col("f2"))

    def best_of(st: DataFrame) -> DataFrame:
        """1-row (feat, thr, sl, nl, st, nt) argmax relation."""
        rs = st.withColumn(
            "rs", F.col("sy") - F.col("n") * F.col("pred")
        )
        sc = (
            F.broadcast(cand)
            .crossJoin(rs)
            .groupBy("feat", "thr")
            .agg(
                F.sum(
                    F.when(fv <= F.col("thr"), F.col("rs")).otherwise(0)
                )
                .cast("long")
                .alias("sl"),
                F.sum(
                    F.when(fv <= F.col("thr"), F.col("n")).otherwise(0)
                )
                .cast("long")
                .alias("nl"),
                F.sum("rs").cast("long").alias("st"),
                F.sum("n").cast("long").alias("nt"),
            )
        )
        gain = F.round(
            F.col("sl").cast("double") * F.col("sl") / F.col("nl")
            + (F.col("st") - F.col("sl")).cast("double")
            * (F.col("st") - F.col("sl"))
            / (F.col("nt") - F.col("nl")),
            4,
        )
        return (
            sc.filter(
                (F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0)
            )
            .orderBy(gain.desc(), "feat", "thr")
            .limit(1)
        )

    _gl = _fdiv_sql("sl", "nl")
    _gr = _fdiv_sql("(st - sl)", "(nt - nl)")
    _inc_l = _fdiv_sql(f"({_gl})", "2")
    _inc_r = _fdiv_sql(f"({_gr})", "2")

    def updated_inplan(st: DataFrame, best: DataFrame) -> DataFrame:
        cond = (
            F.when(F.col("feat") == 1, F.col("f1")).otherwise(
                F.col("f2")
            )
            <= F.col("thr")
        )
        return (
            st.crossJoin(F.broadcast(best))
            .withColumn(
                "pred",
                F.col("pred")
                + F.when(cond, F.expr(_inc_l)).otherwise(
                    F.expr(_inc_r)
                ),
            )
            .select("f1", "f2", "n", "sy", "syy", "pred")
        )

    out_rows: list[tuple[int, int, int, int, int]] = []
    states: list[DataFrame] = []
    rnd = 0
    while rnd < rounds:
        group = min(fuse, rounds - rnd)
        bests: list[DataFrame] = []
        cur = state
        for g in range(group):
            b = best_of(cur)
            bests.append(b.withColumn("_g", F.lit(g)))
            if g + 1 < group:
                cur = updated_inplan(cur, b)
        u = bests[0]
        for b in bests[1:]:
            u = u.unionByName(b)
        rows = sorted(u.collect(), key=lambda x: x["_g"])
        for row in rows:
            rnd += 1
            feat, thr = int(row["feat"]), int(row["thr"])
            sl, nl = int(row["sl"]), int(row["nl"])
            sr, nr = int(row["st"]) - sl, int(row["nt"]) - nl
            gl, gr = sl // nl, sr // nr
            inc_l, inc_r = gl // 2, gr // 2
            cond = (
                F.col("f1") if feat == 1 else F.col("f2")
            ) <= F.lit(thr)
            state = state.withColumn(
                "pred",
                F.col("pred")
                + F.when(cond, F.lit(inc_l)).otherwise(F.lit(inc_r)),
            ).localCheckpoint(eager=False)
            states.append(state)
            out_rows.append((rnd, feat, thr, gl, gr))
    return _gbt_output(spark, states, out_rows)
