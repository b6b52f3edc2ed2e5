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
    # integer-quantized alphas -> deterministic sign votes
    alphas = [
        (f, t, p, e, mm)
        for (f, t, p, e, mm) in chosen
    ]
    vote = F.lit(0).cast("long")
    out_rows = []
    for i, (f, t, p, e, mm) in enumerate(alphas, start=1):
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
    # ONE job computes every round's post-update SSE: the per-round
    # states are tiny checkpointed cell relations, so a tagged union
    # + one grouped aggregate replaces `rounds` separate scalar jobs
    # (measured 1.99 s -> fewer sequential barriers on the floor-bound
    # suite run)
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
