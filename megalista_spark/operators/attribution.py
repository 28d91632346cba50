"""Marketing attribution operators — the analytics layer over the same
click/conversion data the reference's uploaders feed BACK to ad
platforms. Rule-based forms (last-touch as-of, linear, U-shaped
position) live as gated queries; this module holds the DATA-DRIVEN
model: first-order Markov removal-effect attribution (Anderl et al.
2014's removal-effect formulation — public method).

Engine-portable by the same fixed-point discipline as pagerank /
IVF-PQ: transition probabilities are integer micro-units
(count·1e6 // out-total), the absorption iteration is integer
multiply-sum-floor (order-independent — integer adds commute exactly),
and the model state (a K×K matrix, K = #channels + 3) is BOUNDED, so it
collects to the driver under the k-row-centroid license while the
journey/transition extraction stays fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START, CONV, NULL = "START", "CONV", "NULL"


def journey_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    channel_col: str = "event_type",
    conversion: str = "purchase",
) -> DataFrame:
    """(src, dst, n) transition counts over per-user journeys:
    events strictly ordered by (ts, id), truncated at the FIRST
    conversion (which becomes the absorbing CONV state); journeys
    without a conversion end in NULL; START precedes every journey.

    Scale: one window shuffle keyed by user (rank + truncation + lead
    share the sort), then a (src, dst) count whose map-side combine
    collapses to ≤ K² rows.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    seq = events.select(
        F.col(user_col).alias("u"),
        F.when(F.col(channel_col) == conversion, F.lit(CONV))
        .otherwise(F.col(channel_col))
        .alias("ch"),
        F.row_number().over(w).alias("rn"),
    )
    wconv = Window.partitionBy("u")
    conv_rn = F.min(F.when(F.col("ch") == CONV, F.col("rn"))).over(wconv)
    kept = seq.withColumn("_crn", conv_rn).where(
        F.col("_crn").isNull() | (F.col("rn") <= F.col("_crn"))
    )
    wk = Window.partitionBy("u").orderBy("rn")
    stepped = kept.withColumn("nxt", F.lead("ch").over(wk))
    # row transitions: every non-terminal row → next; last non-CONV → NULL
    row_trans = stepped.where(F.col("ch") != CONV).select(
        F.col("ch").alias("src"),
        F.coalesce(F.col("nxt"), F.lit(NULL)).alias("dst"),
    )
    start_trans = kept.where(F.col("rn") == 1).select(
        F.lit(START).alias("src"), F.col("ch").alias("dst")
    )
    return (
        row_trans.unionByName(start_trans)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _iterate(pm: dict, states: list[str], iters: int, scale: int, dead: set) -> dict:
    """Integer absorption iteration: v(CONV)=scale, v(NULL)=0, removed
    channels pinned to 0; v_t(s) = Σ_d pm[s][d]·v_{t-1}(d) // scale."""
    v = {s: 0 for s in states}
    v[CONV] = scale
    for _ in range(iters):
        nxt = dict(v)
        for s in states:
            if s in (CONV, NULL) or s in dead:
                continue
            acc = 0
            for d, p in pm.get(s, {}).items():
                acc += p * v.get(d, 0)
            nxt[s] = acc // scale
        v = nxt
    return v


def markov_removal_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    channel_col: str = "event_type",
    conversion: str = "purchase",
    iters: int = 16,
    scale: int = 1_000_000,
) -> DataFrame:
    """Removal-effect attribution: per channel, how much conversion
    probability disappears when the channel is removed (its state
    absorbs to zero — visits through it die, nothing renormalizes).

    p_conv is P(reach CONV from START) under ``iters`` integer
    fixed-point rounds — fixed iteration count is the determinism
    contract (probability mass farther than ``iters`` steps counts 0;
    with truncated-at-first-conversion journeys the chain is shallow).
    Output: (channel, p_conv_micro, p_removed_micro,
    removal_effect_micro), one row per non-absorbing channel,
    everything in integer micro-units, bit-identical on any engine.
    """
    trans = journey_transitions(
        events, user_col, ts_col, id_col, channel_col, conversion
    ).collect()
    totals: dict[str, int] = {}
    for r in trans:
        totals[r["src"]] = totals.get(r["src"], 0) + r["n"]
    pm: dict[str, dict[str, int]] = {}
    for r in trans:
        pm.setdefault(r["src"], {})[r["dst"]] = r["n"] * scale // totals[r["src"]]
    states = sorted({r["src"] for r in trans} | {r["dst"] for r in trans})
    channels = [s for s in states if s not in (START, CONV, NULL)]

    base = _iterate(pm, states, iters, scale, dead=set())[START]
    rows = []
    for c in channels:
        removed = _iterate(pm, states, iters, scale, dead={c})[START]
        rows.append((c, base, removed, base - removed))
    spark = events.sparkSession
    return spark.createDataFrame(
        rows,
        "channel string, p_conv_micro long, p_removed_micro long, "
        "removal_effect_micro long",
    )


def rfm_scores(
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bins: int = 1024,
) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quintile scores (1..5, 5 best) per user, the classic audience-
    building primitive the reference's customer-match uploads consume
    downstream.

    Quintile edges come from the PORTABLE binned quantiles
    (sketches.binned_quantiles, p20/40/60/80 per metric) — a global
    ntile(5) would be a one-reducer sort over every user; the histogram
    edges cost two scans of the (already user-collapsed) stats relation
    and broadcast as four scalars per metric. score = 1 + #edges
    strictly below the metric; recency inverts (more recent = higher).
    Everything is exact arithmetic over a shared reference instant (the
    data's max ts), so scores are engine-portable.

    Output: (user, recency_days, frequency, monetary, r_score, f_score,
    m_score) — one row per purchasing user.
    """
    from megalista_spark.operators.sketches import binned_quantiles

    ref = purchases.agg(F.max(F.col(ts_col)).alias("_ref"))
    # the per-user stats relation is read ~7 times by ONE plan (each
    # metric's binned_quantiles evaluates it for bounds AND bin counts,
    # plus the final projection) and Spark re-runs the final aggregate
    # for every appearance (only the exchange below it is reused — the
    # _bidir_edges lesson): unchecked, the rfm plan carried 140
    # HashAggregate / 122 Exchange / 40 scan nodes (measured r12).
    # Materialize the user-grain stats ONCE — the SQL oracle's
    # MATERIALIZED stats CTE, and the same eager-checkpoint discipline
    # as the iterative graph kernels.
    stats = (
        purchases.crossJoin(F.broadcast(ref))
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.datediff(F.max("_ref"), F.max(F.col(ts_col))).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.round(F.sum(F.col(value_col)), 6).alias("monetary"),
        )
        .localCheckpoint(eager=True)
    )

    def edges(col: str) -> DataFrame:
        q = binned_quantiles(stats, col, qs=(0.2, 0.4, 0.6, 0.8), bins=bins)
        return q.agg(
            F.min(F.when(F.col("q") == 0.2, F.col("est"))).alias(f"{col}_e20"),
            F.min(F.when(F.col("q") == 0.4, F.col("est"))).alias(f"{col}_e40"),
            F.min(F.when(F.col("q") == 0.6, F.col("est"))).alias(f"{col}_e60"),
            F.min(F.when(F.col("q") == 0.8, F.col("est"))).alias(f"{col}_e80"),
        )

    out = stats
    for col in ("recency_days", "frequency", "monetary"):
        out = out.crossJoin(F.broadcast(edges(col)))

    def score(col: str) -> "F.Column":
        x = F.col(col).cast("double")
        s = F.lit(1)
        for e in ("e20", "e40", "e60", "e80"):
            s = s + (x > F.col(f"{col}_{e}")).cast("int")
        return s

    return out.select(
        "user",
        "recency_days",
        "frequency",
        "monetary",
        # recency: smaller = better → invert the ascending quintile
        (F.lit(6) - score("recency_days")).cast("int").alias("r_score"),
        score("frequency").cast("int").alias("f_score"),
        score("monetary").cast("int").alias("m_score"),
    )

def decayed_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_days: int = 7,
    decimals: int = 2,
) -> DataFrame:
    """Recency-weighted entity scores — RFM's continuous cousin: each
    event contributes its value halved once per elapsed ``half_life_days``
    from the table's newest event, so a user's score is dominated by what
    they did recently without any hard window cutoff.

    Exact integer staircase decay (the fixed-point discipline): with
    n = (Δdays div half_life) whole half-lives elapsed,

        contribution_micro = (value_fixed · 1e6) div 2^min(n, 62)

    — a power-of-two divisor, so the decay reproduces bit-for-bit on any
    engine (continuous 2^(−Δ/h) needs pow/exp; the staircase is the
    portable contract and the ranking it induces is what campaigns act
    on). Values fix-point to ``decimals``.

    Output per key: ``n_events, raw_fixed`` (undecayed sum),
    ``decayed_micro``. Scale shape: a 1-row max(ts) broadcast + ONE hash
    aggregate over events — map-side combined, no window, no sort.
    """
    ref = df.agg(F.max(ts_col).alias("_ref"))
    scale = 10**decimals
    v = F.round(F.col(value_col) * scale).cast("long")
    nh = F.expr(
        f"least(CAST((unix_micros(_ref) - unix_micros({ts_col}))"
        f" div (86400000000 * {int(half_life_days)}) AS BIGINT), 62L)"
    )
    return (
        df.crossJoin(F.broadcast(ref))
        .where(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col), v.alias("_v"), nh.alias("_nh"))
        .select(
            key_col,
            "_v",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_nh AS INT))").alias("_div"),
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("_v").cast("long").alias("raw_fixed"),
            F.sum(F.expr("_v * 1000000 div _div")).cast("long").alias(
                "decayed_micro"
            ),
        )
    )
