"""Event-stream operators (batch forms; streaming twins live in
megalista_spark/streaming/).

- ``sessionize``: gap-based sessionization via lag + running sum — the
  classic batch formulation (one shuffle on user_id, sort within
  partition; Spark executes the two windows over the same partitioning —
  a single exchange).
- ``tumbling_rollup``: fixed-window aggregation (the batch equivalent of a
  Structured Streaming windowed agg); window start is date_trunc-style so
  external engines (time_bucket) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def money_sum(value_col: str, decimals: int = 2) -> Column:
    """Fixed-point sum of a money-like double column.

    Each value is quantized to ``decimals`` decimal places (integer
    "cents"), summed as a long, and rescaled — so the total is exact and
    bit-identical across engines/partition orders at any row count
    (float summation is order-dependent; long summation is not).

    CONTRACT: inputs MUST have at most ``decimals`` decimal places —
    finer-precision values are rounded per-row before summation. Callers
    with e.g. 4-decimal values must pass ``decimals=4`` or the extra
    precision is silently dropped. Overflow headroom: at decimals=2 a
    long holds ~9.2e16 cents ≈ $9.2e14 — ample for any one group.
    """
    scale = 10 ** decimals
    return F.round(
        F.sum(F.round(F.col(value_col) * scale).cast("long")) / float(scale), 6
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    Output: events + (session_seq) where session_seq is the 1-based session
    index within the user. Both windows share the same partitioning, so
    Catalyst plans exactly one exchange + one sort.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond-exact gap so external engines (epoch_us) agree bit-for-bit;
    # the timestamp cast is a no-op for TimestampType and value-preserving
    # for TIMESTAMP_NTZ under a UTC session zone (unix_micros rejects NTZ)
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    value_decimals: int = 2,
) -> DataFrame:
    """Per-session aggregates over the sessionized stream.

    ``total_value`` uses fixed-point summation (see :func:`money_sum`):
    ``value_col`` is assumed to carry at most ``value_decimals`` decimal
    places (default 2 — money); pass a larger ``value_decimals`` for
    finer-precision values or they are rounded per-row.
    """
    s = sessionize(events, gap_minutes, user_col, ts_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(value_col, value_decimals).alias("total_value"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def concurrency_sweep(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line concurrency: for every boundary instant, how many
    intervals are open — (at_sec bigint, concurrent bigint). The classic
    max-concurrent-sessions / peak-load computation.

    Interval ends become +1/-1 deltas. Ends are INCLUSIVE: the -1 lands at
    end+1, so an interval is still open at its own end second, and two
    intervals touching at one second both count there (concurrent=2). Then
    ONE ordered running sum per the whole timeline. The sort is the
    scale limit — for a 100 TB timeline, pre-aggregate deltas per second
    first (done here: groupBy collapses to ≤ |distinct seconds| rows, so
    the window sorts boundaries, not raw intervals).
    """
    from pyspark.sql import Window

    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    deltas = (
        intervals.select(s.alias("at_sec"), F.lit(1).alias("d"))
        .unionByName(intervals.select((e + 1).alias("at_sec"), F.lit(-1).alias("d")))
        .groupBy("at_sec")
        .agg(F.sum("d").alias("d"))
    )
    w = Window.orderBy("at_sec").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.withColumn(
        "concurrent", F.sum("d").over(w).cast("bigint")
    ).select("at_sec", "concurrent")


def hopping_rollup(
    events: DataFrame,
    window_minutes: int = 60,
    slide_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    value_decimals: int = 2,
) -> DataFrame:
    """Hopping (sliding) window rollup: each event contributes to
    window/slide overlapping windows. ``F.window(ts, w, s)`` generates the
    covering windows JVM-side (a Generate, no shuffle) and the aggregate
    shuffles (window_start, key) groups — the replication factor w/s is
    explicit and bounded, never a range self-join.

    Windows align to the epoch, matching external generate_series oracles.
    ``total_value`` is a fixed-point sum (see :func:`money_sum`): values
    finer than ``value_decimals`` decimals are rounded per-row.
    """
    win = F.window(
        F.col(ts_col), f"{window_minutes} minutes", f"{slide_minutes} minutes"
    )
    return (
        events.groupBy(win.getField("start").alias("window_start"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(value_col, value_decimals).alias("total_value"),
        )
    )


def tumbling_rollup(
    events: DataFrame,
    minutes: int = 60,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    value_decimals: int = 2,
) -> DataFrame:
    """Fixed tumbling-window rollup: (window_start, key) → count/sum.

    ``window(ts, ...)`` buckets align to the epoch, matching external
    time_bucket semantics. One partial-aggregated shuffle.
    ``total_value`` is a fixed-point sum (see :func:`money_sum`): values
    finer than ``value_decimals`` decimals are rounded per-row.
    """
    win = F.window(F.col(ts_col), f"{minutes} minutes")
    return (
        events.groupBy(win.getField("start").alias("window_start"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(value_col, value_decimals).alias("total_value"),
        )
    )


def gap_islands(
    df: DataFrame, key_col: str, bucket_size: int = 1 << 20
) -> DataFrame:
    """Gaps-and-islands over an integer key: contiguous runs of present
    keys as (run_start, run_end, run_len).

    The textbook ``key - row_number()`` trick needs ONE global window —
    a single-partition sort, the thing that doesn't scale. This is the
    two-level form (same shape as sharded sequence packing): local
    islands inside ``bucket_size``-wide key buckets (row_number
    partitioned BY BUCKET — distributed), then a fragment-stitching pass
    that chains runs meeting at bucket boundaries. The second window IS
    global, but over fragments (≤ keys/bucket_size + runs), not keys —
    the standard two-level reduction.
    """
    from pyspark.sql import Window

    keys = df.select(F.col(key_col).cast("long").alias("k")).distinct()
    b = keys.withColumn("bucket", F.expr(f"k div {bucket_size}"))
    w_local = Window.partitionBy("bucket").orderBy("k")
    local = (
        b.withColumn("grp", F.col("k") - F.row_number().over(w_local))
        .groupBy("bucket", "grp")
        .agg(
            F.min("k").alias("s"),
            F.max("k").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w_frag = Window.orderBy("s")
    chained = (
        local.withColumn("prev_e", F.lag("e").over(w_frag))
        .withColumn(
            "new_chain",
            F.when(
                F.col("prev_e").isNull() | (F.col("s") != F.col("prev_e") + 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "chain",
            F.sum("new_chain").over(w_frag.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        chained.groupBy("chain")
        .agg(
            F.min("s").alias("run_start"),
            F.max("e").alias("run_end"),
            F.sum("n").alias("run_len"),
        )
        .select("run_start", "run_end", "run_len")
    )


def _funnel_stage_bucketed(
    cur: DataFrame, step_events: DataFrame, window_seconds: int
) -> DataFrame:
    """One funnel stage: earliest step event per (u, t1) chain with
    tk < t ≤ t1 + window.

    The join key is (user, t div window): any event inside a chain's
    window lands in the chain's own bucket or the next one (div is
    monotone and bucket(t1+W) ≤ bucket(t1)+1), so each chain probes
    exactly two buckets and per-task work is bounded by per-2W event
    density — the whole-history per-user cross product can't form.
    """
    w = window_seconds
    cand = cur.select(
        "u",
        "t1",
        "tk",
        F.explode(
            F.array(F.expr(f"t1 div {w}"), F.expr(f"t1 div {w} + 1"))
        ).alias("b"),
    )
    nxt = step_events.select(
        F.col("u").alias("_u"),
        F.col("t").alias("_t"),
        F.expr(f"t div {w}").alias("_b"),
    )
    return (
        cand.join(nxt, (F.col("u") == F.col("_u")) & (F.col("b") == F.col("_b")))
        .where((F.col("_t") > F.col("tk")) & (F.col("_t") <= F.col("t1") + F.lit(w)))
        .groupBy("u", "t1")
        .agg(F.min("_t").alias("tk"))
    )


def windowed_funnel_chains(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Completed full-depth funnel chains, kept instead of counted:
    (u, t1, tk) per (user, first-step event) whose greedy-earliest chain
    reaches the final step inside the window — the latency-analysis twin
    of :func:`windowed_funnel` (same greedy-exactness argument, same
    bucketed stage joins)."""
    sec = F.col(ts_col).cast("long")
    typed = events.select(
        F.col(user_col).alias("u"), sec.alias("t"), F.col(type_col).alias("et")
    )
    cur = (
        typed.where(F.col("et") == steps[0])
        .select("u", F.col("t").alias("t1"), F.col("t").alias("tk"))
        .distinct()
    )
    for step in steps[1:]:
        cur = _funnel_stage_bucketed(
            cur, typed.where(F.col("et") == step), window_seconds
        )
    return cur


def windowed_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-bounded ordered funnel (the ClickHouse ``windowFunnel``
    semantics; public): (level, n_users) where n_users counts users with
    SOME chain e1 < e2 < ... < e_level of the given step types whose
    whole span fits in ``window_seconds`` of the chain's FIRST event.
    Levels are cumulative (a level-3 user counts at 1, 2 and 3).

    Exactness via the greedy-earliest argument: for a fixed first-step
    event, taking the EARLIEST qualifying next event at every stage
    dominates any other choice (it can only leave more room for later
    stages), so per (user, first-event) chains the greedy chain is
    optimal, and maximizing over first events is exact — no per-user
    event-subset search.

    Plan shape: stage k is one equi-join on (user, window-width time
    bucket) — each candidate chain fans out to the two buckets its
    window can touch, each step event carries its own bucket, and the
    window predicate then filters exactly — followed by a min-aggregate
    per (user, chain start). Bucketing the join key bounds per-task work
    by the user's event density within 2·window, not their whole
    history: a bot user with 10^6 events over a year joins per-hour
    slices, never a 10^6×10^6 per-user cross product. Timestamps compare
    as epoch seconds (bigint) so the window bound is integer arithmetic
    any engine reproduces. No window function ever sees the whole
    stream.
    """
    sec = F.col(ts_col).cast("long")
    typed = events.select(
        F.col(user_col).alias("u"), sec.alias("t"), F.col(type_col).alias("et")
    )
    # each stage's chain table is read twice (own level count + next
    # stage's probe), but the duplicated work sits above runtime-reused
    # exchanges — per-stage eager materialization was TRIED (r12) and
    # measured slightly WORSE at bench scale (stages/tasks up, wall up);
    # the lazy form stays
    chains = (
        typed.where(F.col("et") == steps[0])
        .select("u", F.col("t").alias("t1"))
        .distinct()
    )
    # users reaching >= level 1
    reach = [chains.select("u").distinct()]
    cur = chains.select("u", "t1", F.col("t1").alias("tk"))
    for step in steps[1:]:
        cur = _funnel_stage_bucketed(
            cur, typed.where(F.col("et") == step), window_seconds
        )
        reach.append(cur.select("u").distinct())
    out = None
    for lvl, r in enumerate(reach, start=1):
        row = r.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(lvl).alias("level"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("level")


def sequence_pattern_match(
    events: DataFrame,
    pattern: str,
    symbols: dict[str, str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Behavioral sequence matching (the ClickHouse ``sequenceMatch``
    idea; public): each user's event history becomes one compact symbol
    string — event types mapped through ``symbols`` (e.g. view→'v'),
    unmapped types dropped — ordered by (ts, type); ``pattern`` is a
    plain regex over that string. Returns (user_id, seq, is_match).

    Examples: ``v[^p]*e`` = "a view followed by an error with no
    purchase in between"; ``(vc){2,}`` = "at least two view→click
    loops".

    Determinism: the (ts, type) sort key breaks same-second ties
    identically on every engine, and the per-user string is built with
    an in-row ``array_sort`` over collected (ts, sym) structs — ONE
    user-keyed aggregate, state bounded by events-per-user, no window
    over the stream. The regex then runs at scan speed over |users|
    rows. Seconds-truncated timestamps keep tie behavior identical to
    the funnel operators.
    """
    mapped = F.create_map(
        *[F.lit(x) for kv in symbols.items() for x in kv]
    )[F.col(type_col)]
    rows = events.select(
        F.col(user_col),
        F.col(ts_col).cast("long").alias("_t"),
        mapped.alias("_s"),
    ).where(F.col("_s").isNotNull())
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_t"), F.col("_s")))
            ),
            lambda s: s["_s"],
        ),
    )
    return (
        rows.groupBy(user_col)
        .agg(seq.alias("seq"))
        .select(
            user_col,
            "seq",
            F.col("seq").rlike(pattern).alias("is_match"),
        )
    )


def frequent_event_ngrams(
    events: DataFrame,
    n: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``top_k`` most frequent length-``n`` event-type sequences
    across all users — sequential-pattern mining's workhorse tier (the
    contiguous n-gram), the behavioral sibling of the text collocation
    miner.

    One user-keyed window (single shuffle+sort; ``id_col`` breaks
    same-timestamp ties so the sequence order is engine-independent)
    emits each row's following n−1 event types via lead(); the gram
    string aggregates map-side and the top-k cut is orderBy+limit
    (TakeOrdered: per-partition heaps + a k-row driver merge, no global
    sort). At 100 TB the window shuffle is the one unavoidable pass;
    per-user state is a sort, never a collect.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    grams = events.select(
        F.concat_ws(">", *parts).alias("gram"),
        parts[-1].alias("_last"),
    ).where(F.col("_last").isNotNull())
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(top_k)
    )


def sequential_pattern_support(
    events: DataFrame,
    max_len: int = 3,
    min_support: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """GAP-ALLOWED sequential-pattern support (the PrefixSpan problem,
    Pei et al. 2001, restricted to single-item elements and length ≤ 3;
    public method): for each ordered event-type subsequence ⟨a⟩, ⟨a,b⟩,
    ⟨a,b,c⟩, the number of users whose history CONTAINS it — other
    events may fall in between, which is what ``frequent_event_ngrams``
    (contiguous grams) cannot see. Returns (pattern, length, support)
    with ``a>b>c`` pattern strings, support ≥ ``min_support``, ordered
    by (length, support desc, pattern).

    A naive contains-check explodes each user's m events into O(m³)
    subsequences. The greedy-earliest-occurrence identity makes it
    LINEAR in events: a subsequence exists iff matching each symbol at
    its earliest possible position succeeds, so

        ⟨a,b⟩   exists  iff  first(a) < last(b)
        ⟨a,b,c⟩ exists  iff  e(a,b) < last(c)
          where e(a,b) = min{ts_b : ts_b > first(a)}  (earliest
          completion of ⟨a,b⟩ — the only middle state needed)

    Everything is per-(user, type) firsts/lasts plus one join of b-events
    against the firsts table: O(|events|·|types|) work, no per-user
    quadratics. Strict '<' on seconds-truncated timestamps keeps
    same-second ties out of the match (consistent with the funnel
    operators' tie discipline).

    Scale shape: the alphabet |types| is the fan-out constant (event
    taxonomies are dozens, not thousands — pre-bucket long tails first).
    One (user, type) aggregate, one broadcast-sized types list, one
    events⋈firsts equi-join on user, two pattern-level count
    aggregates over |types|²/³ keys. Pattern support counts are
    map-side-combinable bigints.
    """
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).cast("long").alias("_t"),
        F.col(type_col).alias("_e"),
    )
    # fl is read by five consumers, but its partial aggregation bounds
    # the shuffle and the (u, e) exchange is runtime-reused across them —
    # an eager materialization was TRIED (r12) and measured ~15% WORSE
    # at bench scale (cache write/read + barrier outweigh the duplicated
    # final aggregates); the lazy form stays
    fl = ev.groupBy("_u", "_e").agg(
        F.min("_t").alias("_first"), F.max("_t").alias("_last")
    )
    sup1 = (
        fl.groupBy(F.col("_e").alias("pattern"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .withColumn("length", F.lit(1).cast("int"))
    )
    out = sup1
    if max_len >= 2:
        a = fl.select("_u", F.col("_e").alias("_a"), "_first")
        b = fl.select("_u", F.col("_e").alias("_b"), "_last")
        ab = a.join(b, "_u").where(F.col("_first") < F.col("_last"))
        sup2 = (
            ab.groupBy(
                F.concat_ws(">", "_a", "_b").alias("pattern")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
            .withColumn("length", F.lit(2).cast("int"))
        )
        out = out.unionByName(sup2)
    if max_len >= 3:
        # earliest completion of <a,b>: min b-event strictly after first(a)
        a = fl.select("_u", F.col("_e").alias("_a"), "_first")
        eab = (
            ev.select("_u", F.col("_e").alias("_b"), "_t")
            .join(a, "_u")
            .where(F.col("_t") > F.col("_first"))
            .groupBy("_u", "_a", "_b")
            .agg(F.min("_t").alias("_eab"))
        )
        c = fl.select("_u", F.col("_e").alias("_c"), "_last")
        abc = eab.join(c, "_u").where(F.col("_eab") < F.col("_last"))
        sup3 = (
            abc.groupBy(
                F.concat_ws(">", "_a", "_b", "_c").alias("pattern")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
            .withColumn("length", F.lit(3).cast("int"))
        )
        out = out.unionByName(sup3)
    return (
        out.where(F.col("support") >= min_support)
        .select("pattern", "length", "support")
        .orderBy("length", F.desc("support"), "pattern")
    )
