"""Association-rule mining over transaction baskets (Agrawal/Srikant
Apriori family, restricted to the pair tier — the tier that matters for
"customers who bought X also bought Y" audiences and co-marketing lists).

Scale shape: ONE shuffle on the basket key collapses transactions to
capped distinct-item arrays (the same keep-lowest-``cap`` contract as the
co-purchase graph queries — a viral basket cannot explode a task); item
supports and pair supports are then two independent hash aggregates over
JVM-side array expansions of those arrays (map-side combined, no
self-join of the raw transaction table). The rule join attaches the two
item supports by equi-join on the item id — at 100 TB that is a shuffle
bounded by |frequent pairs| + |items|, never by |transactions|.

Metrics are integer parts-per-million so every engine ranks and hashes
identically (no float division anywhere):

  confidence(a→b) = supp(ab)/supp(a)        → conf_ppm  = sab*1e6 div sa
  lift(a→b)       = N·supp(ab)/(supp(a)·supp(b))
                                            → lift_ppm  = (conf_ppm·N) div sb

``lift_ppm`` is the floor-of-floor composition (not a single rational) —
documented so the oracle twin states the same expression; the nesting
keeps every intermediate ≤ 1e6·N, overflow-free past 10^12 baskets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def basket_arrays(
    transactions: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    cap: int = 64,
) -> DataFrame:
    """(basket_col, items ARRAY) — distinct items per basket, sorted,
    truncated to the lowest ``cap`` (deterministic skew guard)."""
    return (
        transactions.groupBy(basket_col)
        .agg(
            F.slice(F.sort_array(F.collect_set(item_col)), 1, cap).alias("items")
        )
    )


def association_rules(
    transactions: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    cap: int = 64,
    min_pair_support: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` directed pair rules (antecedent → consequent) by
    lift, with integer-ppm confidence/lift and raw support counts.

    Output: antecedent, consequent, pair_support, antecedent_support,
    consequent_support, conf_ppm, lift_ppm — ordered by (lift_ppm DESC,
    conf_ppm DESC, antecedent, consequent) via TakeOrdered (per-partition
    heaps + a k-row driver merge, no global sort).
    """
    baskets = basket_arrays(transactions, basket_col, item_col, cap).persist()
    # eager count (r13): n_baskets, item_supp and pair_supp project
    # different columns off this cache, so their exchange/broadcast
    # builds are distinct AQE jobs that race the unpopulated persist —
    # jobdump showed the collect_set basket aggregate re-running 4× as
    # concurrent ~5 s 35-task jobs under the final checkpoint action.
    # Local wall is flat (idle cores absorb the overlap); the keep is
    # strictly-less-work: 4× the corpus-sized basket build is 4× the
    # CPU on the operator's dominant stage at 100 TB.
    baskets.count()
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))

    item_supp = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_support"))
    )
    pair_expr = F.expr(
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), y -> struct(x AS a, y AS b))))"
    )
    pair_supp = (
        baskets.where(F.size("items") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .where(F.col("pair_support") >= min_pair_support)
    )
    # both rule directions from one undirected pair row (JVM-side explode,
    # no second pair aggregate)
    directed = pair_supp.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("antecedent"), F.col("b").alias("consequent")),
                F.struct(F.col("b").alias("antecedent"), F.col("a").alias("consequent")),
            )
        ).alias("r"),
        "pair_support",
    ).select("r.antecedent", "r.consequent", "pair_support")

    rules = (
        directed.join(
            item_supp.withColumnRenamed("item", "antecedent").withColumnRenamed(
                "item_support", "antecedent_support"
            ),
            "antecedent",
        )
        .join(
            item_supp.withColumnRenamed("item", "consequent").withColumnRenamed(
                "item_support", "consequent_support"
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .withColumn(
            "conf_ppm",
            F.expr(f"pair_support * {PPM} div antecedent_support"),
        )
        .withColumn(
            "lift_ppm",
            F.expr("conf_ppm * n_baskets div consequent_support"),
        )
    )
    out = (
        rules.select(
            "antecedent",
            "consequent",
            "pair_support",
            "antecedent_support",
            "consequent_support",
            "conf_ppm",
            "lift_ppm",
        )
        .orderBy(
            F.desc("lift_ppm"),
            F.desc("conf_ppm"),
            F.asc("antecedent"),
            F.asc("consequent"),
        )
        .limit(top_k)
        .localCheckpoint(eager=True)
    )
    baskets.unpersist()
    return out


def association_rules_sql_ctes(
    table: str = "lineitem",
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    cap: int = 64,
    min_pair_support: int = 2,
) -> str:
    """DuckDB oracle twin ending in CTE ``rules`` (same columns, same
    integer-ppm expressions; `//` is DuckDB's floor division = Spark's
    ``div`` on the all-positive counts here)."""
    return f"""ar_dp AS (
  SELECT DISTINCT {basket_col} AS bk, {item_col} AS item FROM {table}
),
ar_capped AS (
  SELECT bk, item FROM (
    SELECT bk, item,
           row_number() OVER (PARTITION BY bk ORDER BY item) AS rn
    FROM ar_dp
  ) WHERE rn <= {cap}
),
ar_n AS (SELECT count(DISTINCT bk)::BIGINT AS n_baskets FROM ar_capped),
ar_item AS (
  SELECT item, count(*)::BIGINT AS item_support FROM ar_capped GROUP BY item
),
ar_pair AS (
  SELECT x.item AS a, y.item AS b, count(*)::BIGINT AS pair_support
  FROM ar_capped x JOIN ar_capped y
    ON x.bk = y.bk AND x.item < y.item
  GROUP BY x.item, y.item
  HAVING count(*) >= {min_pair_support}
),
ar_directed AS (
  SELECT a AS antecedent, b AS consequent, pair_support FROM ar_pair
  UNION ALL
  SELECT b AS antecedent, a AS consequent, pair_support FROM ar_pair
),
rules AS (
  SELECT d.antecedent, d.consequent, d.pair_support,
         ia.item_support AS antecedent_support,
         ic.item_support AS consequent_support,
         d.pair_support * {PPM} // ia.item_support AS conf_ppm,
         (d.pair_support * {PPM} // ia.item_support) * n.n_baskets
           // ic.item_support AS lift_ppm
  FROM ar_directed d
  JOIN ar_item ia ON d.antecedent = ia.item
  JOIN ar_item ic ON d.consequent = ic.item
  CROSS JOIN ar_n n
)"""
