"""Advanced SQL surface: recursive CTEs, lateral joins, exact
distribution aggregates, deterministic mode, fuzzy string matching, and
time-series gap filling.

These extend the §2.6 capability inventory (SURVEY.md) with the SQL
shapes a dbt-style model layer leans on most: date spines (recursive
CTE), per-group top-k via LATERAL, percentile/median reporting, and
zero-filled time series. The reference itself has none of these (it has
no SQL surface at all — SURVEY.md §2.6); they are engine capabilities
validated against the DuckDB oracle.

Spark-first notes (100 TB):
- The recursive CTE produces a tiny driver-side spine (84 rows) that
  Catalyst broadcasts into the join against the aggregated fact — the
  fact table is reduced by a partial agg BEFORE touching the spine.
- LATERAL top-k decorrelates into a ranked window join in Catalyst
  (``RewriteLateralSubquery``); no per-row re-execution happens.
- Gap filling builds the dense grid from ``sequence()`` + ``explode``
  on an already-aggregated frame: grid size = hours x types, never a
  function of raw event count.
- The fuzzy join is dim x dim only. At scale, levenshtein joins on a
  fact table must be blocked/prefiltered first (length bands, q-gram
  prefilter) — levenshtein is O(len^2) per pair and not pushdown-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from . import register

# ---------------------------------------------------------------------------
# recursive CTE: month spine + zero-filled order counts
# ---------------------------------------------------------------------------

_SPINE_SQL = """
WITH RECURSIVE spine(month) AS (
    SELECT TIMESTAMP '1995-01-01'
    UNION ALL
    SELECT month + INTERVAL 1 MONTH FROM spine WHERE month < TIMESTAMP '2001-12-01'
),
counts AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           count(*) AS n,
           round((sum(o_totalprice)) * 100.0) / 100.0 + 0.0 AS revenue
    FROM {orders} GROUP BY 1
)
SELECT s.month,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders,
       round((coalesce(c.revenue, 0.0)) * 100.0) / 100.0 + 0.0 AS revenue,
       CAST(sum(coalesce(c.n, 0)) OVER (ORDER BY s.month) AS BIGINT) AS cum_orders
FROM spine s LEFT JOIN counts c ON c.month = s.month
"""


@register(
    "sql_recursive_month_spine",
    _SPINE_SQL.format(orders="orders"),
    "recursive CTE month spine (1995-01..2001-12) left-joined to monthly "
    "order counts, zero-filled, with a running total",
    tags=("sql", "recursive", "timeseries"),
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4 executes WITH RECURSIVE natively (UnionLoop); the spine is
    # 84 rows, the orders side is partial-aggregated before the join.
    table(spark, sf_dir, "orders").createOrReplaceTempView("_adv_orders")
    return spark.sql(_SPINE_SQL.format(orders="_adv_orders"))


# ---------------------------------------------------------------------------
# LATERAL: top-2 customers by balance per nation
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, top.c_name, top.c_acctbal
FROM {nation} n JOIN LATERAL (
    SELECT c_name, c_acctbal
    FROM {customer}
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name
    LIMIT 2
) top ON true
"""


@register(
    "sql_lateral_topn_per_nation",
    _LATERAL_SQL.format(nation="nation", customer="customer"),
    "correlated LATERAL subquery with ORDER BY + LIMIT: top-2 customers "
    "by account balance per nation (c_name tiebreak)",
    tags=("sql", "lateral", "topk"),
)
def sql_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("_adv_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("_adv_customer")
    return spark.sql(_LATERAL_SQL.format(nation="_adv_nation", customer="_adv_customer"))


# ---------------------------------------------------------------------------
# exact distribution aggregates: median / percentile_cont / percentile_disc
# ---------------------------------------------------------------------------

_DIST_SQL = """
SELECT l_returnflag,
       count(*) AS n,
       round((median(l_extendedprice)) * 100.0) / 100.0 + 0.0 AS median_price,
       round((percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice)) * 100.0) / 100.0 + 0.0 AS p25,
       round((percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice)) * 100.0) / 100.0 + 0.0 AS p75,
       round((percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)) * 100.0) / 100.0 + 0.0 AS p90_disc
FROM {lineitem}
GROUP BY l_returnflag
"""

# Engine twin of _DIST_SQL: median == percentile(x, 0.5) and
# percentile_cont(p) == percentile(x, p) in Spark (same Percentile
# aggregate), so one array-percentage buffer serves all three
# continuous quantiles; percentile_disc keeps its own (different
# interpolation). 4 full-column per-group buffers → 2.
_DIST_SQL_ENGINE = """
SELECT l_returnflag, n,
       round(element_at(p, 1) * 100.0) / 100.0 + 0.0 AS median_price,
       round(element_at(p, 2) * 100.0) / 100.0 + 0.0 AS p25,
       round(element_at(p, 3) * 100.0) / 100.0 + 0.0 AS p75,
       round(pd * 100.0) / 100.0 + 0.0 AS p90_disc
FROM (
    SELECT l_returnflag, count(*) AS n,
           percentile(l_extendedprice, array(0.5D, 0.25D, 0.75D)) AS p,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS pd
    FROM {lineitem}
    GROUP BY l_returnflag
)
"""


@register(
    "agg_exact_distribution",
    _DIST_SQL.format(lineitem="lineitem"),
    "exact median + percentile_cont(0.25/0.75) + percentile_disc(0.9) "
    "per return flag (sort-based exact percentiles, not sketches)",
    tags=("agg", "percentile"),
)
def agg_exact_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact percentiles sort within each group — at 100 TB prefer the
    # approx_percentile sketch gate (agg_approx_percentiles) unless the
    # group count is high enough that per-group sorts stay small.
    #
    # r14 engine twin (oracle keeps _DIST_SQL): median/percentile_cont
    # fuse into ONE array-percentage `percentile` buffer (same exact
    # Percentile aggregate, one buffer instead of three — the
    # agg_approx_percentiles fusion, guide §1.2) and the scan is spread
    # (§2.5). Equality checked against _DIST_SQL each run of
    # tests/test_percentile_fused.py; measured 7.35 → 3.04 s at sf0.1.
    table(spark, sf_dir, "lineitem", spread=True).createOrReplaceTempView("_adv_lineitem")
    return spark.sql(_DIST_SQL_ENGINE.format(lineitem="_adv_lineitem"))


# ---------------------------------------------------------------------------
# deterministic mode (most frequent value, explicit tiebreak)
# ---------------------------------------------------------------------------


@register(
    "agg_mode_priority_by_status",
    """
    SELECT o_orderstatus, o_orderpriority AS modal_priority, CAST(n AS BIGINT) AS n
    FROM (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY count(*) DESC, o_orderpriority) AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
    "modal order priority per status — mode() tie order is engine-defined, "
    "so the mode is spelled as count + row_number with a value tiebreak",
    tags=("agg",),
)
def agg_mode_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("n").cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# fuzzy matching: levenshtein pairs over a dimension
# ---------------------------------------------------------------------------


@register(
    "join_fuzzy_levenshtein",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 2
    """,
    "fuzzy self-join: nation-name pairs within levenshtein distance 2",
    tags=("join", "fuzzy"),
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dim x dim only (25 x 25). On a fact table this needs blocking
    # (length bands / q-gram prefilter) before the quadratic verify.
    a = table(spark, sf_dir, "nation").select(F.col("n_name").alias("name_a"))
    b = table(spark, sf_dir, "nation").select(F.col("n_name").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .filter(dist <= 2)
        .select("name_a", "name_b", dist.cast("int").alias("dist"))
    )


# ---------------------------------------------------------------------------
# time-series gap fill: dense hourly grid, zero-fill, running total
# ---------------------------------------------------------------------------


@register(
    "ts_gap_fill_hourly",
    """
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT g.hour, g.event_type,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n,
           CAST(sum(coalesce(c.n, 0)) OVER (PARTITION BY g.event_type ORDER BY g.hour) AS BIGINT) AS cum_n
    FROM (SELECT hour, event_type FROM spine CROSS JOIN types) g
    LEFT JOIN counts c ON c.hour = g.hour AND c.event_type = g.event_type
    """,
    "gap-filled hourly event counts: sequence() spine x type grid, "
    "left join, zero-fill, cumulative sum over the dense series",
    tags=("timeseries", "window"),
)
def ts_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    )
    # grid size = hours x types (independent of raw row count); the fact
    # side is reduced by the partial agg before it ever meets the grid.
    bounds = ev.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy("hour", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hour")
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
        .withColumn("cum_n", F.sum("n").over(w).cast("long"))
    )


# ---------------------------------------------------------------------------
# bivariate statistics: corr / covar / linear regression aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_corr_regression",
    """
    SELECT l_returnflag,
           round((corr(l_quantity, l_extendedprice)) * 10000.0) / 10000.0 + 0.0 AS corr_qty_price,
           round((covar_samp(l_quantity, l_extendedprice)) * 100.0) / 100.0 + 0.0 AS covar_qty_price,
           round((regr_slope(l_extendedprice, l_quantity)) * 10000.0) / 10000.0 + 0.0 AS slope,
           round((regr_intercept(l_extendedprice, l_quantity)) * 100.0) / 100.0 + 0.0 AS intercept,
           round((regr_r2(l_extendedprice, l_quantity)) * 10000.0) / 10000.0 + 0.0 AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
    "bivariate stats per return flag: corr, covar_samp, OLS slope/"
    "intercept/r2 via the SQL regression aggregates (single-pass, "
    "map-side partial — contrast with udf_grouped_ols_slope)",
    tags=("agg", "stats"),
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    from . import dround

    return li.groupBy("l_returnflag").agg(
        dround(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        dround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        dround(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        dround(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        dround(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# forward fill over a gap-filled series (last_value IGNORE NULLS)
# ---------------------------------------------------------------------------


@register(
    "ts_forward_fill_hourly",
    """
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               round((avg(value)) * 10000.0) / 10000.0 + 0.0 AS avg_v
        FROM events GROUP BY 1, 2
    )
    SELECT g.hour, g.event_type, h.avg_v,
           last_value(h.avg_v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_v_ffill
    FROM (SELECT hour, event_type FROM spine CROSS JOIN types) g
    LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = g.event_type
    """,
    "forward fill: dense hourly grid of avg event value, gaps carried "
    "forward with last_value(... IGNORE NULLS) over an ordered frame",
    tags=("timeseries", "window"),
)
def ts_forward_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import dround

    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type", "value"
    )
    bounds = ev.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    hourly = ev.groupBy("hour", "event_type").agg(dround(F.avg("value"), 4).alias("avg_v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            "avg_v",
            F.last("avg_v", ignorenulls=True).over(w).alias("avg_v_ffill"),
        )
    )


# ---------------------------------------------------------------------------
# tri-valued logic: null-safe equality join, NOT IN vs NOT EXISTS
# ---------------------------------------------------------------------------


@register(
    "join_null_safe_equality",
    """
    SELECT coalesce(ck, -1) AS key_group, CAST(count(*) AS BIGINT) AS n_pairs
    FROM (SELECT nullif(c_nationkey % 5, 0) AS ck FROM customer) c
    JOIN (SELECT nullif(s_nationkey % 5, 0) AS sk FROM supplier) s
      ON ck IS NOT DISTINCT FROM sk
    GROUP BY coalesce(ck, -1)
    """,
    "null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of vanishing, counted per key group",
    tags=("join", "nulls"),
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # eqNullSafe compiles to a plain hash-join key (null is just another
    # key value) — unlike OR-of-isNull rewrites, which break pushdown.
    c = table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("ck")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("sk")
    )
    return (
        c.join(s, F.col("ck").eqNullSafe(F.col("sk")))
        .groupBy(F.coalesce("ck", F.lit(-1)).alias("key_group"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


_NOT_IN_SQL = """
SELECT
    (SELECT count(*) FROM {customer} c
     WHERE NOT EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey)
    ) AS n_not_exists,
    (SELECT count(*) FROM {customer} c
     WHERE c.c_custkey NOT IN (SELECT nullif(o.o_custkey, 7) FROM {orders} o)
    ) AS n_not_in
"""


@register(
    "subquery_not_in_null_semantics",
    _NOT_IN_SQL.format(customer="customer", orders="orders"),
    "ANSI tri-valued NOT IN: one NULL in the subquery makes NOT IN "
    "return zero rows while NOT EXISTS still anti-joins — both engines "
    "must agree on the pair of counts",
    tags=("subquery", "nulls"),
)
def subquery_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark plans the NOT IN branch as a null-aware anti join (NAAJ);
    # NOT EXISTS stays a plain left-anti. Semantics, not plan, is the
    # point here: the NULL poisons every NOT IN comparison.
    table(spark, sf_dir, "customer").createOrReplaceTempView("_adv_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("_adv_orders2")
    return spark.sql(_NOT_IN_SQL.format(customer="_adv_customer", orders="_adv_orders2"))


# ---------------------------------------------------------------------------
# semi-structured VARIANT: parse once, typed extraction
# ---------------------------------------------------------------------------


@register(
    "fn_variant_json",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events GROUP BY event_type
    """,
    "Spark 4 VARIANT ingestion: parse_json once per row, variant_get "
    "typed path extraction (open-schema alternative to from_json)",
    tags=("scalar", "json", "variant"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VARIANT keeps the parsed binary form; repeated variant_get calls
    # don't re-parse the JSON text (unlike chained get_json_object).
    # Use it when props has no stable schema; from_json when it does.
    ev = table(spark, sf_dir, "events").withColumn("_v", F.parse_json("props"))
    k = F.variant_get(F.col("_v"), "$.k", "int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).cast("int").alias("min_k"),
        F.max(k).cast("int").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# RECURSIVE (join-shape): bipartite BFS reachability
# ---------------------------------------------------------------------------

_REACH_SQL = """
WITH RECURSIVE reach(node, d) AS (
    SELECT concat('s', CAST((SELECT min(s_suppkey) FROM {supplier}) AS STRING)), 0
    UNION ALL
    SELECT e.dst, r.d + 1
    FROM reach r JOIN (
        SELECT DISTINCT concat('s', CAST(l_suppkey AS STRING)) AS src,
                        concat('p', CAST(l_partkey AS STRING)) AS dst
        FROM {lineitem}
        UNION ALL
        SELECT DISTINCT concat('p', CAST(l_partkey AS STRING)),
                        concat('s', CAST(l_suppkey AS STRING))
        FROM {lineitem}
    ) e ON e.src = r.node
    WHERE r.d < 2
)
SELECT node, CAST(min(d) AS INT) AS depth
FROM reach GROUP BY node
"""

# Engine-side twin of _REACH_SQL with the guide-§3.2/§8 semi-join
# prefilter: the recursion is depth-bounded (r.d < 2) from ONE start
# supplier, so the only traversable edges are (a) s→p edges of the start
# supplier itself (frontier d=0 is exactly that node) and (b) p→s edges
# whose part is one of the start supplier's parts (frontier d=1 is
# exactly those p-nodes; d=2 nodes are never expanded). Pre-filtering
# lineitem by that knowledge shrinks each iteration's DISTINCT edge
# build from the whole fact (~600 k rows at sf0.1, recomputed EVERY
# loop step by the UnionLoop) to the ~0.3 % of rows touching the start
# supplier's parts. Result-identical by the frontier argument above —
# r14 A/B: 10.5 s → 1.9 s at sf0.1, rows byte-equal; the DuckDB oracle
# keeps the unfiltered statement of the semantics.
#
# r15 (VERDICT r14 #6): the prefiltered edge relation is built OUTSIDE
# the recursion and materialized driver-side (it is O(one supplier's
# distinct part rows) by the same frontier argument — a bounded
# collect, like kmeans' ≤k-row updates), so the UnionLoop's per-step
# join hits an in-plan LocalRelation instead of re-running the
# edge-build scans + IN-subquery EVERY iteration.
_REACH_EDGES_SQL = """
SELECT DISTINCT concat('s', CAST(l_suppkey AS STRING)) AS src,
                concat('p', CAST(l_partkey AS STRING)) AS dst
FROM {lineitem}
WHERE l_suppkey = (SELECT min(s_suppkey) FROM {supplier})
UNION ALL
SELECT DISTINCT concat('p', CAST(l_partkey AS STRING)),
                concat('s', CAST(l_suppkey AS STRING))
FROM {lineitem}
WHERE l_partkey IN (
    SELECT l_partkey FROM {lineitem}
    WHERE l_suppkey = (SELECT min(s_suppkey) FROM {supplier}))
"""

_REACH_SQL_ENGINE = """
WITH RECURSIVE reach(node, d) AS (
    SELECT concat('s', CAST((SELECT min(s_suppkey) FROM {supplier}) AS STRING)), 0
    UNION ALL
    SELECT e.dst, r.d + 1
    FROM reach r JOIN {edges} e ON e.src = r.node
    WHERE r.d < 2
)
SELECT node, CAST(min(d) AS INT) AS depth
FROM reach GROUP BY node
"""


@register(
    "sql_recursive_reachability",
    _REACH_SQL.format(supplier="supplier", lineitem="lineitem"),
    "JOIN-shape recursive CTE: BFS over the supplier-part bipartite "
    "graph from the lowest supplier key, 2 hops, min depth per reached "
    "node -- the other native WITH RECURSIVE execution path next to "
    "the generator-shape month spine",
    tags=("sql", "recursive", "graph"),
)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 executes this natively (UnionLoop with a per-step JOIN
    against the recursive relation) -- the recursion each iteration is
    frontier x edges, so the DEPTH BOUND is the scale contract: at
    depth 2 the frontier is one supplier's parts then their suppliers
    (path counts, not closed sets -- unbounded depth on a dense graph
    multiplies paths; the iterative operators in operators/graph.py
    with per-round dedup are the unbounded-depth tool). min(d) per
    node collapses duplicate paths at the end.

    r14: executes _REACH_SQL_ENGINE — same recursion, same native
    UnionLoop path, but each iteration's edge build is pre-filtered to
    the rows the depth bound can ever traverse (see the twin's comment
    for the equivalence argument; 10.5 s → 1.9 s at sf0.1).

    r15: the prefiltered edge relation is computed ONCE per call and
    handed to the recursion as a LocalRelation (bounded collect — one
    supplier's distinct edges), so each UnionLoop step joins the
    frontier against in-memory rows instead of re-executing the
    edge-build scans + IN-subquery (which the loop re-ran every
    iteration; the relation is recomputed from parquet on every query
    invocation — nothing is memoized across calls)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("_adv_li")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("_adv_supp")
    edges = spark.sql(_REACH_EDGES_SQL.format(supplier="_adv_supp", lineitem="_adv_li"))
    spark.createDataFrame(edges.collect(), edges.schema).createOrReplaceTempView(
        "_adv_edges"
    )
    return spark.sql(_REACH_SQL_ENGINE.format(supplier="_adv_supp", edges="_adv_edges"))


_PIVOT_SQL = """
SELECT o_orderpriority,
       coalesce(`F`, 0) AS status_f,
       coalesce(`O`, 0) AS status_o,
       coalesce(`P`, 0) AS status_p
FROM (SELECT o_orderpriority, o_orderstatus FROM {orders})
PIVOT (count(*) FOR o_orderstatus IN ('F', 'O', 'P'))
"""


@register(
    "sql_pivot_syntax",
    # SQL-surface twin of the DataFrame pivot gate (agg_pivot_status):
    # the PIVOT clause itself, empty cells zero-filled. DuckDB's PIVOT
    # output naming differs, so the oracle states the semantics with
    # FILTER aggregates — same rows, same names.
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
    "SQL PIVOT clause (count FOR status IN (...)), zero-filled — the "
    "SQL-text path beside the DataFrame .pivot() gate",
    tags=("sql", "pivot"),
)
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    table(spark, sf_dir, "orders").createOrReplaceTempView("_adv_orders_pivot")
    out = spark.sql(_PIVOT_SQL.format(orders="_adv_orders_pivot"))
    return out.select(
        "o_orderpriority",
        F.col("status_f").cast("bigint").alias("status_f"),
        F.col("status_o").cast("bigint").alias("status_o"),
        F.col("status_p").cast("bigint").alias("status_p"),
    )
