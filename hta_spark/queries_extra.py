"""Breadth queries: derived HTA means, window-function variants, outer
joins, exact percentiles, string/date scalar breadth, array statistics.
Each paired with DuckDB oracle SQL (same conventions as queries_rel).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries_hta import EVT, LEVEL1, events_raw
from .operators.rollup import build_level1


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- derived means over the rollup (types.hpp:72-89 surface) ----------------

def _r4(c, d):
    """4-decimal round-half-away of the exact ratio (c/1e6)/d, computed
    ENTIRELY in integers before one final IEEE division:
    round(c / (100*d)) / 1e4.  This is the _fix3 convention with a column
    denominator — round(double, 4) is NOT cross-engine stable even on
    bit-identical inputs (Spark rounds the exact binary value HALF_UP,
    DuckDB multiplies by 1e4 first), and the sf0.1 sweep caught exactly
    that: 47.25375 rounding to 47.2538 vs 47.2537 (r8)."""
    den = d.cast("long") * F.lit(100)
    half = d.cast("long") * F.lit(50)
    pos = F.call_function("div", c + half, den)
    neg = -F.call_function("div", -c + half, den)
    return F.when(c < 0, neg).otherwise(pos) / F.lit(10000.0)


def q_hta_means(spark, sf_dir):
    """Derived means over an EXACT (micro-integer) level build: the
    accumulated sum/integral are order-free integers on both engines, and
    the 4-decimal rounding happens on those integers (:func:`_r4`) so the
    only float op is one correctly-rounded final division — fully
    bit-reproducible (round(double, 4) is not: see _r4)."""
    lvl = build_level1(events_raw(spark, sf_dir), LEVEL1, exact=True)
    ms = _r4(F.col("sum"), F.col("count"))
    mi = _r4(F.col("integral"), F.col("active_time"))
    pref = F.when(F.col("active_time") > 0, mi).otherwise(ms)
    return lvl.select(
        "metric", "interval_start",
        ms.alias("mean_sum"),
        mi.alias("mean_integral"),
        pref.alias("mean_pref"),
    ).filter(F.col("count") > 0)


SQL_HTA_MEANS = f"""
WITH pts AS ({EVT}),
lag_pts AS (
  SELECT metric, time, value,
         lag(time) OVER (PARTITION BY metric ORDER BY time) AS prev
  FROM pts
),
rng AS (SELECT metric, min(time) AS t_first, max(time) AS t_last FROM pts GROUP BY 1),
apieces AS (
  SELECT metric, time // {LEVEL1} AS k, value, 1 AS cnt, 0 AS dur FROM lag_pts
),
bpieces AS (
  SELECT metric,
         unnest(range(prev // {LEVEL1}, (time - 1) // {LEVEL1} + 1)) AS k,
         value, 0 AS cnt, 0 AS dur, prev, time
  FROM lag_pts WHERE prev IS NOT NULL
),
bpieces2 AS (
  SELECT metric, k, value, cnt,
         least((k + 1) * {LEVEL1}, time) - greatest(k * {LEVEL1}, prev) AS dur
  FROM bpieces
),
pieces AS (
  SELECT metric, k, value, cnt, dur FROM apieces
  UNION ALL SELECT metric, k, value, cnt, dur FROM bpieces2
),
lvl AS (
  SELECT p.metric, p.k * {LEVEL1} AS interval_start,
         CAST(sum(CASE WHEN p.cnt = 1
                       THEN CAST(round(p.value * 1e6) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS sum_micro,
         CAST(sum(p.cnt) AS BIGINT) AS cnt_val,
         sum(CAST(CAST(round(p.value * 1e6) AS BIGINT) AS HUGEINT)
             * p.dur) AS integral_micro,
         CAST(sum(p.dur) AS BIGINT) AS active_time
  FROM pieces p JOIN rng r ON p.metric = r.metric
  WHERE (p.k + 1) * {LEVEL1} <= r.t_last
  GROUP BY 1, 2
)
SELECT metric, interval_start,
       CAST(CASE WHEN sum_micro < 0
                 THEN -((-sum_micro + 50 * cnt_val) // (100 * cnt_val))
                 ELSE (sum_micro + 50 * cnt_val) // (100 * cnt_val)
            END AS BIGINT) / 10000.0 AS mean_sum,
       CAST(CASE WHEN integral_micro < 0
                 THEN -((-integral_micro + 50 * active_time)
                        // (100 * active_time))
                 ELSE (integral_micro + 50 * active_time)
                      // (100 * active_time)
            END AS BIGINT) / 10000.0 AS mean_integral,
       CASE WHEN active_time > 0
            THEN CAST(CASE WHEN integral_micro < 0
                           THEN -((-integral_micro + 50 * active_time)
                                  // (100 * active_time))
                           ELSE (integral_micro + 50 * active_time)
                                // (100 * active_time)
                      END AS BIGINT) / 10000.0
            ELSE CAST(CASE WHEN sum_micro < 0
                           THEN -((-sum_micro + 50 * cnt_val)
                                  // (100 * cnt_val))
                           ELSE (sum_micro + 50 * cnt_val)
                                // (100 * cnt_val)
                      END AS BIGINT) / 10000.0 END AS mean_pref
FROM lvl WHERE cnt_val > 0
"""


# -- window function variants -----------------------------------------------

def q_window_funcs(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_custkey",
        F.rank().over(Window.partitionBy("o_custkey")
                      .orderBy(F.desc("o_totalprice"), "o_orderkey")).alias("price_rank"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
    )


SQL_WINDOW_FUNCS = """
SELECT o_orderkey, o_custkey,
       CAST(rank() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW), 2) AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# -- full outer join --------------------------------------------------------

def q_full_outer(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"))
    supp = _t(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"))
    j = cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
    return j.select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"))


SQL_FULL_OUTER = """
WITH c AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_supp
           FROM supplier GROUP BY 1)
SELECT CAST(coalesce(c_nationkey, s_nationkey) AS INT) AS nationkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
"""


# -- exact percentiles ------------------------------------------------------

def q_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
                 .alias("median_price"),
                 F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4)
                 .alias("p90_price"),
                 F.round(F.min("l_extendedprice"), 2).alias("min_price"),
                 F.round(F.max("l_extendedprice"), 2).alias("max_price")))


SQL_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY 1
"""


# -- string scalar breadth --------------------------------------------------

def q_string_breadth(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)", 1).alias("name_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_tr"),
        F.substring_index(F.col("c_name"), "#", 1).alias("name_head"),
        F.instr(F.col("c_name"), "1").alias("pos_one"),
    )


SQL_STRING_BREADTH = """
SELECT c_custkey,
       coalesce(regexp_extract(c_name, '(\\d+)', 1), '') AS name_digits,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       reverse(c_mktsegment) AS seg_rev,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
       CASE WHEN instr(c_name, '#') > 0
            THEN substring(c_name, 1, instr(c_name, '#') - 1)
            ELSE c_name END AS name_head,
       CAST(instr(c_name, '1') AS INT) AS pos_one
FROM customer
"""


# -- date scalar breadth ----------------------------------------------------

def q_date_breadth(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.lit("2002-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_2002"),
    )


SQL_DATE_BREADTH = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
           AS days_to_2002
FROM orders
"""


# -- array statistics over embeddings ---------------------------------------

def q_array_stats(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 4).alias("el_sum"),
        F.round(norm, 4).alias("l2_norm"),
        F.round(F.array_max(v), 4).alias("el_max"),
        F.round(F.array_min(v), 4).alias("el_min"),
    )


SQL_ARRAY_STATS = """
SELECT vec_id, label,
       CAST(len(embedding) AS INT) AS dim,
       round(list_sum(embedding::DOUBLE[]), 4) AS el_sum,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4)
           AS l2_norm,
       round(list_max(embedding::DOUBLE[]), 4) AS el_max,
       round(list_min(embedding::DOUBLE[]), 4) AS el_min
FROM embeddings
"""


EXTRA_QUERIES: dict[str, tuple] = {
    "hta_means": (q_hta_means, SQL_HTA_MEANS),
    "q_window_funcs": (q_window_funcs, SQL_WINDOW_FUNCS),
    "q_full_outer": (q_full_outer, SQL_FULL_OUTER),
    "q_percentiles": (q_percentiles, SQL_PERCENTILES),
    "q_string_breadth": (q_string_breadth, SQL_STRING_BREADTH),
    "q_date_breadth": (q_date_breadth, SQL_DATE_BREADTH),
    "q_array_stats": (q_array_stats, SQL_ARRAY_STATS),
}
