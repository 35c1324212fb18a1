"""Relational coverage, part 3: the remaining TPC-H query *shapes* —
with these the catalog demonstrates every optimizer pattern of the full
22-query suite (the synthetic schema has no ``partsupp`` table and no
commit/receipt dates, so q2/q11/q12/q20/q21 are adapted to the columns
that exist, exactly like queries_rel.py's q16/q19/q22 adaptations).

Shapes added here and the Spark plan each is written to produce:

* q2  — correlated scalar MIN subquery → decorrelated group-min + equality
  join back (all dimension-side, broadcast everywhere).
* q7  — two-role dimension (nation n1/n2) with a disjunctive pair filter;
  the fact table joins brokered through broadcast dims.
* q8  — market share: conditional-sum ratio over a 5-way join.
* q9  — LIKE-filtered profit rollup by (nation, year).
* q10 — returned-item revenue, deterministic top-20 (rank with tiebreak).
* q11 — HAVING against a scalar subquery of the same aggregate (share-of-
  total filter) → one agg, reused via a one-row broadcast.
* q12 — interval lateness + two conditional counts (CASE aggregation).
* q17 — correlated AVG subquery → per-key avg + broadcast join back.
* q20 — nested semi-join chain (HAVING-filtered group → IN → IN).
* q21 — EXISTS + NOT EXISTS against the same fact table with non-equi
  correlation (the hardest decorrelation in the suite).

The reference (`/root/reference/indicators.py`) has no joins at all
(SURVEY.md §2b); these are north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import Query, _r, _register, round4
from .queries_rel import _cut, _TS_1996_01
from .sources.prices import load_table

_TS_1997_01 = 852076800  # 1997-01-01
_TS_1998_01 = 883612800  # 1998-01-01


# --------------------------------------------------------------------- #
# q2 shape: correlated scalar MIN subquery over the dimension chain
# --------------------------------------------------------------------- #


def _q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EUROPE suppliers whose balance equals their nation's minimum.  The
    correlated ``MIN`` decorrelates to a per-nation aggregate joined back on
    (nationkey, balance) — everything is dimension-sized, so both the agg
    input and the join are broadcast; no fact-table scan at all."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_nationkey", "n_name")
    )
    min_bal = eu.groupBy(F.col("n_nationkey").alias("_nk")).agg(
        F.min("s_acctbal").alias("_min_bal")
    )
    return (
        eu.join(
            F.broadcast(min_bal),
            (eu.n_nationkey == min_bal._nk) & (eu.s_acctbal == min_bal._min_bal),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            round4(F.col("s_acctbal")).alias("s_acctbal"),
        )
    )


_register(
    "tpch_q2_min_subquery",
    Query(
        spark=_q2,
        sql=f"""
SELECT s_suppkey, s_name, n.n_name AS n_name, {_r("s_acctbal", "s_acctbal")}
FROM supplier s, nation n, region r
WHERE s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND s.s_acctbal = (
    SELECT min(s2.s_acctbal)
    FROM supplier s2, nation n2, region r2
    WHERE s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE'
      AND n2.n_nationkey = n.n_nationkey)""",
    ),
)


# --------------------------------------------------------------------- #
# q7 shape: two-role dimension + disjunctive nation-pair filter
# --------------------------------------------------------------------- #


def _q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipped between NATION_1 and NATION_2 (either direction), by
    (supplier nation, customer nation, ship year).  ``nation`` joins twice
    under different roles; pre-filtering each role to the two nations keeps
    the disjunction a cheap broadcast-side predicate, and the fact table
    shuffles only for the orders join."""
    nations = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = load_table(spark, sf_dir, "nation").filter(nations)
    n2 = load_table(spark, sf_dir, "nation").filter(nations)
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == n1.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == n2.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _cut(_TS_1996_01))
        & (F.col("l_shipdate") < _cut(_TS_1998_01))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            round4(F.col("_rev")).alias("revenue"),
        )
    )


_register(
    "tpch_q7_volume",
    Query(
        spark=_q7,
        sql=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  {_r("sum(l_extendedprice * (1 - l_discount))", "revenue")}
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3""",
    ),
)


# --------------------------------------------------------------------- #
# q8 shape: market-share ratio (conditional sum / sum)
# --------------------------------------------------------------------- #


def _q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of ECONOMY-part volume sold to EUROPE customers,
    per order year.  Five joins, every dimension broadcast; the ratio is a
    conditional sum over the same rows, so it adds no extra pass."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nat = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("_eu_nk"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(eu_nat), F.col("c_nationkey") == F.col("_eu_nk")
    ).select("c_custkey")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)).alias("_n"),
            F.sum(vol).alias("_d"),
        )
        .select("o_year", round4(F.col("_n") / F.col("_d")).alias("mkt_share"))
    )


_register(
    "tpch_q8_market_share",
    Query(
        spark=_q8,
        sql=f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  {_r(
      "sum(CASE WHEN n1.n_name = 'NATION_3' "
      "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
      "/ sum(l_extendedprice * (1 - l_discount))",
      "mkt_share",
  )}
FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
  AND r_name = 'EUROPE' AND s_nationkey = n1.n_nationkey
  AND p_type = 'ECONOMY'
GROUP BY 1""",
    ),
)


# --------------------------------------------------------------------- #
# q9 shape: LIKE filter + profit rollup by (nation, year)
# --------------------------------------------------------------------- #


def _q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on ``bolt`` parts by supplier nation and order year.  The
    schema has no partsupp supplycost, so cost is proxied as 10% of retail
    price × quantity (same expression on both sides).  The LIKE filter
    prunes the broadcast part side before the fact join."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_retailprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.1) * F.col("l_quantity")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).alias("_p"))
        .select("nation", "o_year", round4(F.col("_p")).alias("sum_profit"))
    )


_register(
    "tpch_q9_profit",
    Query(
        spark=_q9,
        sql=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  {_r(
      "sum(l_extendedprice * (1 - l_discount) "
      "- p_retailprice * 0.1 * l_quantity)",
      "sum_profit",
  )}
FROM part, supplier, lineitem, orders, nation
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%bolt%'
GROUP BY 1, 2""",
    ),
)


# --------------------------------------------------------------------- #
# q10 shape: returned-item revenue, deterministic top-20
# --------------------------------------------------------------------- #


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ranked by revenue lost to returns in H1-1996, top 20.
    ``LIMIT`` after a float sort is nondeterministic under ties, so the
    cut is a rank with an explicit c_custkey tiebreak — same window in the
    oracle.  The per-customer agg shuffles once on custkey; the final
    rank's single-partition sort sees only #customers rows (post-agg), not
    the fact table."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _cut(_TS_1996_01))
        & (F.col("o_orderdate") < _cut(_TS_1997_01))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
        )
    )
    w = Window.orderBy(F.col("_rev").desc(), F.col("c_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "rank",
            round4(F.col("_rev")).alias("revenue"),
        )
    )


_register(
    "tpch_q10_returned_topk",
    Query(
        spark=_q10,
        sql=f"""
WITH rev AS (
  SELECT c_custkey, c_name, c_nationkey,
    sum(l_extendedprice * (1 - l_discount)) AS _rev
  FROM lineitem, orders, customer
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, c_nationkey,
  CAST(rank AS INT) AS rank, {_r("_rev", "revenue")}
FROM (
  SELECT *, row_number() OVER (ORDER BY _rev DESC, c_custkey) AS rank
  FROM rev
) WHERE rank <= 20""",
    ),
)


# --------------------------------------------------------------------- #
# q11 shape: HAVING vs a scalar subquery of the same aggregate
# --------------------------------------------------------------------- #


def _q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value exceeds 0.07% of total shipped value (the
    partsupp-less analogue of q11's share-of-stock filter).  One aggregate
    pass; the global total re-aggregates the *grouped* result (2k rows),
    not the fact table, and returns as a one-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_v")
    )
    total = val.agg((F.sum("_v") * F.lit(0.0007)).alias("_thresh"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("_v") > F.col("_thresh"))
        .select("l_partkey", round4(F.col("_v")).alias("part_value"))
    )


_register(
    "tpch_q11_value_share",
    Query(
        spark=_q11,
        sql=f"""
WITH val AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS _v
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, {_r("_v", "part_value")}
FROM val
WHERE _v > (SELECT sum(_v) * 0.0007 FROM val)""",
    ),
)


# --------------------------------------------------------------------- #
# q12 shape: interval lateness + conditional counts
# --------------------------------------------------------------------- #


def _q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line items shipped more than 60 days after the order date in 1996,
    split into high/low-priority counts per line status (the commit/receipt
    lateness of q12, re-expressed with the dates that exist).  Interval
    arithmetic on instants is timezone-free; both conditional counts ride
    the same aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _cut(_TS_1996_01))
        & (F.col("l_shipdate") < _cut(_TS_1997_01))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


_register(
    "tpch_q12_lateness",
    Query(
        spark=_q12,
        sql="""
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1""",
    ),
)


# --------------------------------------------------------------------- #
# q17 shape: correlated AVG subquery (small-quantity outliers)
# --------------------------------------------------------------------- #


def _q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from Brand#5 line items whose quantity is below 20% of that
    part's average quantity.  The correlated AVG decorrelates into one
    per-part aggregate over the *unfiltered* fact table (the subquery is
    not brand-scoped), broadcast back — the fact table is scanned twice but
    shuffled only once (the avg), and the second scan joins two broadcast
    sides with zero exchanges."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#5"
    ).select("p_partkey")
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("_cap")
    )
    out = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_cap"))
        .agg((F.sum("l_extendedprice") / F.lit(7.0)).alias("_a"))
    )
    return out.select(round4(F.col("_a")).alias("avg_yearly"))


_register(
    "tpch_q17_small_qty",
    Query(
        spark=_q17,
        sql=f"""
SELECT {_r("sum(l_extendedprice) / 7.0", "avg_yearly")}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey)""",
    ),
)


# --------------------------------------------------------------------- #
# q20 shape: nested semi-join chain
# --------------------------------------------------------------------- #


def _q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than 50 units of any single ``red`` part
    during 1996.  Inner query: fact-table group by (supplier, part) with a
    HAVING, itself semi-filtered by the LIKE'd part dimension; outer: semi
    join into supplier.  The chain collapses to one fact shuffle on the
    composite key; both semi probes are broadcast."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _cut(_TS_1996_01))
        & (F.col("l_shipdate") < _cut(_TS_1997_01))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 50.0)
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


_register(
    "tpch_q20_semi_chain",
    Query(
        spark=_q20,
        sql="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50.0)""",
    ),
)


# --------------------------------------------------------------------- #
# q21 shape: EXISTS + NOT EXISTS with non-equi correlation
# --------------------------------------------------------------------- #


def _q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who alone were late on a finished multi-supplier order
    (late = shipped >90 days after the order date).  The EXISTS (another
    supplier participated) is a left-semi self-join on orderkey with a
    suppkey inequality; the NOT EXISTS (no *other* supplier was also late)
    is a left-anti with the lateness bound correlated through the outer
    row's order date.  Both probe sides reuse the same orderkey shuffle of
    the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return _q21_core(li, orders, sup)


_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY 1"""

_register(
    "tpch_q21_lone_late",
    Query(spark=_q21, sql=_Q21_SQL),
)


def _q21_core(li: DataFrame, orders_all: DataFrame, sup: DataFrame) -> DataFrame:
    """q21 plan shared by the plain and bucketed variants — all three fact
    joins key on orderkey, so co-located inputs run them shuffle-free."""
    orders = orders_all.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select(
            F.col("l_orderkey").alias("_ok"),
            F.col("l_suppkey").alias("_sk"),
            F.col("o_orderdate").alias("_od"),
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("_ok3"),
        F.col("l_suppkey").alias("_sk3"),
        F.col("l_shipdate").alias("_sd3"),
    )
    waited = (
        l1.join(
            l2,
            (F.col("_ok") == F.col("_ok2")) & (F.col("_sk") != F.col("_sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("_ok") == F.col("_ok3"))
            & (F.col("_sk") != F.col("_sk3"))
            & (F.col("_sd3") > F.col("_od") + F.expr("INTERVAL 90 DAYS")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(sup), F.col("_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def bucketed_fact_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize lineitem + orders as orderkey-bucketed managed tables
    (once per sf dir; reused across queries and sessions via the
    spark-warehouse catalog).  Bucketing both facts identically is the
    100 TB co-location story: every orderkey equi-join between them —
    q21's three, q18's, q4's — then plans ZERO fact-side exchanges; the
    one-time write amortizes over every such query.  8 buckets at test
    scale; at 100 TB size buckets to ~executor-memory shares (e.g. 4096).

    Staleness guard: rewrite when the cataloged row count no longer
    matches the parquet source (regenerated testdata)."""
    from .sources.io import write_bucketed_table

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    li_t, ord_t = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    for tname, table, key in ((li_t, "lineitem", "l_orderkey"), (ord_t, "orders", "o_orderkey")):
        src = load_table(spark, sf_dir, table)
        if (
            spark.catalog.tableExists(tname)
            and spark.table(tname).count() == src.count()
        ):
            continue
        if not spark.catalog.tableExists(tname):
            # The default in-memory catalog forgets managed tables between
            # sessions while their warehouse location survives on disk;
            # saveAsTable then fails with LOCATION_ALREADY_EXISTS.  Clear
            # the orphaned location (Hadoop FS API — works on any
            # filesystem, not just file:) before recreating.  A persistent
            # metastore makes this a no-op.
            jvm = spark._jvm
            wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
            path = jvm.org.apache.hadoop.fs.Path(f"{wh}/{tname.lower()}")
            fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.delete(path, True)
        write_bucketed_table(src, tname, (key,), 8, sort_cols=(key,))
    return li_t, ord_t


def _q21_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result (and oracle) as ``tpch_q21_lone_late``, read from the
    orderkey-bucketed tables: the three fact joins run with no exchange —
    the only shuffle left is the final tiny s_name aggregate
    (plan-pinned in tests/test_bucketing.py)."""
    li_t, ord_t = bucketed_fact_tables(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return _q21_core(spark.table(li_t), spark.table(ord_t), sup)


_register(
    "tpch_q21_bucketed",
    Query(spark=_q21_bucketed, sql=_Q21_SQL),
)
