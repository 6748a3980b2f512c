package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Second wave of relational surface: the remaining classic TPC-H query
  * shapes (multi-nation join chains, disjunctive join predicates,
  * distinct-count with NOT IN, nested HAVING semi-joins), full-outer /
  * cross joins, GROUPING SETS, MapType results, and deterministic
  * hash-sampling — the "not exercised" remainder of SURVEY.md §2.3/§2.4
  * plus training-pipeline sampling.
  *
  * Numeric parity follows the established recipe: money doubles are cast
  * to exact DECIMAL before aggregation, then back to DOUBLE for output
  * (deterministic under any partitioning; see Relational).
  */
object TpchMore {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec4(c: String): Column = col(c).cast(DecimalType(4, 2))

  /** FULL OUTER join of two grouped views of the same fact — neither
    * side's keys are a superset, so every join class (matched, left-only,
    * right-only) appears. At scale this is one shuffle per side on the
    * join key; COALESCE collapses the key afterwards. */
  val fullOuterJoin: QueryEntry = QueryEntry(
    "q47_full_outer_join",
    """WITH a AS (SELECT o_custkey AS k, COUNT(*) AS open_n
      |           FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
      |     b AS (SELECT o_custkey AS k, COUNT(*) AS done_n
      |           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
      |SELECT COALESCE(a.k, b.k) AS custkey,
      |       COALESCE(open_n, 0) AS open_n, COALESCE(done_n, 0) AS done_n
      |FROM a FULL OUTER JOIN b ON a.k = b.k
      |ORDER BY custkey""".stripMargin
  ) { (s, d) =>
    def side(st: String, out: String) = Tables.orders(s, d)
      .filter(col("o_orderstatus") === st)
      .groupBy(col("o_custkey").as(s"k_$out"))
      .agg(count(lit(1)).as(out))
    side("O", "open_n").join(side("F", "done_n"),
        col("k_open_n") === col("k_done_n"), "full_outer")
      .select(coalesce(col("k_open_n"), col("k_done_n")).as("custkey"),
        coalesce(col("open_n"), lit(0L)).as("open_n"),
        coalesce(col("done_n"), lit(0L)).as("done_n"))
      .orderBy(col("custkey"))
  }

  /** Explicit CROSS JOIN (dimension × distinct fact values) — the only
    * join class round 1 left out. Both sides are tiny; Spark plans a
    * broadcast nested loop. */
  val crossJoin: QueryEntry = QueryEntry(
    "q48_cross_join",
    """SELECT r_name, st FROM region
      |CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders)
      |ORDER BY r_name, st""".stripMargin
  ) { (s, d) =>
    Tables.region(s, d).select(col("r_name"))
      .crossJoin(Tables.orders(s, d).select(col("o_orderstatus").as("st")).distinct())
      .orderBy(col("r_name"), col("st"))
  }

  /** TPC-H Q7 shape: two-nation shipping volume through a 6-table join
    * chain (fact ⋈ supplier ⋈ orders ⋈ customer ⋈ nation×2). nation and
    * supplier broadcast; the lineitem⋈orders join is the only large
    * shuffle. The OR-of-nation-pairs predicate only prunes AFTER both
    * nation joins — the optimizer pushes each side's half down. */
  val tpchQ7: QueryEntry = QueryEntry(
    "q49_tpch_q7",
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
      |             l_extendedprice, l_discount
      |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |           JOIN orders ON o_orderkey = l_orderkey
      |           JOIN customer ON c_custkey = o_custkey
      |           JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
  ) { (s, d) =>
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec4("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q14 shape: promo revenue share — conditional aggregate over a
    * fact ⋈ dim join, two aggregates in one pass, scalar result. */
  val tpchQ14: QueryEntry = QueryEntry(
    "q50_tpch_q14",
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |                  ELSE CAST(0 AS DECIMAL(12,2)) * (1 - CAST(0 AS DECIMAL(4,2))) END) AS DOUBLE)
      |       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin
  ) { (s, d) =>
    val vol = dec(col("l_extendedprice")) * (lit(1) - dec4("l_discount"))
    val zero = dec(lit(0)) * (lit(1) - lit(0).cast(DecimalType(4, 2)))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", vol).otherwise(zero)).cast("double")
        / sum(vol).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q19 shape: disjunctive multi-column join predicates (brand ×
    * size × quantity bands OR'd together). The equi-join key is still
    * extracted by the planner; the OR residual evaluates post-join. */
  val tpchQ19: QueryEntry = QueryEntry(
    "q51_tpch_q19",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin
  ) { (s, d) =>
    def band(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
      .filter(band("Brand#1", 15, 1, 20) || band("Brand#2", 25, 10, 30) ||
        band("Brand#3", 35, 20, 40))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec4("l_discount")))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q16 shape: supplier counts per part attribute with a NOT IN
    * anti-subquery — COUNT(DISTINCT) over a join, Expand-based distinct
    * aggregation after an anti join. */
  val tpchQ16: QueryEntry = QueryEntry(
    "q52_tpch_q16",
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PRO%'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin
  ) { (s, d) =>
    Tables.registerViews(s, d)
    s.sql(
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PRO%'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }

  /** TPC-H Q20 shape: suppliers of promo parts above a shipped-quantity
    * threshold — IN over a grouped-HAVING subquery feeding a semi join. */
  val tpchQ20: QueryEntry = QueryEntry(
    "q53_tpch_q20",
    """SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      |    WHERE p_type = 'PROMO'
      |      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |    GROUP BY l_suppkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val heavy = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 50)
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** Deterministic hash sampling — the training-pipeline sampling
    * primitive: a ~5% sample selected by md5(key) prefix, reproducible
    * across engines, partitionings, and runs (unlike TABLESAMPLE/rand).
    * At 100 TB this is a map-only filter pushed to the scan. */
  val hashSample: QueryEntry = QueryEntry(
    "q54_hash_sample",
    """SELECT COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sampled_sales
      |FROM orders
      |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '0c'""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) <= "0c")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("sampled_sales"))
  }

  /** Explicit GROUPING SETS with GROUPING() markers (rollup/cube's
    * general form; one Expand + one aggregation). */
  val groupingSets: QueryEntry = QueryEntry(
    "q55_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
      |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    Tables.registerViews(s, d)
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
        |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** MapType surface: per-customer status→count maps built with
    * map_from_entries, consumed with explode back to rows (so the
    * verify pipeline sees scalar columns; the oracle states the
    * map-free equivalent). */
  val mapResult: QueryEntry = QueryEntry(
    "q56_map_type",
    """SELECT o_custkey AS custkey, o_orderstatus AS st, COUNT(*) AS n
      |FROM orders WHERE o_custkey < 50
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val counts = Tables.orders(s, d)
      .filter(col("o_custkey") < 50)
      .groupBy(col("o_custkey").as("custkey"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy(col("custkey"))
      .agg(map_from_entries(collect_list(struct(col("st"), col("n")))).as("by_status"))
      .select(col("custkey"), explode(col("by_status")).as(Seq("st", "n")))
      .orderBy(col("custkey"), col("st"))
  }

  val all: Seq[QueryEntry] = Seq(
    fullOuterJoin, crossJoin, tpchQ7, tpchQ14, tpchQ19, tpchQ16, tpchQ20,
    hashSample, groupingSets, mapResult)
}
