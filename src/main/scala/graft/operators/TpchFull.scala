package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Column

/** Third TPC-H wave: the remaining classic query shapes (Q2, Q6, Q8,
  * Q9, Q10, Q11, Q13, Q15, Q17, Q21, Q22), adapted to the driver
  * testdata's column subset (no partsupp / commitdate / receiptdate /
  * phone — each adaptation keeps the original query's OPERATOR shape:
  * correlated min/avg subqueries, scalar-subquery HAVING thresholds,
  * double-EXISTS correlation, outer-join-with-ON-filter counting).
  *
  * Numeric parity recipe (proven round 1): money doubles → exact
  * DECIMAL(12,2) before aggregation, back to DOUBLE for output; avg =
  * CAST(decimal-sum AS DOUBLE)/COUNT; quantities are integral doubles
  * so their double sums are exact at any partitioning.
  *
  * Scale notes are per-query; the common posture: fact-fact joins
  * shuffle on their keys, every dimension is broadcast, aggregates are
  * partial→final, and correlated subqueries decorrelate into joins
  * (Catalyst RewriteCorrelatedScalarSubquery / RewritePredicateSubquery)
  * rather than per-row re-execution.
  */
object TpchFull {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec4(c: String): Column = col(c).cast(DecimalType(4, 2))
  private def revenue: Column = dec(col("l_extendedprice")) * (lit(1) - dec4("l_discount"))

  /** TPC-H Q2 shape: cheapest supplier per part in a region. partsupp
    * is stood in by per-(part,supplier) MIN(l_extendedprice) from the
    * fact. The correlated "= (SELECT MIN(...))" is expressed as a
    * window min over the eligible set — ONE shuffle on p_partkey
    * instead of a decorrelated self-join, the winning shape at scale. */
  val tpchQ2: QueryEntry = QueryEntry(
    "q57_tpch_q2",
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |elig AS (
      |  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, c,
      |         MIN(c) OVER (PARTITION BY p_partkey) AS best
      |  FROM part JOIN cost ON p_partkey = l_partkey
      |       JOIN supplier ON s_suppkey = l_suppkey
      |       JOIN nation ON s_nationkey = n_nationkey
      |       JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE' AND p_size BETWEEN 10 AND 20)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM elig WHERE c = best
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin
  ) { (s, d) =>
    val cost = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("c"))
    val elig = Tables.part(s, d).filter(col("p_size").between(10, 20))
      .join(cost, col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    elig
      .withColumn("best", min(col("c")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("c") === col("best"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q6: forecast revenue change — the canonical pushed-filter
    * scan + scalar aggregate. At 100 TB this is a map-only scan with
    * all three predicates in PushedFilters and a 2-column ReadSchema. */
  val tpchQ6: QueryEntry = QueryEntry(
    "q58_tpch_q6",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec4("l_discount"))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q8: national market share — conditional share of a grouped
    * sum over a 7-table join. Share = decimal-sum / decimal-sum, both
    * cast to double only at output. */
  val tpchQ8: QueryEntry = QueryEntry(
    "q59_tpch_q8",
    """SELECT o_year,
      |       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(12,2)) * (1 - CAST(0 AS DECIMAL(4,2))) END) AS DOUBLE)
      |       / CAST(SUM(vol) AS DOUBLE) AS mkt_share
      |FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      |             CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS vol,
      |             n2.n_name AS nation
      |      FROM part JOIN lineitem ON p_partkey = l_partkey
      |           JOIN supplier ON s_suppkey = l_suppkey
      |           JOIN orders ON l_orderkey = o_orderkey
      |           JOIN customer ON o_custkey = c_custkey
      |           JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |           JOIN region ON n1.n_regionkey = r_regionkey
      |           JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
      |        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00') allnations
      |GROUP BY o_year ORDER BY o_year""".stripMargin
  ) { (s, d) =>
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    val zero = dec(lit(0)) * (lit(1) - lit(0).cast(DecimalType(4, 2)))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "STANDARD")),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate").between(
            lit("1996-01-01 00:00:00").cast("timestamp"),
            lit("1997-12-31 00:00:00").cast("timestamp"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n1_region") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select(year(col("o_orderdate")).as("o_year"), revenue.as("vol"), col("nation"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("nation") === "NATION_3", col("vol")).otherwise(zero)).cast("double")
        / sum(col("vol")).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9: product-type profit by nation and year. Supply cost is
    * stood in by p_retailprice × quantity (no partsupp in testdata). */
  val tpchQ9: QueryEntry = QueryEntry(
    "q60_tpch_q9",
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (SELECT n_name AS nation,
      |             CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      |             CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |               - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      |      FROM part JOIN lineitem ON p_partkey = l_partkey
      |           JOIN supplier ON s_suppkey = l_suppkey
      |           JOIN orders ON o_orderkey = l_orderkey
      |           JOIN nation ON s_nationkey = n_nationkey
      |      WHERE p_name LIKE '%red%') profit
      |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%red%"))),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
        (revenue - dec(col("p_retailprice")) * dec(col("l_quantity"))).as("amount"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("amount")).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q10: returned-item revenue per customer, top 20. Revenue
    * ties broken by custkey so the LIMIT edge is deterministic. */
  val tpchQ10: QueryEntry = QueryEntry(
    "q61_tpch_q10",
    """SELECT c_custkey, c_name,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |       c_acctbal, n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |     JOIN lineitem ON l_orderkey = o_orderkey
      |     JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-07-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q11 shape: parts whose stocked value for one nation's
    * suppliers exceeds a scalar-subquery fraction of the total. The
    * threshold compare happens in exact decimals. */
  val tpchQ11: QueryEntry = QueryEntry(
    "q62_tpch_q11",
    """WITH val AS (
      |  SELECT l_partkey AS partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |       JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_5'
      |  GROUP BY l_partkey)
      |SELECT partkey, CAST(v AS DOUBLE) AS value FROM val
      |WHERE v > (SELECT SUM(v) * 0.001 FROM val)
      |ORDER BY value DESC, partkey""".stripMargin
  ) { (s, d) =>
    val suppOfNation = broadcast(
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
    val value = Tables.lineitem(s, d)
      .join(suppOfNation, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("v"))
    val threshold = value.agg((sum(col("v")) * lit(0.001)).as("t"))
    value.join(broadcast(threshold))
      .filter(col("v") > col("t"))
      .select(col("partkey"), col("v").cast("double").as("value"))
      .orderBy(col("value").desc, col("partkey"))
  }

  /** TPC-H Q13: customer distribution of order counts INCLUDING the
    * zero-order customers — filter lives in the LEFT JOIN's ON clause,
    * which is exactly what distinguishes it from a WHERE. */
  val tpchQ13: QueryEntry = QueryEntry(
    "q63_tpch_q13",
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders
      |           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15: top supplier by quarterly revenue — "revenue = MAX
    * (scalar subquery over the same view)", matched on exact decimals
    * so the equality is safe. */
  val tpchQ15: QueryEntry = QueryEntry(
    "q64_tpch_q15",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total = (SELECT MAX(total) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(revenue).as("total"))
    val best = rev.agg(max(col("total")).as("best"))
    rev.join(broadcast(best)).filter(col("total") === col("best"))
      .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("supplier_no"))
      .select(col("s_suppkey"), col("s_name"), col("total").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17: small-quantity-order revenue below a correlated
    * per-part average. Quantities are integral doubles, so AVG is the
    * exact integer sum / count in both engines. The correlated AVG
    * decorrelates into a grouped join (Catalyst), not per-row SQL. */
  val tpchQ17: QueryEntry = QueryEntry(
    "q65_tpch_q17",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'
      |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin
  ) { (s, d) =>
    Tables.registerViews(s, d)
    s.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** TPC-H Q21 shape: suppliers whose line was the ONLY late one in a
    * finished multi-supplier order ("late" = shipped >90 days after
    * order date; testdata has no commit/receipt dates). EXISTS → semi
    * join, NOT EXISTS → anti join, both on l_orderkey with non-equi
    * residuals — the fact joins itself twice, shuffling on the same key
    * so AQE reuses the exchange. */
  val tpchQ21: QueryEntry = QueryEntry(
    "q66_tpch_q21",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |     JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |     JOIN orders ON o_orderkey = l1.l_orderkey
      |     JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |  AND n_name = 'NATION_7'
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val late = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
    val l2 = li.select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
    val l3 = li.select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"),
      col("l_shipdate").as("l3_shipdate"))
    late
      .join(l2, col("l2_orderkey") === col("l_orderkey") &&
        col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l3_orderkey") === col("l_orderkey") &&
        col("l3_suppkey") =!= col("l_suppkey") &&
        col("l3_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"), "left_anti")
      .join(broadcast(Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q22 shape: rich "inactive" customers per country code
    * (nationkey mod 10 stands in for the phone prefix; inactive = no
    * urgent-priority order, since every testdata customer has orders).
    * Scalar AVG subquery threshold + NOT EXISTS anti join; the avg is
    * the exact decimal sum / count cast to double. */
  val tpchQ22: QueryEntry = QueryEntry(
    "q67_tpch_q22",
    """SELECT cntry, COUNT(*) AS numcust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM (SELECT c_nationkey % 10 AS cntry, c_acctbal, c_custkey FROM customer
      |      WHERE c_nationkey % 10 IN (1, 3, 5, 7)
      |        AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |                         FROM customer c2
      |                         WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey % 10 IN (1, 3, 5, 7))
      |        AND NOT EXISTS (SELECT 1 FROM orders
      |                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')) custsale
      |GROUP BY cntry ORDER BY cntry""".stripMargin
  ) { (s, d) =>
    val cust = Tables.customer(s, d)
      .withColumn("cntry", col("c_nationkey") % 10)
      .filter(col("cntry").isin(1, 3, 5, 7))
    val threshold = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("t"))
    cust
      .join(broadcast(threshold))
      .filter(col("c_acctbal") > col("t"))
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("cntry"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("cntry"))
  }

  val all: Seq[QueryEntry] = Seq(
    tpchQ2, tpchQ6, tpchQ8, tpchQ9, tpchQ10, tpchQ11, tpchQ13, tpchQ15,
    tpchQ17, tpchQ21, tpchQ22)
}
