package graft

import java.sql.DriverManager

/** JDBC source surface against embedded Derby — the closest offline
  * analogue of the reference's PostgreSQL connector path, exercising
  * the DSv2 JDBC behaviors the reference's plans rely on: filter
  * pushdown (q001 explain.txt:9 parameterized WHERE) and aggregate
  * pushdown (the whole sum evaluated in the source, SURVEY.md §4.1). */
class JdbcSourceSpec extends SparkSpec {

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE ord (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO ord VALUES (?, ?, ?)")
    Tables.orders(spark, sf1).select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(500).collect().foreach { r =>
        ps.setLong(1, r.getLong(0)); ps.setLong(2, r.getLong(1)); ps.setDouble(3, r.getDouble(2))
        ps.addBatch()
      }
    ps.executeBatch()
    st.execute("CREATE TABLE cust (c_custkey BIGINT, c_name VARCHAR(64))")
    val pc = conn.prepareStatement("INSERT INTO cust VALUES (?, ?)")
    Tables.customer(spark, sf1).select("c_custkey", "c_name")
      .limit(200).collect().foreach { r =>
        pc.setLong(1, r.getLong(0)); pc.setString(2, r.getString(1))
        pc.addBatch()
      }
    pc.executeBatch()
    conn.close()
    u
  }

  private def jdbcOrders =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "ord")
      .option("pushDownAggregate", "true")
      .option("pushDownLimit", "true")
      .load()

  test("JDBC scan reads rows") {
    assert(jdbcOrders.count() == 500)
  }

  test("filters are pushed into the JDBC source") {
    import org.apache.spark.sql.functions._
    val q = jdbcOrders.filter(col("o_orderkey") < 100)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("O_ORDERKEY"), plan)
    assert(q.count() > 0)
  }

  test("aggregates are pushed into the JDBC source (q001 shape)") {
    import org.apache.spark.sql.functions._
    val q = jdbcOrders.agg(sum(col("o_totalprice")).as("sales"))
    val plan = q.queryExecution.optimizedPlan.toString
    // with pushDownAggregate the scan relation exposes the SUM
    assert(plan.contains("SUM") || plan.contains("sum"), plan)
    assert(q.head().getDouble(0) > 0)
  }

  test("a two-table join is pushed into the JDBC source as one scan (q004 shape)") {
    import org.apache.spark.sql.functions._
    org.apache.spark.sql.jdbc.GraftDerbyJoinDialect.register()
    val conf = spark.conf
    conf.set("spark.sql.catalog.derby",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    conf.set("spark.sql.catalog.derby.url", url)
    conf.set("spark.sql.catalog.derby.pushDownJoin", "true")
    conf.set("spark.sql.catalog.derby.pushDownAggregate", "true")
    try {
      // Derby folds unquoted DDL identifiers to uppercase; the v2
      // catalog quotes whatever identifier it receives
      val o = spark.table("derby.APP.ORD")
      val c = spark.table("derby.APP.CUST")
      val q = o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_totalprice"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // the whole join runs in the source: exactly one JDBC scan, no
      // Spark-side join operator (reference q004 explain.txt:70)
      assert("Scan JDBC".r.findAllIn(plan).length == 1, plan)
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
      // row-identical to the unfused plan
      val unfused = jdbcOrders.as("o")
        .join(spark.read.format("jdbc").option("url", url).option("dbtable", "cust").load(),
          col("o_custkey") === col("c_custkey"))
      assert(q.count() == unfused.count())
      assert(q.count() > 0)
    } finally {
      // restore the stock dialect too — the registry is JVM-global and
      // other suites' Derby plans must not depend on execution order
      org.apache.spark.sql.jdbc.GraftDerbyJoinDialect.unregister()
      Seq("spark.sql.catalog.derby", "spark.sql.catalog.derby.url",
        "spark.sql.catalog.derby.pushDownJoin",
        "spark.sql.catalog.derby.pushDownAggregate").foreach(conf.unset)
    }
  }
}
