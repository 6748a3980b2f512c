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
}
