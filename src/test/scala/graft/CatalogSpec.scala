package graft

import org.apache.spark.sql.functions._

/** Federated multi-catalog surface (SURVEY.md §4.3.1): three-part
  * names, placement enforcement, namespace DDL, CTAS/DROP through the
  * DSv2 catalog — mirroring the reference's psql/mongodb/elastic split
  * (loader.py:313-322). */
class CatalogSpec extends SparkSpec {

  private def useRoot(dir: String): Unit =
    spark.conf.set("spark.sql.graft.root", dir)

  test("three-part names resolve per catalog placement") {
    useRoot(sf1)
    assert(spark.sql("SELECT * FROM psql.tpcds.lineitem").count() > 0)
    assert(spark.sql("SELECT * FROM mongodb.tpcds.orders").count() > 0)
    assert(spark.sql("SELECT * FROM elastic.default.documents").count() > 0)
  }

  test("placement is enforced: orders is not in psql") {
    useRoot(sf1)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM psql.tpcds.orders").collect()
    }
    assert(e.getMessage.contains("orders") || e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }

  test("catalog scans get filter pushdown and column pruning") {
    useRoot(sf1)
    val q = spark.sql(
      "SELECT l_orderkey FROM psql.tpcds.lineitem WHERE l_suppkey = 3")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,3)]"), plan)
    assert(q.count() > 0)
  }

  test("SHOW NAMESPACES / SHOW TABLES") {
    useRoot(sf1)
    val ns = spark.sql("SHOW NAMESPACES IN psql").collect().map(_.getString(0))
    assert(ns.contains("tpcds"))
    val ts = spark.sql("SHOW TABLES IN psql.tpcds").collect().map(_.getString(1))
    assert(ts.contains("lineitem") && !ts.contains("orders"))
  }

  test("CREATE NAMESPACE / CTAS / DROP TABLE through the catalog") {
    useRoot(sf1)
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    // copy a source file so the temp root serves psql tables
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf1/nation.parquet"),
      java.nio.file.Paths.get(s"$root/nation.parquet"))
    useRoot(root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS psql.staging")
    spark.sql(
      """CREATE TABLE psql.tpcds.nation_small AS
        |SELECT n_nationkey, n_name FROM psql.tpcds.nation WHERE n_regionkey = 0""".stripMargin)
    val back = spark.sql("SELECT * FROM psql.tpcds.nation_small")
    assert(back.count() > 0 && back.columns.toSeq == Seq("n_nationkey", "n_name"))
    spark.sql("DROP TABLE psql.tpcds.nation_small")
    useRoot(sf1)
  }

  test("CTAS tables are durable: visible and droppable from a fresh session") {
    val root = java.nio.file.Files.createTempDirectory("graft-dur").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf1/nation.parquet"),
      java.nio.file.Paths.get(s"$root/nation.parquet"))
    useRoot(root)
    spark.sql(
      """CREATE TABLE psql.tpcds.nation_dur AS
        |SELECT n_nationkey, n_name FROM psql.tpcds.nation""".stripMargin)
    // a brand-new session has fresh catalog instances (empty in-memory
    // state) — the table must still resolve from the directory on disk
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.graft.root", root)
    assert(s2.sql("SELECT * FROM psql.tpcds.nation_dur").count() > 0)
    assert(s2.sql("SHOW TABLES IN psql.tpcds").collect().map(_.getString(1))
      .contains("nation_dur"))
    s2.sql("DROP TABLE psql.tpcds.nation_dur")
    assert(!new java.io.File(s"$root/nation_dur.parquet").exists())
    // source data (a single parquet file) is still not droppable
    assert(!s2.sessionState.catalogManager.catalog("psql")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .dropTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("tpcds"), "nation")))
    useRoot(sf1)
  }

  test("federated query spans catalogs with broadcast dims") {
    useRoot(sf1)
    val df = SparkEntry.queries("q19_federated_catalogs")(spark, sf1)
    val plan = df.queryExecution.executedPlan.toString
    assert(df.count() > 0)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
