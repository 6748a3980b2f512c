package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.jdbc.JDBCOptions
import org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCScanBuilder
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the SQL this engine would ship to a PRODUCTION PostgreSQL
  * store — the reference's actual connector (values.yml.j2:35-39,
  * PostgreSQL 16.4 per ansible/roles/postgresql/defaults/main.yml:6).
  * Every runtime gate in the repo proves pushdown through embedded
  * Derby (the only store this sandbox can start); these cases compile
  * the SAME pushdown shapes under Spark's `PostgresDialect` — resolved
  * by URL exactly as production would — and assert the rendered text,
  * no server needed. A dialect swap is precisely where quoting and
  * type-mapping bugs hide, and nothing else in the suite would catch
  * them (verdict r16 residual #1).
  *
  * Shapes pinned, one per Derby gate they mirror:
  *  - filter pushdown conjuncts (q01's parameterized WHERE),
  *  - aggregate pushdown (q01's full SUM-in-source),
  *  - DSv2 join pushdown (q16's fused-scan gate, GraftDerbyJoinDialect),
  *  - the q86 runtime-filter IN fold through [[graft.sources
  *    .GraftJdbcScanBuilder]] (hash-mod slices AND the rendered IN). */
class PgDialectSpec extends SparkSpec {

  // PostgresDialect is chosen by URL prefix — the same resolution a
  // production `spark.sql.catalog.psql.url` would trigger. No
  // connection is ever opened in this suite.
  private val pgUrl = "jdbc:postgresql://pg:5432/tpcds"
  private val dialect = JdbcDialects.get(pgUrl)

  private def col(n: String) = Expressions.column(n)
  private def str(s: String) =
    GraftBridge.v2Literal(UTF8String.fromString(s), StringType)
  private def int(v: Int) = GraftBridge.v2Literal(Int.box(v), IntegerType)
  private def lng(v: Long) = GraftBridge.v2Literal(Long.box(v), LongType)

  test("PostgresDialect is what a psql URL resolves to") {
    assert(dialect.getClass.getSimpleName.contains("PostgresDialect"),
      dialect.getClass.getName)
  }

  test("filter pushdown conjuncts render as PG SQL (q01 WHERE shape)") {
    // c_mktsegment = 'BUILDING' — double-quoted identifier (PG folds
    // unquoted to lower case; quoting preserves the catalog spelling),
    // single-quoted string literal
    val eq = new Predicate("=", Array(col("c_mktsegment"), str("BUILDING")))
    assert(dialect.compileExpression(eq)
      .contains("\"c_mktsegment\" = 'BUILDING'"),
      dialect.compileExpression(eq))

    // c_acctbal > 5000 (q86's dim predicate)
    val gt = new Predicate(">", Array(col("c_acctbal"), int(5000)))
    assert(dialect.compileExpression(gt).contains("\"c_acctbal\" > 5000"),
      dialect.compileExpression(gt))

    // embedded quote must double, not escape — PG standard_conforming
    // _strings rejects backslash escapes
    val quoted = new Predicate("=", Array(col("c_name"), str("O'Brien")))
    assert(dialect.compileExpression(quoted)
      .contains("\"c_name\" = 'O''Brien'"),
      dialect.compileExpression(quoted))

    // conjunction + IS NOT NULL (the q14 BETWEEN-chain residue shape)
    val conj = new Predicate("AND", Array(
      new Predicate(">=", Array(col("o_orderkey"), lng(100L))),
      new Predicate("IS_NOT_NULL", Array(col("o_comment")))))
    val conjSql = dialect.compileExpression(conj)
    assert(conjSql.exists(s => s.contains("\"o_orderkey\" >= 100") &&
      s.contains("\"o_comment\" IS NOT NULL")), conjSql)
  }

  test("temporal literals render as PG SQL (q14 BETWEEN pushdown shape)") {
    // Catalyst timestamps are epoch micros; the dialect must render a
    // literal PG accepts in a WHERE — a raw integer would type-error
    // server-side, so the rendering IS the compatibility contract
    val micros = java.time.Instant.parse("1995-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val ge = new Predicate(">=", Array(col("l_shipdate"),
      GraftBridge.v2Literal(Long.box(micros), TimestampType)))
    val sql = dialect.compileExpression(ge)
    assert(sql.exists(s => s.startsWith("\"l_shipdate\" >= ") &&
      s.contains("1995-01-01") && s.contains("'")), sql)

    val days = java.time.LocalDate.of(1995, 1, 1).toEpochDay.toInt
    val dge = new Predicate(">=", Array(col("o_orderdate"),
      GraftBridge.v2Literal(Int.box(days), DateType)))
    val dsql = dialect.compileExpression(dge)
    assert(dsql.exists(s => s.contains("1995-01-01") && s.contains("'")),
      dsql)
  }

  test("aggregate pushdown renders as PG SQL (q01 SUM-in-source shape)") {
    assert(dialect.compileAggregate(
      new Sum(col("o_totalprice"), false)).contains("SUM(\"o_totalprice\")"))
    assert(dialect.compileAggregate(new CountStar()).contains("COUNT(*)"))
    assert(dialect.compileAggregate(
      new Count(col("o_custkey"), true)).contains("COUNT(DISTINCT \"o_custkey\")"))
    assert(dialect.compileAggregate(
      new Min(col("o_totalprice"))).contains("MIN(\"o_totalprice\")"))
  }

  test("full scan statement renders via the PG query builder") {
    val opts = pgOptions("tpcds.orders")
    val where = new Predicate("=", Array(col("o_orderstatus"), str("F")))
    val sql = GraftBridge.withPredicates(
        dialect.getJdbcSQLQueryBuilder(opts)
          .withColumns(Array("\"o_orderkey\"", "\"o_totalprice\"")),
        Array(where))
      .withLimit(10)
      .build()
    // PG takes the standard LIMIT clause (Derby renders FETCH FIRST —
    // the rendering THIS case exists to catch a swap of)
    assert(sql.contains("SELECT \"o_orderkey\",\"o_totalprice\" FROM tpcds.orders"),
      sql)
    assert(sql.contains("WHERE (\"o_orderstatus\" = 'F')"), sql)
    assert(sql.trim.endsWith("LIMIT 10"), sql)
  }

  test("DSv2 join pushdown fuses two PG scans into one join query") {
    assert(dialect.supportsJoin,
      "PostgresDialect must answer supportsJoin=true — the capability " +
        "GraftDerbyJoinDialect exists to emulate offline")
    withJoinPushdownConf {
      val left = scanBuilder("tpcds.orders",
        StructType(Seq(StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType))))
      val right = scanBuilder("tpcds.customer",
        StructType(Seq(StructField("c_custkey", LongType),
          StructField("c_name", StringType))))
      assert(left.isOtherSideCompatibleForJoin(right),
        "same-URL PG scans must be join-compatible")
      import org.apache.spark.sql.connector.read.SupportsPushDownJoin.ColumnWithAlias
      val cond = new Predicate("=",
        Array(col("o_custkey_l"), col("c_custkey_r")))
      val ok = left.pushDownJoin(right,
        org.apache.spark.sql.connector.join.JoinType.INNER_JOIN,
        Array(new ColumnWithAlias("o_orderkey", null),
          new ColumnWithAlias("o_custkey", "o_custkey_l")),
        Array(new ColumnWithAlias("c_custkey", "c_custkey_r"),
          new ColumnWithAlias("c_name", null)),
        cond)
      assert(ok, "join pushdown was refused under PostgresDialect")
      // the fused query replaces the table reference — the single
      // `Query[...]` fragment the reference's q004 plan ships to psql
      // (results/q004/workers-1/explain.txt:70)
      val fused = left.jdbcOptions.tableOrQuery
      assert(fused.toUpperCase.contains("JOIN"), fused)
      assert(fused.contains("tpcds.orders") && fused.contains("tpcds.customer"),
        fused)
      assert(fused.contains("\"o_custkey_l\" = \"c_custkey_r\""), fused)
    }
  }

  test("PG type mapping: the DDL types an export (l11 CTAS) would create") {
    def ddl(dt: org.apache.spark.sql.types.DataType): String =
      dialect.getJDBCType(dt).map(_.databaseTypeDefinition)
        .getOrElse(sys.error(s"no PG mapping for $dt"))
    // the mappings the reference's psql schema depends on: TEXT (not
    // CLOB), FLOAT8/FLOAT4, BYTEA (not BLOB) — all PG-specific
    // renderings a Derby-proven path would get wrong silently
    assert(ddl(StringType) == "TEXT", ddl(StringType))
    assert(ddl(DoubleType) == "FLOAT8", ddl(DoubleType))
    assert(ddl(FloatType) == "FLOAT4", ddl(FloatType))
    assert(ddl(BinaryType) == "BYTEA", ddl(BinaryType))
    assert(ddl(BooleanType) == "BOOLEAN", ddl(BooleanType))
    assert(ddl(ByteType) == "SMALLINT", ddl(ByteType))
  }

  test("TopN renders as PG ORDER BY … LIMIT/OFFSET (q03 shape)") {
    val opts = pgOptions("tpcds.orders")
    val sql = dialect.getJdbcSQLQueryBuilder(opts)
      .withColumns(Array("\"o_custkey\""))
      .withSortOrders(Array("\"o_totalprice\" DESC NULLS LAST"))
      .withLimit(20)
      .withOffset(5)
      .build()
    assert(sql.contains("ORDER BY \"o_totalprice\" DESC NULLS LAST"), sql)
    // PG takes LIMIT/OFFSET (Derby: FETCH FIRST / OFFSET … ROWS)
    assert(sql.contains("LIMIT 20") && sql.contains("OFFSET 5"), sql)
  }

  test("q86 runtime-filter IN fold renders into the PG fact scan") {
    import org.apache.spark.sql.connector.read.InputPartition
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType)))
    val fqn = dialect.quoteIdentifier("tpcds") + "." +
      dialect.quoteIdentifier("orders")
    val sb = new sources.GraftJdbcScanBuilder(pgUrl, fqn, "pgspec.orders",
      schema, Some("o_custkey"), 4)
    // compile-time pushdown: the branch predicate
    val residual = sb.pushPredicates(Array(
      new Predicate("=", Array(col("o_orderstatus"), str("F")))))
    assert(residual.isEmpty, "PG dialect must compile the = conjunct")
    sb.pruneColumns(StructType(schema.fields.filter(_.name == "o_custkey")))
    val scan = sb.build()
    // runtime filter arrives as the evaluated IN-set — note the
    // USER-CASE column spelling, which the seam must canonicalize
    scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]
      .filter(Array(new Predicate("IN",
        Array[org.apache.spark.sql.connector.expressions.Expression](
          col("O_CUSTKEY"), lng(7L), lng(11L), lng(42L)))))
    val parts: Array[InputPartition] = scan.toBatch.planInputPartitions()
    assert(parts.length == 4)
    val sqls = parts.map(_.asInstanceOf[sources.GraftJdbcPartition].sql)
    sqls.zipWithIndex.foreach { case (sql, i) =>
      assert(sql ==
        "SELECT \"o_custkey\" FROM \"tpcds\".\"orders\"" +
          " WHERE (\"o_orderstatus\" = 'F')" +
          " AND (\"o_custkey\" IN (7, 11, 42))" +
          s""" AND (MOD(MOD("o_custkey", 4) + 4, 4) = $i)""",
        sql)
    }
  }

  // ---- helpers ------------------------------------------------------

  /** PG-URL JDBCOptions constructible offline: the PG driver jar is
    * not on this classpath (and never needed — nothing here connects),
    * so the `driver` option names the Derby driver class to satisfy
    * JDBCOptions' eager driver registration. Dialect resolution is by
    * URL and unaffected. */
  private def pgOptions(table: String): JDBCOptions =
    new JDBCOptions(pgUrl, table, Map(
      "url" -> pgUrl, "dbtable" -> table,
      "driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver",
      "pushDownJoin" -> "true"))

  private def scanBuilder(table: String, schema: StructType): JDBCScanBuilder =
    JDBCScanBuilder(spark, schema, pgOptions(table), Map.empty)

  private def withJoinPushdownConf[A](body: => A): A = {
    val k = "spark.sql.optimizer.datasourceV2JoinPushdown"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }
}
