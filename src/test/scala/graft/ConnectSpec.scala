package graft

import java.sql.ResultSet

/** Spark Connect wire-equality gate, mirroring SqlServerSpec's for the
  * Thrift protocol: the gRPC endpoint runs in the suite's session JVM,
  * and the client side is the REAL `jdbc:sc://` Connect JDBC driver
  * loaded from the distribution's client bundle through an ISOLATED
  * classloader (platform parent) — the client ships its own shaded
  * gRPC/netty, which must never mix with the server's shaded copy on
  * this JVM's classpath. Every statement is a genuine network
  * round-trip: gRPC ExecutePlan, Arrow result batches, decoded by the
  * client into java.sql rows. */
class ConnectSpec extends SparkSpec {

  private lazy val clientLoader: ClassLoader = {
    val dir = new java.io.File("/opt/spark/jars/connect-repl")
    assume(dir.isDirectory, "Spark Connect client bundle not present")
    // the bundle has no scala-library / client-side API jars of its
    // own — borrow the distribution's libraries, EXCLUDING the server's
    // spark-connect jar (its org.apache.spark.sql.connect.* classes
    // must not shadow the client's; each side also carries its own
    // shaded gRPC under a distinct namespace). Client jars lead the
    // URL order, so client classes win any residual overlap.
    val base = new java.io.File("/opt/spark/jars").listFiles()
      .filter(f => f.getName.endsWith(".jar") &&
        !f.getName.startsWith("spark-connect_"))
    val urls = (dir.listFiles().filter(_.getName.endsWith(".jar")) ++ base)
      .map(_.toURI.toURL)
    // platform parent: java.sql.* interfaces are shared (bootstrap),
    // nothing from the server classpath leaks into the client
    new java.net.URLClassLoader(urls, ClassLoader.getPlatformClassLoader)
  }

  private def connect(url: String): java.sql.Connection = {
    val driver = clientLoader
      .loadClass("org.apache.spark.sql.connect.client.jdbc.SparkConnectDriver")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[java.sql.Driver]
    driver.connect(url, new java.util.Properties())
  }

  private def drain(rs: ResultSet): Seq[Seq[Any]] = try {
    val n = rs.getMetaData.getColumnCount
    val buf = scala.collection.mutable.ListBuffer[Seq[Any]]()
    while (rs.next()) buf += (1 to n).map(rs.getObject)
    buf.toSeq
  } finally rs.close() // frees the client's Arrow result buffers

  test("a Connect client's result equals direct execution (gRPC + Arrow wire)") {
    val port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    graft.sources.GraftConnectServer.start(spark, port)
    val conn = connect(s"jdbc:sc://localhost:$port")
    try {
      val st = conn.createStatement()
      // a Connect session is its own SparkSession: it inherits the
      // static conf (catalog definitions) but pins its own root
      st.execute(s"SET spark.sql.graft.root=$sf1")
      val q = """SELECT n_regionkey, COUNT(*) AS n
                |FROM psql.tpcds.nation GROUP BY n_regionkey
                |ORDER BY n_regionkey""".stripMargin
      val wire = drain(st.executeQuery(q))
        .map(r => (r(0).asInstanceOf[Number].intValue,
          r(1).asInstanceOf[Number].longValue))
      spark.conf.set("spark.sql.graft.root", sf1)
      val local = spark.sql(q).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(wire == local, s"wire $wire != local $local")
      assert(wire.nonEmpty)
      // session isolation both ways: a view created over the wire does
      // not appear in the suite session
      st.execute("CREATE TEMPORARY VIEW connect_only AS SELECT 1 AS x")
      assert(drain(st.executeQuery("SELECT x FROM connect_only")) ==
        Seq(Seq(1)))
      assert(!spark.catalog.tableExists("connect_only"),
        "a Connect session's temp view leaked into the server session")
    } finally conn.close()
  }
}
