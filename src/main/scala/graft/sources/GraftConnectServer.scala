package graft.sources

import org.apache.spark.sql.SparkSession

/** Spark Connect gRPC endpoint inside the graft session — the MODERN
  * programmatic client surface beside [[GraftSqlServer]]'s Thrift
  * statement protocol (the reference's two consumption paths:
  * loader.py's HTTP statement loop, and programmatic clients; SURVEY
  * §3.2 maps the latter to Spark Connect).
  *
  * Connect sessions are ISOLATED SparkSessions sharing this JVM's
  * SparkContext: they inherit the static conf — including the
  * federated catalog definitions GraftSession.configure sets at
  * builder time — but not this session's runtime conf or temp views,
  * so a wire client addresses tables through the catalogs
  * (`psql.tpcds.nation`) and pins its own `spark.sql.graft.root` via
  * `SET`. Results stream to the client as Arrow batches over gRPC —
  * the scale-correct wire shape (columnar pages, no driver-side full
  * collect).
  *
  * ConnectSpec drives it with the REAL JDBC-over-Connect client (the
  * `jdbc:sc://` driver) through an isolated classloader — the client
  * bundle ships its own shaded gRPC, which must not mix with the
  * server's — and gates wire results equal to direct execution. */
object GraftConnectServer {

  @volatile private var started = false

  /** Start the Connect gRPC service on `port` (idempotent per JVM).
    * Returns the remote URL clients connect to. */
  def start(spark: SparkSession, port: Int): String = synchronized {
    if (!started) {
      // the service reads its binding port from the LIVE SparkConf
      org.apache.spark.SparkEnv.get.conf
        .set("spark.connect.grpc.binding.port", port.toString)
      org.apache.spark.sql.connect.service.SparkConnectService
        .start(spark.sparkContext)
      started = true
    }
    s"sc://localhost:$port"
  }

  def stop(): Unit = synchronized {
    if (started) {
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
      started = false
    }
  }
}
