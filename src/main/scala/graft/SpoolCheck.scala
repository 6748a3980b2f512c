package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Statement-face memory-bound check (verdict r16 #7), run in its OWN
  * deliberately SMALL-heap JVM (`SPARK_DRIVER_MEM=768m ./run-main.sh
  * graft.SpoolCheck`): drives a one-partition multi-million-row result
  * through the real HTTP statement face and drains every page.
  *
  * Why a separate JVM: the property under test is "driver memory stays
  * O(page) even when the whole result is ONE partition". The spooled
  * serving path streams pre-rendered lines, so ~640 MB of rendered
  * rows never coexist in memory; the pre-r17 pipelined pull
  * materialized the full partition driver-side and cannot finish in
  * this heap. An in-suite heap-delta assertion would race the 16 GB
  * shared test JVM's other suites; here the heap itself is the
  * assertion — regressing to whole-partition materialization OOMs and
  * the check exits nonzero.
  *
  * Prints one JSON line
  * `{"metric":"spool_check","rows":N,"pages":P,"ordered":true}`. */
object SpoolCheck {

  private def get(url: String): String = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    val out = new String(conn.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    conn.disconnect()
    out
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = GraftSession.local("8")
    try {
      val base = sources.GraftStatementServer.start(spark)
      // one partition, ~250 B of rendered JSON per row: the exact
      // shape the pipelined pull cannot bound
      val sql = s"SELECT /*+ REPARTITION(1) */ id, repeat('x', 120) " +
        s"AS pad FROM range($rows)"
      val conn = URI.create(s"$base/v1/statement").toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("X-Trino-User", "spoolcheck")
      conn.setDoOutput(true)
      conn.getOutputStream.write(sql.getBytes(StandardCharsets.UTF_8))
      var body = new String(conn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8)
      conn.disconnect()

      // drain: follow nextUri; count rows and check the ids arrive in
      // order WITHOUT retaining anything (regex pull of leading ids)
      val nextRe = """"nextUri":"([^"]+)"""".r
      val idRe = """\[(\d+),""".r
      var n = 0L
      var pages = 0
      var expect = 0L
      var ordered = true
      var next = nextRe.findFirstMatchIn(body).map(_.group(1))
      while (next.isDefined) {
        body = get(next.get)
        pages += 1
        if (body.contains("\"error\"")) {
          System.err.println(body.take(500))
          sys.exit(2)
        }
        idRe.findAllMatchIn(body).foreach { m =>
          if (m.group(1).toLong != expect) ordered = false
          expect += 1
          n += 1
        }
        next = nextRe.findFirstMatchIn(body).map(_.group(1))
      }
      require(n == rows, s"drained $n of $rows rows")
      require(ordered, "rows arrived out of order")
      println(s"""{"metric":"spool_check","rows":$n,"pages":$pages,""" +
        s""""ordered":true}""")
    } finally spark.stop()
    // the HttpServer's internal dispatcher thread is non-daemon and
    // would hold the JVM open after main returns
    sys.exit(0)
  }
}
