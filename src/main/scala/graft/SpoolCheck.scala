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
  * `{"metric":"spool_check","rows":N,"pages":P,"complete":true}`. */
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

      // drain: follow nextUri and verify the COMPLETE id multiset
      // arrived, WITHOUT retaining anything (running count + sum + xor
      // — together they pin the multiset {0..rows-1} for distinct ids,
      // which round-robin REPARTITION(1) preserves). Arrival ORDER is
      // deliberately not asserted: round-robin repartition + shuffle
      // block fetch order is not a Spark ordering contract, so an
      // order gate could spuriously fail on a scheduler change even
      // though the spool path is correct (ADVICE r17).
      val nextRe = """"nextUri":"([^"]+)"""".r
      val idRe = """\[(\d+),""".r
      var n = 0L
      var pages = 0
      var sum = 0L
      var xor = 0L
      var next = nextRe.findFirstMatchIn(body).map(_.group(1))
      while (next.isDefined) {
        body = get(next.get)
        pages += 1
        if (body.contains("\"error\"")) {
          System.err.println(body.take(500))
          sys.exit(2)
        }
        idRe.findAllMatchIn(body).foreach { m =>
          val id = m.group(1).toLong
          sum += id
          xor ^= id
          n += 1
        }
        next = nextRe.findFirstMatchIn(body).map(_.group(1))
      }
      require(n == rows, s"drained $n of $rows rows")
      val (expSum, expXor) = {
        var s = 0L; var x = 0L; var i = 0L
        while (i < rows) { s += i; x ^= i; i += 1 }
        (s, x)
      }
      require(sum == expSum && xor == expXor,
        s"drained id multiset mismatch: sum=$sum/$expSum xor=$xor/$expXor")
      println(s"""{"metric":"spool_check","rows":$n,"pages":$pages,""" +
        s""""complete":true}""")
    } finally spark.stop()
    // the HttpServer's internal dispatcher thread is non-daemon and
    // would hold the JVM open after main returns
    sys.exit(0)
  }
}
