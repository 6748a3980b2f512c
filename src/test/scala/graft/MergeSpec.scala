package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftMerge, GraftVersions}

/** MERGE INTO (l04) + concurrent-commit protocol gates: copy-on-write
  * file reuse, snapshot isolation under merge, optimistic append races
  * (both writers' rows survive), read-modify-write conflict detection,
  * and the vacuum guard for in-flight commit files. */
class MergeSpec extends SparkSpec {

  private def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mg").toString
    spark.conf.set("spark.sql.graft.root", dir)
    dir
  }

  private def kvRows(q: String) = spark.sql(q).collect()
    .map(r => (r.getInt(0), r.getString(1))).toSet

  test("merge replaces matched rows, inserts unmatched, reuses untouched files") {
    val root = freshRoot()
    import spark.implicits._
    // 4 single-key files: per-key partitioning makes touched-file
    // accounting exact (source hits keys 2 and 4 → exactly 2 files)
    Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
      .repartition(4, col("k")).createOrReplaceTempView("mg_src")
    spark.sql("""CREATE TABLE psql.tpcds.mg1 TBLPROPERTIES('versioned'='true')
                |AS SELECT * FROM mg_src""".stripMargin)
    val dir = s"$root/mg1.parquet"
    val before = GraftVersions.manifest(dir, 1).map(p => new java.io.File(p).getName)
    val src = Seq((2, "B2"), (4, "D2"), (9, "NEW")).toDF("k", "v")
    val (base, reused, rewritten) = GraftMerge.mergeInto(spark, dir, src, "k")
    assert(base == 1)
    assert(reused + rewritten == before.size)
    assert(rewritten >= 1 && reused >= 1,
      s"expected partial rewrite, got reused=$reused rewritten=$rewritten")
    // post-merge state: updates applied, insert present, others kept
    assert(kvRows("SELECT * FROM psql.tpcds.mg1") ==
      Set((1, "a"), (2, "B2"), (3, "c"), (4, "D2"), (9, "NEW")))
    // pre-merge snapshot unchanged
    assert(kvRows("SELECT * FROM psql.tpcds.mg1 VERSION AS OF 1") ==
      Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // untouched files carried into v2's manifest BY NAME (no rewrite)
    val after = GraftVersions.manifest(dir, 2).map(p => new java.io.File(p).getName)
    val carried = before.toSet.intersect(after.toSet)
    assert(carried.size == reused, s"manifest reuse mismatch: $carried")
  }

  test("racing appends both land: no lost update, versions serialize") {
    val root = freshRoot()
    import spark.implicits._
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("mg_src2")
    spark.sql("""CREATE TABLE psql.tpcds.mg2 TBLPROPERTIES('versioned'='true')
                |AS SELECT * FROM mg_src2""".stripMargin)
    val dir = s"$root/mg2.parquet"
    val dfs = (0 until 4).map(i => Seq((100 + i, s"w$i")).toDF("k", "v"))
    // 4 concurrent blind appends — every one must retry past the
    // others and publish; the final snapshot must contain all rows
    val threads = dfs.map { df =>
      new Thread(() => GraftVersions.commit(dir, df, overwrite = false))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(GraftVersions.current(dir) == 5)
    assert(kvRows("SELECT * FROM psql.tpcds.mg2") ==
      Set((1, "a"), (100, "w0"), (101, "w1"), (102, "w2"), (103, "w3")))
    // every intermediate snapshot is well-formed (no torn manifest):
    // each version adds exactly one row over its predecessor
    (1 to 5).foreach { v =>
      assert(spark.sql(
        s"SELECT COUNT(*) FROM psql.tpcds.mg2 VERSION AS OF $v").head.getLong(0) == v)
    }
  }

  test("merge based on a stale snapshot fails loudly, losing no rows") {
    val root = freshRoot()
    import spark.implicits._
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("mg_src3")
    spark.sql("""CREATE TABLE psql.tpcds.mg3 TBLPROPERTIES('versioned'='true')
                |AS SELECT * FROM mg_src3""".stripMargin)
    val dir = s"$root/mg3.parquet"
    // a writer sneaks in a commit between the merge's snapshot read
    // (simulated: mergeCommit pinned to base=1) and its publish
    GraftVersions.commit(dir, Seq((2, "b")).toDF("k", "v"), overwrite = false)
    val ex = intercept[java.util.ConcurrentModificationException] {
      GraftVersions.mergeCommit(dir, expectedBase = 1, keepNames = Seq.empty,
        Seq((1, "A")).toDF("k", "v"))
    }
    assert(ex.getMessage.contains("conflicts"))
    // the concurrent writer's row survived; the failed merge left no
    // manifest and its staged files were surrendered
    assert(kvRows("SELECT * FROM psql.tpcds.mg3") == Set((1, "a"), (2, "b")))
    assert(GraftVersions.current(dir) == 2)
  }

  test("streaming upsert: each micro-batch is one snapshot, history time-travelable") {
    val root = freshRoot()
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("mg_src5")
    spark.sql("""CREATE TABLE psql.tpcds.mg5 TBLPROPERTIES('versioned'='true')
                |AS SELECT * FROM mg_src5""".stripMargin)
    val dir = s"$root/mg5.parquet"
    val srcDir = java.nio.file.Files.createTempDirectory("graft_mgs").toString
    Seq((2, "B"), (3, "c")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$srcDir/batch1.parquet")
    val stream = spark.readStream
      .schema("k INT, v STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*.parquet")
    val q = graft.streaming.DocsStreaming.mergeStream(dir, "k", stream).start()
    try {
      q.processAllAvailable()
      assert(kvRows("SELECT * FROM psql.tpcds.mg5") ==
        Set((1, "a"), (2, "B"), (3, "c")))
      // second micro-batch arrives; the stream merges it as ANOTHER commit
      Seq((3, "C3"), (4, "d")).toDF("k", "v").coalesce(1)
        .write.parquet(s"$srcDir/batch2.parquet")
      q.processAllAvailable()
    } finally q.stop()
    assert(kvRows("SELECT * FROM psql.tpcds.mg5") ==
      Set((1, "a"), (2, "B"), (3, "C3"), (4, "d")))
    assert(GraftVersions.current(dir) == 3)
    // the intermediate micro-batch boundary is a time-travelable snapshot
    assert(kvRows("SELECT * FROM psql.tpcds.mg5 VERSION AS OF 2") ==
      Set((1, "a"), (2, "B"), (3, "c")))
    assert(kvRows("SELECT * FROM psql.tpcds.mg5 VERSION AS OF 1") ==
      Set((1, "a"), (2, "b")))
  }

  test("expire never vacuums an in-flight commit's files") {
    val root = freshRoot()
    import spark.implicits._
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("mg_src4")
    spark.sql("""CREATE TABLE psql.tpcds.mg4 TBLPROPERTIES('versioned'='true')
                |AS SELECT * FROM mg_src4""".stripMargin)
    spark.sql("INSERT INTO psql.tpcds.mg4 VALUES (2, 'b')")
    val dir = s"$root/mg4.parquet"
    // an in-flight commit has moved its file into data/ but not yet
    // published its manifest: version prefix beyond the pointer
    val inFlight = new java.io.File(s"$dir/data/v99-0-deadbeef.parquet")
    java.nio.file.Files.write(inFlight.toPath, Array[Byte](1, 2, 3))
    val (_, deleted) = GraftVersions.expire(dir, keepLast = 1)
    assert(!deleted.contains(inFlight.getName) && inFlight.exists(),
      "vacuum deleted an uncommitted snapshot's data file")
  }
}
