package graft

// encoders need a top-level case class (inner classes lack a static scope)
case class TypedOrder(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double)

/** Typed Dataset[T] surface: case-class encoders, typed transforms and
  * groupByKey aggregation agree with the untyped DataFrame path. */
class TypedDatasetSpec extends SparkSpec {

  test("typed groupByKey agg equals DataFrame groupBy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ds = Tables.orders(spark, sf1)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[TypedOrder]
    val typed = ds.filter(_.o_totalprice > 1000.0)
      .groupByKey(_.o_orderstatus)
      .mapGroups((k, it) => (k, it.size))
      .collect().sortBy(_._1).toSeq
    val untyped = Tables.orders(spark, sf1)
      .filter(col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => (r.getString(0), r.getLong(1).toInt)).sortBy(_._1).toSeq
    assert(typed == untyped && typed.nonEmpty)
  }

  test("typed map keeps encoder schema") {
    import spark.implicits._
    val ds = Tables.orders(spark, sf1)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[TypedOrder]
      .map(o => o.copy(o_totalprice = o.o_totalprice * 2))
    assert(ds.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
    assert(ds.count() == Tables.orders(spark, sf1).count())
  }
}
