package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Value gate for the r20 compiled decimal kernels (DecimalDot, PqLut,
  * NearestDecimal): each must be BIT-identical — values and nulls — to
  * the Catalyst composition it replaced (the relational decimal sums /
  * interpreted higher-order folds that the s05/s07/s08 oracles froze).
  * The HOF reference forms are spelled out here verbatim so a kernel
  * drift fails against the same arithmetic the DuckDB oracle replays,
  * on real corpus vectors plus adversarial null/mismatch literals. */
class DecimalVecOpsSpec extends SparkSpec {

  private val dec = DecimalType(28, 18)

  /** The interpreted reference: CAST(Σ DECIMAL(28,18)(aᵢ·bᵢ) AS DOUBLE)
    * accumulated at (28,18) — exactly the fold DecimalDot compiles. */
  private def ddotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") * y.cast("double")).cast(dec)),
      lit(java.math.BigDecimal.ZERO).cast(dec),
      (acc, v) => (acc + v).cast(dec))
      .cast("double")

  /** The interpreted reference for the decimal argmin fold (the old
    * Clustering.nearestDecimal body, verbatim). */
  private def nearestHof(cents: Column, emb: Column): Column =
    aggregate(cents,
      struct(lit(null).cast(dec).as("dist"), lit(-1L).as("cl")),
      (acc, cc) => {
        val dist = aggregate(
          zip_with(emb, cc("cs"), (xf, c) => {
            val x = xf.cast("double")
            ((x - c) * (x - c)).cast(dec)
          }),
          lit(java.math.BigDecimal.ZERO).cast(dec),
          (a, sq) => (a + sq).cast(dec))
        when(acc("cl") === -1L || dist < acc("dist"),
          struct(dist.as("dist"), cc("cl").as("cl"))).otherwise(acc)
      })("cl")

  private def pairs = {
    val e = Tables.embeddings(spark, sf1)
    val q = e.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("qe"))
    e.crossJoin(broadcast(q))
  }

  test("decimal_dot equals the decimal HOF fold on corpus float x double pairs") {
    val diff = pairs
      .select(VectorFunctions.decimal_dot(col("embedding"), col("qe")).as("k"),
        ddotHof(col("embedding"), col("qe")).as("h"))
      .filter(not(col("k") <=> col("h")))
      .count()
    assert(diff === 0L)
  }

  test("decimal_dot null semantics: length mismatch and null element both yield null") {
    val row = spark.sql(
      """SELECT CAST(array(1.5, 2.5) AS array<double>) AS a,
        |       CAST(array(1.0, 2.0, 3.0) AS array<double>) AS b,
        |       CAST(array(1.0, NULL) AS array<double>) AS c""".stripMargin)
    val out = row.select(
      VectorFunctions.decimal_dot(col("a"), col("b")).as("mismatch"),
      VectorFunctions.decimal_dot(col("a"), col("c")).as("nullElem"),
      VectorFunctions.decimal_dot(col("a"), col("a")).as("ok"),
      ddotHof(col("a"), col("a")).as("okRef")).collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1))
    assert(out.getDouble(2) === out.getDouble(3))
  }

  test("nearest_decimal equals the interpreted argmin fold on corpus vectors") {
    val e = Tables.embeddings(spark, sf1)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cl"),
        transform(col("embedding"), x => x.cast("double")).as("cs"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("cl"), col("cs")))).as("cents"))
    val diff = e.crossJoin(broadcast(cents))
      .select(VectorFunctions.nearest_decimal(col("cents"), col("embedding")).as("k"),
        nearestHof(col("cents"), col("embedding")).as("h"))
      .filter(not(col("k") <=> col("h")))
      .count()
    assert(diff === 0L)
  }

  test("nearest_decimal fold quirks: empty array is -1; ties break to the earlier cl") {
    val out = spark.sql(
      """SELECT CAST(array() AS array<struct<cl: bigint, cs: array<double>>>) AS empty,
        |       array(struct(3L AS cl, array(1.0d, 1.0d) AS cs),
        |             struct(5L AS cl, array(1.0d, 1.0d) AS cs)) AS tied,
        |       CAST(array(1.0, 1.0) AS array<double>) AS v""".stripMargin)
      .select(
        VectorFunctions.nearest_decimal(col("empty"), col("v")).as("e"),
        VectorFunctions.nearest_decimal(col("tied"), col("v")).as("t"),
        nearestHof(col("tied"), col("v")).as("tRef")).collect()(0)
    assert(out.getLong(0) === -1L)
    assert(out.getLong(1) === 3L)
    assert(out.getLong(1) === out.getLong(2))
  }

  test("pq_lut (dot and squared) equals per-slot decimal HOF folds on a real codebook") {
    val M = Similarity.pqSubspaces; val sd = Similarity.pqSubDim
    val k = Similarity.pqK
    val e = Tables.embeddings(spark, sf1)
    // synthetic but real-shaped codebook: per subspace, 5 centroids =
    // subDim-slices of the first 5 corpus vectors (cl dense 0..4)
    val cbs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("cl"),
        explode(sequence(lit(0), lit(M - 1))).as("sub"), col("embedding"))
      .select(col("sub"), col("cl"),
        expr(s"transform(slice(embedding, sub * $sd + 1, $sd), x -> CAST(x AS DOUBLE))").as("cs"))
      .groupBy(col("sub"))
      .agg(array_sort(collect_list(struct(col("cl"), col("cs")))).as("arr"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("sub"), col("arr")))).as("cbs"))
    def lutHof(cbsC: Column, vec: Column, squared: Boolean): Column =
      transform(sequence(lit(0), lit(M * k - 1)), i => {
        val sub = (i / k).cast("int")
        val cl = (i % k).cast("int")
        val arr = element_at(cbsC, sub + 1).getField("arr")
        when(cl < size(arr), {
          val cs = element_at(arr, cl + 1).getField("cs")
          if (squared) ddotHof(cs, cs)
          else ddotHof(slice(vec, sub * sd + 1, lit(sd)), cs)
        }).otherwise(lit(null).cast("double"))
      })
    val diff = e.crossJoin(broadcast(cbs))
      .select(
        VectorFunctions.pq_lut(col("cbs"), col("embedding"), M, sd, k, squared = false).as("kd"),
        lutHof(col("cbs"), col("embedding"), squared = false).as("hd"),
        VectorFunctions.pq_lut(col("cbs"), col("embedding"), M, sd, k, squared = true).as("ks"),
        lutHof(col("cbs"), col("embedding"), squared = true).as("hs"))
      .filter(not(col("kd") <=> col("hd")) || not(col("ks") <=> col("hs")))
      .count()
    assert(diff === 0L)
  }
}
