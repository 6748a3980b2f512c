package graft

import org.apache.spark.sql.types.{ArrayType, MapType}

/** Harness-compatibility gate for every oracled entry's output schema.
  *
  * The driver's correctness harness canonicalizes both result sets
  * through a pandas column-sort before hashing; a top-level ArrayType
  * (or MapType) cell is unhashable there and kills the comparison at
  * the harness layer even when both engines computed identical values
  * (this is exactly how p22_loss_mask went red in round 10 — see
  * VERDICT r10 "What's wrong" #1). Contract: any entry that declares an
  * oracle must emit only scalar top-level columns; sequence-valued
  * results are canonicalized to a joined string (`array_join`) or
  * exploded to one row per element before registration. Entries without
  * an oracle are exempt — the driver only row-counts them.
  */
class OracleSchemaSpec extends SparkSpec {

  SparkEntry.allEntries.filter(_.oracle.isDefined).foreach { e =>
    test(s"${e.name} (oracled) emits no array/map top-level columns") {
      val bad = e.build(spark, sf1).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] => f.name
      }
      assert(bad.isEmpty,
        s"oracled entry ${e.name} has unhashable columns ${bad.mkString(",")}; " +
          "array_join or explode them (driver harness sorts via pandas)")
    }
  }
}
