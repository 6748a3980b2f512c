package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, per guide). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("8")
  val sf1: String = "/root/testdata/sf0.001"
  val sf2: String = "/root/testdata/sf0.01"
}
