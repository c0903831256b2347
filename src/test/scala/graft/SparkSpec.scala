package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + helpers for all suites. One session per JVM (the
  * suites run in sbt's forked test JVM) via GraftSession so test plans
  * see exactly the configs Verify/Bench use.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  /** Smallest scale factor — semantic minis run here. */
  val sf: String = "/root/testdata/sf0.001"

  def run(key: String, dir: String = sf): DataFrame =
    SparkEntry.queries(key)(spark, dir)

  /** Formatted physical plan text, for plan-shape assertions. */
  def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
