package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across suites (getOrCreate dedups). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.GraftSession.local("graft-test", "4")
  val sf: String = "/root/testdata/sf0.001"
}
