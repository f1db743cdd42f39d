package graft

import org.apache.spark.sql.SparkSession

/** One shared local session across all suites (getOrCreate returns
  * the singleton; suites must not stop it).
  */
trait SparkTestBase {
  lazy val spark: SparkSession = GraftSession.getOrCreate("local[4]", shufflePartitions = 4)
}
