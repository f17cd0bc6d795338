package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark startup is the
  * dominant test cost; suites must not stop it).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(cores = 4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
