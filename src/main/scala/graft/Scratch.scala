package graft

import graft.pipeline._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc local profiling / plan auditing (not part of the driver
  * contract; run via `sbt "runMain graft.Scratch"`). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def audit(name: String): Unit = {
      println(s"\n======== PLAN $name ========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(plan.linesIterator.take(80).mkString("\n"))
      val nShuffles = "Exchange".r.findAllIn(plan).size
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
      println(s"--- exchanges: $nShuffles")
      pushed.foreach(p => println(s"--- $p"))
    }
    Seq("q01_scan_filter", "q07_groupby_lerp_sum", "q27_rollup_routed")
      .foreach(audit)
    spark.stop()
  }
}
