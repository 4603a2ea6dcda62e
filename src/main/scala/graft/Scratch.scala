package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc local profiling / plan auditing (not part of the driver
  * contract; run via `sbt "runMain graft.Scratch"`). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val names = args.toSeq match {
      case Seq() => SparkEntry.queries.keys.toSeq.sorted
      case xs => xs
    }
    // pass 1: warmup (JIT + codegen); pass 2: steady state
    val cold = names.map(n => n -> time(n)).toMap
    spark.catalog.clearCache()
    val warm = names.map(n => n -> time(n)).toMap
    println(f"${"query"}%-28s cold     warm")
    names.sortBy(-warm(_)).foreach { n =>
      println(f"TIME $n%-28s ${cold(n)}%6.2f ${warm(n)}%8.2f")
    }
    println(f"TIME total ${cold.values.sum}%6.2f ${warm.values.sum}%8.2f")
    spark.stop()
  }
}
