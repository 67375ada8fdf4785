package graft

import org.apache.spark.sql.SparkSession

/** Perf probe: time named queries N times in one session.
  *
  * Usage: runMain graft.Probe <sfDir> <reps> <name> [<name> ...]
  * Prints per-rep wall seconds so JIT-warmup cost (rep 1) separates
  * from steady-state plan cost (reps 2+).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-22s rep$r $dt%8.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
