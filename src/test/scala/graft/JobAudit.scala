package graft

/** Throwaway audit: run named queries once (after one warmup) with a
  * listener and print per-job wall time + stage/task counts — the
  * job-count floor audit (r19 verdict #6: any query whose wall clock
  * materially exceeds jobs × ~0.1 s scheduling floor gets attacked;
  * any at the floor is certified done).
  *
  * Usage: Test/runMain graft.JobAudit <sfDir> <name> [<name> ...]
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.io.GraftLakeExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = List.empty[(Int, Long, Int, Int, String)] // id, ms, stages, tasks, site
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Seq[Int], String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStart.put(e.jobId, (System.nanoTime(), e.stageInfos.map(_.stageId), site))
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageTasks.put(e.stageInfo.stageId, e.stageInfo.numTasks)
        val si = e.stageInfo
        val ms = for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b
        stages.add((si.stageId, ms.getOrElse(-1L), si.numTasks, si.name))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, sids, site) = jobStart.get(e.jobId)
        val nt = sids.map(s => Option(stageTasks.get(s)).getOrElse(0)).sum
        val ran = sids.count(s => stageTasks.containsKey(s))
        jobs = (e.jobId, (System.nanoTime() - t0) / 1000000L, ran, nt, site) :: jobs
      }
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warmup rep (JIT + fixture ensure)
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      graft.ops.SideCache.releaseAll(); spark.catalog.clearCache()
      spark.sparkContext.addSparkListener(listener)
      jobs = Nil
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.sortBy(_._1)
      println(f"[jobaudit] $name wall=$wall%.2f s jobs=${js.size} " +
        f"stages=${js.map(_._3).sum} tasks=${js.map(_._4).sum}")
      js.foreach { case (id, ms, st, tk, site) =>
        println(f"[jobaudit]   job$id%-4d ${ms}%6d ms  stages=$st%-3d tasks=$tk%-4d $site")
      }
      val ss = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int, String)]()
      val it = stages.iterator(); while (it.hasNext) ss += it.next()
      ss.sortBy(-_._2).take(12).foreach { case (id, ms, tk, nm) =>
        println(f"[stageaudit] stage$id%-5d ${ms}%6d ms tasks=$tk%-4d ${nm.take(90)}")
      }
      graft.ops.SideCache.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
