package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Round-17 optimization probe: per-entry decomposition of wall time
  * into scheduler shape — job count, stage count, summed task time,
  * summed executor-run time — so optimization effort lands on the real
  * sink (data work vs stage/job scheduling floor vs codegen). Runs each
  * named catalog entry once warm then `reps` timed, printing one line
  * per timed run. Test scope: a measurement tool, not a shipped main.
  *
  *   sbt 'Test/runMain graft.OptProbe q69_robust_outliers q40_dup_clusters'
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = GraftSession.local("graft-optprobe")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    @volatile var runMs = 0L
    @volatile var gcMs = 0L
    @volatile var shufReadB = 0L
    @volatile var shufWriteB = 0L
    val perJob = sys.env.contains("SPARK_GRAFT_PROBE_JOBS")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (perJob) jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (perJob) Option(jobStart.get(j.jobId)).foreach { case (t0, d) =>
          println(f"[optprobe-job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $d")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        if (perJob) {
          val i = s.stageInfo
          val dur = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          println(f"[optprobe-stage] ${i.stageId}%4d $dur%7d ms ${i.numTasks}%5d tasks  " +
            i.name.take(110))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskMs += m.executorRunTime + m.executorDeserializeTime +
            m.resultSerializationTime
          runMs += m.executorRunTime
          gcMs += m.jvmGCTime
          shufReadB += m.shuffleReadMetrics.totalBytesRead
          shufWriteB += m.shuffleWriteMetrics.bytesWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm (staged builds + codegen)
      spark.catalog.clearCache()
      val w0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - w0) / 1e9
      println(f"[optprobe] $name warm: $warm%.2f s")
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        jobs = 0; stages = 0; taskMs = 0L; runMs = 0L; gcMs = 0L
        shufReadB = 0L; shufWriteB = 0L
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give them a beat
        Thread.sleep(300)
        println(f"[optprobe] $name #$i: wall $wall%.2f s, jobs $jobs, " +
          f"stages $stages, task ${taskMs / 1e3}%.1f s, run ${runMs / 1e3}%.1f s, " +
          f"gc ${gcMs / 1e3}%.1f s, shufR ${shufReadB / 1e6}%.1f MB, " +
          f"shufW ${shufWriteB / 1e6}%.1f MB")
      }
    }
    spark.stop()
  }
}
