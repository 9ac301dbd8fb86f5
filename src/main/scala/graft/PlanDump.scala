package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Measurement tool (optimization rounds): for each named query, dump
  * `.explain("formatted")` of the returned frame plus an execution
  * profile — job count, stage count, shuffle read/write bytes, task
  * count — to `plans/<tag>/<query>_<suffix>.txt`. Iterative operators
  * return eagerly-materialized frames (their final explain is just an
  * RDD scan), so the listener profile is the load-bearing evidence for
  * them: fewer jobs/stages/shuffled bytes for identical results.
  *
  * Usage: sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>"
  * Not a declared query; not part of the driver surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-plandump")
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    graft.operators.Analytics.warmShared(spark, sfDir)
    graft.operators.Similarity.warmShared(spark, sfDir)
    graft.operators.Dedup.warmShared(spark, sfDir)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Double, Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        shufWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shufRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        val dur = (for {
          c <- sc.stageInfo.completionTime; s <- sc.stageInfo.submissionTime
        } yield (c - s) / 1e3).getOrElse(-1.0)
        stageLog.add((dur, sc.stageInfo.numTasks,
          sc.stageInfo.name.takeWhile(_ != '\n').take(120)))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      jobs = 0; stages = 0; tasks = 0; shufWrite = 0; shufRead = 0
      stageLog.clear()
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val nRows = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; give the bus a moment to drain
      Thread.sleep(400)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      import scala.jdk.CollectionConverters._
      val slow = stageLog.asScala.toSeq.sortBy(-_._1).take(15)
        .map { case (d, t, nm) => f"  $d%7.3fs tasks=$t%-4d $nm" }
        .mkString("\n")
      val profile =
        f"""== Execution profile ($name, $sfDir, local[$cpus]) ==
           |wall_s=$wall%.3f rows=$nRows
           |jobs=$jobs stages=$stages tasks=$tasks
           |shuffle_write_bytes=$shufWrite shuffle_read_bytes=$shufRead
           |slowest stages:
           |$slow
           |""".stripMargin
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        (profile + "\n" + plan).getBytes("UTF-8"))
      println(s"[plandump] $name: wall=${f"$wall%.2f"}s jobs=$jobs " +
        s"stages=$stages shufMB=${(shufRead + shufWrite) / 1024 / 1024}")
    }
    spark.stop()
  }
}
