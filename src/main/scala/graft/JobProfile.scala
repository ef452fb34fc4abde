package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentHashMap

/** Optimization-round diagnostic (guide §1/§7): run one or more declared
  * keys and print a per-Spark-job wall/desc table plus per-stage task-time
  * totals, so "where does a 3 s/batch streaming key spend its wall"
  * becomes a measurement instead of a guess.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  *     sbt "runMain graft.JobProfile q_stream_semantic"
  *
  * Output per key: every job (id, wall ms, total task ms, description
  * truncated), then a summary: job count, sum of job walls, gaps (wall
  * time outside any job = driver/planning/commit time), and the top
  * stages by task time. Diagnostic only — never part of the gate/bench.
  */
object JobProfile {
  private case class Job(id: Int, start: Long, var end: Long = -1L,
                         var desc: String = "", var taskMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq else Seq("q_stream_semantic")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new ConcurrentHashMap[Int, Job]()
    val stageTask = new ConcurrentHashMap[Int, (String, Long)]()
    val stageToJob = new ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val cs = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val j = Job(e.jobId, e.time, desc = if (d.nonEmpty) d else cs)
        jobs.put(e.jobId, j)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        val ms = info.taskMetrics.executorRunTime
        stageTask.put(info.stageId, (info.name.take(90), ms))
        Option(stageToJob.get(info.stageId))
          .flatMap(j => Option(jobs.get(j))).foreach(_.taskMs += ms)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // GRAFT_PROFILE_REPEAT=n: before the profiled run, execute the key n
    // extra times printing each wall — makes a first-measure-vs-spaced
    // spike (JIT/codegen convergence vs plan cost) a measurement
    val repeat = sys.env.get("GRAFT_PROFILE_REPEAT").map(_.toInt).getOrElse(0)
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      // warmup run (uncounted): JIT + codegen + FS caches, same as Bench
      val tw = System.nanoTime()
      fn(spark, sfDir).count()
      if (repeat > 0)
        println(f"[repeat] $k warmup ${(System.nanoTime() - tw) / 1e9}%.3fs")
      (1 to repeat).foreach { i =>
        val tr = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[repeat] $k run$i ${(System.nanoTime() - tr) / 1e9}%.3fs")
      }
      jobs.clear(); stageTask.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // listener bus is async — give it a beat to drain
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      println(s"===== $k: wall ${wallMs.toInt} ms, ${js.size} jobs =====")
      val base = js.headOption.map(_.start).getOrElse(0L)
      var covered = 0L
      var lastEnd = 0L
      js.foreach { j =>
        val dur = if (j.end > 0) j.end - j.start else -1
        val gap = j.start - math.max(base, lastEnd)
        if (j.end > lastEnd) { covered += math.max(0, j.end - math.max(j.start, lastEnd)); lastEnd = j.end }
        println(f"job ${j.id}%4d +${j.start - base}%6dms wall=${dur}%5dms task=${j.taskMs}%6dms gap=${math.max(0, gap)}%5dms  ${j.desc.take(110)}")
      }
      val jobSpan = if (js.nonEmpty) lastEnd - base else 0L
      println(f"-- jobs=${js.size} jobWallCovered=${covered}ms jobSpan=${jobSpan}ms outsideJobs=${(wallMs - covered).toInt}ms")
      val topStages = stageTask.asScala.toSeq.sortBy(-_._2._2).take(12)
      topStages.foreach { case (sid, (name, ms)) =>
        println(f"stage $sid%4d task=${ms}%6dms  $name")
      }
    }
    spark.stop()
  }
}
