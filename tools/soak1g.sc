// >1 GB on-disk soak for the lance connector (round 8, verdict item 8).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-memory 24g -I tools/soak1g.sc
// Validates: fragment byte-range splits, filter/stats pushdown at size,
// metadata-path DV delete (with removed-stats capture) on ~9M-row
// fragments, AQE skew-join handling, shuffle sizing. Prints per-stage
// wall times and per-stage max/median task times (straggler check).
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.sources.lance._
import scala.collection.mutable

val taskTimes = mutable.Map[Int, mutable.ArrayBuffer[Long]]()
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = taskTimes.synchronized {
    taskTimes.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) += t.taskInfo.duration
  }
})
def stragglerReport(label: String): Unit = taskTimes.synchronized {
  val worst = taskTimes.toSeq.filter(_._2.size >= 4).map { case (sid, ds) =>
    val s = ds.sorted; (sid, s.last, s(s.size / 2), ds.size)
  }.sortBy(-_._2).take(3)
  worst.foreach { case (sid, mx, med, n) =>
    println(f"[soak] $label stage=$sid tasks=$n max=${mx}ms median=${med}ms ratio=${mx.toDouble / math.max(med, 1)}%.1f")
  }
  taskTimes.clear()
}
def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[soak] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
  stragglerReport(label); r
}

def check(cond: Boolean, msg: String): Unit =
  if (!cond) println(s"[soak] FAIL: $msg")

spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val sf = "/root/testdata/sf0.1"
val root = "/tmp/soak1g-lance"

// ---- 1. generate + write ~1 GB (72M rows, 8 range-clustered fragments);
// reuse an existing soak dataset at version 1 (delete it to regenerate)
val hconf0 = spark.sessionState.newHadoopConf()
val haveDataset = ManifestIO.loadLatest(root, hconf0).exists(_.version == 1L)
if (!haveDataset) {
  org.apache.hadoop.fs.FileSystem.getLocal(hconf0)
    .delete(new org.apache.hadoop.fs.Path(root), true)
  val li = spark.read.parquet(s"$sf/lineitem.parquet")
  val reps = 120
  timed(s"write ${reps}x lineitem as 8 range-clustered fragments") {
    val big = spark.range(reps).crossJoin(li)
      .withColumn("l_orderkey", col("l_orderkey") + col("id") * 10000000L)
      .drop("id")
    big.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.format("lance").save(root)
  }
}
val conf = spark.sessionState.newHadoopConf()
val m = ManifestIO.loadLatest(root, conf).get
val totalBytes = m.fragments.map(_.sizeBytes).sum
val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
println(s"[soak] fragments=${m.fragments.size} rows=${m.totalRows} " +
  f"bytes=${totalBytes / 1e9}%.2f GB largest=${m.fragments.map(_.sizeBytes).max / 1e6}%.0f MB " +
  s"(maxPartitionBytes=${maxPart / 1e6.toInt}MB)")
check(totalBytes > 1_000_000_000L, "need >1GB on disk")
check(m.fragments.exists(_.sizeBytes > maxPart), "need fragments that force byte-range splits")

// ---- 2. byte-range splits: oversize fragments split, results exact
val ds = spark.read.format("lance").load(root)
val nParts = ds.select("l_quantity").rdd.getNumPartitions
println(s"[soak] scan partitions=$nParts for ${m.fragments.size} fragments (byte-range splits)")
check(nParts > m.fragments.size, "expected byte-range splits over the oversize fragments")
timed("full-scan aggregate (sum/count over 72M rows)") {
  val r = ds.agg(count(lit(1)), sum("l_quantity"), avg("l_extendedprice")).collect()(0)
  check(r.getLong(0) == m.totalRows, s"full-scan count ${r.getLong(0)} != ${m.totalRows}")
}

// ---- 3. range pruning at size: a 1-fragment slice scans ~1/8 of the data
timed("range-pruned scan (one fragment's key range)") {
  val lo = 200000000L; val hi = 210000000L
  val n = ds.filter(col("l_orderkey") >= lo && col("l_orderkey") < hi).count()
  println(s"[soak]   pruned-range rows=$n")
}

// ---- 4. stats-only aggregate (zero data files; long sum — double sums
// are order-dependent and never stats-answered)
timed("stats-answered aggregate (LanceStatsScan)") {
  val q = ds.agg(count(lit(1)), min("l_orderkey"), max("l_orderkey"), sum("l_orderkey"))
  check(q.queryExecution.executedPlan.toString.contains("LanceStatsScan"), "no stats scan")
  q.collect()
}

// ---- 5. metadata-path DV delete on a ~9M-row fragment + removed stats
// (keys are original + replica*10^7, so 200.0M..200.3M sits inside the
// replica-20 block — a genuine partial-fragment slice)
timed("DV delete (key slice inside one fragment, removed-stats capture)") {
  LanceDelete.deleteWhere(spark, root, Array(
    org.apache.spark.sql.sources.And(
      org.apache.spark.sql.sources.GreaterThan("l_orderkey", 200000000L),
      org.apache.spark.sql.sources.LessThan("l_orderkey", 200300000L))), Map.empty)
}
val m2 = ManifestIO.loadLatest(root, conf).get
val dvd = m2.fragments.filter(_.deletes.isDefined)
println(s"[soak] DV'd fragments=${dvd.size} deleted=${m.totalRows - m2.totalRows} rows, " +
  s"removed-stats cols=${dvd.headOption.map(_.deletes.get.removed.size).getOrElse(0)}")
check(dvd.nonEmpty && m2.totalRows < m.totalRows, "delete removed nothing")
timed("stats-answered aggregate AFTER delete (live stats)") {
  val q = spark.read.format("lance").load(root)
    .agg(count(lit(1)), count(col("l_quantity")), min("l_orderkey"), max("l_orderkey"))
  check(q.queryExecution.executedPlan.toString.contains("LanceStatsScan"),
    "post-delete aggregate fell back to a data scan")
  val r = q.collect()(0)
  check(r.getLong(0) == m2.totalRows, s"post-delete count ${r.getLong(0)} != ${m2.totalRows}")
}

// ---- 6. AQE skew handling: 30% of probe rows hit one build key.
// Shuffle sizing note: AQE only splits a skewed partition when it exceeds
// skewedPartitionThresholdInBytes AND medianFactor x the median — at 32
// shuffle partitions over ~1 GB the skewed partition is ~200 MB, under the
// 256 MB default, so a 100-TB-minded job sizes the thresholds with the
// data (or raises shuffle.partitions): thresholds here mirror that.
timed("skewed shuffle join under AQE (skew split active)") {
  spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
  spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
  val probe = ds.select(col("l_orderkey"), col("l_quantity"))
    .withColumn("k", when(pmod(col("l_orderkey"), lit(10)) < 3, lit(0L))
      .otherwise(pmod(col("l_orderkey"), lit(100000L))))
  val dim = spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("w"))
  val joined = probe.join(dim, "k").agg(count(lit(1)), sum(col("l_quantity") + col("w")))
  joined.collect()
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
  spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
}

// ---- 7. shuffle sizing: wide groupBy at 32 partitions
timed("groupBy shuffle over 72M rows (32 shuffle partitions)") {
  ds.groupBy(pmod(col("l_orderkey"), lit(1000)).as("b"))
    .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    .agg(count(lit(1)), sum("n")).collect()
}
println("[soak] DONE")
