// Sorted-run-report soak (round 9): quantifies the SupportsReportOrdering
// win on a storage-partitioned join at 20M⋈10M rows / 32 buckets.
//   A) one-fragment-per-bucket layout (the maintained/compacted shape):
//      scan reports the persisted sort -> SMJ plans with NO Sort nodes.
//   B) two-fragments-per-bucket layout (same rows, written in two
//      inserts): no report is sound -> Spark re-sorts both sides.
// Both joins are exchange-free (SPJ); the delta is the sort cost alone.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-memory 24g -I tools/soak_sortrep.sc
import org.apache.spark.sql.functions._
import graft.sources.lance._

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[soak] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
  r
}
def check(cond: Boolean, msg: String): Unit =
  if (!cond) println(s"[soak] FAIL: $msg")

val wh = java.nio.file.Files.createTempDirectory("graft-soak-sortrep-").toString
spark.conf.set("spark.sql.catalog.srt", classOf[LanceCatalog].getName)
spark.conf.set("spark.sql.catalog.srt.warehouse", wh)
spark.sql("CREATE NAMESPACE srt.db")
val N = 60000000L
val buckets = 32
for (t <- Seq("fact1", "fact2", "dim"))
  spark.sql(s"CREATE TABLE srt.db.$t (k BIGINT, v BIGINT) TBLPROPERTIES(" +
    s"'write.bucket-by'='k','write.bucket-count'='$buckets')")

spark.range(N).selectExpr("id AS k", "id * 7 AS v").createOrReplaceTempView("src_f")
spark.range(N / 2).selectExpr("id * 2 AS k", "id AS v").createOrReplaceTempView("src_d")
timed(s"write fact1 (${N} rows, one insert -> 1 frag/bucket)") {
  spark.sql("INSERT INTO srt.db.fact1 SELECT * FROM src_f")
}
timed(s"write fact2 (${N} rows, two inserts -> 2 frags/bucket)") {
  spark.sql(s"INSERT INTO srt.db.fact2 SELECT * FROM src_f WHERE k % 2 = 0")
  spark.sql(s"INSERT INTO srt.db.fact2 SELECT * FROM src_f WHERE k % 2 = 1")
}
timed(s"write dim (${N / 2} rows)") {
  spark.sql("INSERT INTO srt.db.dim SELECT * FROM src_d")
}
val conf = spark.sessionState.newHadoopConf()
val m1 = ManifestIO.loadLatest(s"$wh/db/fact1", conf).get
check(m1.fragments.size == buckets, s"fact1 fragments=${m1.fragments.size}")
check(m1.fragments.forall(_.sortedBy == Seq("k")), "fact1 missing sort stamps")
check(ManifestIO.loadLatest(s"$wh/db/fact2", conf).get.fragments.size == 2 * buckets,
  "fact2 layout")

spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
def q(fact: String): String = s"SELECT count(*) AS n, sum(f.v + d.v) AS s FROM srt.db.$fact f JOIN srt.db.dim d ON f.k = d.k"

val planA = spark.sql(q("fact1")).queryExecution.executedPlan.toString
check(!planA.contains("Exchange hashpartitioning(k"), s"A shuffles:\n$planA")
check(!planA.contains("Sort "), s"A still sorts:\n$planA")
val planB = spark.sql(q("fact2")).queryExecution.executedPlan.toString
check(!planB.contains("Exchange hashpartitioning(k"), s"B shuffles:\n$planB")
check(planB.contains("Sort "), s"B unexpectedly sort-free:\n$planB")

// warm the page cache fairly, then measure each twice
for (r <- 1 to 3) {
  val a = timed(s"run $r: SPJ sort-FREE (1 frag/bucket, reported order)") {
    spark.sql(q("fact1")).collect()
  }
  val b = timed(s"run $r: SPJ with sorts (2 frags/bucket)") {
    spark.sql(q("fact2")).collect()
  }
  check(a.head.getLong(0) == b.head.getLong(0) && a.head.getLong(1) == b.head.getLong(1),
    s"result mismatch: ${a.head} vs ${b.head}")
  if (r == 3) println(s"[soak] rows joined: ${a.head.getLong(0)}")
}
println("[soak] done")
System.exit(0)
