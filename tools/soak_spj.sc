// Storage-partitioned-join soak (round 8): two ~20M-row lance tables
// bucketed on the join key; measures the co-partitioned join with
// v2 bucketing ON (zero shuffle) vs OFF (both sides shuffle), checks the
// plans and that results agree.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-memory 24g -I tools/soak_spj.sc
import org.apache.spark.sql.functions._
import graft.sources.lance._

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[soak] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
  r
}
def check(cond: Boolean, msg: String): Unit =
  if (!cond) println(s"[soak] FAIL: $msg")

val wh = java.nio.file.Files.createTempDirectory("graft-soak-spj-").toString
spark.conf.set("spark.sql.catalog.spj", classOf[LanceCatalog].getName)
spark.conf.set("spark.sql.catalog.spj.warehouse", wh)
spark.sql("CREATE NAMESPACE spj.db")
val N = 20000000L
val buckets = 32
for (t <- Seq("fact", "dim"))
  spark.sql(s"CREATE TABLE spj.db.$t (k BIGINT, v BIGINT) TBLPROPERTIES(" +
    s"'write.bucket-by'='k','write.bucket-count'='$buckets')")

timed(s"write fact ${N} rows, $buckets buckets") {
  spark.range(N).selectExpr("id AS k", "id * 7 AS v").createOrReplaceTempView("src_f")
  spark.sql("INSERT INTO spj.db.fact SELECT * FROM src_f")
}
timed(s"write dim ${N / 2} rows, $buckets buckets") {
  spark.range(N / 2).selectExpr("id * 2 AS k", "id AS v").createOrReplaceTempView("src_d")
  spark.sql("INSERT INTO spj.db.dim SELECT * FROM src_d")
}
val mf = ManifestIO.loadLatest(s"$wh/db/fact", spark.sessionState.newHadoopConf()).get
println(s"[soak] fact fragments=${mf.fragments.size} " +
  s"bytes=${mf.fragments.map(_.sizeBytes).sum / 1024 / 1024} MB " +
  s"buckets=${mf.fragments.flatMap(_.bucket).distinct.size}")
check(mf.fragments.forall(_.bucket.isDefined), "unbucketed fact fragment")

val q = "SELECT count(*) AS n, sum(f.v + d.v) AS s FROM spj.db.fact f JOIN spj.db.dim d ON f.k = d.k"
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
val shuffled = timed("join WITHOUT SPJ (both sides shuffle)") { spark.sql(q).collect() }

spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
val plan = spark.sql(q).queryExecution.executedPlan.toString
check(!plan.contains("Exchange hashpartitioning(k"), s"SPJ plan still shuffles:\n$plan")
val spjRes = timed("join WITH SPJ (zero shuffle)") { spark.sql(q).collect() }
check(spjRes.head.getLong(0) == shuffled.head.getLong(0) && spjRes.head.getLong(1) == shuffled.head.getLong(1), s"result mismatch: ${spjRes.head} vs ${shuffled.head}")
println(s"[soak] rows joined: " + spjRes.head.getLong(0))
println("[soak] done")
System.exit(0)
