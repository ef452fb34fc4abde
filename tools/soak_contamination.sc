// Decontamination-family scale soak: FIXED benchmark, corpus grown ×1 →
// ×64 (the deployment shape — eval sets are static while the crawl grows).
// Validates the two scale claims the keys make: per-corpus-row cost is
// flat (wall time ~linear in corpus), and the bench side stays a
// broadcast at every scale (no plan flip to a shuffle join).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-memory 24g -I tools/soak_contamination.sc
// The screen bodies are re-derived inline (the operators' are
// private[operators]); multi-line chains are parenthesized for the
// REPL's statement splitting.
import org.apache.spark.sql.functions._
import graft.functions.{shingle_hashes, vec_cosine}

val sf = "/root/testdata/sf0.1"
val docs0 = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
val emb0 = spark.read.parquet(s"$sf/embeddings.parquet")

// fixed benchmark sides, from the BASE corpus only
val benchSh = (docs0.filter(col("doc_id") % 20 === 0)
  .withColumn("sh", shingle_hashes(col("text"), 3)).filter(size(col("sh")) > 0)
  .select(col("doc_id").as("bid"), explode(col("sh")).as("s"))
  .localCheckpoint())
val benchVec = (emb0.filter(col("vec_id") % 20 === 0)
  .select(col("vec_id").as("bid"), col("embedding").as("vb"))
  .localCheckpoint())

def time[A](f: => A): (A, Double) = {
  val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
}

for (x <- Seq(1, 4, 16, 64)) {
  val corpus = (docs0.filter(col("doc_id") % 20 =!= 0)
    .crossJoin(spark.range(x).select(col("id").as("r")))
    .select((col("doc_id") + col("r") * 10000000L).as("doc_id"), col("text"))
    .withColumn("sh", shingle_hashes(col("text"), 3)).filter(size(col("sh")) > 0)
    .select(col("doc_id"), explode(col("sh")).as("s")))
  val q = (corpus.join(broadcast(benchSh), "s")
    .groupBy("doc_id", "bid").count().filter(col("count") >= 3)
    .groupBy("doc_id").agg(max("count").as("max_overlap"), count(lit(1)).as("n")))
  val (n, t) = time(q.count())
  val bhj = q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
  println(f"[soak] ngram   x$x%2d  flagged=$n%7d  ${t}%6.2f s  broadcast=$bhj")
}

for (x <- Seq(1, 4, 16, 64)) {
  val corpus = (emb0.filter(col("vec_id") % 20 =!= 0)
    .crossJoin(spark.range(x).select(col("id").as("r")))
    .select((col("vec_id") + col("r") * 10000000L).as("vec_id"), col("embedding")))
  val q = (corpus.crossJoin(broadcast(benchVec))
    .select(col("vec_id"), vec_cosine(col("embedding"), col("vb")).as("cos"))
    .filter(col("cos") >= 0.4 && !isnan(col("cos")))
    .groupBy("vec_id").agg(round(max("cos"), 6).as("max_cos"), count(lit(1)).as("n")))
  val (n, t) = time(q.count())
  val bnl = q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
  println(f"[soak] cosine  x$x%2d  flagged=$n%7d  ${t}%6.2f s  broadcast=$bnl")
}
System.exit(0)
