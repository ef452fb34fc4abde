package graft

import graft.operators.{CentroidGraph, VectorIndex}
import org.apache.spark.sql.SparkSession

/** Measurement tool behind SURVEY §7 r16(11): recall-vs-probes at 64
  * cells, exact probe selection vs centroid-graph (greedy ef) probe
  * selection — the experiment that decides whether a true multi-layer
  * HNSW over cell MEMBERS would buy recall this connector's IVF_HNSW
  * lacks. Note the framing: this engine scans probed cells EXACTLY
  * (codegen'd distance over the pruned fragments), so within-cell recall
  * is 1.0 by construction — the reference's member-graph only
  * APPROXIMATES that scan to save CPU, it cannot beat it on recall. The
  * only place recall can leak here is probe SELECTION (which cells to
  * read): graph-greedy vs exact nearest-centroids. This prints that gap.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RecallCurve"
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cells = 64
    val k = 10
    val (root, centroids) = VectorIndex.buildIvfFlat(spark, sfDir, cells)
    val io = graft.sources.lance.LanceVectorOptions.index(Map("index.type" -> "IVF_HNSW"))
    val graph = CentroidGraph.build(spark, centroids, io.hnswM, io.efConstruction, io.maxLevel)
    val qids = Seq(1L, 7L, 23L, 57L, 101L, 257L, 511L, 999L, 1501L, 1999L)
    val qvs = qids.map(q => q -> VectorIndex.embeddingOf(spark, sfDir, q)).toMap
    val exact = qids.map { q =>
      q -> VectorIndex.ivfSearch(spark, root, centroids, qvs(q), cells, k, q)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    println(f"[recall] cells=$cells k=$k queries=${qids.size} corpus=$sfDir")
    Seq(1, 2, 4, 8, 16).foreach { np =>
      def recall(useGraph: Boolean, ef: Int): Double = qids.map { q =>
        val got =
          if (useGraph)
            VectorIndex.searchIndex(spark, root, centroids, qvs(q),
              Map("vector.nprobes" -> np.toString, "vector.ef" -> ef.toString,
                "vector.k" -> k.toString),
              excludeVecId = q, graph = Some(graph))
          else VectorIndex.ivfSearch(spark, root, centroids, qvs(q), np, k, q)
        (got.collect().map(_.getLong(0)).toSet & exact(q)).size / k.toDouble
      }.sum / qids.size
      val rEx = recall(useGraph = false, ef = np)
      val rG1 = recall(useGraph = true, ef = np)
      val rG2 = recall(useGraph = true, ef = 2 * np)
      println(f"[recall] nprobes=$np%2d exact-select=$rEx%.3f graph ef=np $rG1%.3f graph ef=2np $rG2%.3f gap=${rEx - rG1}%+.3f")
    }
    spark.stop()
  }
}
