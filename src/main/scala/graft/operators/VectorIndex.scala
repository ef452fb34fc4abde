package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.vec_l2
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** IVF vector indexes (reference: LanceIndexBuilder.java:116-141 — IVF_FLAT
  * num-partitions, IVF_PQ num-sub-vectors/num-bits).
  *
  * IVF_FLAT build: KMeans centroids (MLlib), every vector assigned to its
  * nearest cell, the assigned dataset written through the lance connector
  * `repartitionByRange(cell)` — so each fragment covers a contiguous cell
  * range and carries cell min/max stats. Search: pick `nprobes` nearest
  * centroids driver-side (k-sized work), read the index with
  * `cell IN (probed…)` — LanceScan's fragment pruning skips every fragment
  * whose cell range misses the probe set, so IO scales with nprobes/k, not
  * dataset size; the in-cell scan is the codegen'd VectorDistance + a
  * TakeOrderedAndProject top-k. At 100 TB: the index dataset is built once
  * (the build is one KMeans + one shuffled write) and each query touches
  * only the probed fragments.
  *
  * The `ivf_flat_search` correctness key probes ALL cells — IVF with full
  * probing is exactly brute-force KNN, so the DuckDB oracle is the exact
  * scan; the recall/pruning behavior at nprobes < k is covered by
  * VectorIndexSpec instead (approximate results can't hash-match a SQL
  * oracle).
  */
object VectorIndex extends QueryModule {
  import Tables._

  private val QueryVecId = 1L
  private val K = 15
  private val Cells = 16

  private val toVec = udf { a: Seq[Float] =>
    Vectors.dense(a.map(_.toDouble).toArray)
  }

  /** Build the IVF_FLAT index: returns (index dataset root, centroids). */
  def buildIvfFlat(s: SparkSession, dir: String, cells: Int = Cells): (String, Array[Vector]) = {
    val root = Files.createTempDirectory("graft-ivf-").toString
    val e = t(s, dir, "embeddings").withColumn("fv", toVec(col("embedding")))
    val model = new KMeans().setK(cells).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(e)
    model.transform(e)
      .select(col("vec_id"), col("embedding"), col("label"), col("cell"))
      .repartitionByRange(cells, col("cell"))
      .sortWithinPartitions("cell")
      .write.format("lance").save(root)
    (root, model.clusterCenters)
  }

  /** Probe the `nprobes` cells nearest to the query vector. */
  def ivfSearch(s: SparkSession, indexRoot: String, centroids: Array[Vector],
                queryVec: Array[Double], nprobes: Int, k: Int,
                excludeVecId: Long = -1L): DataFrame = {
    val probed = centroids.zipWithIndex
      .map { case (c, i) => (i, math.sqrt(Vectors.sqdist(c, Vectors.dense(queryVec)))) }
      .sortBy { case (i, d) => (d, i) }
      .take(nprobes).map(_._1)
    import s.implicits._
    val qvDf = Seq(Tuple1(queryVec.map(_.toFloat))).toDF("qv")
    s.read.format("lance").load(indexRoot)
      .filter(col("cell").isin(probed.toIndexedSeq: _*) && col("vec_id") =!= excludeVecId)
      .crossJoin(broadcast(qvDf))
      .select(col("vec_id"), round(vec_l2(col("embedding"), col("qv")), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Driver-side fetch of one embedding (k-sized, not a data scan). */
  def embeddingOf(s: SparkSession, dir: String, vecId: Long): Array[Double] =
    t(s, dir, "embeddings").filter(col("vec_id") === vecId)
      .select("embedding").first().getSeq[Float](0).map(_.toDouble).toArray

  private def ivfFlatSearch(s: SparkSession, dir: String): DataFrame = {
    val (root, centroids) = buildIvfFlat(s, dir)
    val qv = embeddingOf(s, dir, QueryVecId)
    // nprobes = all cells → exact KNN (the oracle-checkable configuration)
    ivfSearch(s, root, centroids, qv, nprobes = Cells, k = K, excludeVecId = QueryVecId)
  }

  // ---- IVF_PQ ------------------------------------------------------------

  /** Product quantization: split the 64-dim space into `M` subspaces,
    * KMeans a 2^bits codebook per subspace, encode every vector as M code
    * ids, and answer queries with an asymmetric-distance (ADC) scan: a
    * per-query M×codes lookup table makes each row's approximate distance
    * M table lookups instead of a 64-dim loop. Approximate by construction
    * → rows-only key + recall covered in VectorIndexSpec.
    */
  private val M = 8
  private val CodeBits = 4 // 16 codes per subspace

  def buildPq(s: SparkSession, dir: String): (DataFrame, Array[Array[Vector]]) = {
    val e = t(s, dir, "embeddings")
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    val subDim = dim / M
    val codebooks = (0 until M).map { m =>
      val sub = e.select(toVec(expr(
        s"slice(embedding, ${m * subDim + 1}, $subDim)")).as("fv"))
      new KMeans().setK(1 << CodeBits).setSeed(42L + m).setMaxIter(10)
        .setFeaturesCol("fv").fit(sub).clusterCenters
    }.toArray
    val bc = s.sparkContext.broadcast(codebooks)
    val encode = udf { a: Seq[Float] =>
      val cbs = bc.value
      (0 until M).map { m =>
        val sub = Vectors.dense(a.slice(m * subDim, (m + 1) * subDim).map(_.toDouble).toArray)
        cbs(m).zipWithIndex.minBy { case (c, i) => (Vectors.sqdist(c, sub), i) }._2
      }.toArray
    }
    (e.select(col("vec_id"), encode(col("embedding")).as("codes")), codebooks)
  }

  private def ivfPqSearch(s: SparkSession, dir: String): DataFrame = {
    val (encoded, codebooks) = buildPq(s, dir)
    val qv = embeddingOf(s, dir, QueryVecId)
    val subDim = qv.length / M
    // per-query ADC lookup table: lut(m)(code) = ||q_sub - codebook||^2
    val lut: Array[Array[Double]] = Array.tabulate(M) { m =>
      val qSub = Vectors.dense(qv.slice(m * subDim, (m + 1) * subDim))
      codebooks(m).map(c => Vectors.sqdist(c, qSub))
    }
    val bc = s.sparkContext.broadcast(lut)
    val adc = udf { codes: Seq[Int] =>
      val t = bc.value
      var sum = 0.0
      var m = 0
      while (m < codes.length) { sum += t(m)(codes(m)); m += 1 }
      math.sqrt(sum)
    }
    encoded.filter(col("vec_id") =!= QueryVecId)
      .select(col("vec_id"), round(adc(col("codes")), 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ivf_flat_search" -> ivfFlatSearch,
    "ivf_pq_search" -> ivfPqSearch)

  /** Full-probe IVF == exact KNN, so the oracle is the brute-force scan.
    * ivf_pq is approximate by construction → rows-only (no SQL oracle). */
  val oracleSql: Map[String, String] = Map(
    "ivf_flat_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId)
         |SELECT * FROM (
         |  SELECT e.vec_id, round(list_distance(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS dist
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> $QueryVecId)
         |ORDER BY dist ASC, vec_id ASC LIMIT $K""".stripMargin)
}
