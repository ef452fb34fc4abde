package graft.operators

import org.apache.spark.ml.linalg.{Vector, Vectors}

import scala.collection.mutable

/** One-layer HNSW-equivalent navigation graph over the IVF centroids
  * (reference: LanceIndexBuilder.java:140-152 — IVF_HNSW_PQ with m /
  * efConstruction; search-side ef at LanceVectorSearch.java:155-157).
  *
  * Role at scale: IVF probe selection is driver-side O(cells·dim) per
  * query. At 16–4096 cells that is noise; at the ~100k cells a 100 TB
  * dataset wants, it is the per-query bottleneck. Greedy ef-search over an
  * m-NN graph costs O(ef·m·dim) — sub-linear in cells — while the
  * executor-side plan is unchanged (probed cells scan exactly, the
  * IVF_FLAT semantics). This is the same division of labor as the
  * reference: HNSW navigates, the cell scan stays exact.
  *
  * Build: exact m-nearest-neighbor edges per centroid (candidate pool
  * capped at efConstruction) plus a ring edge i→(i+1)%n, so the graph is
  * connected BY CONSTRUCTION — with ef ≥ cells the search provably visits
  * every node and probe selection equals the exact top-nprobes (that
  * configuration is SQL-oracle-checkable; smaller ef trades recall for
  * navigation cost, covered by VectorIndexSpec).
  */
final class CentroidGraph private (centroids: Array[Vector],
                                   val neighbors: Array[Array[Int]])
    extends Serializable {

  def this(centroids: Array[Vector], m: Int, efConstruction: Int) =
    this(centroids, CentroidGraph.knnEdges(centroids, m, efConstruction))

  private val n = centroids.length
  require(n > 0, "empty centroid set")

  /** Greedy best-first ef-search from node 0: visit up to the natural
    * HNSW stopping point (nearest open candidate worse than the worst of
    * the ef best found), return the `nprobes` nearest cells seen. */
  def probe(queryVec: Array[Double], nprobes: Int, ef: Int): Array[Int] = {
    val qv = Vectors.dense(queryVec)
    def d(i: Int): Double = Vectors.sqdist(centroids(i), qv)
    val budget = math.max(ef, nprobes)
    val visited = mutable.BitSet(0)
    // candidates: nearest-first; results: worst-first (bounded at budget)
    val cand = mutable.PriorityQueue((d(0), 0))(Ordering.by[(Double, Int), Double](_._1).reverse)
    val results = mutable.PriorityQueue((d(0), 0))(Ordering.by[(Double, Int), Double](_._1))
    while (cand.nonEmpty) {
      val (dc, c) = cand.dequeue()
      if (results.size >= budget && dc > results.head._1) {
        cand.clear() // nearest open node is beyond the ef frontier: done
      } else {
        neighbors(c).foreach { nb =>
          if (!visited(nb)) {
            visited += nb
            val dn = d(nb)
            if (results.size < budget || dn < results.head._1) {
              cand.enqueue((dn, nb))
              results.enqueue((dn, nb))
              if (results.size > budget) results.dequeue()
            }
          }
        }
      }
    }
    results.toArray.sortBy { case (dist, i) => (dist, i) }.take(nprobes).map(_._2)
  }
}

object CentroidGraph {
  /** Exact m-NN edges (pool capped at efConstruction) + connectivity ring. */
  private def knnEdges(centroids: Array[Vector], m: Int,
                       efConstruction: Int): Array[Array[Int]] = {
    val n = centroids.length
    Array.tabulate(n) { i =>
      val pool = (0 until n).iterator.filter(_ != i)
        .map(j => (Vectors.sqdist(centroids(i), centroids(j)), j))
        .toSeq.sorted
        .take(math.max(1, math.min(efConstruction, n - 1)))
        .map(_._2)
      (pool.take(m) :+ (i + 1) % n).distinct.toArray
    }
  }

  /** Rebuild from persisted adjacency (index sidecar load path). */
  def fromNeighbors(centroids: Array[Vector], neighbors: Array[Array[Int]]): CentroidGraph =
    new CentroidGraph(centroids, neighbors)
}
