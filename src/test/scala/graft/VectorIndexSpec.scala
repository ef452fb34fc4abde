package graft

import graft.operators.VectorIndex
import org.apache.spark.sql.functions._

/** Approximation-quality tests for the IVF indexes (the correctness keys
  * run exact-equivalent configurations; this covers nprobes < cells). */
class VectorIndexSpec extends SparkSpec {

  test("ivf_flat recall grows with nprobes and reaches >= 0.8 at 10/16") {
    // near-random 64-dim vectors are the worst case for IVF (true
    // neighbors scatter across cells): measured recall@10 here is
    // 2→0.2, 4→0.4, 8→0.7, 10→0.9, 12→1.0
    val (root, centroids) = VectorIndex.buildIvfFlat(spark, sf)
    val qv = VectorIndex.embeddingOf(spark, sf, vecId = 1L)
    def recallAt(nprobes: Int, exact: Set[Long]): Double = {
      val a = VectorIndex.ivfSearch(spark, root, centroids, qv,
        nprobes, k = 10, excludeVecId = 1L).collect().map(_.getLong(0)).toSet
      a.intersect(exact).size.toDouble / exact.size
    }
    val exact = VectorIndex.ivfSearch(spark, root, centroids, qv,
      nprobes = 16, k = 10, excludeVecId = 1L)
      .collect().map(_.getLong(0)).toSet
    val r2 = recallAt(2, exact); val r10 = recallAt(10, exact)
    assert(r10 >= 0.8, s"recall@nprobes=10 was $r10")
    assert(r10 >= r2, s"recall not monotone: $r2 -> $r10")
  }

  test("ivf probe filter prunes index fragments in the plan") {
    val (root, centroids) = VectorIndex.buildIvfFlat(spark, sf)
    val qv = VectorIndex.embeddingOf(spark, sf, vecId = 1L)
    val plan = VectorIndex.ivfSearch(spark, root, centroids, qv, nprobes = 2, k = 10)
      .queryExecution.executedPlan.toString
    // fragments=<pruned>/<total> — pruned must be strictly fewer
    val m = "fragments=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, plan)
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"no fragment pruning: ${m.get.matched}")
  }

  test("ivf_pq_search is deterministic and roughly orders by true distance") {
    val r1 = SparkEntry.queries("ivf_pq_search")(spark, sf).collect()
    val r2 = SparkEntry.queries("ivf_pq_search")(spark, sf).collect()
    assert(r1.map(_.getLong(0)).sameElements(r2.map(_.getLong(0))))
    assert(r1.length === 10)
    // sanity: PQ top-10 should overlap the exact top-30 (weak bound — PQ on
    // near-random vectors quantizes coarsely)
    val pq = r1.map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("ivf_flat_search")(spark, sf)
      .limit(30).collect().map(_.getLong(0)).toSet
    assert(pq.intersect(exact).nonEmpty, s"pq=$pq exact30=$exact")
  }

  test("pq scan is UDF-free (codegen'd encode + ADC)") {
    val plan = SparkEntry.queries("ivf_pq_search")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    assert(!plan.contains("BatchEvalPython"), plan)
    assert(plan.toLowerCase.contains("pqadc"), plan)
  }

  test("refine-factor re-rank: recall >= plain PQ against the true top-10") {
    val truth = SparkEntry.queries("ivf_flat_search")(spark, sf)
      .limit(10).collect().map(_.getLong(0)).toSet
    val plain = SparkEntry.queries("ivf_pq_search")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val refined = VectorIndex.ivfPqRefine(spark, sf, k = 10, refineFactor = 4)
      .collect().map(_.getLong(0)).toSet
    assert(refined.size === 10)
    val rPlain = plain.intersect(truth).size
    val rRef = refined.intersect(truth).size
    assert(rRef >= rPlain, s"refine recall $rRef < plain $rPlain")
  }
}
