package graft.sources.lance

/** Typed vector search knobs, names/defaults mirroring the reference
  * (config/LanceOptions.java:197-238 vector.*; defaults
  * LanceVectorSearch.java:341-345 — L2, nprobes 20, ef 100, refine unset).
  * Keys are read through [[LanceOptions.get]] so the V2 option-map
  * lowercasing is tolerated. */
case class VectorSearchOptions(column: String, metric: String, k: Int,
                               nprobes: Int, ef: Int, refineFactor: Option[Int]) {
  require(Seq("l2", "cosine", "dot").contains(metric), s"unknown vector.metric: $metric")
}

/** Typed index-build knobs (config/LanceOptions.java:123-190 index.* —
  * IVF_PQ default, 256 partitions, 8 bits, auto sub-vectors, HNSW m 16 /
  * ef-construction 100, max-level 7 at LanceOptions.java:168). */
case class VectorIndexOptions(indexType: String, column: String,
                              numPartitions: Int, numSubVectors: Option[Int],
                              numBits: Int, hnswM: Int, efConstruction: Int,
                              maxLevel: Int = 7) {
  require(Seq("IVF_FLAT", "IVF_PQ", "IVF_HNSW", "IVF_HNSW_PQ", "IVF_SQ").contains(indexType),
    s"unknown index.type: $indexType")
  require(maxLevel >= 1, s"index.max-level must be >= 1, got $maxLevel")
}

object LanceVectorOptions {
  private def g(m: Map[String, String], key: String): Option[String] =
    LanceOptions.get(m, key)

  def search(m: Map[String, String]): VectorSearchOptions = VectorSearchOptions(
    column = g(m, "vector.column").getOrElse("embedding"),
    metric = g(m, "vector.metric").map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("l2"),
    k = g(m, "vector.k").map(_.toInt).getOrElse(10),
    nprobes = g(m, "vector.nprobes").map(_.toInt).getOrElse(20),
    ef = g(m, "vector.ef").map(_.toInt).getOrElse(100),
    refineFactor = g(m, "vector.refine-factor").map(_.toInt))

  def index(m: Map[String, String]): VectorIndexOptions = VectorIndexOptions(
    indexType = g(m, "index.type").map(_.toUpperCase(java.util.Locale.ROOT)).getOrElse("IVF_PQ"),
    column = g(m, "index.column").getOrElse("embedding"),
    numPartitions = g(m, "index.num-partitions").map(_.toInt).getOrElse(256),
    numSubVectors = g(m, "index.num-sub-vectors").map(_.toInt),
    numBits = g(m, "index.num-bits").map(_.toInt).getOrElse(8),
    hnswM = g(m, "index.m").map(_.toInt).getOrElse(16),
    efConstruction = g(m, "index.ef-construction").map(_.toInt).getOrElse(100),
    maxLevel = g(m, "index.max-level").map(_.toInt).getOrElse(7))
}
