package graft.sources.lance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.Collections

/** Maintenance ops as SQL stored procedures (Spark 4 ProcedureCatalog —
  * the Iceberg `CALL cat.system.op(...)` surface):
  *
  * {{{
  *   CALL cat.system.compact(table => 'db.t', smaller_than_rows => 10000,
  *                           target_rows => 100000)
  *   CALL cat.system.vacuum(table => 'db.t', retain_versions => 3)
  *   CALL cat.system.history(table => 'db.t')
  * }}}
  *
  * Each returns its result as rows (compaction/vacuum summaries, the
  * version history table), driven by the same [[LanceMaintenance]]
  * entry points the Scala API uses.
  */
object LanceProcedures {

  val Namespace = "system"

  def load(catalog: LanceCatalog, ident: Identifier): UnboundProcedure = {
    if (!(ident.namespace.sameElements(Array(Namespace))))
      throw new IllegalArgumentException(
        s"lance: procedures live in the '$Namespace' namespace, got ${ident.namespace.mkString(".")}")
    ident.name match {
      case "compact" => compact(catalog)
      case "vacuum" => vacuum(catalog)
      case "history" => history(catalog)
      case "zorder" => zorder(catalog)
      case "knn" => knn(catalog)
      case "knn_join" => knnJoin(catalog)
      case "search" => search(catalog)
      case "hybrid" => hybrid(catalog)
      case "reindex" => reindex(catalog)
      case "stats" => stats(catalog)
      case "decontaminate" => decontaminate(catalog)
      case "dedup" => dedup(catalog)
      case "sample" => sample(catalog)
      case "split" => split(catalog)
      case "score" => score(catalog)
      case "chunk" => chunk(catalog)
      case "pack" => pack(catalog)
      case "semdedup" => semdedup(catalog)
      case "dsir" => dsir(catalog)
      case "dsir_refresh" => dsirRefresh(catalog)
      case "drift" => drift(catalog)
      case other => throw new IllegalArgumentException(
        s"lance: unknown procedure $other (expected compact / vacuum / history / " +
          "zorder / knn / knn_join / search / reindex / stats / decontaminate / " +
          "dedup / sample / split / score / chunk / pack / semdedup / dsir / " +
          "dsir_refresh / drift)")
    }
  }

  def list(): Array[Identifier] =
    Array("compact", "vacuum", "history", "zorder", "knn", "knn_join", "search", "hybrid",
        "reindex", "stats", "decontaminate", "dedup", "sample", "split", "score",
        "chunk", "pack", "semdedup", "dsir", "dsir_refresh", "drift")
      .map(Identifier.of(Array(Namespace), _))

  private def param(name: String, dt: DataType, default: Option[String] = None) = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One-result-set bound procedure. `run(tableRoot, args)` returns
    * (schema, rows of internal values). */
  private def bound(procName: String, catalog: LanceCatalog,
                    params: Array[ProcedureParameter])
                   (run: (String, InternalRow) => (StructType, Seq[Array[Any]])): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false // reads/commits manifests
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val table = input.getUTF8String(0).toString
          val root = catalog.tableRootFor(table)
          val (schema, resultRows) = run(root, input)
          // procedure output must be a LocalScan (driver-side rows)
          val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
            override def rows(): Array[InternalRow] =
              resultRows.map(vs => new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(vs): InternalRow).toArray
            override def readSchema(): StructType = schema
            override def description(): String = s"LanceProcedureResult($procName)"
          }
          Collections.singletonList(scan).iterator()
        }
      }
    }

  private def compact(catalog: LanceCatalog): UnboundProcedure =
    bound("compact", catalog, Array(
      param("table", StringType),
      param("smaller_than_rows", LongType, Some("10000")),
      param("target_rows", LongType, Some("1000000")))) { (root, in) =>
      val spark = SparkSession.active
      val before = ManifestIO.loadLatest(root,
        org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty))
        .map(_.fragments.size).getOrElse(0)
      val m = LanceMaintenance.compact(spark, root, in.getLong(1), in.getLong(2))
      (StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("fragments_before", IntegerType, nullable = false),
        StructField("fragments_after", IntegerType, nullable = false))),
        Seq(Array[Any](m.version, before, m.fragments.size)))
    }

  private def vacuum(catalog: LanceCatalog): UnboundProcedure =
    bound("vacuum", catalog, Array(
      param("table", StringType),
      param("retain_versions", IntegerType, Some("1")),
      param("grace_ms", LongType, Some((10 * 60 * 1000L).toString)))) { (root, in) =>
      val spark = SparkSession.active
      LanceMaintenance.vacuum(spark, root, in.getInt(1), in.getLong(2))
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val versions = ManifestIO.listVersions(root, conf)
      (StructType(Seq(
        StructField("retained_versions", IntegerType, nullable = false),
        StructField("earliest_version", LongType, nullable = false))),
        Seq(Array[Any](versions.size, versions.headOption.getOrElse(0L))))
    }

  private def zorder(catalog: LanceCatalog): UnboundProcedure =
    bound("zorder", catalog, Array(
      param("table", StringType),
      param("columns", StringType),
      param("target_rows", LongType, Some("1000000")))) { (root, in) =>
      val spark = SparkSession.active
      val cols = in.getUTF8String(1).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
      val m = LanceMaintenance.zorder(spark, root, cols, in.getLong(2))
      (StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_fragments", IntegerType, nullable = false))),
        Seq(Array[Any](m.version, m.fragments.size)))
    }

  /** SQL-callable vector search — reference parity with the Flink table
    * function (table/LanceVectorSearchFunction.java:1-357):
    *
    * {{{
    *   CALL cat.system.knn(table => 'db.t', column => 'embedding',
    *                       query => array(0.1D, ...), k => 10,
    *                       metric => 'l2', nprobes => 16,
    *                       refine_factor => 2, id_column => 'vec_id')
    * }}}
    *
    * A table carrying a persisted index sidecar (`_index/meta.json`)
    * searches through [[graft.operators.IndexBuild.search]] (probe-pruned
    * fragment scan, ADC/refine for PQ); a plain table falls back to
    * brute-force exact KNN (codegen'd distance + TakeOrderedAndProject —
    * a per-partition k-heap with a k-sized driver merge, never a global
    * sort). Both return k (id, dist) rows — driver-side result size is k.
    *
    * r20 serving modes: `mode => 'mmr'` re-ranks a `candidates => N`
    * pool with Maximal Marginal Relevance (returns (id, rk, cos,
    * mmr_micro)); `mode => 'maxsim'` scores late-interaction over
    * `query_toks => array(array(...), ...)` (returns (id, score, rk)).
    * Both are cosine-ranked, serve probe-pruned over an indexed store
    * (fragment-level `cell IN` at partial nprobes) and reproduce the
    * exact brute-force answers at full probes — gated end to end by
    * knn_mmr_sql / knn_maxsim_sql's full oracles. */
  private def knn(catalog: LanceCatalog): UnboundProcedure =
    bound("knn", catalog, Array(
      param("table", StringType),
      // optional since r20: mode => 'maxsim' takes its vectors via
      // query_toks; topk/mmr still require a non-empty query
      param("query", ArrayType(DoubleType), Some("CAST(array() AS ARRAY<DOUBLE>)")),
      param("column", StringType, Some("'embedding'")),
      param("k", IntegerType, Some("10")),
      param("metric", StringType, Some("'l2'")),
      param("nprobes", IntegerType, Some("20")),
      param("ef", IntegerType, Some("100")),
      param("refine_factor", IntegerType, Some("0")),
      param("id_column", StringType, Some("'vec_id'")),
      param("filter", StringType, Some("''")),
      param("columns", StringType, Some("''")),
      param("mode", StringType, Some("'topk'")),
      param("candidates", IntegerType, Some("40")),
      param("query_toks", ArrayType(ArrayType(DoubleType)),
        Some("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")))) { (root, in) =>
      val spark = SparkSession.active
      val qv = in.getArray(1).toDoubleArray()
      val column = in.getUTF8String(2).toString
      val k = in.getInt(3)
      val metric = in.getUTF8String(4).toString.toLowerCase(java.util.Locale.ROOT)
      val nprobes = in.getInt(5)
      val ef = in.getInt(6)
      val refine = in.getInt(7)
      val idCol = in.getUTF8String(8).toString
      // the reference's optional search filter (SQL WHERE syntax,
      // LanceVectorSearch.java:130): candidates filter BEFORE ranking
      val pred: Option[org.apache.spark.sql.Column] =
        Some(in.getUTF8String(9).toString.trim).filter(_.nonEmpty)
          .map(org.apache.spark.sql.functions.expr)
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val hasIndex = graft.operators.IndexBuild.exists(spark, root)
      import org.apache.spark.sql.functions._
      val mode = in.getUTF8String(11).toString.toLowerCase(java.util.Locale.ROOT)
      // pin EVERY read of this call to one manifest version: the ranked
      // search and the matched-row lookup below are two separate reads,
      // and a concurrent commit between them would return columns from a
      // different snapshot than the distances
      val pinned: Map[String, String] = ManifestIO.loadLatest(root, conf)
        .map(m => Map("versionAsOf" -> m.version.toString)).getOrElse(Map.empty)
      // mode => 'mmr' | 'maxsim' (r19 verdict item 1): the r19 serving
      // machinery, SQL-reachable — same entry points as the gated keys
      // (mmrCandidatesForVecs -> probedSlice -> mmrServe;
      // maxSimRankPruned / maxSimRank), so full probes over an indexed
      // store reproduce the gated answers row-for-row and partial probes
      // run the fragment-pruned production plan. Both rank by the proven
      // 6-dp cosine contract; the optional `filter` narrows candidates
      // BEFORE ranking, exactly as in topk mode.
      def modalStore(dId: String): org.apache.spark.sql.DataFrame = {
        // pre-filter with the USER's column names, then rename to the
        // machinery's (vec_id/doc_id, embedding[, cell])
        val base = spark.read.format("lance").options(pinned).load(root)
        val f = pred.map(base.filter).getOrElse(base)
        if (hasIndex)
          f.select(col(idCol).cast("long").as(dId),
            col(column).as("embedding"), col("cell"))
        else
          f.select(col(idCol).cast("long").as(dId), col(column).as("embedding"))
      }
      def probedCfg(): Option[(Array[Array[Double]], Int)] =
        if (!hasIndex) None
        else {
          val idx = graft.operators.IndexBuild.load(spark, root)
          require(idx.opts.column == column,
            s"lance knn: index at $root covers column ${idx.opts.column}, not $column")
          Some((idx.centroids.map(_.toArray), nprobes))
        }
      val df = mode match {
        case "mmr" =>
          require(metric == "cosine",
            "lance knn: mode => 'mmr' ranks by cosine — pass metric => 'cosine'")
          require(qv.nonEmpty, "lance knn: mode => 'mmr' needs query => array(...)")
          val cand = graft.operators.VectorSearch.mmrCandidatesForVecs(
            spark, modalStore("vec_id"), Seq((0L, qv.map(_.toFloat))),
            probedCfg(), in.getInt(12))
          // the greedy tail consumes candidates 3x (pair self-join +
          // collect) — materialize the (candidates)-bounded rows once
          graft.operators.VectorSearch.mmrServe(cand.localCheckpoint(), k)
            .select(col("doc_id"), col("rk"), col("cos"), col("mmr_micro"))
        case "maxsim" =>
          require(metric == "cosine",
            "lance knn: mode => 'maxsim' ranks by cosine — pass metric => 'cosine'")
          val qt = in.getArray(13)
          val toks = (0 until qt.numElements()).map { i =>
            val v = qt.getArray(i)
            require(v != null && v.numElements() > 0,
              s"lance knn: query_toks token $i is null/empty")
            (0L, i.toLong, v.toDoubleArray().map(_.toFloat))
          }.toSeq
          require(toks.nonEmpty,
            "lance knn: mode => 'maxsim' needs query_toks => array(array(...), ...)")
          (probedCfg() match {
            case Some((cents, _)) =>
              graft.operators.VectorSearch.maxSimRankPruned(
                spark, modalStore("doc_id"), toks, cents, nprobes, k)
            case None =>
              import spark.implicits._
              graft.operators.VectorSearch.maxSimRank(modalStore("doc_id"),
                broadcast(toks.toDF("query_id", "q_tok", "qv")), k)
          }).select(col("doc_id"), col("score"), col("rk"))
        case "topk" =>
        require(qv.nonEmpty, "lance knn: query => array(...) is required")
        if (hasIndex) {
          val idx = graft.operators.IndexBuild.load(spark, root)
          require(idx.opts.column == column,
            s"lance knn: index at $root covers column ${idx.opts.column}, not $column")
          val opts = pinned ++
            Map("vector.k" -> k.toString, "vector.metric" -> metric,
              "vector.nprobes" -> nprobes.toString, "vector.ef" -> ef.toString) ++
            (if (refine > 0) Map("vector.refine-factor" -> refine.toString)
             else Map.empty)
          graft.operators.IndexBuild.search(spark, idx, qv, opts, idCol = idCol,
            pred = pred)
        } else {
          val (score, asc) = metric match {
            case "l2" => (graft.functions.vec_l2(col(column), typedLit(qv)), true)
            case "cosine" => (graft.functions.vec_cosine(col(column), typedLit(qv)), false)
            case "dot" => (graft.functions.vec_dot(col(column), typedLit(qv)), false)
            case other => throw new IllegalArgumentException(
              s"lance knn: unknown metric $other (expected l2 / cosine / dot)")
          }
          val base = spark.read.format("lance").options(pinned).load(root)
          val scored = pred.map(base.filter).getOrElse(base)
            .select(col(idCol).cast("long").as("id"), round(score, 6).as("dist"))
          (if (asc) scored.orderBy(col("dist").asc, col("id").asc)
           else scored.orderBy(col("dist").desc, col("id").asc)).limit(k)
        }
        case other => throw new IllegalArgumentException(
          s"lance knn: unknown mode $other (expected topk / mmr / maxsim)")
      }
      // every mode returns (id, metric columns...): id first (long), then
      // primitive long/double rank columns — internal values as-is
      val rankFields: Seq[StructField] = mode match {
        case "mmr" => Seq(
          StructField("rk", LongType, nullable = false),
          StructField("cos", DoubleType, nullable = false),
          StructField("mmr_micro", LongType, nullable = false))
        case "maxsim" => Seq(
          StructField("score", DoubleType, nullable = false),
          StructField("rk", LongType, nullable = false))
        case _ => Seq(StructField("dist", DoubleType, nullable = false))
      }
      val rows = df.collect().map(r =>
        Array[Any](r.get(0) match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case other => other.toString.toLong
        }) ++ (1 until r.length).map(r.get))
      // the reference's table function returns the matched ROW, not just
      // (id, distance) (LanceVectorSearchFunction.java:68-70 ROW<id,
      // content, embedding, _distance>) — `columns` lists table columns
      // to carry along, fetched by a k-sized IN lookup over the table
      // (bloom/dictionary pruning applies), merged in rank order
      val extra = in.getUTF8String(10).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
      if (extra.isEmpty) {
        (StructType(StructField("id", LongType, nullable = false) +: rankFields),
          rows.toSeq)
      } else {
        val ids = rows.map(_(0).asInstanceOf[Long]).toSeq
        val lookupDf = knnLookup(spark, root, pinned, idCol, ids, extra)
        val extraSchema = lookupDf.schema.fields.drop(1)
        val conv = extraSchema.map(f =>
          org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(f.dataType))
        val byId = lookupDf.collect().map(r =>
          r.getLong(0) -> extraSchema.indices.map(i => conv(i)(r.get(i + 1))).toArray
        ).toMap
        val merged = rows.map { r =>
          val id = r(0).asInstanceOf[Long]
          r ++ byId.getOrElse(id, Array.fill[Any](extraSchema.length)(null))
        }
        (StructType(
          (StructField("id", LongType, nullable = false) +: rankFields) ++
          extraSchema.map(f => f.copy(nullable = true)).toSeq),
          merged.toSeq)
      }
    }

  /** The matched-row lookup behind `CALL system.knn(columns => ...)`: a
    * k-sized IN over the id column, IN-filtering the RAW column with
    * literals of ITS type — a cast-then-compare would block V1 filter
    * translation for INT/SHORT id columns and turn the lookup into a full
    * scan; typed literals keep bloom/dictionary fragment pruning for every
    * integral id type. Package-visible so specs assert the pruning on the
    * real code path. */
  private[graft] def knnLookup(spark: SparkSession, root: String,
                               pinned: Map[String, String], idCol: String,
                               ids: Seq[Long], extra: Seq[String]):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val lookupBase = spark.read.format("lance").options(pinned).load(root)
    val typedIds: Seq[Any] = lookupBase.schema(idCol).dataType match {
      case LongType => ids
      case IntegerType => ids.map(_.toInt)
      case ShortType => ids.map(_.toShort)
      case ByteType => ids.map(_.toByte)
      case _ => ids // non-integral id column: Catalyst casts as before
    }
    lookupBase
      .filter(col(idCol).isin(typedIds: _*))
      .select(col(idCol).cast("long").as("__id") +: extra.map(col): _*)
  }

  /** SQL surface for BATCH vector retrieval — the set-oriented sibling of
    * [[knn]] (the reference's table function is usable per-row in a
    * lateral join, table/LanceVectorSearchFunction.java:55-66; this is
    * that shape over a whole query TABLE):
    *
    * {{{
    *   CALL cat.system.knn_join(queries => 'db.q', corpus => 'db.c',
    *                            column => 'embedding', k => 10,
    *                            metric => 'l2', cells => 64, nprobes => 8,
    *                            output_table => 'db.q_neighbors')
    * }}}
    *
    * Routing: a corpus with a persisted index joins through its stored
    * centroids (no KMeans retrain) — through the ADC/PQ-code path when the
    * index carries codebooks and `refine` is set (the shuffle-lean variant
    * for memory-bound corpora); a plain corpus trains ad-hoc cells. With
    * `output_table` the result MATERIALIZES to a lance table (one
    * distributed write — the result never visits the driver) and one
    * summary row returns; without it the k×|queries| rows return directly
    * (interactive use only — batch retrieval should materialize). */
  private def knnJoin(catalog: LanceCatalog): UnboundProcedure =
    bound("knn_join", catalog, Array(
      param("queries", StringType),
      param("corpus", StringType),
      param("column", StringType, Some("'embedding'")),
      param("query_id", StringType, Some("'vec_id'")),
      param("corpus_id", StringType, Some("'vec_id'")),
      param("k", IntegerType, Some("10")),
      param("metric", StringType, Some("'l2'")),
      param("cells", IntegerType, Some("0")),
      param("nprobes", IntegerType, Some("0")),
      param("refine", IntegerType, Some("0")),
      param("exclude_self", BooleanType, Some("false")),
      param("output_table", StringType, Some("''")))) { (qRoot, in) =>
      val spark = SparkSession.active
      val cRoot = catalog.tableRootFor(in.getUTF8String(1).toString)
      val column = in.getUTF8String(2).toString
      val qId = in.getUTF8String(3).toString
      val cId = in.getUTF8String(4).toString
      val k = in.getInt(5)
      val metric = in.getUTF8String(6).toString.toLowerCase(java.util.Locale.ROOT)
      val cells = in.getInt(7)
      val nprobes = in.getInt(8)
      val refine = in.getInt(9)
      val excludeSelf = in.getBoolean(10)
      val outTable = in.getUTF8String(11).toString.trim
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val queries = spark.read.format("lance").load(qRoot)
      val hasIndex = graft.operators.IndexBuild.exists(spark, cRoot)
      val result =
        if (hasIndex) {
          val idx = graft.operators.IndexBuild.load(spark, cRoot)
          require(idx.opts.column == column,
            s"lance knn_join: index at $cRoot covers column ${idx.opts.column}, not $column")
          if (idx.pq.isDefined && refine > 0) {
            require(metric == "l2",
              "lance knn_join: the ADC/PQ path reconstructs L2 — use metric => 'l2' " +
                "or refine => 0 for the stored-vector join")
            graft.operators.VectorSearch.knnJoinPq(spark, queries, idx, qId,
              k, nprobes, refine, excludeSelf, cIdCol = cId)
          } else {
            graft.operators.VectorSearch.knnJoin(spark, queries, idx, qId,
              k, metric, nprobes, excludeSelf, cIdCol = cId)
          }
        } else {
          val corpus = spark.read.format("lance").load(cRoot)
          graft.operators.VectorSearch.knnJoin(spark, queries, corpus,
            qId, cId, column, k, metric, cells, nprobes, excludeSelf)
        }
      import org.apache.spark.sql.functions._
      val normalized = result.select(col("q_id").cast("long").as("q_id"),
        col("n_id").cast("long").as("n_id"), col("dist"), col("rk"))
      if (outTable.nonEmpty) {
        val outRoot = catalog.tableRootForCreate(outTable)
        normalized.write.format("lance").mode("overwrite").save(outRoot)
        val n = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
        (StructType(Seq(
          StructField("output_table", StringType, nullable = false),
          StructField("n_rows", LongType, nullable = false))),
          Seq(Array[Any](UTF8String.fromString(outTable), n)))
      } else {
        // no output_table ⇒ the k·|queries| result comes back through the
        // driver (a CALL's rows always do). Interactive k-sized use is the
        // intent; a mining-sized query table must write distributed — fail
        // fast with the fix rather than OOM the driver. take(cap+1) guards
        // and fetches in ONE execution (a count() pre-pass would run the
        // possibly-expensive query plan twice), and bounds driver memory at
        // the cap either way.
        val maxRows = 1000000
        val fetched = normalized.take(maxRows + 1)
        require(fetched.length <= maxRows,
          s"lance knn_join: result exceeds the driver-return cap ($maxRows rows); " +
            s"pass output_table => 'db.t' to write the join distributed")
        val rows = fetched.map(r =>
          Array[Any](r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        (StructType(Seq(
          StructField("q_id", LongType, nullable = false),
          StructField("n_id", LongType, nullable = false),
          StructField("dist", DoubleType, nullable = false),
          StructField("rk", LongType, nullable = false))),
          rows.toSeq)
      }
    }

  /** BM25 keyword retrieval over a STANDING inverted index — the text
    * twin of [[knnJoin]] (reference analog: the lateral search function,
    * table/LanceVectorSearchFunction.java:55-66, with terms instead of
    * vectors):
    *
    * {{{
    *   CALL cat.system.search(queries => 'db.q', corpus => 'db.c',
    *                          k => 5, id_column => 'doc_id',
    *                          text_column => 'text',
    *                          output_table => 'db.hits')
    * }}}
    *
    * `queries` rows are (query_id, term). The corpus's index sidecar
    * (term-bucketed postings + df + corpus stats,
    * [[graft.operators.TextIndex]]) is BUILT ON FIRST CALL and reused by
    * every call after — query-time IO is the bucket-restricted postings
    * read, never a corpus scan. Scoring is TextAnalysis.bm25Rank, the
    * identical expression tree as text_search_bm25. With `output_table`
    * the k·|queries| result materializes to a lance table; without it the
    * rows return directly. */
  /** Build-or-reuse the standing text index for a corpus — but never a
    * STALE one: the sidecar records the corpus manifest version it was
    * built from, and a corpus that moved (appends, deletes, overwrites)
    * triggers a rebuild before serving. Shared by CALL system.search and
    * CALL system.hybrid. */
  private def ensureTextIndex(spark: SparkSession, cRoot: String,
                              idCol: String, textCol: String): String = {
    import org.apache.spark.sql.functions.col
    val idxRoot = graft.operators.TextIndex.indexRootFor(cRoot)
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
    val corpusVersion = ManifestIO.loadLatest(cRoot, conf).map(_.version).getOrElse(
      throw new IllegalArgumentException(s"lance search: corpus not found at $cRoot"))
    if (!graft.operators.TextIndex.exists(idxRoot, conf) ||
        !graft.operators.TextIndex.recordedCorpusVersion(idxRoot, conf)
          .contains(corpusVersion)) {
      graft.operators.TextIndex.build(spark,
        spark.read.format("lance").load(cRoot)
          .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text")),
        idxRoot)
      graft.operators.TextIndex.recordCorpusVersion(idxRoot, corpusVersion, conf)
    }
    idxRoot
  }

  /** SQL-callable HYBRID retrieval (r20) — the fused lexical+vector
    * serving the gated text_search_hybrid / q_stream_hybrid keys run,
    * reachable from SQL:
    *
    * {{{
    *   CALL cat.system.hybrid(table => 'db.docs',
    *     vector_table => 'db.vecs',
    *     terms => 'transformer attention',
    *     query_vec => array(0.1D, ...), k => 5, nprobes => 8)
    * }}}
    *
    * The lexical arm serves index-BM25 from the corpus's standing text
    * index (build-or-reuse keyed to the corpus manifest version — CALL
    * system.search's posture); the vector arm serves from `vector_table`
    * probe-pruned when it carries a persisted index (fragment-pruned
    * `cell IN` at partial nprobes — the gated keys' probedSlice), exact
    * brute-force otherwise; the RRF fuse is the gated keys' verbatim.
    * Returns the fused top-k (id, n_arms, rrf, rk). */
  private def hybrid(catalog: LanceCatalog): UnboundProcedure =
    bound("hybrid", catalog, Array(
      param("table", StringType),
      param("vector_table", StringType),
      param("terms", StringType),
      param("query_vec", ArrayType(DoubleType)),
      param("k", IntegerType, Some("5")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("vector_id_column", StringType, Some("'vec_id'")),
      param("vector_column", StringType, Some("'embedding'")),
      param("nprobes", IntegerType, Some("0")))) { (cRoot, in) =>
      val spark = SparkSession.active
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val vRoot = catalog.tableRootFor(in.getUTF8String(1).toString)
      val terms = in.getUTF8String(2).toString
        .split("[,\\s]+").map(_.trim).filter(_.nonEmpty).toSeq
      val qvec = in.getArray(3).toDoubleArray().map(_.toFloat)
      val k = in.getInt(4)
      val idCol = in.getUTF8String(5).toString
      val textCol = in.getUTF8String(6).toString
      val vIdCol = in.getUTF8String(7).toString
      val vCol = in.getUTF8String(8).toString
      val nprobes0 = in.getInt(9)
      require(terms.nonEmpty, "lance hybrid: terms => 'word1 word2 ...' is required")
      require(qvec.nonEmpty, "lance hybrid: query_vec => array(...) is required")
      val idxRoot = ensureTextIndex(spark, cRoot, idCol, textCol)
      val lex = graft.operators.TextIndex.search(spark, idxRoot,
          terms.map(t => (0L, t)).toDF("query_id", "term"), k)
        .select(col("query_id"), col("doc_id"), col("rk").as("r"))
      val pinned: Map[String, String] = {
        val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
        ManifestIO.loadLatest(vRoot, conf)
          .map(m => Map("versionAsOf" -> m.version.toString)).getOrElse(Map.empty)
      }
      val queries = Seq((0L, qvec))
      val vec =
        if (graft.operators.IndexBuild.exists(spark, vRoot)) {
          val idx = graft.operators.IndexBuild.load(spark, vRoot)
          require(idx.opts.column == vCol,
            s"lance hybrid: index at $vRoot covers column ${idx.opts.column}, not $vCol")
          val cents = idx.centroids.map(_.toArray)
          val np = if (nprobes0 > 0) nprobes0 else cents.length
          val store = spark.read.format("lance").options(pinned).load(vRoot)
            .select(col(vIdCol).cast("long").as("vec_id"),
              col(vCol).as("embedding"), col("cell"))
          graft.operators.TextAnalysis.hybridVectorArmForVecs(
            spark, store, queries, Some((cents, np)), k)
        } else {
          val store = spark.read.format("lance").options(pinned).load(vRoot)
            .select(col(vIdCol).cast("long").as("vec_id"), col(vCol).as("embedding"))
          graft.operators.TextAnalysis.hybridVectorArmForVecs(
            spark, store, queries, None, k)
        }
      val fused = graft.operators.TextAnalysis.hybridRrfFuse(lex, vec, k)
        .select("doc_id", "n_arms", "rrf", "rk")
        .collect() // k-bounded: one query, rk <= k
      (StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("n_arms", LongType, nullable = false),
        StructField("rrf", DoubleType, nullable = false),
        StructField("rk", LongType, nullable = false))),
        fused.toSeq.map(r => Array[Any](
          r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))))
    }

  private def search(catalog: LanceCatalog): UnboundProcedure =
    bound("search", catalog, Array(
      param("queries", StringType),
      param("corpus", StringType),
      param("k", IntegerType, Some("5")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("output_table", StringType, Some("''")))) { (qRoot, in) =>
      val spark = SparkSession.active
      val cRoot = catalog.tableRootFor(in.getUTF8String(1).toString)
      val k = in.getInt(2)
      val idCol = in.getUTF8String(3).toString
      val textCol = in.getUTF8String(4).toString
      val outTable = in.getUTF8String(5).toString.trim
      import org.apache.spark.sql.functions._
      val idxRoot = ensureTextIndex(spark, cRoot, idCol, textCol)
      val queries = spark.read.format("lance").load(qRoot)
        .select(col("query_id").cast("long").as("query_id"), col("term"))
      val result = graft.operators.TextIndex.search(spark, idxRoot, queries, k)
      val schema = StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("doc_id", LongType, nullable = false),
        StructField("n_terms", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false),
        StructField("rk", LongType, nullable = false)))
      if (outTable.nonEmpty) {
        val outRoot = catalog.tableRootForCreate(outTable)
        result.write.format("lance").mode("overwrite").save(outRoot)
        val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
        val n = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
        (StructType(Seq(
          StructField("output_table", StringType, nullable = false),
          StructField("n_rows", LongType, nullable = false))),
          Seq(Array[Any](UTF8String.fromString(outTable), n)))
      } else {
        // driver-return path: k·|queries|-shaped — cap it the same way
        // knn_join does so a mining-sized workload fails fast with the
        // actionable fix (output_table) instead of OOMing the driver
        val maxRows = 1000000
        val fetched = result.take(maxRows + 1)
        require(fetched.length <= maxRows,
          s"lance search: result exceeds the driver-return cap ($maxRows rows); " +
            "pass output_table to materialize to a lance table instead")
        val rows = fetched.map(r => Array[Any](
          r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        (schema, rows.toSeq)
      }
    }

  /** Drift-aware index maintenance — composes the drift monitor with the
    * rebuild path so routine pipelines can call it unconditionally:
    *
    * {{{
    *   CALL cat.system.reindex(table => 'db.corpus', threshold => 1.5)
    * }}}
    *
    * Measures [[graft.operators.IndexBuild.driftRatio]] (current mean
    * quantization error over the baseline recorded at build — one
    * broadcast join + codegen'd distance, no driver data); at or below
    * `threshold` it NO-OPs (in-distribution appends stay cheap), above it
    * the index rebuilds in place from the current rows (fresh centroids /
    * codebooks / graph, atomic overwrite commit). Returns the measured
    * drift and whether a rebuild fired. */
  private def reindex(catalog: LanceCatalog): UnboundProcedure =
    bound("reindex", catalog, Array(
      param("table", StringType),
      param("threshold", DoubleType, Some("1.5")))) { (root, in) =>
      val spark = SparkSession.active
      val threshold = in.getDouble(1)
      require(threshold > 0, s"lance reindex: threshold must be > 0, got $threshold")
      val idx = graft.operators.IndexBuild.load(spark, root)
      val drift = graft.operators.IndexBuild.driftRatio(spark, idx)
      val rebuilt = drift > threshold
      if (rebuilt) graft.operators.IndexBuild.rebuild(spark, idx)
      (StructType(Seq(
        StructField("drift", DoubleType, nullable = false),
        StructField("threshold", DoubleType, nullable = false),
        StructField("rebuilt", BooleanType, nullable = false))),
        Seq(Array[Any](drift, threshold, rebuilt)))
    }

  /** SQL entry point for the n-gram DECONTAMINATION family — materializes
    * the cleaned corpus (every column of the corpus table, survivors only)
    * to a lance table and returns one summary row:
    *
    * {{{
    *   CALL cat.system.decontaminate(corpus => 'db.docs', bench => 'db.eval',
    *     id_column => 'doc_id', text_column => 'text',
    *     min_overlap => 3, min_containment => 0.5,
    *     output_table => 'db.docs_clean')
    * }}}
    *
    * A corpus doc is dropped when it shares >= min_overlap 3-word shingles
    * with any bench doc, OR contains >= min_containment of a bench doc's
    * own shingle set (0.0 disables the containment rule), OR — when the
    * SEMANTIC arm is armed (embedding_column + bench_embeddings +
    * min_cosine > 0) — its embedding has cosine >= min_cosine to any row
    * of the bench_embeddings table (the paraphrase rule; one broadcast
    * nested-loop map pass, the bench side small by construction; the
    * bench table's vector column defaults to embedding_column's name and
    * is overridden with bench_embedding_column).
    *
    * `prescreen` ('auto' | 'on' | 'off', default 'auto') controls the
    * semantic arm's sign-sketch hamming prescreen. The screen's admit
    * bound is PROBABILISTIC (4σ-conservative, not a theorem): a cos >=
    * min_cosine pair whose similarity rides a few large-magnitude
    * coordinates can exceed it and be silently dropped. 'auto' therefore
    * arms the screen per row only at >= PrescreenMinDim dims (the
    * measured crossover, where the bound concentrates and the screen
    * pays for itself); 'off' forces the exact single-phase screen at any
    * dimension — the knob for a contamination pass that must be provably
    * exhaustive; 'on' forces the screen everywhere (measurement arm).
    * output_table is REQUIRED — the survivor set is corpus-sized, so it
    * always writes distributed (one anti-join + one lance write; the
    * driver only carries the summary). The screens are the gated keys'
    * shapes: [[graft.operators.TextAnalysis.decontaminationFlags]] and the
    * contamination_semantic cosine rule. */
  private def decontaminate(catalog: LanceCatalog): UnboundProcedure =
    bound("decontaminate", catalog, Array(
      param("corpus", StringType),
      param("bench", StringType),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("min_overlap", IntegerType, Some("3")),
      param("min_containment", DoubleType, Some("0.0")),
      param("embedding_column", StringType, Some("''")),
      param("bench_embeddings", StringType, Some("''")),
      // bench table's vector column; '' = same name as embedding_column
      param("bench_embedding_column", StringType, Some("''")),
      param("min_cosine", DoubleType, Some("0.0")),
      // required in effect (the runtime require below) — declared with a
      // default only because optional params may not precede required ones
      param("output_table", StringType, Some("''")),
      param("prescreen", StringType, Some("'auto'")))) { (cRoot, in) =>
      val spark = SparkSession.active
      val bRoot = catalog.tableRootFor(in.getUTF8String(1).toString)
      val idCol = in.getUTF8String(2).toString
      val textCol = in.getUTF8String(3).toString
      val minOverlap = in.getInt(4)
      val minContainment = in.getDouble(5)
      val embCol = in.getUTF8String(6).toString.trim
      val benchEmb = in.getUTF8String(7).toString.trim
      val benchEmbCol0 = in.getUTF8String(8).toString.trim
      val minCosine = in.getDouble(9)
      val outTable = in.getUTF8String(10).toString.trim
      val prescreen = in.getUTF8String(11).toString.trim.toLowerCase match {
        case "auto" => None
        case "on"   => Some(true)
        case "off"  => Some(false)
        case other => throw new IllegalArgumentException(
          s"lance decontaminate: prescreen must be 'auto', 'on' or 'off', got '$other'")
      }
      require(outTable.nonEmpty, "lance decontaminate: output_table is required " +
        "(the survivor set is corpus-sized — it must write distributed)")
      require(embCol.isEmpty == benchEmb.isEmpty && (minCosine > 0) == embCol.nonEmpty,
        "lance decontaminate: the semantic arm needs all three of " +
          "embedding_column, bench_embeddings and min_cosine > 0 (or none)")
      val corpus = spark.read.format("lance").load(cRoot)
      val bench = spark.read.format("lance").load(bRoot)
      import org.apache.spark.sql.functions.col
      val ngramFlags = graft.operators.TextAnalysis.decontaminationFlags(
        corpus, bench, idCol, textCol, minOverlap, minContainment)
      val allFlags = if (embCol.isEmpty) ngramFlags else {
        val benchEmbCol = if (benchEmbCol0.nonEmpty) benchEmbCol0 else embCol
        val bv = spark.read.format("lance")
          .load(catalog.tableRootFor(benchEmb))
          .select(col(benchEmbCol).as("vb"))
        // the ONE τ/NaN screen definition — shared with the gated keys
        val sem = graft.operators.VectorSearch.semanticMatches(
          corpus.select(col(idCol), col(embCol)), bv, embCol, minCosine,
          prescreen)
          .select(idCol)
        ngramFlags.unionByName(sem).distinct()
      }
      // localCheckpoint: the flag set (ids only) is consumed twice (count +
      // anti-join) — without it the corpus-wide screens would execute
      // twice, doubling the procedure's dominant cost
      val flags = allFlags.localCheckpoint()
      val nFlagged = flags.count()
      val survivors = corpus.join(flags, Seq(idCol), "left_anti")
      val outRoot = catalog.tableRootForCreate(outTable)
      survivors.write.format("lance").mode("overwrite").save(outRoot)
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val nOut = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
      (StructType(Seq(
        StructField("output_table", StringType, nullable = false),
        StructField("n_flagged", LongType, nullable = false),
        StructField("n_out", LongType, nullable = false))),
        Seq(Array[Any](UTF8String.fromString(outTable), nFlagged, nOut)))
    }

  /** Collect a small result DataFrame into procedure rows — driver cap
    * enforced in ONE execution (take(cap+1) — a count() pre-pass would
    * run the possibly-expensive plan twice), Catalyst converters handle
    * strings/decimals/arrays generically. */
  private def collectRows(df: org.apache.spark.sql.DataFrame, cap: Int,
                          what: String): (StructType, Seq[Array[Any]]) = {
    val fetched = df.take(cap + 1)
    require(fetched.length <= cap,
      s"lance $what: result exceeds the driver-return cap ($cap rows); " +
        s"pass output_table => 'db.t' to write the result distributed")
    val schema = df.schema
    val conv = schema.fields.map(f =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(f.dataType))
    (schema, fetched.toSeq.map(r =>
      schema.fields.indices.map(i => conv(i)(r.get(i))).toArray[Any]))
  }

  /** SQL entry point for the DEDUPLICATION family (r20) — the gated
    * dedup keys' exact machinery behind the reference-idiom CALL surface
    * (the SQL-first posture of LanceVectorSearchFunction.java:51-64,
    * applied to the pipeline family users run most):
    *
    * {{{
    *   CALL cat.system.dedup(table => 'db.docs', method => 'exact',
    *     id_column => 'doc_id', text_column => 'text',
    *     output_table => 'db.docs_unique')   -- survivors, every column
    *   CALL cat.system.dedup(table => 'db.docs', method => 'pairs')
    *     -- verified MinHash-LSH near-dup pairs (a_id, b_id, jaccard)
    *   CALL cat.system.dedup(table => 'db.docs', method => 'clusters')
    *     -- connected components over the pairs (keep_id, n_docs, sum_ids)
    * }}}
    *
    * method => 'exact': one content-hash shuffle (sha2-256 groupBy,
    * uniform keys — the gated dedup_exact shape); survivors = min-id per
    * hash group, EVERY corpus column, materialized distributed to
    * output_table (REQUIRED — the survivor set is corpus-sized); one
    * summary row returns (the input count is stats-answered, not a scan).
    *
    * method => 'pairs': the banded MinHash-LSH pipeline
    * ([[graft.operators.Dedup.minhashPairsFor]] — one signature map pass,
    * BucketCap-bounded band buckets, exact-Jaccard verify at τ=0.8), so
    * recall/cost bounds are the gated dedup_minhash_lsh key's. Near-dup
    * pairs only ⇒ rows return directly under the knn_join driver cap;
    * output_table materializes instead.
    *
    * method => 'clusters': min-label propagation over the verified pairs
    * ([[graft.operators.Dedup.clusterLabels]] — pointer-doubling, bounded
    * checkpoint storage) → the per-component report, same return posture. */
  private def dedup(catalog: LanceCatalog): UnboundProcedure =
    bound("dedup", catalog, Array(
      param("table", StringType),
      param("method", StringType, Some("'exact'")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      import org.apache.spark.sql.functions._
      val method = in.getUTF8String(1).toString.trim.toLowerCase(java.util.Locale.ROOT)
      val idCol = in.getUTF8String(2).toString
      val textCol = in.getUTF8String(3).toString
      val outTable = in.getUTF8String(4).toString.trim
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val corpus = spark.read.format("lance").load(root)
      // the near-dup machinery's column contract (long ids)
      lazy val docs = corpus.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      def materialize(df: org.apache.spark.sql.DataFrame): (StructType, Seq[Array[Any]]) = {
        val outRoot = catalog.tableRootForCreate(outTable)
        df.write.format("lance").mode("overwrite").save(outRoot)
        val n = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
        (StructType(Seq(
          StructField("output_table", StringType, nullable = false),
          StructField("n_rows", LongType, nullable = false))),
          Seq(Array[Any](UTF8String.fromString(outTable), n)))
      }
      method match {
        case "exact" =>
          require(outTable.nonEmpty, "lance dedup: method => 'exact' " +
            "materializes the survivor corpus — output_table is required")
          // min-id per content hash; survivors keep every corpus column.
          // The semi-join's build side is one row per DISTINCT text — at
          // a near-dup-free extreme that is corpus-sized, so it stays a
          // shuffle join unless AQE proves it small; the id key is the
          // corpus's own type (no cast — bloom/dict pruning applies)
          val keeps = corpus.groupBy(sha2(col(textCol), 256))
            .agg(min(col(idCol)).as(idCol)).select(idCol)
          val survivors = corpus.join(keeps, Seq(idCol), "left_semi")
          val outRoot = catalog.tableRootForCreate(outTable)
          survivors.write.format("lance").mode("overwrite").save(outRoot)
          val nOut = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
          // COUNT answers from fragment stats (delete-vector-aware) —
          // no second corpus scan for the summary
          val nIn = corpus.count()
          (StructType(Seq(
            StructField("output_table", StringType, nullable = false),
            StructField("n_in", LongType, nullable = false),
            StructField("n_dropped", LongType, nullable = false),
            StructField("n_out", LongType, nullable = false))),
            Seq(Array[Any](UTF8String.fromString(outTable), nIn, nIn - nOut, nOut)))
        case "pairs" =>
          val pairs = graft.operators.Dedup.minhashPairsFor(docs)
            .orderBy("a_id", "b_id")
          if (outTable.nonEmpty) materialize(pairs)
          else collectRows(pairs, 1000000, "dedup")
        case "clusters" =>
          val pairs = graft.operators.Dedup.minhashPairsFor(docs)
            .select("a_id", "b_id")
          val labels = graft.operators.Dedup.closeLabelsAdaptive(spark, pairs)
          val report = labels
            .groupBy(col("lbl").as("keep_id"))
            .agg(count(lit(1)).as("n_docs"), sum("node").cast("long").as("sum_ids"))
            .orderBy("keep_id")
          if (outTable.nonEmpty) materialize(report)
          else collectRows(report, 1000000, "dedup")
        case "canonical" =>
          // best-QUALITY survivor per cluster (singletons are their own
          // canonical) — one row per kept doc, so the report is
          // corpus-sized minus dropped dups: same cap/escape posture
          val pairs = graft.operators.Dedup.minhashPairsFor(docs)
            .select("a_id", "b_id")
          val report = graft.operators.Dedup.canonicalOver(docs, pairs)
          if (outTable.nonEmpty) materialize(report)
          else collectRows(report, 1000000, "dedup")
        case other => throw new IllegalArgumentException(
          s"lance dedup: unknown method $other (expected exact / pairs / clusters / canonical)")
      }
    }

  /** SQL entry point for the DATA-SELECTION family (r20) — the corpus
    * composition recipes behind the gated sampling keys, callable from
    * SQL:
    *
    * {{{
    *   CALL cat.system.sample(table => 'db.docs', method => 'mixture',
    *     shares => 'web:35,books:25,code:20,wiki:15,forums:5')
    *   CALL cat.system.sample(table => 'db.docs', method => 'temperature',
    *     budget => 6000)
    *   CALL cat.system.sample(table => 'db.docs', method => 'token_budget',
    *     budget => 800, output_table => 'db.docs_selected')
    * }}}
    *
    * method => 'mixture': share-targeted composition without upsampling —
    * the scarcest source relative to its percent binds the total; docs
    * selected in deterministic minstd2-hash order
    * ([[graft.operators.Sampling.mixtureOver]]).
    * method => 'temperature': T^(1/2)-flattened per-source budgets over a
    * total token budget ([[graft.operators.Sampling.temperatureOver]] —
    * IEEE-sqrt + integer-denominator determinism).
    * method => 'token_budget': per-source quality-ordered selection up to
    * `budget` tokens per source ([[graft.operators.Sampling.tokenBudgetOver]]).
    * method => 'epochs': mixture composition WITH bounded upsampling — a
    * scarce source repeats for up to `max_epochs` passes toward its
    * share of `budget` total tokens, epoch-major (every doc once before
    * any twice; [[graft.operators.Sampling.epochsOver]]); takes `shares`
    * AND `budget`.
    *
    * All three are the gated keys' exact plans (one |sources|-bounded
    * partial agg + one source-keyed prefix-sum window — sources are the
    * unit of parallelism at any corpus size). The selection is
    * budget-bounded, so rows return directly under the driver cap;
    * output_table materializes instead. */
  private def sample(catalog: LanceCatalog): UnboundProcedure =
    bound("sample", catalog, Array(
      param("table", StringType),
      param("method", StringType, Some("'temperature'")),
      param("budget", LongType, Some("6000")),
      param("shares", StringType, Some("''")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("source_column", StringType, Some("'source'")),
      param("max_epochs", IntegerType, Some("4")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      import org.apache.spark.sql.functions._
      val method = in.getUTF8String(1).toString.trim.toLowerCase(java.util.Locale.ROOT)
      val budget = in.getLong(2)
      val sharesStr = in.getUTF8String(3).toString.trim
      val idCol = in.getUTF8String(4).toString
      val textCol = in.getUTF8String(5).toString
      val srcCol = in.getUTF8String(6).toString
      val maxEpochs = in.getInt(7)
      val outTable = in.getUTF8String(8).toString.trim
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val docs = spark.read.format("lance").load(root)
        .select(col(idCol).cast("long").as("doc_id"),
          col(srcCol).as("source"), col(textCol).as("text"))
      def parsedShares(forWhat: String): Seq[(String, Int)] = {
        val shares = sharesStr.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
          kv.split(':') match {
            case Array(k, v) if k.trim.nonEmpty && v.trim.matches("\\d+") =>
              (k.trim, v.trim.toInt)
            case _ => throw new IllegalArgumentException(
              s"lance sample: malformed share '$kv' (expected source:percent)")
          }
        }
        require(shares.nonEmpty && shares.forall(_._2 > 0)
            && shares.map(_._2).sum == 100,
          s"lance sample: method => '$forWhat' needs shares => 'src:pct,...' " +
            "with positive integer percents summing to 100")
        require(shares.map(_._1).distinct.size == shares.size,
          "lance sample: duplicate source in shares")
        shares
      }
      val selected = method match {
        case "mixture" =>
          graft.operators.Sampling.mixtureOver(docs, parsedShares("mixture"))
        case "temperature" =>
          require(budget > 0, "lance sample: budget must be positive")
          graft.operators.Sampling.temperatureOver(docs, budget)
        case "token_budget" =>
          require(budget > 0, "lance sample: budget must be positive")
          graft.operators.Sampling.tokenBudgetOver(docs, budget)
        case "epochs" =>
          require(budget > 0, "lance sample: budget must be positive")
          require(maxEpochs > 0, "lance sample: max_epochs must be positive")
          graft.operators.Sampling.epochsOver(docs, parsedShares("epochs"),
            budget, maxEpochs.toLong)
        case other => throw new IllegalArgumentException(
          s"lance sample: unknown method $other (expected mixture / " +
            "temperature / token_budget / epochs)")
      }
      if (outTable.nonEmpty) {
        val outRoot = catalog.tableRootForCreate(outTable)
        selected.write.format("lance").mode("overwrite").save(outRoot)
        val n = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
        (StructType(Seq(
          StructField("output_table", StringType, nullable = false),
          StructField("n_rows", LongType, nullable = false))),
          Seq(Array[Any](UTF8String.fromString(outTable), n)))
      } else collectRows(selected, 1000000, "sample")
    }

  /** SQL entry point for TRAIN/VALIDATION/TEST SPLITS (r20) — the split
    * recipes behind the gated sample_hash / sample_split_leakfree keys,
    * callable from SQL and materialized as a labeled corpus:
    *
    * {{{
    *   CALL cat.system.split(table => 'db.docs',
    *     train_pct => 90, val_pct => 5,
    *     output_table => 'db.docs_split')          -- method => 'hash'
    *   CALL cat.system.split(table => 'db.docs', method => 'leakfree',
    *     output_table => 'db.docs_split')
    * }}}
    *
    * method => 'hash': the double-MINSTD id hash decides each doc's side —
    * reproducible across engines/runs, growth-stable, map-only
    * ([[graft.operators.Sampling.splitColumns]]).
    * method => 'leakfree': CLUSTER-CONSISTENT — near-duplicate documents
    * never straddle the train/test fence: the banded MinHash-LSH pairs
    * cluster to min-id representatives and the REP's hash decides the
    * whole cluster's side. The component labels cover only pair-docs (a
    * tiny slice of any real corpus), so the rep lookup is a broadcast
    * left join over an otherwise map-only projection.
    *
    * The labeled set is corpus-sized, so output_table is REQUIRED (every
    * corpus column + rep_id (leakfree) + pct + split, one distributed
    * write); the summary row returns per-split counts read back from the
    * output's column-pruned scan. train_pct/val_pct are SIZES in percent
    * (test takes the remainder). */
  private def split(catalog: LanceCatalog): UnboundProcedure =
    bound("split", catalog, Array(
      param("table", StringType),
      param("method", StringType, Some("'hash'")),
      param("train_pct", IntegerType, Some("90")),
      param("val_pct", IntegerType, Some("5")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      import org.apache.spark.sql.functions._
      val method = in.getUTF8String(1).toString.trim.toLowerCase(java.util.Locale.ROOT)
      val trainPct = in.getInt(2)
      val valPct = in.getInt(3)
      val idCol = in.getUTF8String(4).toString
      val textCol = in.getUTF8String(5).toString
      val outTable = in.getUTF8String(6).toString.trim
      require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
        s"lance split: need train_pct > 0, val_pct >= 0, sum <= 100 " +
          s"(got $trainPct/$valPct)")
      require(outTable.nonEmpty, "lance split: the labeled set is " +
        "corpus-sized — output_table is required")
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val corpus = spark.read.format("lance").load(root)
      val labeled = method match {
        case "hash" =>
          val (pct, split) = graft.operators.Sampling.splitColumns(
            col(idCol).cast("long"), trainPct, trainPct + valPct)
          corpus.withColumn("pct", pct).withColumn("split", split)
        case "leakfree" =>
          val docs = corpus.select(col(idCol).cast("long").as("doc_id"),
            col(textCol).as("text"))
          val pairs = graft.operators.Dedup.minhashPairsFor(docs)
            .select("a_id", "b_id")
          val labels = graft.operators.Dedup.closeLabelsAdaptive(spark, pairs)
          val (pct, split) = graft.operators.Sampling.splitColumns(
            col("rep_id"), trainPct, trainPct + valPct)
          corpus
            .join(broadcast(labels.select(col("node").as("__node"), col("lbl"))),
              col(idCol).cast("long") === col("__node"), "left")
            .withColumn("rep_id", coalesce(col("lbl"), col(idCol).cast("long")))
            .drop("__node", "lbl")
            .withColumn("pct", pct).withColumn("split", split)
        case other => throw new IllegalArgumentException(
          s"lance split: unknown method $other (expected hash / leakfree)")
      }
      val outRoot = catalog.tableRootForCreate(outTable)
      labeled.write.format("lance").mode("overwrite").save(outRoot)
      // per-split counts from the output's pruned (split) scan — cheap,
      // and they count what was actually committed
      val counts = spark.read.format("lance").load(outRoot)
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      (StructType(Seq(
        StructField("output_table", StringType, nullable = false),
        StructField("n_train", LongType, nullable = false),
        StructField("n_validation", LongType, nullable = false),
        StructField("n_test", LongType, nullable = false))),
        Seq(Array[Any](UTF8String.fromString(outTable),
          counts.getOrElse("train", 0L), counts.getOrElse("validation", 0L),
          counts.getOrElse("test", 0L))))
    }

  /** SQL entry point for TEXT SCORING (r20) — the per-document quality /
    * language-ID / fingerprint annotations behind the gated text-analysis
    * keys, callable from SQL and materialized as a scored corpus:
    *
    * {{{
    *   CALL cat.system.score(table => 'db.docs',
    *     metrics => 'quality,langid,fingerprint',
    *     output_table => 'db.docs_scored')
    * }}}
    *
    * metrics is a CSV of: `quality` (n_chars, n_tokens, distinct_ratio,
    * stop_ratio, quality — [[graft.operators.TextAnalysis.qualityMetricCols]];
    * n_chars computes as length(text), self-contained), `langid`
    * (per-language stopword-hit scores + argmax pred_lang; with
    * `label_column` set the label and an is_match flag append — the gated
    * text_langid shape), `fingerprint` (the rolling-hash fp + fp_bucket).
    * All pure codegen'd map expressions over one corpus pass — the scored
    * set is corpus-sized, so output_table is REQUIRED; one summary row
    * returns. */
  private def score(catalog: LanceCatalog): UnboundProcedure =
    bound("score", catalog, Array(
      param("table", StringType),
      param("metrics", StringType, Some("'quality'")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("label_column", StringType, Some("''")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      import org.apache.spark.sql.functions._
      val metricsStr = in.getUTF8String(1).toString
      val idCol = in.getUTF8String(2).toString
      val textCol = in.getUTF8String(3).toString
      val labelCol = in.getUTF8String(4).toString.trim
      val outTable = in.getUTF8String(5).toString.trim
      require(outTable.nonEmpty, "lance score: the scored set is " +
        "corpus-sized — output_table is required")
      val metrics = metricsStr.split(',').map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty).distinct.toSeq
      val known = Set("quality", "langid", "fingerprint")
      require(metrics.nonEmpty && metrics.forall(known),
        s"lance score: metrics must be a CSV of ${known.mkString(" / ")} " +
          s"(got '$metricsStr')")
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val corpus = spark.read.format("lance").load(root)
      val base = corpus
        .select(Seq(col(idCol).as("doc_id"), col(textCol).as("text")) ++
          (if (labelCol.nonEmpty) Seq(col(labelCol)) else Nil): _*)
        .withColumn("w", graft.operators.TextAnalysis.tokens)
      val metricCols: Seq[org.apache.spark.sql.Column] = metrics.flatMap {
        case "quality" =>
          graft.operators.TextAnalysis.qualityMetricCols(length(col("text")))
        case "langid" =>
          val (scoreCols, pred) = graft.operators.TextAnalysis.langidMetricCols
          scoreCols ++ Seq(pred.as("pred_lang")) ++
            (if (labelCol.nonEmpty)
              Seq(col(labelCol), (pred === col(labelCol)).as("is_match"))
             else Nil)
        case "fingerprint" =>
          Seq(graft.functions.fingerprint(col("text")).as("fp"),
            (graft.functions.fingerprint(col("text")) % 1024).as("fp_bucket"))
      }
      val scored = base.select(Seq(col("doc_id")) ++ metricCols: _*)
      val outRoot = catalog.tableRootForCreate(outTable)
      scored.write.format("lance").mode("overwrite").save(outRoot)
      val n = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
      (StructType(Seq(
        StructField("output_table", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false))),
        Seq(Array[Any](UTF8String.fromString(outTable), n)))
    }

  /** SQL entry point for RAG/EMBEDDING CHUNKING (r20) — overlapping
    * token-window chunks over any catalog corpus, materialized WITH the
    * chunk text (the gated text_chunk key carries only the counts its
    * oracle can check; a downstream embedding pass needs the text):
    *
    * {{{
    *   CALL cat.system.chunk(table => 'db.docs',
    *     chunk_tokens => 64, stride => 48,
    *     output_table => 'db.docs_chunks')
    * }}}
    *
    * One builtin-only map stage ([[graft.operators.TextAnalysis.chunkOver]]
    * — sequence + posexplode + slice; a doc's chunk list never leaves its
    * task), so chunking scales linearly with input splits. The chunk set
    * is corpus-sized × windows — output_table is REQUIRED. chunk_text
    * joins the window's tokens with single spaces (the whitespace
    * tokenizer's reconstruction convention). */
  private def chunk(catalog: LanceCatalog): UnboundProcedure =
    bound("chunk", catalog, Array(
      param("table", StringType),
      param("chunk_tokens", IntegerType, Some("64")),
      param("stride", IntegerType, Some("48")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      import org.apache.spark.sql.functions._
      val chunkTokens = in.getInt(1)
      val stride = in.getInt(2)
      val idCol = in.getUTF8String(3).toString
      val textCol = in.getUTF8String(4).toString
      val outTable = in.getUTF8String(5).toString.trim
      require(chunkTokens > 0 && stride > 0,
        s"lance chunk: chunk_tokens and stride must be positive (got $chunkTokens/$stride)")
      require(outTable.nonEmpty, "lance chunk: the chunk set is " +
        "corpus-sized — output_table is required")
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val docs = spark.read.format("lance").load(root)
        .select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .withColumn("w", graft.operators.TextAnalysis.tokens)
      val chunks = graft.operators.TextAnalysis.chunkOver(
        docs, chunkTokens, stride, withText = true)
      val outRoot = catalog.tableRootForCreate(outTable)
      chunks.write.format("lance").mode("overwrite").save(outRoot)
      val n = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
      (StructType(Seq(
        StructField("output_table", StringType, nullable = false),
        StructField("n_chunks", LongType, nullable = false))),
        Seq(Array[Any](UTF8String.fromString(outTable), n)))
    }

  /** SQL entry point for SEQUENCE PACKING (r20) — pack documents into
    * ~budget-token training shards from SQL:
    *
    * {{{
    *   CALL cat.system.pack(table => 'db.docs', budget => 2048,
    *                        shards => 0)
    * }}}
    *
    * Routes through [[graft.operators.TextAnalysis.pack]]: docs hash to
    * `shards` independent streams (shards <= 0 sizes the count to the
    * cluster — the production default; the gate pins 8 for its oracle),
    * prefix-sums within each stream assign packs, one shuffle total. The
    * pack report is |corpus|/budget-bounded — rows return under the
    * driver cap; output_table materializes instead. */
  private def pack(catalog: LanceCatalog): UnboundProcedure =
    bound("pack", catalog, Array(
      param("table", StringType),
      param("budget", LongType, Some("2048")),
      param("shards", IntegerType, Some("0")),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      import org.apache.spark.sql.functions._
      val budget = in.getLong(1)
      val shards = in.getInt(2)
      val idCol = in.getUTF8String(3).toString
      val textCol = in.getUTF8String(4).toString
      val outTable = in.getUTF8String(5).toString.trim
      require(budget > 0, "lance pack: budget must be positive")
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val docs = spark.read.format("lance").load(root)
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
        .select(col("doc_id"),
          size(graft.operators.TextAnalysis.tokens).cast("long").as("n_tokens"))
      val packed = graft.operators.TextAnalysis.pack(spark, docs, budget, shards)
      if (outTable.nonEmpty) {
        val outRoot = catalog.tableRootForCreate(outTable)
        packed.write.format("lance").mode("overwrite").save(outRoot)
        val n = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
        (StructType(Seq(
          StructField("output_table", StringType, nullable = false),
          StructField("n_rows", LongType, nullable = false))),
          Seq(Array[Any](UTF8String.fromString(outTable), n)))
      } else collectRows(packed, 1000000, "pack")
    }

  /** SQL entry point for SEMANTIC DEDUPLICATION (SemDeDup) — materializes
    * the curated corpus (every column, one survivor per semantic group)
    * and returns one summary row:
    *
    * {{{
    *   CALL cat.system.semdedup(table => 'db.embs',
    *     id_column => 'vec_id', vector_column => 'embedding',
    *     min_cosine => 0.4, cells => 16,
    *     output_table => 'db.embs_dedup')
    * }}}
    *
    * The pipeline is dedup_semantic_trained's end to end: train the
    * coarse quantizer (KMeans on a capped deterministic sample — the IVF
    * recipe, but no index persists; the curated table is the product),
    * assign every row to its nearest centroid with the codegen'd
    * NearestCell map, form EXACT in-cell cosine pairs (chunked triangle
    * self-join), collapse them to connected components, and keep each
    * component's min-id representative. Survivors write distributed
    * (anti-join against the drop list; the driver carries only the
    * summary). Cell sizing is the scale knob: cells ∝ corpus keeps
    * per-cell work constant. */
  private def semdedup(catalog: LanceCatalog): UnboundProcedure =
    bound("semdedup", catalog, Array(
      param("table", StringType),
      param("id_column", StringType, Some("'vec_id'")),
      param("vector_column", StringType, Some("'embedding'")),
      param("min_cosine", DoubleType, Some("0.4")),
      param("cells", IntegerType, Some("16")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      val idCol = in.getUTF8String(1).toString
      val vecCol = in.getUTF8String(2).toString
      val tau = in.getDouble(3)
      val cells = in.getInt(4)
      val outTable = in.getUTF8String(5).toString.trim
      require(outTable.nonEmpty, "lance semdedup: output_table is required " +
        "(survivors are corpus-sized — they must write distributed)")
      require(tau > 0.0 && tau <= 1.0, s"lance semdedup: min_cosine must be in (0, 1], got $tau")
      require(cells >= 1, s"lance semdedup: cells must be >= 1, got $cells")
      import org.apache.spark.sql.functions.col
      val corpus = spark.read.format("lance").load(root)
      val cents = graft.operators.Dedup.trainCentroids(spark, corpus, vecCol, cells)
      val dim = cents.head.length
      val assigned = corpus.select(col(idCol).as("vec_id"),
        graft.functions.nearest_cell(col(vecCol), cents.flatten, cents.length, dim)
          .cast("long").as("label"),
        col(vecCol).as("embedding"))
      // arm the centroid-literal DuckDB oracle ONLY when the gated key's
      // own invocation is in scope — an unrelated user CALL on a
      // different table must not overwrite the gated key's trained
      // centroids (OracleArming)
      graft.operators.OracleArming.key.foreach { k =>
        graft.operators.Dedup.TrainedSemOracle.record(k, cents, tau,
          """SELECT e.vec_id, e.label FROM embeddings e
            |WHERE e.vec_id NOT IN (SELECT node FROM comp WHERE node != lbl)
            |ORDER BY vec_id""".stripMargin)
      }
      // the drop list (ids only) is consumed twice (count + anti-join)
      val dropped = graft.operators.Dedup.semanticDropList(spark, assigned, tau)
        .localCheckpoint()
      val nDropped = dropped.count()
      val survivors = corpus.join(
        dropped.select(col("vec_id").as(idCol)), Seq(idCol), "left_anti")
      val outRoot = catalog.tableRootForCreate(outTable)
      survivors.write.format("lance").mode("overwrite").save(outRoot)
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val nOut = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
      (StructType(Seq(
        StructField("output_table", StringType, nullable = false),
        StructField("n_dropped", LongType, nullable = false),
        StructField("n_out", LongType, nullable = false))),
        Seq(Array[Any](UTF8String.fromString(outTable), nDropped, nOut)))
    }

  /** SQL entry point for DSIR data selection (Xie et al. 2023) —
    * materializes the selected sub-corpus (every column of the top-k
    * importance-ranked pool docs) and returns one summary row:
    *
    * {{{
    *   CALL cat.system.dsir(table => 'db.docs',
    *     id_column => 'doc_id', text_column => 'text',
    *     target_predicate => 'lang = ''en''',
    *     k => 100, output_table => 'db.docs_selected')
    * }}}
    *
    * The pipeline is sample_dsir's end to end over an ARBITRARY table and
    * target predicate: hashed uni+bigram features (1024 buckets), two
    * bag-of-buckets distributions (predicate rows = target, the rest =
    * pool), per-bucket importance log-ratios in integer micro-nats
    * (driver StrictMath.log over the B-bounded counts), one codegen'd
    * scoring map over the pool, top-k by (score, id). Selection writes
    * distributed (semi-join against the k selected ids; the driver
    * carries only the summary). */
  private def dsir(catalog: LanceCatalog): UnboundProcedure =
    bound("dsir", catalog, Array(
      param("table", StringType),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("target_predicate", StringType, Some("''")),
      param("k", IntegerType, Some("100")),
      param("output_table", StringType, Some("''")))) { (root, in) =>
      val spark = SparkSession.active
      val idCol = in.getUTF8String(1).toString
      val textCol = in.getUTF8String(2).toString
      val pred = in.getUTF8String(3).toString.trim
      val k = in.getInt(4)
      val outTable = in.getUTF8String(5).toString.trim
      require(pred.nonEmpty, "lance dsir: target_predicate is required " +
        "(the target slice defines the distribution to select toward)")
      require(k >= 1, s"lance dsir: k must be >= 1, got $k")
      require(outTable.nonEmpty, "lance dsir: output_table is required " +
        "(the selection materializes distributed)")
      import org.apache.spark.sql.functions.{col, expr}
      val corpus = spark.read.format("lance").load(root)
      val (ct, cr) = graft.operators.Sampling
        .dsirTrainCounts(corpus, expr(pred), col(textCol))
      val (nSel, nOut) = dsirSelectWrite(spark, catalog, corpus, idCol,
        textCol, pred, k, outTable, ct, cr)
      (StructType(Seq(
        StructField("output_table", StringType, nullable = false),
        StructField("n_selected", LongType, nullable = false),
        StructField("n_out", LongType, nullable = false))),
        Seq(Array[Any](UTF8String.fromString(outTable), nSel, nOut)))
    }

  /** λ from the counts → arm oracle (gated runs only) → score → top-k →
    * distributed semi-join write → persist the counts as the selection's
    * sidecar baseline. Shared by CALL system.dsir and the retrain arm of
    * CALL system.dsir_refresh (which already holds the fresh counts from
    * its drift measurement — training never runs twice). */
  private def dsirSelectWrite(spark: SparkSession, catalog: LanceCatalog,
                              corpus: org.apache.spark.sql.DataFrame,
                              idCol: String, textCol: String, pred: String,
                              k: Int, outTable: String,
                              ct: Array[Long], cr: Array[Long]): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, expr}
    val lam = graft.operators.Sampling.dsirLambdaOf(ct, cr)
    // arm the λ-literal DuckDB oracle ONLY under the gated key's own
    // invocation (OracleArming) — a user CALL on another table must not
    // clobber the λ the gate trained
    graft.operators.OracleArming.key.foreach(kk =>
      graft.operators.Sampling.DsirOracle.record(kk, lam))
    val isTarget = expr(pred)
    val st = graft.functions.dsir_doc_score(col(textCol), lam)
    val sel = corpus.filter(!isTarget)
      .select(col(idCol), st.getItem(0).as("n_grams"),
        st.getItem(1).as("dsir_micro"))
      .filter(col("n_grams") > 0)
      .orderBy(col("dsir_micro").desc, col(idCol).asc)
      .limit(k)
      .select(idCol)
      .localCheckpoint() // consumed twice (count + semi-join)
    val nSel = sel.count()
    val selected = corpus.join(sel, Seq(idCol), "left_semi")
    val outRoot = catalog.tableRootForCreate(outTable)
    selected.write.format("lance").mode("overwrite").save(outRoot)
    // baseline AFTER the data commit: a crash between them leaves the new
    // selection with the previous baseline — the next refresh measures
    // against older counts and at worst retrains once too eagerly
    // (monitoring metadata, never correctness)
    writeDsirState(spark, outRoot, ct, cr)
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
    val nOut = ManifestIO.loadLatest(outRoot, conf).map(_.totalRows).getOrElse(0L)
    (nSel, nOut)
  }

  private def dsirStatePath(outRoot: String) =
    new org.apache.hadoop.fs.Path(outRoot, "_dsir/state.json")

  private def writeDsirState(s: SparkSession, outRoot: String,
                             ct: Array[Long], cr: Array[Long]): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JObject(
      "ct" -> JArray(ct.toList.map(JLong(_))),
      "cr" -> JArray(cr.toList.map(JLong(_))))
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(s, Map.empty)
    val p = dsirStatePath(outRoot)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(JsonMethods.compact(JsonMethods.render(j))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readDsirState(s: SparkSession,
                            outRoot: String): Option[(Array[Long], Array[Long])] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val conf = org.apache.spark.sql.graft.Shim.hadoopConf(s, Map.empty)
    val p = dsirStatePath(outRoot)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    def longs(v: JValue): Array[Long] = v match {
      case JArray(xs) => xs.map {
        case JInt(x) => x.toLong
        case JLong(x) => x
        case other => throw new IllegalStateException(s"bad dsir state entry: $other")
      }.toArray
      case other => throw new IllegalStateException(s"bad dsir state: $other")
    }
    val j = JsonMethods.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    Some((longs(j \ "ct"), longs(j \ "cr")))
  }

  /** Drift-GATED selection refresh — the `reindex` posture for the DSIR
    * family: retraining λ is an offline decision, and this procedure makes
    * it a measured one.
    *
    * {{{
    *   CALL cat.system.dsir_refresh(table => 'db.docs',
    *     target_predicate => 'lang = ''en''', k => 100,
    *     output_table => 'db.docs_selected', threshold => 0.05)
    * }}}
    *
    * One featurize pass recomputes the corpus's per-bucket (target, pool)
    * gram counts — the SAME pass training runs, so the measurement is
    * never wasted — and χ²-compares each against the counts persisted
    * when the selection at `output_table` was last trained
    * ([[graft.operators.Sampling.dsirChi2]] — the drift family's exact
    * add-1/nano-term arithmetic). At or below the threshold the selection
    * stands (no-op: the common case, one aggregation pass total); above
    * it, λ retrains FROM THE COUNTS IN HAND, the pool rescores, and the
    * selection MV swaps atomically (lance overwrite commit), establishing
    * the new baseline. Composes corpus_drift with CALL system.dsir the
    * way CALL system.reindex composes driftRatio with the index rebuild. */
  private def dsirRefresh(catalog: LanceCatalog): UnboundProcedure =
    bound("dsir_refresh", catalog, Array(
      param("table", StringType),
      param("id_column", StringType, Some("'doc_id'")),
      param("text_column", StringType, Some("'text'")),
      param("target_predicate", StringType, Some("''")),
      param("k", IntegerType, Some("100")),
      param("output_table", StringType, Some("''")),
      param("threshold", DoubleType, Some("0.05")))) { (root, in) =>
      val spark = SparkSession.active
      val idCol = in.getUTF8String(1).toString
      val textCol = in.getUTF8String(2).toString
      val pred = in.getUTF8String(3).toString.trim
      val k = in.getInt(4)
      val outTable = in.getUTF8String(5).toString.trim
      val threshold = in.getDouble(6)
      require(pred.nonEmpty, "lance dsir_refresh: target_predicate is required")
      require(k >= 1, s"lance dsir_refresh: k must be >= 1, got $k")
      require(outTable.nonEmpty, "lance dsir_refresh: output_table is required")
      require(threshold >= 0.0,
        s"lance dsir_refresh: threshold must be >= 0, got $threshold")
      val outRoot = catalog.tableRootFor(outTable)
      val (ctOld, crOld) = readDsirState(spark, outRoot).getOrElse(
        throw new IllegalStateException(s"lance dsir_refresh: no dsir " +
          s"baseline at $outTable — run CALL system.dsir first"))
      import org.apache.spark.sql.functions.{col, expr}
      val corpus = spark.read.format("lance").load(root)
      val (ctNew, crNew) = graft.operators.Sampling
        .dsirTrainCounts(corpus, expr(pred), col(textCol))
      val drift = math.max(graft.operators.Sampling.dsirChi2(ctOld, ctNew),
        graft.operators.Sampling.dsirChi2(crOld, crNew))
      val refreshed = drift > threshold
      val nSel = if (!refreshed) 0L else
        dsirSelectWrite(spark, catalog, corpus, idCol, textCol, pred, k,
          outTable, ctNew, crNew)._1
      (StructType(Seq(
        StructField("drift", DoubleType, nullable = false),
        StructField("threshold", DoubleType, nullable = false),
        StructField("refreshed", BooleanType, nullable = false),
        StructField("n_selected", LongType, nullable = false))),
        Seq(Array[Any](drift, threshold, refreshed, nSel)))
    }

  /** SQL entry point for cross-table DRIFT monitoring — the procedure face
    * of the corpus_drift/lance_drift family:
    *
    * {{{
    *   CALL cat.system.drift(table => 'db.docs_new',
    *     reference_table => 'db.docs_old',
    *     source_column => 'source', text_column => 'text')
    * }}}
    *
    * Per source, the χ² divergence between the source's hashed-gram
    * distribution in `table` vs `reference_table` (the graft.operators
    * .TextAnalysis.driftPair tail verbatim — add-1 smoothing, integer
    * nano-unit terms). The result is |sources|-bounded, so it returns as
    * procedure rows; the heavy work (two featurize passes + the bounded
    * scaffold joins) runs distributed. Typical pairings: this snapshot vs
    * the last blessed one, the incoming crawl vs the standing corpus. */
  private def drift(catalog: LanceCatalog): UnboundProcedure =
    bound("drift", catalog, Array(
      param("table", StringType),
      param("reference_table", StringType),
      param("source_column", StringType, Some("'source'")),
      param("text_column", StringType, Some("'text'")))) { (root, in) =>
      val spark = SparkSession.active
      val refTable = in.getUTF8String(1).toString.trim
      val srcCol = in.getUTF8String(2).toString
      val textCol = in.getUTF8String(3).toString
      require(refTable.nonEmpty, "lance drift: reference_table is required")
      val refRoot = catalog.tableRootFor(refTable)
      import org.apache.spark.sql.functions.col
      def counts(r: String) = graft.operators.TextAnalysis.driftCounts(
        spark.read.format("lance").load(r)
          .select(col(srcCol).as("source"), col(textCol).as("text")))
      val report = graft.operators.TextAnalysis
        .driftPair(counts(refRoot), counts(root))
        .collect() // |sources|-bounded by construction
      (StructType(Seq(
        StructField("source", StringType, nullable = false),
        StructField("n_grams_old", LongType, nullable = false),
        StructField("n_grams_new", LongType, nullable = false),
        StructField("chi2", DoubleType, nullable = false))),
        report.toSeq.map(r => Array[Any](
          UTF8String.fromString(r.getString(0)), r.getLong(1), r.getLong(2),
          r.getDouble(3))))
    }

  /** Per-column table statistics from metadata alone — the observability
    * face of the same numbers the scan hands the CBO: one row per column
    * with folded min/max/null_count (manifest, zero data IO) and NDV
    * (exact string dictionaries, else the per-fragment HLL sidecar merge).
    * Columns carrying rename/hide indirection on any fragment report
    * nulls rather than guesses. O(fragments) sidecar reads, no data IO. */
  private def stats(catalog: LanceCatalog): UnboundProcedure =
    bound("stats", catalog, Array(param("table", StringType))) { (root, _) =>
      val spark = SparkSession.active
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val m = ManifestIO.loadLatest(root, conf).getOrElse(
        throw new IllegalStateException(s"lance dataset not found: $root"))
      val frs = m.fragments
      val rows = frs.map(_.liveRows).sum
      def jShow(v: org.json4s.JValue): String = v match {
        case org.json4s.JLong(x) => x.toString
        case org.json4s.JDouble(x) => x.toString
        case org.json4s.JString(x) => x
        case other => other.toString
      }
      val out = m.schema.fields.toSeq.map { f =>
        val name = f.name
        val identity = frs.forall(fr =>
          !fr.hidden.contains(name) && !fr.physicalNames.contains(name))
        val per = frs.map(_.stats.get(name))
        val ss = if (identity && frs.nonEmpty && per.forall(_.isDefined))
                 Some(per.map(_.get)) else None
        val nulls = ss.collect {
          case s if s.forall(_.nullCount.isDefined) => s.map(_.nullCount.get).sum
        }
        val (mn, mx) = ss match {
          case Some(s) if s.forall(v => v.min.isDefined && v.max.isDefined) =>
            (Some(jShow(s.map(_.min.get).reduce(ManifestIO.jMin))),
              Some(jShow(s.map(_.max.get).reduce(ManifestIO.jMax))))
          case _ => (None, None)
        }
        val dictNdv: Option[Long] = ss.flatMap { s =>
          val dicts = s.map(_.distinct)
          if (f.dataType == StringType && frs.forall(_.deletes.isEmpty) &&
              dicts.forall(d => d.isDefined && d.get.nonEmpty))
            Some(dicts.flatMap(_.get).toSet.size.toLong)
          else None
        }
        val ndv: Option[Long] = dictNdv.orElse {
          // same sidecar-read cap as the CBO path (LanceScan.NdvSidecarCap):
          // CALL system.stats on a 100k-fragment table must not do 100k
          // driver sidecar reads — past the cap NDV reports unknown, like
          // the scan's estimateStatistics does
          if (!identity || frs.isEmpty || frs.size > 1024 ||
              frs.exists(_.sketches.isEmpty)) None
          else {
            val hlls = frs.map { fr =>
              SidecarCache.get(root, conf, fr.sketches.get)
                .get(fr.physicalNames.getOrElse(name, name)).map(_._1)
            }
            if (hlls.exists(_.isEmpty)) None
            else Some(math.min(hlls.flatten.reduce(_.merge(_)).estimate, math.max(rows, 1L)))
          }
        }
        Array[Any](UTF8String.fromString(name),
          UTF8String.fromString(f.dataType.simpleString),
          rows,
          nulls.map(Long.box).orNull,
          mn.map(UTF8String.fromString).orNull,
          mx.map(UTF8String.fromString).orNull,
          ndv.map(Long.box).orNull)
      }
      (StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("data_type", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("null_count", LongType, nullable = true),
        StructField("min", StringType, nullable = true),
        StructField("max", StringType, nullable = true),
        StructField("ndv", LongType, nullable = true))),
        out)
    }

  private def history(catalog: LanceCatalog): UnboundProcedure =
    bound("history", catalog, Array(param("table", StringType))) { (root, _) =>
      val spark = SparkSession.active
      val conf = org.apache.spark.sql.graft.Shim.hadoopConf(spark, Map.empty)
      val fs = ManifestIO.fs(root, conf)
      val rows = ManifestIO.listVersions(root, conf).map { v =>
        val m = ManifestIO.load(root, v, conf)
        val mtime = fs.getFileStatus(ManifestIO.manifestFile(root, v)).getModificationTime
        Array[Any](v, mtime * 1000L, UTF8String.fromString(m.op),
          m.fragments.size, m.totalRows)
      }
      (StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("committed_at", TimestampType, nullable = false),
        StructField("op", StringType, nullable = false),
        StructField("n_fragments", IntegerType, nullable = false),
        StructField("n_rows", LongType, nullable = false))),
        rows)
    }
}
