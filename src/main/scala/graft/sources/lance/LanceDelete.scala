package graft.sources.lance

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.sources._

/** `DELETE FROM` over a lance dataset (DSv2 SupportsDelete), the
  * lakehouse delete the reference's Lance backend provides natively.
  *
  * Three-way fragment classification from manifest stats — the same
  * trick as scan pruning, applied to writes:
  *   - provably ALL rows match  → drop the fragment (metadata-only);
  *   - provably NO rows match   → keep the fragment untouched;
  *   - otherwise                → rewrite it without the matching rows.
  * Only the third class costs IO, so a delete aligned with fragment
  * ranges (e.g. dropping an old date range) is O(metadata) at any scale.
  */
object LanceDelete {

  /** Rebuild a Column from a pushed source Filter (the delete predicate
    * arrives in source-filter form). None = unsupported → canDeleteWhere
    * returns false and Spark reports the delete as unsupported rather
    * than running a wrong rewrite. */
  def toColumn(f: Filter): Option[Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(c, v) => Some(col(c) === lit(v))
      case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
      case GreaterThan(c, v) => Some(col(c) > lit(v))
      case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
      case LessThan(c, v) => Some(col(c) < lit(v))
      case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
      case In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
      case IsNull(c) => Some(col(c).isNull)
      case IsNotNull(c) => Some(col(c).isNotNull)
      case StringStartsWith(c, v) => Some(col(c).startsWith(v))
      case StringEndsWith(c, v) => Some(col(c).endsWith(v))
      case StringContains(c, v) => Some(col(c).contains(v))
      case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
      case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
      case Not(x) => toColumn(x).map(!_)
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  def deleteWhere(spark: SparkSession, root: String, filters: Array[Filter],
                  options: Map[String, String]): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val conf = Shim.hadoopConf(spark, options)
    val m = ManifestIO.loadLatest(root, conf).getOrElse(
      throw new IllegalStateException(s"lance dataset not found: $root"))
    val conjunction = filters.reduceOption(And(_, _)).getOrElse(AlwaysTrue())
    val pred = filters.flatMap(toColumn).reduceOption(_ && _).getOrElse(
      throw new UnsupportedOperationException(
        s"lance DELETE: unsupported predicate ${filters.mkString(", ")}"))

    val dropped = m.fragments.filter(fr =>
      LancePruning.provablyAllMatch(fr, conjunction))
    val droppedPaths = dropped.map(_.path).toSet
    val toRewrite = m.fragments.filter(fr => !droppedPaths(fr.path) &&
      !LancePruning.provablyEmpty(fr, m.schema, conjunction))
    if (dropped.isEmpty && toRewrite.isEmpty) return // provably no-op

    // SQL DELETE removes rows where the predicate is TRUE; NULL keeps
    val staged =
      if (toRewrite.isEmpty) Seq.empty
      else LanceBatchSave.stageFragments(spark,
        LanceMaintenance.maskedRead(spark, root, m.schema, toRewrite)
          .filter(not(coalesce(pred, lit(false)))),
        root, LanceOptions.any(options, "maxRowsPerFile", "write.max-rows-per-file"))

    val touched = droppedPaths ++ toRewrite.map(_.path)
    val committed = ManifestIO.commit(root, conf) { latest =>
      val cur = latest.getOrElse(
        throw new IllegalStateException(s"lance dataset disappeared during delete: $root"))
      // another writer rewrote/removed a fragment we read — committing
      // would resurrect deleted rows or double the rewritten ones
      if (!touched.forall(cur.fragments.map(_.path).toSet)) None
      else {
        // a concurrent DROP COLUMN removes no fragments (so the path check
        // passes) but the staged rewrites physically contain the dropped
        // column — stamp them so a later re-ADD can't resurrect stale values
        val stamped = LanceWriteUtil.stampRacedDrops(staged, m.schema, cur.schema)
        Some(LanceCommit(cur.schema,
          cur.fragments.filterNot(f => touched(f.path)) ++ stamped, cur.txns))
      }
    }
    if (committed.isEmpty) {
      val fs = ManifestIO.fs(root, conf)
      staged.foreach(f => fs.delete(new Path(root, f.path), false))
      throw new IllegalStateException(
        s"lance DELETE lost a conflict with a concurrent rewrite at $root; retry")
    }
  }
}
