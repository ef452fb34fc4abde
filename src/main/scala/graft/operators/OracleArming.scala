package graft.operators

/** Scopes procedure-surface oracle recordings to the gated key's own
  * invocation. `CALL system.semdedup` / `system.dsir` train literals
  * (KMeans centroids, λ log-ratios) that the armed-literal DuckDB oracles
  * replay; recording them under a GLOBAL key on every user call would let
  * an unrelated CALL on a different table overwrite the weights the gated
  * key's run trained — a Verify dump taken after such a call would gate
  * against the wrong literals. The gated query wraps its CALL in
  * `arming(key)` (procedures run eagerly on the calling thread, so the
  * DynamicVariable is in scope for the whole command); a user CALL outside
  * any scope trains and selects normally but records nothing. */
private[graft] object OracleArming {
  private val current = new scala.util.DynamicVariable[Option[String]](None)

  /** The oracle key the enclosing gated query armed, if any. */
  def key: Option[String] = current.value

  def arming[T](k: String)(f: => T): T = current.withValue(Some(k))(f)
}
