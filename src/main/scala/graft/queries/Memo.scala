package graft.queries

/** Session-lifetime memo for DETERMINISTIC driver-side fit results
  * (perceptron weight arrays, OVA model lists, fold models) shared
  * across the query surface.
  *
  * Why: the bench/verify harness calls each `queries` entry
  * independently, and the classifier family (q_perceptron_score,
  * q_auc_global, q_auc_by_source, q_active_select, q_classifier_eval,
  * q_conformal, q_lift) each re-ran the identical bit-exact fit from
  * scratch — ~6 copies of a 4-6-sequential-job fit per bench pass,
  * pure structural waste (r8 verdict task 2). The fits are
  * deterministic per (sfDir, dim, epochs): same data, integer
  * arithmetic, order-insensitive aggregation — so memoizing is a
  * zero-semantic-change cache of a pure function.
  *
  * Only bounded DRIVER data may be cached here (model arrays of
  * ≤ dim longs), never DataFrames — a DataFrame is bound to its
  * SparkSession and would leak/break across sessions. Keys embed the
  * sf dir, so sf0.01 verify and sf0.1 bench never collide.
  */
private[queries] object Memo {
  private val cache = scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  // Cold-honesty coupling (r14): the bench's cold mode clears
  // PlanCache after every timed pass so each pass computes from the
  // parquet inputs — a driver-side fit memo surviving that clear
  // would exempt the classifier family's fit cost from the same
  // discipline. Recomputation is bit-exact (pure deterministic fits),
  // so dropping entries is semantics-free.
  graft.util.PlanCache.onClear(_ => cache.clear())

  def cached[T <: AnyRef](key: String)(compute: => T): T =
    cache.getOrElseUpdate(key, compute).asInstanceOf[T]
}
