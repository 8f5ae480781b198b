package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded lifetime for the intermediate caches the dedup operators create.
  *
  * The pair operators ([[Dedup.jaccardPairsExact]], [[Dedup.ppjoinPairs]],
  * [[Dedup.containmentPairs]], [[Dedup.minhashPairs]],
  * [[Dedup.simhashPairs]]) cache a multi-consumer intermediate (the shingle
  * sets / signatures) — load-bearing for performance (3-8× measured), but by
  * default those blocks live until someone calls
  * `spark.catalog.clearCache()`. A long-lived library caller that invokes
  * operators repeatedly would accumulate cached blocks for the session
  * lifetime (they are LRU-evicted under memory pressure, so this is a
  * hygiene concern, not a correctness one).
  *
  * Passing an explicit scope bounds that lifetime with the loan pattern:
  *
  * {{{
  * val n = CacheScope.using(s => Dedup.ppjoinPairs(docs, 0.8, s)) { pairs =>
  *   pairs.count() // caches live exactly for the duration of this block
  * }
  * }}}
  *
  * After `using` returns, every cache the operator created has been
  * unpersisted — nothing outlives the invocation.
  */
final class CacheScope private[operators] (managed: Boolean) {

  def this() = this(managed = true)

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val hooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Cache `df` and, if this scope is managed, remember it for release. */
  private[graft] def track(df: DataFrame): DataFrame = {
    df.cache()
    if (managed) synchronized { tracked += df }
    df
  }

  /** Register a release action for storage `.cache()` cannot express
    * (e.g. the persisted blocks behind a `localCheckpoint`, which
    * `Dataset.unpersist`/`catalog.clearCache` never free). No-op in an
    * unmanaged scope, mirroring [[track]]. NOTE: unlike an unpersisted
    * cache (which silently recomputes), a released checkpoint cannot be
    * recomputed — using the result after release fails loudly. */
  private[graft] def onRelease(f: () => Unit): Unit =
    if (managed) synchronized { hooks += f }

  /** Unpersist every tracked cache (non-blocking), run every release
    * hook, and forget both. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
    hooks.foreach(f => f())
    hooks.clear()
  }
}

object CacheScope {

  /** The session-lifetime scope: caches are created but never released by
    * the operator — identical to a plain `.cache()` (the driver's
    * Verify/Bench loops clear between queries). This is what [[ambient]]
    * resolves to outside any [[scoped]] block. */
  val unmanaged: CacheScope = new CacheScope(managed = false)

  private val ambientVar =
    new scala.util.DynamicVariable[CacheScope](unmanaged)

  /** The scope an operator picks up when its caller passes none — the
    * innermost enclosing [[scoped]] block's managed scope, or [[unmanaged]]
    * outside any block. This is how pre-built query closures whose
    * signature has no scope parameter (the `SparkEntry.queries` registry:
    * `(SparkSession, dir) => DataFrame`) still get bounded cache lifetimes:
    * the library caller wraps build-plus-action in `CacheScope.scoped`,
    * and every operator the registry entry invokes routes its caches
    * through that scope. */
  def ambient: CacheScope = ambientVar.value

  /** Loan pattern: build an operator plan that caches through a fresh
    * scope, hand it to `use`, and release all operator-created caches when
    * `use` finishes — whether it returns or throws. The DataFrame must not
    * escape `use` (its caches are gone afterwards; the plan would silently
    * recompute uncached). */
  def using[A](build: CacheScope => DataFrame)(use: DataFrame => A): A = {
    val scope = new CacheScope
    try use(build(scope)) finally scope.release()
  }

  /** Ambient loan pattern for plans built by code you don't control the
    * signature of (e.g. the `SparkEntry.queries` registry). Every operator
    * invoked while `body` runs — on this thread — defaults to one fresh
    * managed scope, and every cache those operators created is released
    * when `body` finishes, whether it returns or throws:
    *
    * {{{
    * CacheScope.scoped {
    *   SparkEntry.queries("dd_ppjoin")(spark, dir).count()
    * } // all operator caches released here
    * }}}
    *
    * `body` must CONSUME its DataFrames (run the action inside the
    * block); a frame escaping the block would silently recompute
    * uncached. Thread-scoped (DynamicVariable): plans built on other
    * threads see their own ambient. */
  def scoped[A](body: => A): A = {
    val scope = new CacheScope
    try ambientVar.withValue(scope)(body) finally scope.release()
  }
}
