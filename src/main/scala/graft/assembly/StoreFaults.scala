package graft.assembly

/** Fault-injection seam for the incremental stores' write boundaries.
  *
  * Every table write of the sharded stores ([[IncrementalReadonly]],
  * [[IncrementalBelief]], [[IncrementalOntologyEdges]]) passes through
  * [[ShardedStore.append]] / [[ShardedStore.overwriteShards]], which call
  * `onWrite("db.table")` immediately BEFORE the write. The crash-safety
  * contract of those stores — an at-least-once replay after a crash
  * between ANY two writes heals to the same state as a clean run — is
  * only testable if a test can actually crash between two writes; the
  * soak spec installs a countdown hook here and kills the micro-batch at
  * randomized boundaries. Production never touches this: the default is
  * a no-op and the call costs one volatile read per table write (the
  * stores write a handful of tables per BATCH, not per row).
  */
object StoreFaults {

  /** Exception type the injector throws, so tests can tell an injected
    * crash from a genuine failure in a foreachBatch cause chain. */
  final class InjectedCrash(site: String)
    extends RuntimeException(s"injected crash before write of $site")

  @volatile private var hook: String => Unit = _ => ()

  /** Called by every store write site ([[ShardedStore]]; also the dedup
    * index's [[graft.operators.Dedup.appendIndex]] table appends). */
  private[graft] def onWrite(site: String): Unit = hook(site)

  /** Arm: crash immediately before the `n`-th store write from now
    * (1-based); disarms itself after throwing. `n` larger than the run's
    * write count means no crash. */
  def armCrashAt(n: Int): Unit = {
    val remaining = new java.util.concurrent.atomic.AtomicInteger(n)
    hook = site =>
      if (remaining.decrementAndGet() == 0) {
        disarm()
        throw new InjectedCrash(site)
      }
  }

  def disarm(): Unit = hook = _ => ()
}
