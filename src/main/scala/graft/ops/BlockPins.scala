package graft.ops

import org.apache.spark.sql.SparkSession

/** Registry of persistent-RDD ids that must OUTLIVE a single query
  * invocation, plus a sweeper that releases everything else.
  *
  * Why this exists: most registered queries cap lineage with
  * `localCheckpoint()` (the right call inside an iterative or
  * multi-consumer plan), but a checkpoint's blocks stay pinned in the
  * block manager until explicitly unpersisted. One invocation leaks a
  * few MB; a bench run of 4 passes x 300+ queries in ONE session
  * accumulated thousands of dead block sets and degraded late-position
  * invocations 3-12x (r14 verdict, "What's wrong #1"). On a real
  * cluster the same leak evicts hot cache blocks and pressures
  * executor storage memory for the lifetime of the application.
  *
  * The ONLY blocks that legitimately survive an invocation are the
  * per-(appId, corpus) memo tables (TextQueries.sharedPairs /
  * bm25Stats, GrapheneQueries.sharedEdges) — a production pipeline
  * materializes those once per corpus snapshot and serves every
  * downstream consumer from them. Memo builders wrap their
  * materialization in [[pinning]]; harness loops (Bench/Verify) call
  * [[sweep]] after each invocation to release everything unpinned.
  */
object BlockPins {
  private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Run `body` (which materializes one or more persistent RDDs —
    * localCheckpoint or cache) and pin every persistent-RDD id it
    * created, so [[sweep]] leaves them resident.
    */
  def pinning[T](s: SparkSession)(body: => T): T = {
    val before = s.sparkContext.getPersistentRDDs.keySet
    val v = body
    val after = s.sparkContext.getPersistentRDDs.keySet
    (after -- before).foreach(id => ids.add(id))
    v
  }

  /** Ids pinned so far (memo-owned blocks). */
  def pinned: Set[Int] = {
    import scala.jdk.CollectionConverters._
    ids.asScala.toSet
  }

  /** Unpersist every persistent RDD not pinned and not in `alsoKeep`
    * (a harness baseline snapshot — e.g. fixture-era caches that were
    * already resident before the query loop started). Non-blocking:
    * the block manager releases asynchronously, which is enough to
    * keep storage flat across a long loop.
    */
  def sweep(s: SparkSession, alsoKeep: Set[Int] = Set.empty): Unit = {
    val keep = pinned ++ alsoKeep
    s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keep.contains(id)) rdd.unpersist(blocking = false)
    }
  }

  /** Quiet the per-RDD "locally checkpointed ... cannot be recomputed"
    * WARN that every sweep of a discarded checkpoint emits — a harness
    * loop sweeps thousands of them by design, and the flood would bury
    * the real diagnostics in the captured log tail.
    */
  def quietSweepLogs(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

  /** Total bytes (memory + disk) currently held by persistent RDD
    * blocks — the storage breadcrumb the bench records per invocation
    * so a future degradation is attributed by measurement.
    */
  def storageBytes(s: SparkSession): Long =
    s.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum
}
