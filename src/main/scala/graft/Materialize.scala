package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Strategy-selectable eager materialization for shared subplans
  * (subplans feeding both sides of a self-join, or iterative state).
  *
  * Why eager + lineage-truncating at all: a lazy .cache() is not
  * enough — join sides materialize concurrently and each computes the
  * full subplan (in-flight work isn't deduped), and AQE broadcast-build
  * stages sometimes recompute the cache child through a 1-task
  * coalesced exchange (see Dedup's original notes).
  *
  * Why a strategy switch: `localCheckpoint` blocks are unreplicated
  * and lineage is gone, so on a multi-executor cluster an executor
  * loss makes the query unrecoverable. The single-JVM bench wants
  * exactly that (fastest, zero replication); a cluster deployment
  * picks a recoverable flavor with ONE conf:
  *
  *   spark.graft.materialize = local      (default; single-JVM bench)
  *                           | replicated (persist MEMORY_AND_DISK_2 +
  *                                         eager count — survives one
  *                                         executor loss)
  *                           | checkpoint (reliable checkpoint to
  *                                         sc.setCheckpointDir — survives
  *                                         any loss; pay HDFS writes)
  *
  * All flavors preserve the child's output partitioning, which
  * iterative operators (d_components) rely on to pre-partition their
  * static join side once.
  */
object Materialize {

  val ConfKey = "spark.graft.materialize"

  /** Truncated frame → its persisted backing frame, so release() can
    * drop the blocks (the truncated view is not itself in the cache
    * manager). Weak keys: frames the caller dropped get collected.
    */
  private val persistedOf = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, DataFrame]())

  def forceCached(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "local" => df.localCheckpoint(eager = true)
      case "replicated" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        p.count() // eager: consumers read blocks, never the lineage
        // LINEAGE must still be cut (a LogicalRDD leaf over the
        // executed plan): without it, iterative supersteps nest their
        // unions into an exponentially growing logical plan and the
        // driver heap dies at ~15 supersteps — persist alone is not a
        // plan barrier. The leaf's RDD keeps its own DAG + replicated
        // storage, so executor-loss recovery is intact.
        val t = org.apache.spark.sql.GraftShim.truncateLineage(p)
        persistedOf.put(t, p)
        t
      case "checkpoint" => df.checkpoint(eager = true)
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be local|replicated|checkpoint, got '$other'")
    }

  /** Release a frame a previous forceCached produced, for iterative
    * loops that re-materialize state every superstep — the caller
    * asserts the frame is never read again. Under `replicated` the
    * superseded persisted blocks would otherwise accumulate across
    * supersteps (2 copies each); under `local` the superseded
    * localCheckpoint blocks are dropped eagerly (they would otherwise
    * sit in the block store until the RDD is GC'd); reliable
    * `checkpoint` files live on disk and need no release.
    *
    * The never-read-again contract is a trap if violated under
    * `local`: the localCheckpoint RDD's lineage is truncated, so a
    * later read dies with an opaque
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Every local release is
    * therefore LEDGERED (bounded map, RDD id → caller site) so the
    * post-mortem question "who released rdd N?" is answerable via
    * [[releaseSiteOf]]; with `spark.graft.materialize.debugReleases`
    * = true each release also logs its site eagerly.
    */
  def release(df: DataFrame): Unit =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "replicated" =>
        Option(persistedOf.remove(df)).foreach(_.unpersist(blocking = false))
      case "local" =>
        org.apache.spark.sql.GraftShim.unpersistLeaves(df)
          .foreach(recordRelease(df, _))
      case _ => ()
    }

  /** Conf key: log each local release's call site eagerly. */
  val DebugConfKey = "spark.graft.materialize.debugReleases"

  private val releasedSites = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Int, String](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, String]): Boolean = size() > 256
    })

  /** Where (call site) the given leaf RDD id was released, if a local
    * release ledgered it recently — the first thing to check when a
    * job fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on rdd N.
    */
  def releaseSiteOf(rddId: Int): Option[String] =
    Option(releasedSites.get(rddId))

  private def recordRelease(df: DataFrame, rddId: Int): Unit = {
    val site = Thread.currentThread.getStackTrace.iterator
      .map(_.toString)
      .filterNot(f => f.startsWith("java.") || f.contains("Materialize") ||
        f.contains("getStackTrace"))
      .take(4).mkString(" <- ")
    releasedSites.put(rddId, site)
    if (df.sparkSession.conf.get(DebugConfKey, "false").toBoolean)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .info(s"graft.Materialize.release: dropped leaf rdd $rddId at $site")
  }
}
