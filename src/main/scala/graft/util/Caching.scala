package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Size-aware persist policy for operators whose plans read an
 * intermediate several times (postings self-joins, grid/slot
 * interpolation, LSH banding).
 *
 * Persisting is the right call at scale — recomputing a 100 TB scan
 * three times is catastrophic — but each persist is also a
 * materialization barrier plus storage-memory traffic, which at small
 * inputs costs more than the recompute it avoids (and dozens of leaked
 * cached intermediates crowd the storage pool over a long session).
 * So: consult the optimizer's size estimate (rooted in parquet scan
 * statistics) and persist only when the intermediate is big enough
 * that recompute dominates. Both regimes keep identical results —
 * this trades only where time is spent.
 *
 * Applicability: ONLY for intermediates whose recompute cost is
 * byte-bound (scans, windowed point tables, plain aggregations). For
 * CPU-dense recomputes the bytes estimate undercounts — an exploded
 * postings table inherits its parent's scan size while carrying a
 * per-shingle hash, and a 60-bit vote aggregation is heavy per input
 * byte — and self-joins amplify the miss on both sides; those sites
 * (graft.pipeline.Dedup) persist unconditionally.
 */
object Caching {

  /** Below this estimated size, recompute beats the persist barrier.
    * 256 MB ≈ a couple of seconds of scan on one executor — around the
    * cost a persist barrier itself introduces on a busy cluster. */
  val RECOMPUTE_CHEAP_BYTES: Long = 256L * 1024 * 1024

  /** Persist `df` (MEMORY_AND_DISK — spill, never recompute) when the
    * optimizer estimates it larger than `thresholdBytes`; otherwise
    * return it unpersisted and let the branches recompute. */
  def maybePersist(df: DataFrame,
                   thresholdBytes: Long = RECOMPUTE_CHEAP_BYTES): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > thresholdBytes) df.persist(StorageLevel.MEMORY_AND_DISK)
    else df
  }

  private val owned = scala.collection.concurrent.TrieMap
    .empty[(String, org.apache.spark.sql.SparkSession), Seq[DataFrame]]

  /** Persist caller-invisible intermediates under an owner key,
    * releasing the PREVIOUS generation registered under the same key —
    * the same replace-style cleanup Engine.resultCache uses. This
    * bounds a long session's leaked caches to one generation per
    * operator while keeping the returned plan fully lazy (no eager
    * materialization barrier, one action runs the whole DAG). The
    * previous generation's DataFrames recompute if still referenced —
    * a documented tradeoff, not a correctness hazard. Keyed per
    * session (concurrent sessions must not clobber each other); the
    * unpersist is best-effort because the previous generation's
    * session may already be stopped. */
  def persistOwned(owner: String, dfs: DataFrame*): Seq[DataFrame] = {
    // Drop generations pinned to sessions that have since stopped —
    // their cached blocks are already gone, but the map entry would
    // otherwise keep the dead session's plan graph reachable forever
    // in a JVM that cycles many sessions.
    owned.keys.foreach { k =>
      if (k._2.sparkContext.isStopped) owned.remove(k)
    }
    val persisted = dfs.map(_.persist(StorageLevel.MEMORY_AND_DISK))
    dfs.headOption.foreach { head =>
      owned.put((owner, head.sparkSession), persisted)
        .foreach(_.foreach(releaseOne))
    }
    persisted
  }

  /**
   * Register ALREADY-materialized frames (localCheckpoint results)
   * under an owner key with the same generation-bounded release as
   * [[persistOwned]]. A checkpoint's blocks are RDD-persisted, not
   * CacheManager-registered, so Dataset.unpersist is a no-op on them;
   * release goes through the wrapped RDD. Unlike a persist, a released
   * checkpoint CANNOT recompute (its blocks are its only lineage) —
   * owners must be call sites whose previous generation is dead by the
   * time the next is built (sequential query execution).
   */
  def ownMaterialized(owner: String, dfs: DataFrame*): Unit = {
    owned.keys.foreach { k =>
      if (k._2.sparkContext.isStopped) owned.remove(k)
    }
    dfs.headOption.foreach { head =>
      owned.put((owner, head.sparkSession), dfs)
        .foreach(_.foreach(releaseOne))
    }
  }

  private def releaseOne(df: DataFrame): Unit = scala.util.Try {
    df.unpersist(false)
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Release every operator-owned cache generation (session teardown). */
  def releaseOwned(): Unit = {
    owned.values.foreach(_.foreach(releaseOne))
    owned.clear()
  }
}
