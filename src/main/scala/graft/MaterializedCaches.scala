package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** A (session, sfDir)-keyed cache of a materialized shared input (a
  * persisted DataFrame computed once and consumed by several queries).
  *
  * Staleness caveat: entries are keyed by path, not by file content — if
  * the parquet files under an sfDir are rewritten while a JVM holds a
  * cached entry, consumers keep reading the persisted stale blocks until
  * [[MaterializedCaches.invalidateAll]] (or [[clear]]) is called. Tools
  * and tests that rewrite inputs must invalidate first; long-lived
  * multi-session apps should invalidate when retiring a session so the
  * strong session references and their storage blocks are released.
  */
final class DfCache(val name: String) {
  private val m = TrieMap.empty[(SparkSession, String), DataFrame]
  MaterializedCaches.register(this)

  def getOrElseUpdate(key: (SparkSession, String), compute: => DataFrame): DataFrame =
    m.getOrElseUpdate(key, compute)

  private[graft] def dfs: Seq[DataFrame] = m.values.toSeq

  /** Unpersist every cached block and drop all entries (incl. the strong
    * SparkSession references).
    */
  def clear(): Unit = {
    m.values.foreach(df => try df.unpersist(blocking = false) catch { case _: Exception => () })
    m.clear()
  }
}

/** Registry of every [[DfCache]] in the engine, so one call releases all
  * materialized shared inputs (see the staleness caveat on [[DfCache]]).
  */
object MaterializedCaches {
  private val all = TrieMap.empty[String, DfCache]

  private[graft] def register(c: DfCache): Unit = all.put(c.name, c)

  /** Unpersist and forget every cached shared input across all modules. */
  def invalidateAll(): Unit = all.values.foreach(_.clear())

  private[graft] def registered: Seq[String] = all.keys.toSeq.sorted

  /** Every DataFrame currently held by any [[DfCache]] — the protected
    * set for the bench's between-queries storage janitor.
    */
  private[graft] def allDfs: Seq[DataFrame] = all.values.flatMap(_.dfs).toSeq
}

/** JVM-lifetime registry of temporary on-disk artifacts (the materialized
  * IVF-PQ index, the month-partitioned orders layout): [[create]] returns
  * a fresh temp directory AND registers it for recursive deletion by a
  * single shutdown hook, so repeated short-lived runs (tests, bench
  * iterations, the verify driver) do not accumulate orphaned index
  * directories in /tmp. `deleteOnExit` alone cannot do this — it deletes
  * only empty directories and would need every future file pre-registered.
  */
object TempArtifacts {
  private val dirs = TrieMap.empty[String, Unit]

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    dirs.keys.foreach { d =>
      try {
        val p = Path.of(d)
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
      } catch { case _: Exception => () } // best-effort: never fail shutdown
    }
  }, "graft-temp-artifacts-cleanup"))

  /** A fresh temp directory, registered for deletion at JVM exit. */
  def create(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs.put(d, ())
    d
  }
}
