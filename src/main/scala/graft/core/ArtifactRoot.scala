package graft.core

import org.apache.spark.sql.SparkSession

/** One tmpdir artifact root per SESSION for queries that materialize
  * real files mid-plan (saved ANN indexes, shard layouts, rollup
  * ledgers, format round-trips, schema generations).
  *
  * Why per-session: the pre-r19 convention was a FIXED per-sfDir path
  * (`graft_<family>_<sf>`), which let any two concurrent sessions on
  * the same dataset overwrite part files under each other's open
  * reads — a lazily-evaluated file-backed frame then reads a sibling's
  * half-written artifact (the r18 verdict's latent-race finding on the
  * saved-index family; every other fixed-path writer shared the same
  * hazard). A random per-session root closes the window across
  * sessions AND JVMs while keeping the per-dataset suffix (a census
  * must never read another scale's artifacts).
  *
  * Lifecycle: the root is created lazily on first use per session; a
  * JVM shutdown hook deletes the tree best-effort (artifacts are
  * small-scale: codebooks, shard summaries, ledgers). The map entry is
  * dropped when the owning context ends; [[evict]] exists for
  * session-level teardown under a shared context (`newSession` pools),
  * mirroring `Similarity.evictKnnMemo`.
  */
object ArtifactRoot {
  private val roots =
    scala.collection.concurrent.TrieMap[SparkSession, String]()
  private val hooked =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** The session's artifact path for `family` on dataset `d`, e.g.
    * `/tmp/graft_artifacts_3f.../c13_shards__root_testdata_sf0_01`.
    * Stable within a session (memoized root), unique across sessions. */
  def path(s: SparkSession, family: String, d: String): String = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            evict(s)
        })
    }
    val root = roots.getOrElseUpdate(s, {
      val dir =
        java.nio.file.Files.createTempDirectory("graft_artifacts_").toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
          f.delete(); ()
        }
        rm(dir)
      }))
      dir.getAbsolutePath
    })
    root + "/" + family + "_" + d.replaceAll("[^A-Za-z0-9]", "_")
  }

  /** Drop the session's root mapping (files are reclaimed by the JVM
    * shutdown hook). A later [[path]] call allocates a fresh root. */
  def evict(s: SparkSession): Unit = {
    roots.remove(s)
    hooked.remove(s)
    ()
  }
}
