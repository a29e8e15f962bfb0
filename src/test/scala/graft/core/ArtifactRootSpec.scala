package graft.core

import graft.SparkSuite

/** Contract of the session-unique artifact root every
  * file-materializing query family writes under (the r19 replacement
  * for fixed per-sfDir tmp paths, which raced across sessions):
  *   1. the path is STABLE within a session (an artifact written at
  *      plan-construction time must be re-readable later in the same
  *      session) and carries the family + dataset suffix (a census
  *      must never read another scale's artifacts);
  *   2. two sessions get DISJOINT roots — the overwrite-under-open-read
  *      race is closed by construction, not by sequencing;
  *   3. eviction releases the root: a later call allocates a fresh one
  *      (session teardown under a shared context), while the old
  *      directory stays on disk until the JVM shutdown hook (frames
  *      still lazily reading it must not break).
  */
class ArtifactRootSpec extends SparkSuite {

  test("path is stable within a session and keyed by family + dataset") {
    val a = ArtifactRoot.path(spark, "famA", "/data/sf1")
    assert(a == ArtifactRoot.path(spark, "famA", "/data/sf1"),
      "same (session, family, dataset) must resolve to the same path")
    assert(a != ArtifactRoot.path(spark, "famB", "/data/sf1"),
      "families must not share a directory")
    assert(a != ArtifactRoot.path(spark, "famA", "/data/sf2"),
      "datasets must not share a directory")
    assert(a.endsWith("famA__data_sf1"),
      s"path must carry the sanitized family+dataset suffix, got $a")
  }

  test("two sessions get disjoint roots — the cross-session race is structural") {
    val other = spark.newSession()
    val mine = ArtifactRoot.path(spark, "fam", "/data/sf1")
    val theirs = ArtifactRoot.path(other, "fam", "/data/sf1")
    assert(mine != theirs,
      "same family+dataset in two sessions must NOT collide")
    ArtifactRoot.evict(other)
  }

  test("evict releases the root: fresh allocation, old directory untouched") {
    val before = ArtifactRoot.path(spark, "fam", "/data/sf1")
    val dir = new java.io.File(before).getParentFile
    dir.mkdirs() // materialize the root as a writer would
    assert(dir.exists())
    ArtifactRoot.evict(spark)
    val after = ArtifactRoot.path(spark, "fam", "/data/sf1")
    assert(after != before, "post-eviction call must allocate a fresh root")
    assert(dir.exists(),
      "eviction must not delete the old root — open lazily-read frames " +
        "may still reference it (the JVM shutdown hook reclaims it)")
    ArtifactRoot.evict(spark)
  }
}
