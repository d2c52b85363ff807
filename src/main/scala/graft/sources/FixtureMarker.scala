package graft.sources

/** Cross-process reuse marker for derived fixture/state directories:
  * a completed build is stamped with a fingerprint of its source file
  * (version tag + size + mtime), so a later JVM (Verify after Bench,
  * or vice versa) reuses the directory instead of rebuilding, while
  * any testdata regeneration — or a version-tag bump when the build
  * recipe changes — forces a clean rebuild. ONE definition of the
  * discipline: the streamed-state fixtures (dedup admission, capped
  * sessions, media admission) all stamp through here, so a fix to the
  * fingerprint rule lands everywhere at once.
  *
  * Caveat the fingerprint inherits from `Files.size`: on a parquet
  * DIRECTORY the size is the directory entry, not the content — point
  * `srcFile` at a data FILE (the single-file testdata parquet), never
  * a directory.
  */
object FixtureMarker {

  private def markerPath(base: String): java.nio.file.Path =
    java.nio.file.Paths.get(s"$base/_COMPLETE")

  /** The source fingerprint: versionTag | size | mtime. */
  def fingerprint(srcFile: java.nio.file.Path,
      versionTag: String): String =
    versionTag + "|" + java.nio.file.Files.size(srcFile) + "|" +
      java.nio.file.Files.getLastModifiedTime(srcFile).toMillis

  /** When set ("1"), every marker reads as stale — measurement
    * harnesses (the Stress sweep) set this so `*_build` legs time a
    * REAL build at every scale instead of a ~0 s cross-process marker
    * no-op, which would make the fitted exponent meaningless. */
  val ForceProp = "graft.fixture.force"

  /** True iff `base` holds a completed build of exactly this source
    * (always false under [[ForceProp]]). */
  def reusable(base: String, fp: String): Boolean = {
    if (sys.props.get(ForceProp).contains("1")) return false
    val m = markerPath(base)
    java.nio.file.Files.exists(m) &&
      new String(java.nio.file.Files.readAllBytes(m), "UTF-8") == fp
  }

  /** Stamp a completed build (write LAST, after every state write). */
  def stamp(base: String, fp: String): Unit = {
    java.nio.file.Files.write(markerPath(base), fp.getBytes("UTF-8"))
    ()
  }
}
