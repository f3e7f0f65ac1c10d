package graft.util

import org.apache.spark.sql.DataFrame

/** Content-version fingerprints for cache keys.
  *
  * Every driver-side memo in the library (cached frames, trained
  * models, persisted index layouts, bucketed materializations) must be
  * keyed by the VERSION of its input data, not just its path: a corpus
  * regenerated in place at the same path must read as a different key,
  * or the memo serves results computed over the old bytes for the rest
  * of the session. The round-12 sf1 differential caught exactly this
  * class live (`llm_knn_ivf_persisted` served a stale persisted index
  * after an in-place 10× re-derivation), and the fix — a sorted
  * (file name, length, mtime) census of the input files, hashed — is
  * generalized here for every cache in the library.
  *
  * At warehouse scale this token is the table format's snapshot /
  * version id (Iceberg snapshot-id, Delta table version); for raw
  * parquet directories the file census is the same signal. mtimes have
  * second-or-better granularity on every filesystem we run on and
  * regeneration rewrites file NAMES anyway (Spark part-file UUIDs), so
  * the census collides only if nothing changed.
  */
object ContentToken {

  private def hash(sig: String): String =
    (scala.util.hashing.MurmurHash3.stringHash(sig).toLong & 0xffffffffL)
      .toHexString

  /** Census token of one file or directory tree (a table path). */
  def ofPath(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
      else Seq(f)
    hash(walk(new java.io.File(path))
      .sortBy(_.getPath)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|"))
  }

  /** Census token of every FILE INPUT of a frame's plan
    * (`Dataset.inputFiles`, stat'ed for length+mtime where local).
    * Frames with no file inputs (literal test data) hash to the token
    * of the empty census — their identity is carried entirely by the
    * plan's semantic hash, which the cache key also includes. */
  def ofFrame(df: DataFrame): String =
    hash(df.inputFiles.sorted.map { u =>
      val f =
        try {
          val uri = new java.net.URI(u)
          if (uri.getScheme == null) new java.io.File(u)
          else if (uri.getScheme == "file") new java.io.File(uri.getPath)
          else null
        } catch { case _: Throwable => null }
      if (f != null && f.exists) s"$u:${f.length}:${f.lastModified}" else u
    }.mkString("|"))
}
