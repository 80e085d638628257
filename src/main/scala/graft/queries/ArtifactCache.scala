package graft.queries

import org.apache.spark.sql.SparkSession

/** Compute-once materialization of DERIVED artifacts (the near-dup
  * cluster table, the IVF index) to parquet, keyed by the source corpus
  * FILE's identity (qualified path + length + mtime) — a regenerated
  * testdata dir recomputes, `_SUCCESS` markers gate reuse (Spark writes
  * them last, so a crashed build rebuilds). This is the production
  * split: the artifact is computed by one nightly job and read by every
  * downstream consumer, so the consuming query's cost never re-pays the
  * build chain.
  *
  * In-JVM builds are serialized per cache dir: two queries racing the
  * same cold cache would otherwise interleave `mode("overwrite")` writes
  * into one path (ConcurrencySpec pins the 2-way cold race). Cross-JVM
  * races are out of scope, like the bench rig's same-query drains
  * (SCALE.md's documented-contract list).
  */
private[queries] object ArtifactCache {

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Cache dir for the artifact `tag` derived from `table` at `sfDir`;
    * `build(dir)` runs (under the dir's lock) iff any of `markers`
    * (dir-relative, e.g. "_SUCCESS" or "postings/_SUCCESS") is missing.
    *
    * The key is a CONTENT summary of the source table's data files
    * (count + Σlength + Σmtime), not the directory's own status: a
    * directory mtime is not reliably bumped by an in-place rewrite of a
    * file inside it, and keying on it could serve a stale artifact.
    * Marker existence is checked through the CACHE dir's own FileSystem
    * — the cache lives under local java.io.tmpdir while the source may
    * be hdfs/s3, and resolving markers against the source's FS would
    * look for them on the wrong store.
    */
  def dir(s: SparkSession, sfDir: String, table: String, tag: String,
      markers: Seq[String])(build: String => Unit): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
    val srcFs = src.getFileSystem(conf)
    var nFiles = 0L
    var sumLen = 0L
    var sumMtime = 0L
    val it = srcFs.listFiles(src, true)
    while (it.hasNext) {
      val st = it.next()
      nFiles += 1
      sumLen += st.getLen
      sumMtime += st.getModificationTime
    }
    val key = s"${srcFs.makeQualified(src)}|$nFiles|$sumLen|$sumMtime"
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = sys.props("java.io.tmpdir") + s"/graft_${tag}_cache_$hash"
    val cacheFs = new org.apache.hadoop.fs.Path(d).getFileSystem(conf)
    val lock = locks.computeIfAbsent(d, _ => new Object)
    lock.synchronized {
      if (!markers.forall(m =>
          cacheFs.exists(new org.apache.hadoop.fs.Path(s"$d/$m")))) build(d)
    }
    d
  }

  /** Staged build — the append-lifecycle extension of [[dir]]: each
    * `(marker, stage)` runs IN ORDER, and only when its own marker is
    * missing, so an APPEND stage (a new index generation) re-runs
    * without repeating the complete base build — the marker protocol
    * distinguishes "append pending" from "cold cache". Every stage must
    * be overwrite-idempotent into its OWN subdirectory (its generation):
    * a stage crashed mid-write re-runs by overwriting only what it owns,
    * so it can neither duplicate rows (the in-place mode-append hazard)
    * nor trigger a spurious full rebuild.
    */
  def staged(s: SparkSession, sfDir: String, table: String, tag: String,
      stages: Seq[(String, String => Unit)]): String =
    dir(s, sfDir, table, tag, stages.map(_._1)) { d =>
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      stages.foreach { case (m, stage) =>
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$d/$m"))) stage(d)
      }
    }
}
