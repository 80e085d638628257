package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Compute-once materialization of DERIVED artifacts (the near-dup
  * cluster table, the IVF index) to parquet, keyed by the source corpus
  * FILE's identity (qualified path + length + mtime) — a regenerated
  * testdata dir recomputes, `_SUCCESS` markers gate reuse (Spark writes
  * them last, so a crashed build rebuilds). This is the production
  * split: the artifact is computed by one nightly job and read by every
  * downstream consumer, so the consuming query's cost never re-pays the
  * build chain.
  *
  * The REGISTRY root is configurable (`spark.graft.artifacts.root` — a
  * warehouse path in production, `java.io.tmpdir` by default for the
  * test rig), and builds are serialized across JVMs by a lease file
  * (below), so two drivers sharing the registry can neither double-build
  * nor serve a partial artifact — on stores with an atomic
  * create-if-absent (the local scheme via NIO O_EXCL, HDFS-likes
  * natively); elsewhere the race window narrows to the one create call.
  * In-JVM racers additionally share a
  * per-dir monitor (cheaper than file polling; ConcurrencySpec pins the
  * 2-way cold race).
  *
  * Lease protocol (a `<dir>.lease` SIBLING file — outside the artifact
  * dir, because single-table artifacts overwrite their ROOT dir and a
  * lease stored inside would be deleted mid-build, silently reopening
  * the double-build window; content = a fresh UUID):
  *   1. markers all present → serve, no lease needed (markers are
  *      written LAST, so their presence proves a completed build).
  *   2. else try to create the lease atomically — O_EXCL via NIO on the
  *      local scheme (Hadoop's LocalFileSystem create-if-absent is
  *      exists-then-create, NOT atomic), the FileSystem's
  *      create(overwrite = false) elsewhere (atomic on HDFS-likes; on
  *      stores without an atomic create the window narrows to that
  *      call). The winner re-checks markers (the previous holder may
  *      have finished while we raced), builds, and deletes ONLY a lease
  *      still carrying its own UUID.
  *   3. losers poll: markers appearing → serve; lease vanishing →
  *      re-contend; lease older than `spark.graft.artifacts.leaseMs`
  *      (default 10 min) → presumed crashed builder. The steal is
  *      SINGLE-WINNER: the stealer RENAMES the stale lease to a unique
  *      tombstone (rename-if-source-exists is atomic where create is) —
  *      of two racing stealers exactly one rename succeeds, the loser
  *      re-contends against the winner's fresh lease, so a stealer can
  *      never delete another stealer's new lease. The TTL must exceed
  *      the slowest build: takeover of a LIVE builder would re-introduce
  *      the interleaved-overwrite hazard the lease exists to prevent; a
  *      crashed builder's partial writes are safely overwritten because
  *      no marker was committed.
  */
private[graft] object ArtifactCache {

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Registry root — `spark.graft.artifacts.root` (unset → tmpdir). */
  private def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.artifacts.root")
      .getOrElse(sys.props("java.io.tmpdir"))

  /** Stale-lease TTL — must exceed the slowest artifact build. */
  private def leaseTtlMs(s: SparkSession): Long =
    s.conf.getOption("spark.graft.artifacts.leaseMs")
      .map(_.toLong).getOrElse(600000L)

  /** Cache dir for the artifact `tag` derived from `table` at `sfDir`;
    * `build(dir)` runs (under the in-JVM lock AND the cross-JVM lease)
    * iff any of `markers` (dir-relative, e.g. "_SUCCESS" or
    * "postings/_SUCCESS") is missing.
    *
    * The key is a CONTENT summary of the source table's data files
    * (count + Σlength + Σmtime), not the directory's own status: a
    * directory mtime is not reliably bumped by an in-place rewrite of a
    * file inside it, and keying on it could serve a stale artifact.
    * Marker existence is checked through the CACHE dir's own FileSystem
    * — the registry may live on a different store (local tmpdir, hdfs)
    * than the source, and resolving markers against the source's FS
    * would look for them on the wrong store.
    */
  def dir(s: SparkSession, sfDir: String, table: String, tag: String,
      markers: Seq[String])(build: String => Unit): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new Path(s"$sfDir/$table.parquet")
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
    val d = root(s) + s"/graft_${tag}_cache_$hash"
    val cacheFs = new Path(d).getFileSystem(conf)
    def ready() = markers.forall(m => cacheFs.exists(new Path(s"$d/$m")))
    val lock = locks.computeIfAbsent(d, _ => new Object)
    lock.synchronized {
      if (!ready()) withLease(cacheFs, d, leaseTtlMs(s)) {
        if (!ready()) build(d)
      }
    }
    d
  }

  /** Run `body` holding `dir`'s cross-JVM build lease (see the protocol
    * in the object doc). Must be called under the in-JVM per-dir lock.
    */
  private def withLease(fs: FileSystem, dir: String, ttlMs: Long)(
      body: => Unit): Unit = {
    // SIBLING of the artifact dir: a root-overwriting build deletes the
    // dir itself, and a lease inside it would vanish mid-build
    val lease = new Path(s"$dir.lease")
    val token = java.util.UUID.randomUUID().toString
    fs.mkdirs(new Path(dir).getParent)
    // O_EXCL create on the local scheme — Hadoop's LocalFileSystem
    // create(overwrite=false) is exists-then-create and NOT atomic, but
    // java.nio's createFile is, and tmpdir is the default registry root
    def tryCreate(): Boolean =
      try {
        if (fs.getScheme == "file") {
          val nio = java.nio.file.Paths.get(lease.toUri.getPath)
          java.nio.file.Files.createFile(nio)
          java.nio.file.Files.write(nio, token.getBytes("UTF-8"))
        } else {
          val out = fs.create(lease, false)
          out.write(token.getBytes("UTF-8"))
          out.close()
        }
        true
      } catch { case _: java.io.IOException => false }
    var held = false
    while (!held) {
      if (tryCreate()) held = true
      else {
        val st =
          try Some(fs.getFileStatus(lease))
          catch { case _: java.io.FileNotFoundException => None }
        st match {
          case Some(fst)
              if System.currentTimeMillis() - fst.getModificationTime > ttlMs =>
            // presumed crashed builder — SINGLE-WINNER steal: rename the
            // stale lease to a unique tombstone (exactly one of two
            // racing stealers' renames succeeds; the loser re-contends
            // against the winner's fresh lease and can never delete it)
            val tomb = new Path(s"$dir.lease.$token.stale")
            if (fs.rename(lease, tomb)) fs.delete(tomb, false): Unit
          case Some(_) => Thread.sleep(200)
          case None    => // vanished between create and stat — re-contend
        }
      }
    }
    try body
    finally {
      // delete only OUR lease: a staler may have taken over if this
      // build outlived the TTL, and their lease must survive our exit
      val ours =
        try {
          val in = fs.open(lease)
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          in.close()
          n > 0 && new String(buf, 0, n, "UTF-8") == token
        } catch { case _: java.io.IOException => false }
      if (ours) fs.delete(lease, false): Unit
    }
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
      val fs = new Path(d).getFileSystem(s.sparkContext.hadoopConfiguration)
      stages.foreach { case (m, stage) =>
        if (!fs.exists(new Path(s"$d/$m"))) stage(d)
      }
    }

  /** The append-night GENERATION COUNTER: the next free generation under
    * `dir/sub` (hive layout `sub/gen=N`, committed = `_SUCCESS` present)
    * — 1 + the highest committed generation, 0 on a cold store. Nightly
    * appends call this instead of hard-coding gen numbers, so the SAME
    * append code serves night 1 on a fresh build, night N on an
    * append-only store, and night 1 again on a freshly compacted store
    * (whose history collapsed back to gen=0).
    */
  def nextGen(s: SparkSession, dir: String, sub: String): Int = {
    val p = new Path(s"$dir/$sub")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val gens = fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
        .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
        .map(_.getPath.getName.stripPrefix("gen=").toInt)
      if (gens.isEmpty) 0 else gens.max + 1
    }
  }
}
