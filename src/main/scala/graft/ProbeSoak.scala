package graft

import org.apache.spark.sql.SparkSession

/** Calibration-probe convergence probe (dev tool): runs the bench's two
  * fixed-work machine-speed probes N times each in one JVM and prints
  * every reading, so the warm-up curve — how many executions until the
  * reading plateaus on THIS hardware — is observable directly. Round-17
  * motivation: on a fast machine the 400M-row probe finishes in ~0.1 s,
  * where per-job fixed overhead (scheduling, codegen cache, JIT tiers)
  * is a large share of the reading and decays with JVM age — the
  * pre/post brackets then disagree for reasons that are neither machine
  * drift nor code change. Usage: runMain graft.ProbeSoak [n]
  */
object ProbeSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(15)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probe(rows: Long): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, rows, 1L, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id))")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println("[probesoak] calib (400M):")
    val c = (1 to n).map(i => { val s = probe(400000000L); println(f"  $i%2d: $s%.3f"); s })
    println("[probesoak] calib_mc (4.8B):")
    val m = (1 to n).map(i => { val s = probe(4800000000L); println(f"  $i%2d: $s%.3f"); s })
    println(f"[probesoak] calib min=${c.min}%.3f last3min=${c.takeRight(3).min}%.3f  " +
      f"mc min=${m.min}%.3f last3min=${m.takeRight(3).min}%.3f")
    spark.stop()
  }
}
