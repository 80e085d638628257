package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** BPE trainer cost-shape probe: times `Bpe.trainMerges` (one CORPUS scan
  * per round) against `Bpe.trainMergesHist` (ONE corpus scan total, merge
  * rounds over the word histogram) on the same data for the same number
  * of rounds, and asserts the trajectories agree. The histogram trainer's
  * wall-clock should stay near-flat as rounds grow while the corpus
  * trainer's grows with rounds x cumulative-merge replace chains.
  * Usage: runMain graft.BpeSoak <dir> <perRound> <rounds...>
  */
object BpeSoak {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BpeSoak <dir> <perRound> <rounds...>")
    val dir = args(0)
    val perRound = args(1).toInt
    val roundsList = args.drop(2).map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.t(spark, dir, "documents")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warmup both paths (codegen + JVM)
    graft.operators.Bpe.trainMerges(docs, col("text"), perRound, 1)
    graft.operators.Bpe.trainMergesHist(docs, col("text"), perRound, 1)
    roundsList.foreach { rounds =>
      val (mc, tCorpus) =
        time(graft.operators.Bpe.trainMerges(docs, col("text"), perRound, rounds))
      val (mh, tHist) =
        time(graft.operators.Bpe.trainMergesHist(docs, col("text"), perRound, rounds))
      require(mc == mh, s"trajectory diverged at rounds=$rounds")
      println(f"[bpesoak] rounds=$rounds%-3d merges=${rounds * perRound}%-4d " +
        f"corpus=${tCorpus}%7.2f s  hist=${tHist}%7.2f s  (trajectories equal)")
    }
    spark.stop()
  }
}
