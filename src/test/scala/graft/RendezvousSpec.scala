package graft

import org.apache.spark.sql.functions._
import graft.operators.Rendezvous

/** Rendezvous hashing: brute-force agreement, the minimal-disruption
  * law (removing a shard moves ONLY its keys), rough balance, and
  * determinism across partitionings.
  */
class RendezvousSpec extends SparkTestBase {

  private val shards = (0 until 8).map(i => s"s$i")

  private def md5score(id: Long, shard: String): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id|$shard".getBytes("UTF-8"))
    java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def brute(id: Long, pool: Seq[String]): String =
    pool.maxBy(sh => (md5score(id, sh), sh))

  test("assignment matches the brute-force HRW argmax") {
    import spark.implicits._
    val df = (1L to 300L).toDF("id")
    val got = Rendezvous.assign(df, "id", shards)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 300L).foreach { id =>
      assert(got(id) == brute(id, shards), s"id $id diverged")
    }
  }

  test("removing a shard moves only that shard's keys (minimal disruption)") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val full = Rendezvous.assign(df, "id", shards)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val without = Rendezvous.assign(df, "id", shards.filterNot(_ == "s3"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    full.foreach { case (id, sh) =>
      if (sh == "s3") assert(without(id) != "s3")
      else assert(without(id) == sh,
        s"id $id moved from $sh to ${without(id)} though s3 did not own it")
    }
    assert(full.values.exists(_ == "s3"), "s3 owned nothing — test is vacuous")
  }

  test("rough balance and partition-invariance") {
    import spark.implicits._
    val df = (1L to 800L).toDF("id")
    val counts = Rendezvous.assign(df, "id", shards)
      .groupBy("shard").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == shards.toSet, s"some shard owns nothing: $counts")
    // 800 keys over 8 shards: each should land within a loose 3x band
    counts.values.foreach(n => assert(n > 33 && n < 300, s"imbalance: $counts"))
    val again = Rendezvous.assign(df.repartition(13), "id", shards)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = Rendezvous.assign(df, "id", shards)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
    intercept[IllegalArgumentException](Rendezvous.shardOf(col("id"), Nil))
    intercept[IllegalArgumentException](
      Rendezvous.shardOf(col("id"), Seq("a", "a")))
  }
}
