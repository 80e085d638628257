package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — Thaler & Ravishankar,
  * IEEE/ACM ToN '98: route each key to the shard maximizing
  * score(key, shard) = h(key ‖ shard). The data-placement primitive
  * with MINIMAL DISRUPTION: adding or removing a shard moves ONLY the
  * keys that shard wins/owned (≈ n/m keys), where a mod-m bucket scheme
  * reshuffles nearly everything. The standard router for embedding
  * shards, cache tiers and per-shard index files in a serving stack —
  * and, in a training pipeline, the stable doc→worker assignment that
  * survives fleet resizes without re-downloading the corpus.
  *
  * Deterministic and engine-portable by the repo's md5 contract: the
  * score is the first-8-hex md5 of "key|shard" (a 32-bit integer), so
  * any engine reproduces the full assignment (q_rendezvous re-derives
  * it in DuckDB). Ties (32-bit score collisions) break to the
  * lexicographically LARGEST shard name — fixed and documented.
  *
  * Shape at 100 TB: one per-row expression computing |shards| hashes
  * and an in-expression argmax — rides the scan, nothing shuffles, no
  * lookup table anywhere. |shards| is the fleet size (bounded); for
  * thousand-shard fleets precompute per-shard literals once per plan,
  * exactly as here.
  */
object Rendezvous {

  /** The winning shard for `key` among `shards` (non-empty, distinct). */
  def shardOf(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      s"shards must be non-empty and distinct: $shards")
    val scored = array(shards.map(sh =>
      struct(
        conv(substring(md5(concat(key.cast("string"), lit("|" + sh))), 1, 8),
          16, 10).cast("long").as("score"),
        lit(sh).as("shard"))): _*)
    // struct max compares (score, shard) lexicographically: highest
    // score wins, score ties to the largest shard name
    array_max(scored).getField("shard")
  }

  /** Assign every row: input columns + `shard`. */
  def assign(df: DataFrame, idCol: String, shards: Seq[String]): DataFrame =
    df.withColumn("shard", shardOf(col(idCol), shards))
}
