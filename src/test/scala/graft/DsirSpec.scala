package graft

import org.apache.spark.sql.functions._

/** DSIR importance weighting: the score must separate target-like text
  * from the rest, emit every input row, and be a pure function of the
  * corpus content (partitioning-invariant).
  */
class DsirSpec extends SparkTestBase {

  import graft.operators.Dsir

  // two disjoint vocabularies: "target-ish" docs reuse the target's
  // words, "other" docs never do
  private def corpus = {
    import spark.implicits._
    ((1 to 20).map(i => (i.toLong, s"alpha beta gamma delta alpha beta g$i", "t")) ++
      (21 to 40).map(i => (i.toLong, s"zulu yankee xray whiskey zulu x$i", "o")))
      .toDF("id", "text", "kind")
  }

  test("target-vocabulary docs outscore off-target docs") {
    val target = corpus.filter(col("kind") === "t").select("id", "text")
    val byKind = Dsir.importanceWeights(corpus, target, "id", "text")
      .join(corpus.select("id", "kind"), "id")
      .groupBy("kind").agg(avg(col("logw_micro") / col("n_grams")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byKind("t") > byKind("o") + 100000,
      s"per-gram weight must separate target from off-target: $byKind")
  }

  test("every row is emitted; gram-less docs score zero") {
    import spark.implicits._
    val raw = Seq((1L, "alpha beta"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val got = Dsir.importanceWeights(raw, raw.limit(1), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got(1) == ((2L, 0L, 0L)) && got(2) == ((3L, 0L, 0L)),
      s"empty/whitespace docs must emit (0 grams, 0 weight): ${got.toSeq}")
    // 2 tokens -> 2 unigrams + 1 bigram
    assert(got(0)._2 == 3L, s"gram count: ${got(0)}")
  }

  test("scores are partitioning-invariant") {
    val target = corpus.filter(col("kind") === "t").select("id", "text")
    val a = Dsir.importanceWeights(corpus, target, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = Dsir.importanceWeights(corpus.repartition(7), target.repartition(3),
        "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b)
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(corpus, target, "id", "text", buckets = 0))
  }
}
