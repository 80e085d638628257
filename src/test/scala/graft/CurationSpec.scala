package graft

import org.apache.spark.sql.functions._

/** The composed curation manifest (q_curation_manifest): all three
  * stages are id-set filters, so the manifest must equal the
  * INTERSECTION of the standalone oracled queries' keep-sets — if any
  * stage's semantics drifted from its standalone query, this breaks.
  */
class CurationSpec extends SparkTestBase {

  test("q_curation_manifest == intersection of the gate / dedup / decontam keep-sets") {
    val docs = Tables.t(spark, sf, "documents")
    val manifest = SparkEntry.queries("q_curation_manifest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(manifest.nonEmpty, "empty manifest — gates dropped everything")
    // standalone keep-sets, each from its own oracled query
    val gate = graft.operators.TextAnalysis.gopherGates(col("text"))
      .map(_._2).reduce(_ && _)
    val gated = docs.filter(col("source") =!= "src0").filter(gate)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dedupKept = SparkEntry.queries("q_dedup_apply")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val cleanKept = SparkEntry.queries("q_decontaminate")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val expect = gated.intersect(dedupKept).intersect(cleanKept)
    assert(manifest.map(_._1).toSet == expect,
      "manifest diverges from the intersection of the standalone keep-sets")
    // each kept row carries its true source, and src0 never leaks in
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    manifest.foreach { case (id, src) =>
      assert(src == srcOf(id) && src != "src0")
    }
    // cache protocol: a second invocation serves the artifact, no rewrite
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val markers = tmp.listFiles()
      .filter(_.getName.startsWith("graft_manifest_cache_"))
      .map(c => new java.io.File(c, "_SUCCESS")).filter(_.exists())
    assert(markers.nonEmpty, "no materialized manifest found")
    val before = markers.map(m => m.getAbsolutePath -> m.lastModified()).toMap
    val again = SparkEntry.queries("q_curation_manifest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSeq == manifest.toSeq)
    markers.foreach { m =>
      assert(m.lastModified() == before(m.getAbsolutePath),
        s"manifest ${m.getParent} was rebuilt on a cache hit")
    }
  }

  test("q_curation_manifest_incr (append-maintained clusters) == q_curation_manifest (full rebuild)") {
    // gates and decontam commute with an append per-doc; incremental ==
    // full for the cluster table is the frozen-LSH law — so the two
    // manifests must be row-identical
    val full = SparkEntry.queries("q_curation_manifest")(spark, sf)
      .collect().map(_.toString).toSeq
    val incr = SparkEntry.queries("q_curation_manifest_incr")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(incr == full, "append-maintained manifest drifted from the full rebuild")
  }

  test("q_curation_manifest_delta == the frozen-bench recipe recomputed from scratch; losers are monotone under merges") {
    val docs = Tables.t(spark, sf, "documents")
    val delta = SparkEntry.queries("q_curation_manifest_delta")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // from-scratch recompute of the SAME recipe: gates over everything,
    // full-corpus near-dup losers, decontam against the FROZEN benchmark
    // (src0 ∩ base slice) — no stored verdict reused
    val gate = graft.operators.TextAnalysis.gopherGates(col("text"))
      .map(_._2).reduce(_ && _)
    val gated = docs.filter(col("source") =!= "src0").filter(gate)
    val dedupKept = SparkEntry.queries("q_dedup_apply")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val frozenBench = docs.filter(col("source") === "src0")
      .filter(col("doc_id") % 4 =!= 3)
    val cleanKept = graft.operators.Decontaminate
      .decontaminate(gated, frozenBench, "doc_id", "text", n = 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = gated.select("doc_id").collect().map(_.getLong(0)).toSet
      .intersect(dedupKept).intersect(cleanKept)
    assert(delta.map(_._1) == expect,
      "delta manifest diverges from the from-scratch frozen-bench recipe")
    // the identity's load-bearing lemma: a base loser never becomes a
    // rep after the merge (min ids only decrease)
    val sh = graft.operators.Dedup.shinglesHashed(col("text"), 5)
    val base = docs.filter(col("doc_id") % 4 =!= 3)
    def losersOf(df: org.apache.spark.sql.DataFrame) = {
      val pairs = graft.operators.Dedup.minHashPairsHashed(df, "doc_id", sh,
        threshold = 0.7, k = 126, bands = 21)
      graft.operators.Dedup.resolveClusters(pairs, "id_a", "id_b")
        .filter(col("v") =!= col("cluster_rep"))
        .select("v").collect().map(_.getLong(0)).toSet
    }
    val lb = losersOf(base)
    val lf = losersOf(docs)
    assert(lb.subsetOf(lf), "a base loser became a rep after the merge")
  }

  test("q_curation_manifest_delta2: verdicts rolled forward TWICE == the frozen-bench recipe from scratch") {
    val docs = Tables.t(spark, sf, "documents")
    val delta2 = SparkEntry.queries("q_curation_manifest_delta2")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // from-scratch recompute, benchmark frozen at the NIGHT-0 slice
    // (doc_id % 4 < 2): gates over everything, full-corpus near-dup
    // losers, decontam vs the frozen bench — no rolled verdict reused
    val gate = graft.operators.TextAnalysis.gopherGates(col("text"))
      .map(_._2).reduce(_ && _)
    val gated = docs.filter(col("source") =!= "src0").filter(gate)
    val dedupKept = SparkEntry.queries("q_dedup_apply")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val frozenBench = docs.filter(col("source") === "src0")
      .filter(col("doc_id") % 4 < 2)
    val cleanKept = graft.operators.Decontaminate
      .decontaminate(gated, frozenBench, "doc_id", "text", n = 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = gated.select("doc_id").collect().map(_.getLong(0)).toSet
      .intersect(dedupKept).intersect(cleanKept)
    assert(delta2.map(_._1) == expect,
      "delta-of-delta manifest diverges from the from-scratch frozen-bench recipe")
    // the composition is honest: night 2's input artifact (night 1's
    // kept table) differs from the output unless night 2 changed nothing
    val n1Caches = new java.io.File(sys.props("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_manifestd1_cache_"))
    assert(n1Caches.nonEmpty, "night-1 kept artifact missing")
  }

  test("q_pack_manifest: exactly the manifest docs, per-source prefix-sum offsets, shard = off / 512") {
    val packed = SparkEntry.queries("q_pack_manifest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val manifestIds = SparkEntry.queries("q_curation_manifest")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(packed.map(_._1).toSet == manifestIds,
      "packed doc set diverges from the manifest")
    // per source, in doc_id order: start_off is the running token sum
    // BEFORE the doc, shard its 512-token bucket
    packed.groupBy(_._2).foreach { case (src, g) =>
      var acc = 0L
      g.sortBy(_._1).foreach { case (id, _, nToks, off, shard) =>
        assert(off == acc, s"doc $id ($src): offset broke the prefix sum")
        assert(shard == off / 512L, s"doc $id ($src): shard != off / 512")
        acc += nToks
      }
    }
  }

  test("q_nightly_roll serves the three component artifacts verbatim") {
    // the capstone is a COMPOSITION, not a new computation: each tagged
    // section must equal its standalone oracled verb row-for-row
    val rows = SparkEntry.queries("q_nightly_roll")(spark, sf).collect()
    val byTag = rows.groupBy(_.getString(0))
    assert(byTag.keySet == Set("clusters", "ann", "manifest"),
      s"unexpected artifact tags: ${byTag.keySet}")
    val clu = SparkEntry.queries("q_dedup_clusters_compact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1).toString)).toSet
    assert(byTag("clusters").map(r => (r.getLong(1), r.getString(2))).toSet == clu,
      "clusters section drifted from q_dedup_clusters_compact")
    val ann = SparkEntry.queries("q_ann_index_incr")(spark, sf)
      .collect().map(r => (r.getLong(0) * 100 + r.getLong(2),
        r.getLong(1).toString)).toSet
    assert(byTag("ann").map(r => (r.getLong(1), r.getString(2))).toSet == ann,
      "ann section drifted from q_ann_index_incr")
    val man = SparkEntry.queries("q_curation_manifest_delta")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(byTag("manifest").map(r => (r.getLong(1), r.getString(2))).toSet == man,
      "manifest section drifted from q_curation_manifest_delta")
  }
}
