package graft

import org.apache.spark.sql.functions._

/** Checksum-validated PII: Luhn against published test vectors, and the
  * candidate extractor's shape (lengths, multiplicity, ordering).
  */
class PiiSpec extends SparkTestBase {

  import graft.operators.Pii

  private def luhn(s: String): Boolean = {
    import spark.implicits._
    Seq(s).toDF("c").select(Pii.luhnValid(col("c"))).collect()(0).getBoolean(0)
  }

  test("luhnValid matches published vectors") {
    // classic worked example from the ISO/IEC 7812 literature
    assert(luhn("79927398713"))
    assert(!luhn("79927398710"))
    // standard industry test PANs (16- and 13-digit)
    assert(luhn("4111111111111111"))
    assert(!luhn("4111111111111112"))
    assert(luhn("4222222222222"))
    assert(luhn("5500005555555559"))
  }

  test("cardCandidates: digit runs 13-19 only, per-doc order, Luhn verdicts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "pay 4111111111111111 or 4111111111111112 ok"), // two candidates
      (2L, "short 123456789012 and done"),                 // 12 digits: none
      (3L, "id 999 then 4222222222222 end"),               // 13-digit valid
      (4L, "no digits at all")
    ).toDF("id", "text")
    val got = Pii.cardCandidates(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (1L, 0L, "4111111111111111", true),
      (1L, 1L, "4111111111111112", false),
      (3L, 0L, "4222222222222", true)), s"got: ${got.toSeq}")
  }

  test("a 20+ digit run yields one greedy 19-digit candidate (non-overlapping)") {
    import spark.implicits._
    val docs = Seq((1L, "x 123456789012345678901 y")).toDF("id", "text") // 21 digits
    val got = Pii.cardCandidates(docs, "id", "text")
      .collect().map(r => r.getString(2))
    assert(got.toSeq == Seq("1234567890123456789"),
      s"greedy non-overlapping extraction: ${got.toSeq}")
  }
}
