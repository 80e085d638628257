package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Checksum-validated PII detection — the precision layer above the
  * regex scrub (q_redact): a bare `\d{13,19}` matcher flags every
  * order id and timestamp in a crawl, so production pipelines validate
  * candidates with the Luhn mod-10 check (ISO/IEC 7812) that real
  * payment-card numbers satisfy, cutting false positives ~10×.
  *
  * Both steps are pure per-row expression chains (regex extraction +
  * a HOF fold over the digit positions) — codegen'd builtins, no UDF,
  * no shuffle: the detector rides the scan at 100 TB like every other
  * per-row gate, and both are engine-portable (DuckDB re-derives the
  * fold bit-for-bit, so detection AND validation oracle exactly).
  */
object Pii {

  /** Luhn mod-10 validity of a contiguous digit string: doubling every
    * second digit from the RIGHT (subtracting 9 on overflow), the total
    * must divide by 10. One `aggregate` fold over the positions; the
    * input must be non-empty and all-digit (the shape
    * [[cardCandidates]]' regex guarantees).
    */
  def luhnValid(c: Column): Column = {
    val n = length(c)
    val total = aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val d = (ascii(c.substr(i, lit(1))) - lit(48)).cast("long")
      val dbl = when((n - i) % lit(2) === lit(1),
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      acc + dbl
    })
    total % lit(10L) === lit(0L)
  }

  /** Candidate card numbers per document: non-overlapping contiguous
    * digit runs of 13-19 (the ISO/IEC 7812 PAN length range), each with
    * its Luhn verdict. One row per (doc, candidate occurrence) — docs
    * without candidates emit nothing; a downstream redaction keeps only
    * `luhn_valid` hits.
    */
  def cardCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit("[0-9]{13,19}"), lit(0))
    df.select(col(idCol), posexplode(cands).as(Seq("cand_idx", "cand")))
      .select(col(idCol), col("cand_idx").cast("long").as("cand_idx"),
        col("cand"), luhnValid(col("cand")).as("luhn_valid"))
  }
}
