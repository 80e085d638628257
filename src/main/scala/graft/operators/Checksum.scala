package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table checksums — the data-migration validator: two
  * engines (or two copies of a 100 TB table) agree on content iff their
  * checksums agree, with NO sort and NO row transfer.
  *
  * Construction: each row is rendered to a canonical string (caller
  * chooses the columns — they must render identically in every engine:
  * integers, strings, exact cents; never raw floats), md5-hashed, the
  * first 14 hex digits parsed as a 56-bit integer, and SUMMED modulo
  * 2^62. Addition is commutative, so the result is independent of row
  * order and partitioning — the whole check is one partial-aggregable
  * scan per side, comparing two longs at the end. Any engine with md5 +
  * hex parsing can produce the same number (DuckDB:
  * `CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)`).
  *
  * A 56-bit digest makes an undetected difference vanishingly unlikely
  * (two DIFFERENT multisets collide with probability ~2^-56 per differing
  * row pair).
  *
  * CROSS-ENGINE ACCUMULATION CONTRACT: the partner engine must either
  * accumulate the 56-bit digests EXACTLY (128-bit/decimal arithmetic —
  * Spark sums decimal(38,0) here, DuckDB sums to HUGEINT) and apply `%
  * 2^62` once at the end, or fold `% 2^62` into every partial sum
  * (per-row modular addition agrees with the end-fold because modular
  * addition is associative). What it must NOT do is accumulate in
  * wrapping int64: ~64 max-weight digests overflow 2^63 and the wrapped
  * sum diverges from the modular one silently.
  */
object Checksum {

  /** 2^62 — both engines fold the digest sum with the same modulus. */
  val Modulus: Long = 4611686018427387904L

  /** 56-bit row digest of a canonical string column (decimal-typed so
    * sums stay exact past long range before the modular fold).
    */
  def rowDigest(canonical: Column): Column =
    conv(substring(md5(canonical), 1, 14), 16, 10).cast("decimal(38,0)")

  /** Canonical row rendering, INJECTIVE over the column value sequence:
    * each value is netstring-encoded as `<charlen>:<value>`, nulls as
    * `-`, concatenated with no separator. Unambiguously parseable (read
    * digits to ':', consume that many chars), so no value content —
    * separators, empty strings — and no null/shift confusion can make two
    * different rows render alike, which a plain `concat_ws` cannot
    * guarantee (it skips nulls and its separator can be injected).
    * Callers pass columns already cast to engine-stable strings
    * (integers, exact cents — never raw floats).
    */
  def canonical(cols: Seq[Column]): Column =
    concat(cols.map(c =>
      coalesce(concat(length(c).cast("string"), lit(":"), c), lit("-"))): _*)

  /** Per-group (n_rows, checksum) over the canonical rendering of `cols`.
    * With no `groupCols`: one global row. Checksum = sum(digest) mod 2^62
    * as a long.
    */
  def grouped(df: DataFrame, groupCols: Seq[Column], cols: Seq[Column]): DataFrame = {
    val digested = df.select(groupCols ++ Seq(rowDigest(canonical(cols)).as("__digest")): _*)
    val aggd =
      if (groupCols.isEmpty) digested.agg(count(lit(1)).as("n_rows"),
        sum(col("__digest")).as("__sum"))
      else digested.groupBy(groupCols: _*).agg(count(lit(1)).as("n_rows"),
        sum(col("__digest")).as("__sum"))
    aggd.withColumn("checksum",
        (col("__sum") % lit(Modulus)).cast("long"))
      .drop("__sum")
  }
}
