package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string matching (entity resolution) by blocked edit
  * distance — the "same thing spelled differently" join.
  *
  * Scale design in two layers:
  *   1. DICTIONARY FIRST: real corpora have far fewer distinct strings
  *      than rows (names, brands, cities). [[dictionaryPairs]] matches
  *      over `distinct()` values — cardinality bounded by the vocabulary,
  *      not the table — and callers map matches back to rows with an
  *      equi-join. A 100 TB table with a 1M-value dictionary does the
  *      quadratic part on 1M, never on the table.
  *   2. BLOCK + SOUND FILTER: candidate pairs come from an EQUI-join on a
  *      blocking key (declared semantics: only same-block pairs can
  *      match — standard in entity resolution since Fellegi-Sunter '69),
  *      then a length-difference filter (|len(a)-len(b)| <= maxDist, a
  *      NECESSARY condition for edit distance <= maxDist, so it drops no
  *      true match) prunes before the expensive levenshtein evaluates.
  */
object FuzzyJoin {

  /** Default blocking key: lowercased first whitespace token. */
  def firstToken(c: Column): Column = split(lower(c), " ").getItem(0)

  /** Matching pairs (a < b lexicographically) over the DISTINCT values of
    * `strCol`: same block, edit distance <= maxDist. Output:
    * (name_a, name_b, dist).
    */
  def dictionaryPairs(df: DataFrame, strCol: String, maxDist: Int,
      block: Column => Column = firstToken): DataFrame = {
    val dict = df.select(col(strCol).as("name")).distinct()
      .withColumn("__block", block(col("name")))
    val a = dict.select(col("name").as("name_a"), col("__block"))
    val b = dict.select(col("name").as("name_b"), col("__block"))
    a.join(b, "__block")
      .filter(col("name_a") < col("name_b"))
      // sound pre-filter: cheap length window before the DP-cost distance
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
  }
}
