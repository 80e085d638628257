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
    *
    * The equi-join key is (block, length band): a web-scale dictionary has
    * hot first tokens ("the", "new", a dominant brand), and blocking on
    * the token alone makes that one block quadratic. Banding by
    * floor(len / maxDist) splits a hot block by string length WITHOUT
    * losing matches: |len(a)-len(b)| <= maxDist (necessary for edit
    * distance <= maxDist) implies the band indices differ by at most 1,
    * so side A is expanded to its own band and both neighbors and every
    * true pair still meets on exactly one key. Candidate work per hot
    * token drops from |block|² to ~3·Σ|band|² — bounded by the length
    * histogram, not the token's popularity. `FuzzyJoinSpec` property-tests
    * no-miss against the unbanded join.
    */
  def dictionaryPairs(df: DataFrame, strCol: String, maxDist: Int,
      block: Column => Column = firstToken): DataFrame = {
    val w = math.max(maxDist, 1)
    val dict = df.select(col(strCol).as("name")).distinct()
      .withColumn("__block", block(col("name")))
      .withColumn("__band", floor(length(col("name")) / w))
    // A-side covers {band-1, band, band+1}: the three values are distinct,
    // and B keeps its single band, so each (a, b) pair meets exactly once.
    val a = dict.select(col("name").as("name_a"), col("__block"),
      explode(array(col("__band") - 1, col("__band"), col("__band") + 1)).as("__band"))
    val b = dict.select(col("name").as("name_b"), col("__block"), col("__band"))
    a.join(b, Seq("__block", "__band"))
      .filter(col("name_a") < col("name_b"))
      // sound pre-filter: cheap length window before the DP-cost distance
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
  }
}
