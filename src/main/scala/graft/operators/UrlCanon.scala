package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the first dedup pass of a
  * web-crawl curation pipeline (a recrawled page returns the same
  * canonical URL with different tracking params long before its content
  * hash matches). North-star surface; no trace in the reference
  * (/root/reference/src/planner/logicalplan.rs:207-273).
  *
  * Scale shape: canonicalization is a pure per-row expression chain over
  * Spark's codegen'd `parse_url` builtin (no UDF); the dedup is one
  * groupBy on the canonical string — payloads never move, exactly the
  * [[Dedup.exact]] digest shape keyed by URL instead of content.
  */
object UrlCanon {

  /** Canonical form: lowercased scheme + host, path kept verbatim,
    * fragment dropped, `utm_*` tracking params stripped, remaining query
    * params kept in order (reordering params can change semantics on
    * real sites; order-insensitive callers can sort upstream).
    */
  def canonicalize(url: Column): Column = {
    val q = parse_url(url, lit("QUERY"))
    val kept = filter(split(q, "&"),
      p => !p.startsWith("utm_") && p =!= "")
    val qs = when(q.isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    concat(
      lower(parse_url(url, lit("PROTOCOL"))), lit("://"),
      lower(parse_url(url, lit("HOST"))),
      parse_url(url, lit("PATH")),
      qs)
  }

  /** One row per canonical URL: smallest id kept ("first wins", the
    * [[Dedup.exact]] contract) plus the copy count.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.groupBy(canonicalize(col(urlCol)).as("canon_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("canon_url", "keep_id", "n_copies")
}
