package graft

import scala.io.StdIn
import graft.engine.{GraftSession, GraftSql}

/** Interactive SQL REPL — the reference's user surface
  * (/root/reference/src/main.rs:27-61: readline -> parse -> plan ->
  * print), completed: statements here are parsed, *planned and executed*,
  * and DDL persists in the session catalog instead of being printed and
  * dropped (the reference re-creates an empty catalog per line,
  * main.rs:41-42). `:explain` prints the optimized + physical plan —
  * the part of mura's output worth keeping.
  *
  * Usage: sbt "runMain graft.Repl" — then e.g.
  *   CREATE EXTERNAL TABLE li (...) STORED AS PARQUET LOCATION '/root/testdata/sf0.001/lineitem.parquet'
  *   SELECT count(*) FROM li
  *   :explain SELECT l_returnflag, sum(l_quantity) FROM li GROUP BY 1
  */
object Repl {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-repl")
    println("graft> SQL REPL (blank line or :quit to exit; :explain <sql> for plans)")
    var line = ""
    while ({ print("graft> "); Console.flush(); line = StdIn.readLine(); line != null && line.trim.nonEmpty && line.trim != ":quit" }) {
      try {
        val trimmed = line.trim
        if (trimmed.startsWith(":explain")) {
          GraftSql.sql(spark, trimmed.stripPrefix(":explain").trim).explain("formatted")
        } else if (trimmed.toUpperCase.startsWith("CREATE ")) {
          val df = GraftSql.sql(spark, trimmed)
          println(s"registered (${df.schema.fields.length} columns)")
        } else {
          GraftSql.sql(spark, trimmed).show(20, truncate = false)
        }
      } catch {
        // errors report and the loop continues — unlike the reference,
        // which .unwrap()s the parse result and dies (main.rs:40)
        case e: Exception => println(s"error: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
