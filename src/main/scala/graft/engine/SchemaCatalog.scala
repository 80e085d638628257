package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Catalog abstraction.
  *
  * Mirrors the reference's `SchemaCatalog` trait
  * (/root/reference/src/planner/catalog.rs:20-22): fetch a table's schema by
  * name, `None` if absent. Unlike the reference's `DummySchemaCatalog`
  * (catalog.rs:24-32), which is write-never/read-panics, this one is backed
  * by the live Spark catalog, so DDL actually persists for the session.
  */
trait SchemaCatalog {
  def fetchTableInfo(tableName: String): Option[StructType]
}

/** Spark-catalog-backed implementation: any temp view / table visible to the
  * session is visible here.
  */
final class SparkSchemaCatalog(spark: SparkSession) extends SchemaCatalog {
  override def fetchTableInfo(tableName: String): Option[StructType] =
    if (spark.catalog.tableExists(tableName)) Some(spark.table(tableName).schema)
    else None
}

/** In-memory map-backed catalog for tests (the shape of
  * `DummySchemaCatalog`, /root/reference/src/planner/catalog.rs:24-32,
  * minus its panic-on-miss bug).
  */
final class MapSchemaCatalog(tables: Map[String, StructType]) extends SchemaCatalog {
  override def fetchTableInfo(tableName: String): Option[StructType] = tables.get(tableName)
}
