package graft

import org.apache.spark.sql.SparkSession

/** Idempotent warehouse-table lifecycle for the bucketed index
  * builders: drop the catalog entries AND their orphaned locations
  * (an in-memory catalog forgets tables across JVMs; the warehouse
  * directory does not).
  */
private[graft] object Warehouse {
  def reset(spark: SparkSession, db: String, tables: Seq[String]): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    for (tbl <- tables) {
      spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
      val loc = new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath
      val dir = java.nio.file.Paths.get(loc, s"$db.db", tbl)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
