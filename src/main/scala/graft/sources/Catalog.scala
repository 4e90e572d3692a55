package graft.sources

import org.apache.spark.sql.SparkSession

/** Registers the star-schema tables of a data directory as temp views so
  * ad-hoc `spark.sql` works over plain table names — the interactive
  * front door next to the programmatic `SparkEntry.queries` registry.
  * Views are lazy references to the parquet (no caching, full
  * pushdown/pruning preserved); `events` goes through the same
  * [[Tables.events]] normalization as every operator, so `ts`/`ts_us`
  * mean the same thing in ad-hoc SQL as in the gate entries.
  */
object Catalog {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  /** Create (or replace) one temp view per table over `dir`. */
  def register(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }
}
