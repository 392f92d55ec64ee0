package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (`TESTDATA.md`).
  *
  * Scale notes: every reader goes through `spark.read.parquet` so Catalyst's
  * parquet source handles predicate pushdown / column pruning / partition
  * coalescing. At 100 TB these would be catalog tables partitioned by date;
  * the query code below only ever references logical tables, so swapping the
  * resolution layer (this object) is the only change needed.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events fixture stores ts as parquet TIMESTAMP(NANOS), which Spark
    // has no native type for: read it as Long (legacy conf) and convert to
    // µs TimestampType. `div` (integer division) — a double roundtrip would
    // lose precision on ~1.7e18 ns epochs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every fixture as a temp view so SQL-passthrough queries
    * (SURVEY §2.11 Tier B) can reference them by name, exactly like the
    * DuckDB oracle does. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
