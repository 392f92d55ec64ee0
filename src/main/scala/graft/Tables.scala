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
    // The events fixture has shipped `ts` under three parquet encodings over
    // time; normalize all of them to µs TimestampType (session tz is pinned
    // UTC, so the values match DuckDB's naive reading bit-for-bit):
    //  1. TIMESTAMP(NANOS) — no native Spark type: read as Long (legacy conf)
    //     and convert with integer division (a double roundtrip would lose
    //     precision on ~1.7e18 ns epochs).
    //  2. TIMESTAMP(MICROS, isAdjustedToUTC=false) — surfaces as
    //     TIMESTAMP_NTZ in Spark 4: cast to TimestampType.
    //  3. TIMESTAMP(MICROS, adjusted) — already TimestampType, pass through.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => df
    } else df
  }

  /** Register every fixture as a temp view so SQL-passthrough queries
    * (SURVEY §2.11 Tier B) can reference them by name, exactly like the
    * DuckDB oracle does. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
