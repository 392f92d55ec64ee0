package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the heavy operators (run with
  * `sbt "runMain graft.tools.Probe <sfDir>"`). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = Tables(spark, dir, "documents")
    val sets = docs.select(col("doc_id").as("id"), shingles(col("text"), 3).as("sh"))
    time("shingles count")(sets.selectExpr("sum(size(sh))").collect())
    val sig = sets.select(col("id"), minhashSignature(col("sh"), 128).as("sig"))
    time("minhash sig")(sig.selectExpr("sum(size(sig))").collect())

    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        j => hash(slice(col("sig"), j * lit(8) + 1, lit(8))))).as(Seq("band", "bucket")))
    val stats = time("bucket stats")(
      banded.groupBy("band", "bucket").count()
        .agg(sum(expr("count*count")).as("sq_pairs"), max("count").as("max_bucket"),
          count(lit(1)).as("n_buckets")).collect()(0))
    println(s"[probe] bucket stats: $stats")

    val lsh = time("full lsh")(
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    println(s"[probe] lsh pairs: $lsh")
    spark.stop()
  }
}
