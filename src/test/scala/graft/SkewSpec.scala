package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Skew helpers must be pure rewrites: salted results equal unsalted ones
  * exactly, while the salted plans spread hot keys over many partitions. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 1 hot key carrying 90% of rows + a long tail
  private lazy val skewed = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("k", "v")

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(skewed, Seq("k"), col("v"), buckets = 8,
      partial = Seq(count(lit(1)).as("pn"), sum("v").as("psv")),
      finalAgg = Seq(sum("pn").as("n"), sum("psv").as("sv")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join, replicating only hot right-side keys") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, "k")
      .select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val salted = Skew.saltedJoin(skewed, dim, "k",
        hotKeys = Seq("hot"), buckets = 8, saltBy = col("v"))
      .select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(salted.toSeq == plain.toSeq)
  }
}
