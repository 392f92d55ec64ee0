package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** Pins AsofJoin against a brute-force per-row oracle computed in Scala. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, label) right rows; (key, ts, id) left rows — ts as long for
  // easy brute-force arithmetic; the operator is type-agnostic in ts.
  private val leftRows = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
    (2L, 15L, "d"), (2L, 15L, "e"), (3L, 5L, "f"))
  private val rightRows = Seq(
    (1L, 10L, 100.0), (1L, 25L, 101.0),
    (2L, 14L, 200.0), (2L, 15L, 201.0), (2L, 16L, 202.0))

  private def leftDf = leftRows.toDF("k", "ts", "id")
  private def rightDf = rightRows.toDF("k", "rts", "v")

  private def brute(inclusive: Boolean, forward: Boolean): Map[String, Option[(Long, Double)]] =
    leftRows.map { case (k, ts, id) =>
      val cands = rightRows.filter(_._1 == k).filter { case (_, rts, _) =>
        (forward, inclusive) match {
          case (false, true)  => rts <= ts
          case (false, false) => rts < ts
          case (true, true)   => rts >= ts
          case (true, false)  => rts > ts
        }
      }
      val best =
        if (cands.isEmpty) None
        else if (forward) Some(cands.minBy(_._2)) else Some(cands.maxBy(_._2))
      id -> best.map(c => (c._2, c._3))
    }.toMap

  private def run(inclusive: Boolean, forward: Boolean): Map[String, Option[(Long, Double)]] = {
    val out =
      if (forward) AsofJoin.forward(leftDf, rightDf, "k", "ts", "rts", inclusive)
      else AsofJoin.backward(leftDf, rightDf, "k", "ts", "rts", inclusive)
    out.collect().map { r =>
      val id = r.getAs[String]("id")
      val m = if (r.isNullAt(r.fieldIndex("r_rts"))) None
              else Some((r.getAs[Long]("r_rts"), r.getAs[Double]("r_v")))
      id -> m
    }.toMap
  }

  for (forward <- Seq(false, true); inclusive <- Seq(true, false)) {
    val name = (if (forward) "forward" else "backward") +
      (if (inclusive) " inclusive" else " strict")
    test(s"$name matches the brute-force oracle") {
      assert(run(inclusive, forward) === brute(inclusive, forward))
    }
  }

  test("matched right columns come from one row (no column tearing on nulls)") {
    // Right payloads with interleaved nulls: a per-column last(ignoreNulls)
    // would combine v from one row with tag from another.
    val l = Seq((1L, 30L, "x")).toDF("k", "ts", "id")
    val r = Seq((1L, 10L, Option(1.0), Option.empty[String]),
                (1L, 20L, Option.empty[Double], Option("t20")))
      .toDF("k", "rts", "v", "tag")
    val row = AsofJoin.backward(l, r, "k", "ts", "rts").collect().head
    // latest row at ts=20 wins wholesale: v null, tag "t20"
    assert(row.getAs[Long]("r_rts") === 20L)
    assert(row.isNullAt(row.fieldIndex("r_v")))
    assert(row.getAs[String]("r_tag") === "t20")
  }

  test("duplicate right timestamps break ties by rightTieBreak") {
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "id")
    val r = Seq((1L, 10L, "p"), (1L, 10L, "q"), (1L, 10L, "z"))
      .toDF("k", "rts", "tag")
    val row = AsofJoin
      .backward(l, r, "k", "ts", "rts", rightTieBreak = Some("tag"))
      .collect().head
    assert(row.getAs[String]("r_tag") === "z") // largest tiebreak wins
  }

  test("unmatched left keys survive with null right columns") {
    val out = AsofJoin.backward(leftDf, rightDf, "k", "ts", "rts")
      .filter(col("id") === "f").collect().head
    assert(out.isNullAt(out.fieldIndex("r_rts")))
    assert(out.isNullAt(out.fieldIndex("r_v")))
  }

  test("plan shape: exactly one shuffle (on the key), no join blowup") {
    val plan = AsofJoin.backward(leftDf, rightDf, "k", "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "LOCF as-of must not compile to a join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
