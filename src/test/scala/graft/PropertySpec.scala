package graft

import graft.engine.{ConnOptions, GraftEngine}
import graft.streaming.Changelog
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}

/** Property-based tests (SURVEY §5.2 item 4), driven by seeded ScalaCheck
  * generators for determinism:
  *  - the MV invariant under random insert/flush interleavings;
  *  - subscription kill/resume at arbitrary offsets = at-least-once, no gaps;
  *  - Changelog.diff round-trip: applying the ops to `prev` reproduces `next`.
  */
class PropertySpec extends SparkSpec {

  private lazy val rw: GraftEngine = GraftEngine.open(ConnOptions(), Some(spark))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  sealed trait OpKind
  case object InsertOne extends OpKind
  case object InsertBatch extends OpKind
  case object Flush extends OpKind

  private val opGen: Gen[(OpKind, String, Double)] = for {
    kind <- Gen.frequency(5 -> InsertOne, 2 -> InsertBatch, 2 -> Flush)
    k <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.choose(0, 999).map(_.toDouble)
  } yield (kind, k, v)

  test("MV invariant holds under random insert/flush interleavings") {
    for (scenario <- 1 to 3) {
      val tbl = s"prop_t_$scenario"
      rw.createTable(tbl, StructType(Seq(
        StructField("k", StringType), StructField("v", DoubleType))))
      rw.mv(s"SELECT k, count(*) AS n, sum(v) AS sv FROM $tbl GROUP BY k", s"prop_mv_$scenario")
      val ops = sample(Gen.listOfN(40, opGen), seed = 1000 + scenario)
      ops.foreach {
        case (InsertOne, k, v) => rw.insertRow(tbl, values = Map("k" -> k, "v" -> v))
        case (InsertBatch, k, v) =>
          rw.table(tbl).get.insert(Seq(Row(k, v), Row(k, v + 1), Row("z", v)))
        case (Flush, _, _) => rw.flush()
      }
      rw.flush()
      val inc = rw.fetch(s"SELECT * FROM prop_mv_$scenario")
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      val batch = rw.fetch(s"SELECT k, count(*) AS n, sum(v) AS sv FROM $tbl GROUP BY k")
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(inc == batch, s"scenario $scenario")
    }
  }

  test("cascade invariant: agg→agg chain equals batch under random interleavings") {
    for (scenario <- 1 to 3) {
      val tbl = s"casp_t_$scenario"
      rw.createTable(tbl, StructType(Seq(
        StructField("k", StringType), StructField("v", DoubleType))))
      rw.mv(s"SELECT k, count(*) AS n, SUM(CAST(v AS DECIMAL(18,6))) AS sv " +
        s"FROM $tbl GROUP BY k", s"casp_up_$scenario")
      val down = rw.mv(
        s"SELECT substring(k, 1, 1) AS g, CAST(SUM(n) AS BIGINT) AS n, SUM(sv) AS sv " +
          s"FROM casp_up_$scenario GROUP BY substring(k, 1, 1)", s"casp_dn_$scenario")
      assert(down.isChangelogCascadeMode)
      // negatives make upstream aggregates DECREASE (retraction folds);
      // NULL keys exercise the null-safe key join end-to-end
      val gen = for {
        kind <- Gen.frequency(5 -> InsertOne, 2 -> InsertBatch, 2 -> Flush)
        k <- Gen.frequency(5 -> Gen.oneOf("a1", "a2", "b1", "b2", "c1"),
          1 -> Gen.const(null: String))
        v <- Gen.choose(-500, 999).map(_.toDouble)
      } yield (kind, k, v)
      sample(Gen.listOfN(40, gen), seed = 7000 + scenario).foreach {
        case (InsertOne, k, v) => rw.insertRow(tbl, values = Map("k" -> k, "v" -> v))
        case (InsertBatch, k, v) =>
          rw.table(tbl).get.insert(Seq(Row(k, v), Row(k, v - 100), Row("c1", v)))
        case (Flush, _, _) => rw.flush()
      }
      rw.flush()
      val inc = rw.fetch(s"SELECT g, n, CAST(sv AS DOUBLE) AS sv FROM casp_dn_$scenario")
        .map(r => (Option(r.getString(0)), (r.getLong(1), r.getDouble(2)))).toMap
      val batch = rw.fetch(
        s"SELECT substring(k, 1, 1) AS g, count(*) AS n, " +
          s"CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sv FROM $tbl GROUP BY 1")
        .map(r => (Option(r.getString(0)), (r.getLong(1), r.getDouble(2)))).toMap
      assert(inc == batch, s"scenario $scenario")
      assert(down.isChangelogCascadeMode, "mode must survive the whole run")
    }
  }

  test("grouped top-N: visible top-N equals batch under random keyed deltas; state stays ≤ n+C") {
    // round-7 verdict item 6: the frozen-bound / re-fetch-on-underflow
    // argument is subtle — 210 random deltas (incl. negatives, which make
    // per-key aggregates DECREASE and force displacement, eviction, bound
    // hits and re-fetches) across 3 seeded scenarios, with the invariant
    // checked after EVERY flush: the visible snapshot must equal the batch
    // evaluation of the statement, and the carried state must never exceed
    // n + cache margin.
    for (scenario <- 1 to 3) {
      val tbl = s"tnp_t_$scenario"
      rw.createTable(tbl, StructType(Seq(
        StructField("k", StringType), StructField("v", DoubleType))))
      val mv = rw.mv(s"SELECT k, SUM(CAST(v AS DECIMAL(18,6))) AS s FROM $tbl " +
        s"GROUP BY k ORDER BY s DESC, k LIMIT 3", s"tnp_mv_$scenario")
      assert(mv.isTopNMode, "must take the incremental grouped top-N path")
      val stateBound = 3 + math.max(2 * 3, 16) // n + topNCacheMargin
      val gen = for {
        flush <- Gen.frequency(3 -> false, 1 -> true)
        k <- Gen.choose(1, 25).map(i => f"k$i%02d") // 25 keys >> n+C=19: evictions happen
        v <- Gen.choose(-800, 999).map(_.toDouble)
      } yield (flush, k, v)
      def check(tag: String): Unit = {
        val sel = "ORDER BY s DESC, k LIMIT 3"
        val inc = rw.fetch(s"SELECT k, CAST(s AS DOUBLE) AS s FROM tnp_mv_$scenario $sel")
          .map(r => (r.getString(0), r.getDouble(1)))
        val batch = rw.fetch(s"SELECT k, CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS s " +
          s"FROM $tbl GROUP BY k $sel").map(r => (r.getString(0), r.getDouble(1)))
        assert(inc == batch, s"scenario $scenario $tag: $inc != $batch")
        assert(mv.topNStateCount <= stateBound,
          s"scenario $scenario $tag: state ${mv.topNStateCount} exceeds n+C=$stateBound")
      }
      var flushes = 0
      sample(Gen.listOfN(70, gen), seed = 9000 + scenario).foreach { case (flush, k, v) =>
        rw.table(tbl).get.insert(Seq(Row(k, v)))
        if (flush) { rw.flush(); flushes += 1; check(s"flush $flushes") }
      }
      rw.flush(); check("final")
      assert(mv.isTopNMode, "mode must survive the whole run")
    }
  }

  test("subscription kill/resume at arbitrary offsets is at-least-once with no gaps") {
    val tbl = "prop_resume_t"
    rw.createTable(tbl, StructType(Seq(StructField("x", LongType))))
    rw.mv(s"SELECT x FROM $tbl", "prop_resume_mv")
    (1L to 40L).grouped(7).foreach { g =>
      rw.table(tbl).get.insert(g.map(Row(_)).toSeq); rw.flush()
    }
    val mv = rw.mvByName("prop_resume_mv").get

    val cutGen = Gen.choose(1, 12)
    var seen = Vector.empty[Long]
    var sub = mv.subscription().declareCursor(Some(0L))
    var resumeAt = 0L
    var iter = 0
    var done = false
    while (!done && iter < 50) {
      iter += 1
      val n = sample(cutGen, seed = 7000 + iter)
      val batch = sub.fetch(n)
      if (batch.isEmpty) done = true
      else {
        seen ++= batch.map(_.getLong(0))
        resumeAt = sub.currentPosition
        // kill the cursor and resume from the persisted offset (W5)
        sub = mv.subscription().declareCursor(Some(resumeAt))
      }
    }
    assert(seen.sorted == (1L to 40L).toVector) // exactly-once here (progress saved post-batch)

    // resume from an EARLIER offset → replay (at-least-once, never gaps)
    val replay = mv.subscription().declareCursor(Some(0L))
    val all = Iterator.continually(replay.fetch(9)).takeWhile(_.nonEmpty).flatten.toSeq
    assert(all.map(_.getLong(0)).sorted == (1L to 40L).toSeq)
  }

  test("Changelog.diff round-trip: prev + ops == next") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType)))
    val kvGen = for {
      ks <- Gen.someOf(Seq("a", "b", "c", "d", "e", "f"))
      vs <- Gen.listOfN(ks.size, Gen.choose(0, 9))
    } yield ks.zip(vs).toMap

    for (i <- 1 to 5) {
      val prev = sample(kvGen, 300 + i)
      val next = sample(kvGen, 400 + i)
      import scala.jdk.CollectionConverters._
      val prevDf = spark.createDataFrame(prev.toList.map { case (k, v) => Row(k, v) }.asJava, schema)
      val nextDf = spark.createDataFrame(next.toList.map { case (k, v) => Row(k, v) }.asJava, schema)
      val ops = Changelog.diff(Some(prevDf), nextDf, Seq("k")).collect()

      // apply ops to prev
      var state = prev
      ops.foreach { r =>
        val (k, v, op) = (r.getString(0), r.getInt(1), r.getString(2))
        op match {
          case Changelog.OpInsert | Changelog.OpUpdateInsert => state = state + (k -> v)
          case Changelog.OpDelete => state = state - k
          case Changelog.OpUpdateDelete => // retraction half; UI follows
        }
      }
      assert(state == next, s"case $i: ops=${ops.mkString(",")}")
      // retraction pairing: every UD is followed (same key) by a UI
      val uds = ops.filter(_.getString(2) == Changelog.OpUpdateDelete).map(_.getString(0)).toSet
      val uis = ops.filter(_.getString(2) == Changelog.OpUpdateInsert).map(_.getString(0)).toSet
      assert(uds == uis)
    }
  }

  test("multisetDiff round-trip: prev + ops == next as multisets, incl. duplicates") {
    val schema = StructType(Seq(StructField("k", StringType), StructField("v", IntegerType)))
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 3)
    } yield (k, v)
    for (i <- 1 to 5) {
      val prev = sample(Gen.listOfN(12, rowGen), 500 + i)
      val next = sample(Gen.listOfN(12, rowGen), 600 + i)
      import scala.jdk.CollectionConverters._
      val prevDf = spark.createDataFrame(prev.map { case (k, v) => Row(k, v) }.asJava, schema)
      val nextDf = spark.createDataFrame(next.map { case (k, v) => Row(k, v) }.asJava, schema)
      val ops = Changelog.multisetDiff(Some(prevDf), nextDf).collect()
        .map(r => ((r.getString(0), r.getInt(1)), r.getString(2)))

      var counts = prev.groupBy(identity).view.mapValues(_.size).toMap
      ops.foreach {
        case (kv, Changelog.OpInsert) => counts = counts + (kv -> (counts.getOrElse(kv, 0) + 1))
        case (kv, Changelog.OpDelete) => counts = counts + (kv -> (counts(kv) - 1))
        case (kv, op) => fail(s"unexpected op $op for $kv")
      }
      val expect = next.groupBy(identity).view.mapValues(_.size).toMap
      assert(counts.filter(_._2 != 0) == expect, s"case $i")
    }
  }

  test("localMultisetDiff equals the distributed multisetDiff, ops and order") {
    // the driver-side diff powers the top-N epoch tail; its delta AND its
    // deterministic emission order must be bit-identical to the
    // distributed spelling (changelog consumers replay both)
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", IntegerType), StructField("d", DoubleType)))
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "é", "c")
      v <- Gen.choose(0, 3)
      d <- Gen.oneOf(1.5, -2.0, 0.0)
    } yield Row(k, v, d)
    import scala.jdk.CollectionConverters._
    for (i <- 1 to 5) {
      val prev = sample(Gen.listOfN(10, rowGen), 700 + i)
      val next = sample(Gen.listOfN(10, rowGen), 800 + i)
      val dist = Changelog.multisetDiff(
        Some(spark.createDataFrame(prev.asJava, schema)),
        spark.createDataFrame(next.asJava, schema)).collect().toSeq
      val local = Changelog.localMultisetDiff(Some(prev), next, schema)
      assert(local.nonEmpty, "schema must have a local ordering")
      assert(local.get.map(_.toSeq) == dist.map(_.toSeq), s"case $i")
    }
    // first-epoch spelling (prev = None): all Inserts, sorted
    val onlyNext = sample(Gen.listOfN(8, rowGen), 900)
    val dist0 = Changelog.multisetDiff(None,
      spark.createDataFrame(onlyNext.asJava, schema)).collect().toSeq
    val local0 = Changelog.localMultisetDiff(None, onlyNext, schema)
    assert(local0.get.map(_.toSeq) == dist0.map(_.toSeq))
  }

  test("mixDomains: rates bound at 1, unlisted domains drop, selection deterministic") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    val schema = StructType(Seq(StructField("id", LongType), StructField("dom", StringType)))
    // dom a: 60 rows (over-represented vs target 10%), dom b: 5 rows
    // (under-represented vs target 50% -> rate clamps to 1, kept whole)
    val rows = (0L until 60L).map(Row(_, "a")) ++ (100L until 105L).map(Row(_, "b")) ++
      (200L until 220L).map(Row(_, "c"))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val kept = Sampling.mixDomains(df, "id", "dom", Map("a" -> 0.1, "b" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.forall(_._2 != "c"), "unlisted domains must drop")
    assert(kept.count(_._2 == "b") == 5, "under-represented domain keeps whole")
    val na = kept.count(_._2 == "a")
    assert(na > 0 && na < 60, s"over-represented domain must shrink, kept $na/60")
    val again = Sampling.mixDomains(df, "id", "dom", Map("a" -> 0.1, "b" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet, "selection must be deterministic")
  }

  test("NearestCentroid equals an independent Scala argmax on random vectors") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(97L)
    val dim = 16
    val corpus = (0L until 200L).map(id => (id, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", ArrayType(FloatType, containsNull = false))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(corpus.map { case (id, v) => Row(id, v.toSeq) }: _*), schema)

    val assigned = Similarity.ivfAssignments(df, "id", "v", 8).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap

    // independent replication in plain Scala: same centroid-selection
    // scramble, same double fold, same (score desc, cid asc) tie rule
    val byId = corpus.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < dim) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val cids = corpus.map(_._1)
      .sortBy(id => (((id % 104729L) * (2654435761L % 104729L)) % 104729L, id))
      .take(8).sorted
    corpus.foreach { case (id, v) =>
      val vn = norm(v)
      val best = cids.map { cid =>
        (dot(v, byId(cid)) / (vn * norm(byId(cid))), cid)
      }.minBy { case (s, cid) => (-s, cid) }._2
      assert(assigned(id) == best, s"id=$id: got ${assigned(id)}, want $best")
    }
  }

  test("delta-agg fold equals batch under random upsert/delete/flush interleavings") {
    // round 9: the algebraic fold's aux state (counts, decimal sums,
    // non-null counters, vanish-at-zero) must track ANY interleaving of
    // PK overwrites, NULL values, DELETEs, and flush barriers; checked
    // against a fresh batch aggregate after every flush.
    for (scenario <- 1 to 3) {
      val tbl = s"dap_t_$scenario"
      rw.createTable(tbl, StructType(Seq(
        StructField("id", LongType), StructField("grp", StringType),
        StructField("v", LongType))), primaryKey = Seq("id"))
      val mv = rw.mv(s"SELECT grp, count(*) AS n, sum(v) AS sv, " +
        s"avg(CAST(v AS DECIMAL(18,6))) AS av FROM $tbl GROUP BY grp",
        s"dap_mv_$scenario")
      assert(mv.isDeltaAggMode, "count/sum/decimal-avg over a PK table must fold")
      sealed trait K
      case object Up extends K; case object Del extends K; case object Fl extends K
      val gen = for {
        kind <- Gen.frequency(6 -> Up, 1 -> Del, 2 -> Fl)
        id <- Gen.choose(1L, 12L)
        grp <- Gen.oneOf("a", "b", "c")
        v <- Gen.frequency(6 -> Gen.choose(-500L, 999L).map(Long.box),
          1 -> Gen.const(null: java.lang.Long))
      } yield (kind, id, grp, v)
      var checks = 0
      sample(Gen.listOfN(50, gen), seed = 11000 + scenario).foreach {
        case (Up, id, grp, v) => rw.table(tbl).get.insert(Seq(Row(id, grp, v)))
        case (Del, id, _, _) => rw.execute(s"DELETE FROM $tbl WHERE id = $id")
        case (Fl, _, _, _) =>
          rw.flush()
          val inc = rw.fetch(s"SELECT grp, n, sv, CAST(av AS DOUBLE) AS av " +
              s"FROM dap_mv_$scenario")
            .map(r => r.getString(0) -> ((r.getLong(1), r.get(2),
              Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
          val batch = rw.fetch(s"SELECT grp, count(*) AS n, sum(v) AS sv, " +
              s"CAST(avg(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS av " +
              s"FROM $tbl GROUP BY grp")
            .map(r => r.getString(0) -> ((r.getLong(1), r.get(2),
              Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
          assert(inc == batch, s"scenario $scenario after $checks checks")
          checks += 1
      }
      rw.flush()
      assert(mv.isDeltaAggMode, "the fold must survive the whole interleaving")
    }
  }

  test("delta-join MV equals batch join under random two-sided interleavings") {
    // round 9: the signed delta-join fold (incl. the ΔA⋈ΔB cross term when
    // both sides change in one epoch, and upsert/DELETE retractions) must
    // track any interleaving; checked against a fresh batch join per flush.
    for (scenario <- 1 to 3) {
      val evT = s"djp_e_$scenario"; val usT = s"djp_u_$scenario"
      rw.createTable(evT, StructType(Seq(StructField("eid", LongType),
        StructField("uid", LongType), StructField("v", LongType))),
        primaryKey = Seq("eid"))
      rw.createTable(usT, StructType(Seq(StructField("uid", LongType),
        StructField("nm", StringType))), primaryKey = Seq("uid"))
      val mv = rw.mv(s"SELECT e.eid, u.nm, e.v FROM $evT e " +
        s"JOIN $usT u ON u.uid = e.uid", s"djp_mv_$scenario")
      assert(mv.isDeltaJoinMode)
      sealed trait K
      case object Ev extends K; case object Us extends K
      case object DelE extends K; case object Fl extends K
      val gen = for {
        kind <- Gen.frequency(4 -> Ev, 3 -> Us, 1 -> DelE, 2 -> Fl)
        eid <- Gen.choose(1L, 15L)
        uid <- Gen.choose(1L, 6L)
        v <- Gen.choose(0L, 99L)
        nm <- Gen.oneOf("ann", "bob", "cat")
      } yield (kind, eid, uid, v, nm)
      sample(Gen.listOfN(50, gen), seed = 13000 + scenario).foreach {
        case (Ev, eid, uid, v, _) => rw.table(evT).get.insert(Seq(Row(eid, uid, v)))
        case (Us, _, uid, v, nm) => rw.table(usT).get.insert(Seq(Row(uid, s"$nm$v")))
        case (DelE, eid, _, _, _) => rw.execute(s"DELETE FROM $evT WHERE eid = $eid")
        case (Fl, _, _, _, _) =>
          rw.flush()
          val inc = rw.fetch(s"SELECT * FROM djp_mv_$scenario")
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
          val batch = rw.fetch(s"SELECT e.eid, u.nm, e.v FROM $evT e " +
              s"JOIN $usT u ON u.uid = e.uid")
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
          assert(inc == batch, s"scenario $scenario: $inc vs $batch")
      }
      rw.flush()
      assert(mv.isDeltaJoinMode, "the delta-join must survive the whole interleaving")
    }
  }

  test("LEFT-join MV equals batch under random two-sided interleavings (round 10)") {
    // the outer-join delta cascade: null-padded rows must appear/retract
    // exactly as match counts cross zero under any interleaving of fact
    // inserts, dim upserts, and DELETEs on BOTH sides — checked against a
    // fresh batch LEFT JOIN at every flush
    for (scenario <- 1 to 3) {
      val evT = s"ljp_e_$scenario"; val usT = s"ljp_u_$scenario"
      rw.createTable(evT, StructType(Seq(StructField("eid", LongType),
        StructField("uid", LongType), StructField("v", LongType))),
        primaryKey = Seq("eid"))
      rw.createTable(usT, StructType(Seq(StructField("uid", LongType),
        StructField("nm", StringType))), primaryKey = Seq("uid"))
      val mv = rw.mv(s"SELECT e.eid, u.nm, e.v FROM $evT e " +
        s"LEFT JOIN $usT u ON u.uid = e.uid", s"ljp_mv_$scenario")
      assert(mv.isDeltaJoinMode)
      sealed trait K
      case object Ev extends K; case object Us extends K
      case object DelE extends K; case object DelU extends K
      case object Fl extends K
      val gen = for {
        kind <- Gen.frequency(4 -> Ev, 3 -> Us, 1 -> DelE, 1 -> DelU, 2 -> Fl)
        eid <- Gen.choose(1L, 15L)
        uid <- Gen.choose(1L, 6L)
        v <- Gen.choose(0L, 99L)
        nm <- Gen.oneOf("ann", "bob", "cat")
      } yield (kind, eid, uid, v, nm)
      def rowsOf(sql: String): Seq[(Long, Option[String], Long)] =
        rw.fetch(sql).map(r =>
          (r.getLong(0), Option(r.getString(1)), r.getLong(2))).sorted
      sample(Gen.listOfN(50, gen), seed = 14000 + scenario).foreach {
        case (Ev, eid, uid, v, _) => rw.table(evT).get.insert(Seq(Row(eid, uid, v)))
        case (Us, _, uid, v, nm) => rw.table(usT).get.insert(Seq(Row(uid, s"$nm$v")))
        case (DelE, eid, _, _, _) => rw.execute(s"DELETE FROM $evT WHERE eid = $eid")
        case (DelU, _, uid, _, _) => rw.execute(s"DELETE FROM $usT WHERE uid = $uid")
        case (Fl, _, _, _, _) =>
          rw.flush()
          val inc = rowsOf(s"SELECT * FROM ljp_mv_$scenario")
          val batch = rowsOf(s"SELECT e.eid, u.nm, e.v FROM $evT e " +
            s"LEFT JOIN $usT u ON u.uid = e.uid")
          assert(inc == batch, s"scenario $scenario: $inc vs $batch")
      }
      rw.flush()
      assert(mv.isDeltaJoinMode, "the outer delta-join must survive the whole interleaving")
    }
  }

  test("FULL-outer MV equals batch under random two-sided interleavings (round 11)") {
    // both sides nonlinear: padding must flip in BOTH directions as match
    // counts cross zero, under any interleaving of inserts, upsert
    // overwrites, and deletes on either side
    for (scenario <- 1 to 2) {
      val evT = s"fjp_e_$scenario"; val usT = s"fjp_u_$scenario"
      rw.createTable(evT, StructType(Seq(StructField("eid", LongType),
        StructField("uid", LongType), StructField("v", LongType))),
        primaryKey = Seq("eid"))
      rw.createTable(usT, StructType(Seq(StructField("uid", LongType),
        StructField("nm", StringType))), primaryKey = Seq("uid"))
      val stmt = s"SELECT e.eid, u.uid AS duid, u.nm, e.v FROM $evT e " +
        s"FULL JOIN $usT u ON u.uid = e.uid"
      val mv = rw.mv(stmt, s"fjp_mv_$scenario")
      assert(mv.isDeltaJoinMode)
      sealed trait K
      case object Ev extends K; case object Us extends K
      case object DelE extends K; case object DelU extends K
      case object Fl extends K
      val gen = for {
        kind <- Gen.frequency(4 -> Ev, 3 -> Us, 1 -> DelE, 1 -> DelU, 2 -> Fl)
        eid <- Gen.choose(1L, 15L)
        uid <- Gen.choose(1L, 6L)
        v <- Gen.choose(0L, 99L)
        nm <- Gen.oneOf("ann", "bob", "cat")
      } yield (kind, eid, uid, v, nm)
      def rowsOf(sql: String): Seq[(Option[Long], Option[Long], Option[String], Option[Long])] =
        rw.fetch(sql).map(r => (
          if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).sorted
      sample(Gen.listOfN(50, gen), seed = 15000 + scenario).foreach {
        case (Ev, eid, uid, v, _) => rw.table(evT).get.insert(Seq(Row(eid, uid, v)))
        case (Us, _, uid, v, nm) => rw.table(usT).get.insert(Seq(Row(uid, s"$nm$v")))
        case (DelE, eid, _, _, _) => rw.execute(s"DELETE FROM $evT WHERE eid = $eid")
        case (DelU, _, uid, _, _) => rw.execute(s"DELETE FROM $usT WHERE uid = $uid")
        case (Fl, _, _, _, _) =>
          rw.flush()
          val inc = rowsOf(s"SELECT * FROM fjp_mv_$scenario")
          val batch = rowsOf(stmt)
          assert(inc == batch, s"scenario $scenario: $inc vs $batch")
      }
      rw.flush()
      assert(mv.isDeltaJoinMode, "the FULL-outer fold must survive the whole interleaving")
    }
  }

  test("multi-LEFT-join MV equals batch under random three-sided interleavings (round 11)") {
    val evT = "mlp_e"; val d1T = "mlp_d1"; val d2T = "mlp_d2"
    rw.createTable(evT, StructType(Seq(StructField("eid", LongType),
      StructField("uid", LongType), StructField("v", LongType))),
      primaryKey = Seq("eid"))
    rw.createTable(d1T, StructType(Seq(StructField("uid", LongType),
      StructField("nm", StringType))), primaryKey = Seq("uid"))
    rw.createTable(d2T, StructType(Seq(StructField("uid", LongType),
      StructField("tag", StringType)))) // no PK: fan-out legal
    val stmt = s"SELECT e.eid, u.nm, t.tag, e.v FROM $evT e " +
      s"LEFT JOIN $d1T u ON u.uid = e.uid LEFT JOIN $d2T t ON t.uid = e.uid"
    val mv = rw.mv(stmt, "mlp_mv")
    assert(mv.isDeltaJoinMode)
    sealed trait K
    case object Ev extends K; case object D1 extends K; case object D2 extends K
    case object DelE extends K; case object DelD1 extends K; case object DelD2 extends K
    case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(4 -> Ev, 2 -> D1, 2 -> D2,
        1 -> DelE, 1 -> DelD1, 1 -> DelD2, 2 -> Fl)
      eid <- Gen.choose(1L, 15L)
      uid <- Gen.choose(1L, 6L)
      v <- Gen.choose(0L, 99L)
      nm <- Gen.oneOf("ann", "bob", "cat")
    } yield (kind, eid, uid, v, nm)
    def rowsOf(sql: String): Seq[(Long, Option[String], Option[String], Long)] =
      rw.fetch(sql).map(r =>
        (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)), r.getLong(3))).sorted
    sample(Gen.listOfN(60, gen), seed = 16001).foreach {
      case (Ev, eid, uid, v, _) => rw.table(evT).get.insert(Seq(Row(eid, uid, v)))
      case (D1, _, uid, v, nm) => rw.table(d1T).get.insert(Seq(Row(uid, s"$nm$v")))
      case (D2, _, uid, v, nm) => rw.table(d2T).get.insert(Seq(Row(uid, s"t$nm$v")))
      case (DelE, eid, _, _, _) => rw.execute(s"DELETE FROM $evT WHERE eid = $eid")
      case (DelD1, _, uid, _, _) => rw.execute(s"DELETE FROM $d1T WHERE uid = $uid")
      case (DelD2, _, uid, _, _) => rw.execute(s"DELETE FROM $d2T WHERE uid = $uid")
      case (Fl, _, _, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM mlp_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    assert(mv.isDeltaJoinMode, "the multi-outer fold must survive the whole interleaving")
  }

  test("window-cascade MV equals batch under random upsert/delete interleavings (round 11)") {
    // expression PARTITION BY (computed bucket) — the lineage-derived key
    // path: touched partitions derive by evaluating the bucket expression
    // on the delta payload; whole-partition slices replace
    val t = "wcp_t"
    rw.createTable(t, StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    val stmt = s"SELECT id, grp, v, CAST(v % 3 AS BIGINT) AS bucket, " +
      "CAST(rank() OVER (PARTITION BY CAST(v % 3 AS BIGINT) " +
      s"ORDER BY v DESC, id) AS BIGINT) AS r FROM $t"
    val mv = rw.mv(stmt, "wcp_mv")
    assert(mv.isWindowCascadeMode,
      "the expression-key window cascade must admit (round 11)")
    sealed trait K
    case object Ins extends K; case object Del extends K; case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(5 -> Ins, 1 -> Del, 2 -> Fl)
      id <- Gen.choose(1L, 12L)
      grp <- Gen.oneOf("a", "b")
      v <- Gen.choose(0L, 30L)
    } yield (kind, id, grp, v)
    def rowsOf(sql: String): Seq[(Long, String, Long, Long, Long)] =
      rw.fetch(sql).map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).sorted
    sample(Gen.listOfN(60, gen), seed = 17001).foreach {
      case (Ins, id, grp, v) => rw.table(t).get.insert(Seq(Row(id, grp, v)))
      case (Del, id, _, _) => rw.execute(s"DELETE FROM $t WHERE id = $id")
      case (Fl, _, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM wcp_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    assert(mv.isWindowCascadeMode, "DML must not demote the window cascade")
  }

  test("agg-over-LEFT-join fold equals batch under random two-sided interleavings (round 11)") {
    val evT = "ajp_e"; val usT = "ajp_u"
    rw.createTable(evT, StructType(Seq(StructField("eid", LongType),
      StructField("uid", LongType), StructField("v", LongType))),
      primaryKey = Seq("eid"))
    rw.createTable(usT, StructType(Seq(StructField("uid", LongType),
      StructField("nm", StringType))), primaryKey = Seq("uid"))
    val stmt = s"SELECT u.nm AS label, count(*) AS n, CAST(sum(e.v) AS BIGINT) AS sv, " +
      s"max(e.v) AS mx FROM $evT e LEFT JOIN $usT u ON u.uid = e.uid GROUP BY u.nm"
    val mv = rw.mv(stmt, "ajp_mv")
    assert(mv.isDeltaAggMode,
      "agg-over-outer-join must delta-accumulate (round 11)")
    sealed trait K
    case object Ev extends K; case object Us extends K
    case object DelE extends K; case object DelU extends K
    case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(4 -> Ev, 3 -> Us, 1 -> DelE, 1 -> DelU, 2 -> Fl)
      eid <- Gen.choose(1L, 15L)
      uid <- Gen.choose(1L, 6L)
      v <- Gen.choose(0L, 99L)
      nm <- Gen.oneOf("ann", "bob", "cat")
    } yield (kind, eid, uid, v, nm)
    def rowsOf(sql: String): Seq[(Option[String], Long, Long, Long)] =
      rw.fetch(sql).map(r =>
        (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    sample(Gen.listOfN(60, gen), seed = 18001).foreach {
      case (Ev, eid, uid, v, _) => rw.table(evT).get.insert(Seq(Row(eid, uid, v)))
      case (Us, _, uid, v, nm) => rw.table(usT).get.insert(Seq(Row(uid, s"$nm$v")))
      case (DelE, eid, _, _, _) => rw.execute(s"DELETE FROM $evT WHERE eid = $eid")
      case (DelU, _, uid, _, _) => rw.execute(s"DELETE FROM $usT WHERE uid = $uid")
      case (Fl, _, _, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM ajp_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    assert(mv.isDeltaAggMode, "the outer-join agg fold must survive the interleaving")
  }

  test("global-window fold equals batch under random upsert/delete interleavings (round 12)") {
    // global rank (no PARTITION BY) with a prefix filter: the prefix-fold
    // mode carries the filtered input multiset, folds signed deltas and
    // re-ranks the carried state — never re-evaluating the base statement
    val t = "gwp_t"
    rw.createTable(t, StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    val stmt = s"SELECT id, grp, v, CAST(rank() OVER (ORDER BY v DESC, id) AS BIGINT) AS r " +
      s"FROM $t WHERE v >= 5"
    val mv = rw.mv(stmt, "gwp_mv")
    assert(mv.isGlobalWindowMode,
      "a global window must fold via the prefix cut (round 12)")
    sealed trait K
    case object Ins extends K; case object Del extends K; case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(5 -> Ins, 1 -> Del, 2 -> Fl)
      id <- Gen.choose(1L, 12L)
      grp <- Gen.oneOf("a", "b")
      v <- Gen.choose(0L, 30L)
    } yield (kind, id, grp, v)
    def rowsOf(sql: String): Seq[(Long, String, Long, Long)] =
      rw.fetch(sql).map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted
    sample(Gen.listOfN(60, gen), seed = 19001).foreach {
      case (Ins, id, grp, v) => rw.table(t).get.insert(Seq(Row(id, grp, v)))
      case (Del, id, _, _) => rw.execute(s"DELETE FROM $t WHERE id = $id")
      case (Fl, _, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM gwp_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    assert(mv.isGlobalWindowMode && mv.statementEvals <= 1,
      "the global-window fold must survive the interleaving with zero re-evals")
  }

  test("live-padded window cascade equals batch under random two-sided interleavings (round 12)") {
    // fact LEFT JOIN live_dim below a partitioned rank: dim churn flips
    // enrichment/padding of matching fact rows; touched partitions derive
    // from the restricted term (fact ⋉ dim delta)
    val fT = "wlp_f"; val dT = "wlp_d"
    rw.createTable(fT, StructType(Seq(StructField("id", LongType),
      StructField("uid", LongType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    rw.createTable(dT, StructType(Seq(StructField("uid", LongType),
      StructField("nm", StringType))), primaryKey = Seq("uid"))
    val stmt = s"SELECT f.id, f.uid, d.nm, f.v, CAST(rank() OVER " +
      s"(PARTITION BY f.uid ORDER BY f.v DESC, f.id) AS BIGINT) AS r " +
      s"FROM $fT f LEFT JOIN $dT d ON d.uid = f.uid"
    val mv = rw.mv(stmt, "wlp_mv")
    assert(mv.isWindowCascadeMode,
      "a live padded side below the window must admit (round 12)")
    sealed trait K
    case object Ev extends K; case object Us extends K
    case object DelE extends K; case object DelU extends K
    case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(4 -> Ev, 3 -> Us, 1 -> DelE, 1 -> DelU, 2 -> Fl)
      id <- Gen.choose(1L, 15L)
      uid <- Gen.choose(1L, 5L)
      v <- Gen.choose(0L, 99L)
      nm <- Gen.oneOf("ann", "bob", "cat")
    } yield (kind, id, uid, v, nm)
    def rowsOf(sql: String): Seq[(Long, Long, Option[String], Long, Long)] =
      rw.fetch(sql).map(r =>
        (r.getLong(0), r.getLong(1), Option(r.getString(2)), r.getLong(3),
          r.getLong(4))).sorted
    sample(Gen.listOfN(60, gen), seed = 19002).foreach {
      case (Ev, id, uid, v, _) => rw.table(fT).get.insert(Seq(Row(id, uid, v)))
      case (Us, _, uid, v, nm) => rw.table(dT).get.insert(Seq(Row(uid, s"$nm$v")))
      case (DelE, id, _, _, _) => rw.execute(s"DELETE FROM $fT WHERE id = $id")
      case (DelU, _, uid, _, _) => rw.execute(s"DELETE FROM $dT WHERE uid = $uid")
      case (Fl, _, _, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM wlp_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    assert(mv.isWindowCascadeMode,
      "the live-padded window cascade must survive the interleaving")
  }

  test("histogram-tier fold equals batch under random upsert/delete interleavings (round 12)") {
    // the round-12 delta-agg composition in one statement: two-level
    // distinct state (count+sum DISTINCT), the value-histogram percentile,
    // an argument-at-extremum slot, a FILTERed count, and a co-moment
    // covariance — all sharing one carried state keyed by (grp, v)
    val t = "htp_t"
    rw.createTable(t, StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("v", LongType))),
      primaryKey = Seq("id"))
    val stmt = s"SELECT grp, count(DISTINCT v) AS dv, " +
      s"CAST(sum(DISTINCT v) AS BIGINT) AS sdv, " +
      s"round(percentile(v, 0.5), 4) AS p50, max_by(v, id) AS latest, " +
      s"round(covar_pop(v, id), 4) AS cp, " +
      s"count(*) FILTER (WHERE v % 2 = 0) AS ne FROM $t GROUP BY grp"
    val mv = rw.mv(stmt, "htp_mv")
    assert(mv.isDeltaAggMode,
      "the histogram-tier composition must fold (round 12)")
    sealed trait K
    case object Ins extends K; case object Del extends K; case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(5 -> Ins, 2 -> Del, 2 -> Fl)
      id <- Gen.choose(1L, 14L)
      grp <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 12L)
    } yield (kind, id, grp, v)
    def rowsOf(sql: String): Seq[(String, Long, Any, Any, Any, Any, Long)] =
      rw.fetch(sql).map(r => (r.getString(0), r.getLong(1), r.get(2),
        r.get(3), r.get(4), r.get(5), r.getLong(6)))
        .sortBy(_._1)
    sample(Gen.listOfN(60, gen), seed = 19003).foreach {
      case (Ins, id, grp, v) => rw.table(t).get.insert(Seq(Row(id, grp, v)))
      case (Del, id, _, _) => rw.execute(s"DELETE FROM $t WHERE id = $id")
      case (Fl, _, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM htp_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    assert(mv.isDeltaAggMode,
      "the histogram-tier fold must survive the interleaving undemoted")
  }

  test("order-sensitive fold equals batch under random upsert/delete interleavings (round 13)") {
    // round-13 composition: ASC + DESC listagg and a sorted collect_list
    // share ONE dk histogram column; every face rebuilds from the
    // refcounted state at each flush and must equal the native batch
    // evaluation (deterministic: orderings are BY THE VALUE)
    val t = "osp_t"
    rw.createTable(t, StructType(Seq(StructField("id", LongType),
      StructField("grp", StringType), StructField("s", StringType))),
      primaryKey = Seq("id"))
    val stmt = s"SELECT grp, listagg(s, ',') WITHIN GROUP (ORDER BY s) AS sa, " +
      s"listagg(s, '+') WITHIN GROUP (ORDER BY s DESC) AS sad, " +
      s"array_join(sort_array(collect_list(s)), '|') AS aa, count(*) AS n " +
      s"FROM $t GROUP BY grp"
    val mv = rw.mv(stmt, "osp_mv")
    assert(mv.isDeltaAggMode,
      "the order-sensitive composition must fold (round 13)")
    sealed trait K
    case object Ins extends K; case object Del extends K; case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(5 -> Ins, 2 -> Del, 2 -> Fl)
      id <- Gen.choose(1L, 12L)
      grp <- Gen.oneOf("a", "b")
      sv <- Gen.oneOf("m", "q", "x", "y", "z")
    } yield (kind, id, grp, sv)
    def rowsOf(sql: String): Seq[(String, Any, Any, Any, Long)] =
      rw.fetch(sql).map(r => (r.getString(0), r.get(1), r.get(2), r.get(3),
        r.getLong(4))).sortBy(_._1)
    sample(Gen.listOfN(60, gen), seed = 19013).foreach {
      case (Ins, id, grp, sv) => rw.table(t).get.insert(Seq(Row(id, grp, sv)))
      case (Del, id, _, _) => rw.execute(s"DELETE FROM $t WHERE id = $id")
      case (Fl, _, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM osp_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    assert(mv.isDeltaAggMode,
      "the order-sensitive fold must survive the interleaving undemoted")
  }

  test("multi-source global-window fold equals batch under two-sided interleavings (round 14)") {
    // round 14 (verdict #1): the round-13 multi-source prefix fold — a
    // global rank over a UNION ALL of TWO live PK tables — had only a
    // vacuous oracle (its filter sat above the fixture max, 0 rows both
    // sides). This drives it with data: per-source signed delta terms,
    // later source bound to the reconstructed OLD snapshot of the
    // earlier one, membership flips crossing the prefix filter from
    // BOTH sides, at zero statement re-evaluations.
    val aT = "gwu_a"; val bT = "gwu_b"
    Seq(aT, bT).foreach { t =>
      rw.createTable(t, StructType(Seq(StructField("id", LongType),
        StructField("v", LongType))), primaryKey = Seq("id"))
    }
    val stmt = s"SELECT id, v, CAST(rank() OVER (ORDER BY v DESC, id) AS BIGINT) AS r " +
      s"FROM (SELECT id, v FROM $aT UNION ALL SELECT id, v FROM $bT) u WHERE v >= 5"
    val mv = rw.mv(stmt, "gwu_mv")
    assert(mv.isGlobalWindowMode,
      "a union-all global rank must take the multi-source prefix fold (round 13)")
    sealed trait K
    case object InsA extends K; case object InsB extends K
    case object DelA extends K; case object DelB extends K
    case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(4 -> InsA, 4 -> InsB, 1 -> DelA, 1 -> DelB, 2 -> Fl)
      id <- Gen.choose(1L, 12L)
      v <- Gen.choose(0L, 30L)
    } yield (kind, id, v)
    def rowsOf(sql: String): Seq[(Long, Long, Long)] =
      rw.fetch(sql).map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // disjoint id spaces per table (a: 100+id, b: 200+id) keep the union
    // a true multiset while upserts within each side retract freely
    sample(Gen.listOfN(70, gen), seed = 19014).foreach {
      case (InsA, id, v) => rw.table(aT).get.insert(Seq(Row(100L + id, v)))
      case (InsB, id, v) => rw.table(bT).get.insert(Seq(Row(200L + id, v)))
      case (DelA, id, _) => rw.execute(s"DELETE FROM $aT WHERE id = ${100L + id}")
      case (DelB, id, _) => rw.execute(s"DELETE FROM $bT WHERE id = ${200L + id}")
      case (Fl, _, _) =>
        rw.flush()
        val inc = rowsOf("SELECT * FROM gwu_mv")
        val batch = rowsOf(stmt)
        assert(inc == batch, s"$inc vs $batch")
    }
    rw.flush()
    val finalInc = rowsOf("SELECT * FROM gwu_mv")
    assert(finalInc.nonEmpty, "the interleaving must leave visible rows — a 0-row pass proves nothing")
    assert(mv.isGlobalWindowMode && mv.statementEvals <= 1,
      "the multi-source fold must survive the interleaving with zero re-evals")
  }

  test("affected-slice session tier equals batch under random append interleavings (round 14)") {
    // dense, out-of-order timestamps in a small range force every shape
    // the slice proof covers: tail extensions, cross-boundary merges,
    // bridges between old sessions, and far-past late rows whose affected
    // set degenerates to the whole key
    val t = "sprop_t"
    rw.createTable(t, StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampType), StructField("v", LongType))))
    val mv = rw.mv(
      s"""SELECT window_start, window_end, k, count(*) AS n,
         |  CAST(SUM(v) AS BIGINT) AS sv
         |FROM session($t, ts, interval '10 seconds')
         |GROUP BY window_start, window_end, k""".stripMargin, "sprop_mv")
    assert(mv.isSessionMode)
    def tsOf(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    sealed trait K
    case object Ins extends K; case object Late extends K; case object Fl extends K
    val gen = for {
      kind <- Gen.frequency(6 -> Ins, 1 -> Late, 2 -> Fl)
      k <- Gen.oneOf("a", "b")
      sec <- Gen.choose(100L, 400L)
      late <- Gen.choose(0L, 40L)
      v <- Gen.choose(1L, 50L)
    } yield (kind, k, sec, late, v)
    def stateOf(sql: String): Seq[(Long, Long, String, Long, Long)] =
      spark.sql(sql).collect().map(r =>
        (r.getTimestamp(0).toInstant.getEpochSecond,
         r.getTimestamp(1).toInstant.getEpochSecond,
         r.getString(2), r.getLong(3), r.getLong(4))).toSeq.sorted
    val batchSql =
      s"""SELECT session_window.start, session_window.end, k, count(*),
         |  CAST(SUM(v) AS BIGINT) FROM $t
         |GROUP BY session_window(ts, '10 seconds'), k""".stripMargin
    var sliceEpochs = 0
    sample(Gen.listOfN(70, gen), seed = 19014).foreach {
      case (Ins, k, sec, _, v) => rw.table(t).get.insert(Seq(Row(k, tsOf(sec), v)))
      case (Late, k, _, late, v) => rw.table(t).get.insert(Seq(Row(k, tsOf(late), v)))
      case (Fl, _, _, _, _) =>
        rw.flush()
        if (mv.sessionSliceActive) sliceEpochs += 1
        assert(stateOf("SELECT * FROM sprop_mv") == stateOf(batchSql))
    }
    rw.flush()
    assert(stateOf("SELECT * FROM sprop_mv") == stateOf(batchSql))
    assert(mv.sessionSliceActive && sliceEpochs > 3,
      "the slice tier must carry the interleaving, not fall back")
    assert(mv.isSessionMode)
  }
}
