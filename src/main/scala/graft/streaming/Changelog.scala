package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** 4-op changelog generation (SURVEY §2.6 W3): diff of two keyed snapshots
  * into RisingWave's change envelope — `Insert`, `Delete`, and the
  * retraction pair `UpdateDelete`/`UpdateInsert` (observed ops
  * `demo.py:50`; the full envelope is RisingWave's documented public
  * contract). Emission order within an epoch is deterministic: sorted by
  * key, with UpdateDelete immediately preceding its UpdateInsert.
  *
  * This is a distributed diff (full outer join on the key columns) — the
  * component Spark itself lacks (SURVEY §4.2): stateful streaming aggs give
  * you new values, not retractions.
  */
object Changelog {
  val OpInsert = "Insert"
  val OpDelete = "Delete"
  val OpUpdateDelete = "UpdateDelete"
  val OpUpdateInsert = "UpdateInsert"

  /** Order rank used to serialize an epoch's ops deterministically. */
  private val opRank = map(
    lit(OpDelete), lit(0), lit(OpUpdateDelete), lit(1),
    lit(OpUpdateInsert), lit(2), lit(OpInsert), lit(3))

  /** Diff `prev` → `next` keyed by `keyCols`; both must share a schema.
    * Returns the change rows: payload columns + `op`, sorted by key then op
    * rank. `prev = None` means everything in `next` is an Insert.
    * `keyCols = Nil` means a single-row (global aggregate) result: the one
    * row's change is an UpdateDelete/UpdateInsert pair, never Insert+Delete.
    * For keyless multi-row snapshots use [[multisetDiff]]. */
  def diff(prev: Option[DataFrame], next: DataFrame, keyCols: Seq[String],
           wide: Boolean = false): DataFrame = {
    val cols = next.columns.toSeq
    val valueCols = cols.filterNot(keyCols.contains)

    // Ordering note: every consumer appends the ops to a changelog segment
    // through a single-partition write (ChangeLog.appendDF coalesce(1)), so
    // a GLOBAL sort's range-sampling pass (an extra Spark job per epoch)
    // buys nothing — coalesce first and sort the one partition in place.
    // The post-shuffle stage ran as one task under the old orderBy +
    // coalesce(1) combination anyway; this is the same parallelism with
    // one fewer job and one fewer exchange per epoch.
    //
    // EXCEPT on `wide = true` (the initial-backfill epoch, round-10): there
    // the delta is the WHOLE statement result, and funnelling it through
    // one sort+write task is the scale bottleneck the steady-state
    // reasoning above does not cover. Backfill keeps the global range sort
    // (multi-partition; AQE sizes the partition count to the data) and the
    // segment writes one file per partition — appendDF stamps offsets
    // per-partition with zipWithIndex, which preserves the sort order.
    prev match {
      case None =>
        val ins = next.withColumn("op", lit(OpInsert))
        if (wide) ins.orderBy(keyCols.map(col) :+ col("op"): _*)
        else ins.coalesce(1)
          .sortWithinPartitions(keyCols.map(col) :+ col("op"): _*)
      case Some(p) =>
        val pr = p.select(cols.map(c => col(c).as(s"__p_$c")): _*)
        val nr = next.select(cols.map(c => col(c).as(s"__n_$c")): _*)
        val cond = keyCols.map(k => col(s"__p_$k") <=> col(s"__n_$k"))
          .reduceOption(_ && _).getOrElse(lit(true))
        val joined = pr.join(nr, cond, "full_outer")

        // presence test: a side absent from the outer join is all-null
        val pPresent = joined.columns.filter(_.startsWith("__p_")).map(col(_).isNotNull).reduce(_ || _)
        val nPresent = joined.columns.filter(_.startsWith("__n_")).map(col(_).isNotNull).reduce(_ || _)
        val changed =
          if (valueCols.isEmpty) lit(false)
          else !(struct(valueCols.map(c => col(s"__p_$c")): _*) <=>
                 struct(valueCols.map(c => col(s"__n_$c")): _*))

        val inserts = joined.filter(!pPresent && nPresent)
          .select(cols.map(c => col(s"__n_$c").as(c)) :+ lit(OpInsert).as("op"): _*)
        val deletes = joined.filter(pPresent && !nPresent)
          .select(cols.map(c => col(s"__p_$c").as(c)) :+ lit(OpDelete).as("op"): _*)
        val updatesOld = joined.filter(pPresent && nPresent && changed)
          .select(cols.map(c => col(s"__p_$c").as(c)) :+ lit(OpUpdateDelete).as("op"): _*)
        val updatesNew = joined.filter(pPresent && nPresent && changed)
          .select(cols.map(c => col(s"__n_$c").as(c)) :+ lit(OpUpdateInsert).as("op"): _*)

        inserts.union(deletes).union(updatesOld).union(updatesNew)
          .coalesce(1)
          .sortWithinPartitions(keyCols.map(col) :+ element_at(opRank, col("op")): _*)
    }
  }

  /** Specialized diff for the update-mode streaming path, where `prev` is
    * the previous snapshot RESTRICTED to the delta's keys (a semi-join), so
    * prev's keys ⊆ next's keys by construction and Deletes are impossible.
    * That admits a broadcast LEFT OUTER join (full-outer cannot broadcast):
    * with a small per-epoch delta both sides avoid the exchange entirely —
    * the generic [[diff]] paid a two-sided shuffle sort-merge join per
    * epoch for op classes that cannot occur. Ops and ordering are
    * bit-identical to [[diff]] on such inputs. */
  def updateDiff(prev: DataFrame, next: DataFrame, keyCols: Seq[String]): DataFrame = {
    val cols = next.columns.toSeq
    val valueCols = cols.filterNot(keyCols.contains)
    val pr = prev.select(cols.map(c => col(c).as(s"__p_$c")): _*)
    val cond = keyCols.map(k => col(s"__p_$k") <=> col(k))
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined = next.join(broadcast(pr), cond, "left_outer")
    val pPresent = joined.columns.filter(_.startsWith("__p_")).map(col(_).isNotNull).reduce(_ || _)
    val changed =
      if (valueCols.isEmpty) lit(false)
      else !(struct(valueCols.map(c => col(s"__p_$c")): _*) <=>
             struct(valueCols.map(col): _*))
    val inserts = joined.filter(!pPresent)
      .select(cols.map(col) :+ lit(OpInsert).as("op"): _*)
    val updatesOld = joined.filter(pPresent && changed)
      .select(cols.map(c => col(s"__p_$c").as(c)) :+ lit(OpUpdateDelete).as("op"): _*)
    val updatesNew = joined.filter(pPresent && changed)
      .select(cols.map(col) :+ lit(OpUpdateInsert).as("op"): _*)
    inserts.union(updatesOld).union(updatesNew)
      .coalesce(1)
      .sortWithinPartitions(keyCols.map(col) :+ element_at(opRank, col("op")): _*)
  }

  /** Multiset diff for keyless snapshots (no grouping key survives in the
    * output, or the MV is a plain row stream that can hold duplicate rows):
    * per distinct row, emit |Δcount| Inserts or Deletes. Correct where a
    * row-equality full-outer join would collapse or multiply duplicates. */
  def multisetDiff(prev: Option[DataFrame], next: DataFrame,
                   wide: Boolean = false): DataFrame = {
    val cols = next.columns.toSeq
    prev match {
      case None =>
        // wide = initial backfill: multi-partition global sort instead of
        // the single-task funnel — see [[diff]]'s ordering note
        val ins = next.withColumn("op", lit(OpInsert))
        if (wide) ins.orderBy(cols.map(col): _*)
        else ins.coalesce(1).sortWithinPartitions(cols.map(col): _*)
      case Some(p) =>
        // null-safe (<=>) join keys: a row containing NULL must match
        // itself across epochs, else every refresh emits a phantom
        // Delete+Insert pair for it
        val pc = p.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__pc"))
          .select(cols.map(c => col(c).as(s"__p_$c")) :+ col("__pc"): _*)
        val nc = next.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__nc"))
        val cond = cols.map(c => col(s"__p_$c") <=> col(c)).reduce(_ && _)
        val delta = pc.join(nc, cond, "full_outer")
          .select(cols.map(c => coalesce(col(c), col(s"__p_$c")).as(c)) :+
            (coalesce(col("__nc"), lit(0L)) - coalesce(col("__pc"), lit(0L))).as("__d"): _*)
          .filter(col("__d") =!= 0)
        netOps(delta, cols, "__d")
    }
  }

  /** [[multisetDiff]] over frames that are ALREADY grouped as
    * (row → count in `cnt`) — the window cascade's carried-state
    * representation (round 11): skips the expand-then-regroup round trip
    * the ungrouped spelling would pay on the state side. Emission order
    * and op counts are byte-identical to multisetDiff of the expanded
    * frames. */
  private[graft] def multisetDiffGrouped(prevG: DataFrame, nextG: DataFrame,
                                         cnt: String): DataFrame = {
    val cols = nextG.columns.filterNot(_ == cnt).toSeq
    val pc = prevG.select(cols.map(c => col(c).as(s"__p_$c")) :+ col(cnt).as("__pc"): _*)
    val nc = nextG.withColumnRenamed(cnt, "__nc")
    val cond = cols.map(c => col(s"__p_$c") <=> col(c)).reduce(_ && _)
    val delta = pc.join(nc, cond, "full_outer")
      .select(cols.map(c => coalesce(col(c), col(s"__p_$c")).as(c)) :+
        (coalesce(col("__nc"), lit(0L)) - coalesce(col("__pc"), lit(0L))).as("__d"): _*)
      .filter(col("__d") =!= 0)
    netOps(delta, cols, "__d")
  }

  /** Serialize a net per-row multiset delta (`dCol` = signed count per
    * distinct row) into the op envelope: |Δ| Inserts or Deletes per row,
    * in the same deterministic emission order as [[multisetDiff]]. Shared
    * by the full-state multiset diff above and the delta-join cascade
    * ([[graft.engine.MaterializedView]]), whose per-epoch delta arrives
    * already netted — re-diffing the whole state would waste an O(state)
    * shuffle on a delta-proportional change. */
  private[graft] def netOps(delta: DataFrame, cols: Seq[String], dCol: String): DataFrame =
    delta
      .select(cols.map(col) :+ col(dCol) :+
        explode(sequence(lit(1L), abs(col(dCol)))).as("__i"): _*)
      .select(cols.map(col) :+
        when(col(dCol) > 0, lit(OpInsert)).otherwise(lit(OpDelete)).as("op"): _*)
      .coalesce(1)
      .sortWithinPartitions(cols.map(col) :+ element_at(opRank, col("op")): _*)

  private val localOpRank =
    Map(OpDelete -> 0, OpUpdateDelete -> 1, OpUpdateInsert -> 2, OpInsert -> 3)

  /** Driver-side [[multisetDiff]] for BOUNDED snapshots — the top-N
    * maintainer's visible set is ≤ n rows by definition, so diffing it as
    * a distributed query spends several Spark jobs (group, full-outer
    * join, explode, sort) on a handful of driver-resident rows every
    * epoch. Same delta semantics and the same deterministic emission order
    * (row columns ascending NULLS FIRST, then op rank), zero jobs.
    *
    * Returns None when a column's type has no local ordering equivalent to
    * Spark's sort (caller falls back to the distributed diff). Strings
    * compare as UTF-8 bytes — Spark's binary string order, which differs
    * from java.lang.String's UTF-16 order above the BMP. */
  def localMultisetDiff(prev: Option[Seq[Row]], next: Seq[Row],
      schema: org.apache.spark.sql.types.StructType): Option[Seq[Row]] = {
    val ords = schema.fields.map(f => localOrdering(f.dataType))
    if (ords.exists(_.isEmpty)) return None
    val counts = scala.collection.mutable.LinkedHashMap[Row, Long]()
    next.foreach(r => counts.update(r, counts.getOrElse(r, 0L) + 1L))
    prev.getOrElse(Nil).foreach(r => counts.update(r, counts.getOrElse(r, 0L) - 1L))
    val ops = counts.iterator.filter(_._2 != 0L).flatMap { case (r, d) =>
      val op = if (d > 0) OpInsert else OpDelete
      Iterator.fill(math.abs(d).toInt)((r, op))
    }.toIndexedSeq
    val fieldOrds = ords.map(_.get)
    val rowOrd = new Ordering[(Row, String)] {
      def compare(a: (Row, String), b: (Row, String)): Int = {
        var i = 0
        while (i < fieldOrds.length) {
          val c = fieldOrds(i).compare(a._1.get(i), b._1.get(i))
          if (c != 0) return c
          i += 1
        }
        localOpRank(a._2) - localOpRank(b._2)
      }
    }
    Some(ops.sorted(rowOrd).map { case (r, op) => Row.fromSeq(r.toSeq :+ op) })
  }

  /** Driver-side equivalent of [[updateDiff]] for a keyed update-mode
    * delta whose previous per-key values are already known (a state
    * mirror): Insert for brand-new keys, UpdateDelete/UpdateInsert for
    * changed ones, nothing for value-identical rows — sorted by the key
    * columns (ascending NULLS FIRST, Spark's binary string order) then op
    * rank, byte-identical to [[updateDiff]]'s emission order. Zero Spark
    * jobs. None when a key column's type has no local ordering
    * equivalent (caller falls back to the distributed diff). */
  private[graft] def localUpdateDiff(pairs: Seq[(Option[Row], Row)],
      keyIdx: Array[Int],
      schema: org.apache.spark.sql.types.StructType): Option[Seq[Row]] = {
    val keyOrds = keyIdx.map(i => localOrdering(schema.fields(i).dataType))
    if (keyOrds.exists(_.isEmpty)) return None
    val fieldOrds = keyOrds.map(_.get)
    val ops = pairs.iterator.flatMap {
      case (None, nw) => Iterator((nw, OpInsert))
      case (Some(o), nw) if o == nw => Iterator.empty
      case (Some(o), nw) => Iterator((o, OpUpdateDelete), (nw, OpUpdateInsert))
    }.toIndexedSeq
    val rowOrd = new Ordering[(Row, String)] {
      def compare(a: (Row, String), b: (Row, String)): Int = {
        var i = 0
        while (i < keyIdx.length) {
          val c = fieldOrds(i).compare(a._1.get(keyIdx(i)), b._1.get(keyIdx(i)))
          if (c != 0) return c
          i += 1
        }
        localOpRank(a._2) - localOpRank(b._2)
      }
    }
    Some(ops.sorted(rowOrd).map { case (r, op) => Row.fromSeq(r.toSeq :+ op) })
  }

  /** Driver-side equivalent of [[diff]] for two KEYED row sets (each key
    * at most once per side — grouped-aggregate snapshots): Insert for keys
    * only in next, Delete for keys only in prev, UpdateDelete/UpdateInsert
    * for value-changed keys — sorted by key columns (ascending NULLS
    * FIRST) then op rank, byte-identical to [[diff]]'s emission order.
    * Zero Spark jobs; None when a key type has no local ordering. Used by
    * the cascade epoch on its touched-group-restricted (delta-sized)
    * frames — the distributed full-outer diff spent several jobs per
    * epoch on a handful of rows. */
  private[graft] def localKeyedDiff(prev: Seq[Row], next: Seq[Row],
      keyIdx: Array[Int],
      schema: org.apache.spark.sql.types.StructType): Option[Seq[Row]] = {
    val keyOrds = keyIdx.map(i => localOrdering(schema.fields(i).dataType))
    if (keyOrds.exists(_.isEmpty)) return None
    val fieldOrds = keyOrds.map(_.get)
    def keyOf(r: Row): List[Any] = keyIdx.map(r.get).toList
    val prevByKey = prev.map(r => keyOf(r) -> r).toMap
    val nextByKey = next.map(r => keyOf(r) -> r).toMap
    val ops = scala.collection.mutable.ArrayBuffer[(Row, String)]()
    next.foreach { n =>
      prevByKey.get(keyOf(n)) match {
        case None => ops += ((n, OpInsert))
        case Some(p) if p == n => ()
        case Some(p) => ops += ((p, OpUpdateDelete)); ops += ((n, OpUpdateInsert))
      }
    }
    prev.foreach { p => if (!nextByKey.contains(keyOf(p))) ops += ((p, OpDelete)) }
    val rowOrd = new Ordering[(Row, String)] {
      def compare(a: (Row, String), b: (Row, String)): Int = {
        var i = 0
        while (i < keyIdx.length) {
          val c = fieldOrds(i).compare(a._1.get(keyIdx(i)), b._1.get(keyIdx(i)))
          if (c != 0) return c
          i += 1
        }
        localOpRank(a._2) - localOpRank(b._2)
      }
    }
    Some(ops.sorted(rowOrd).map { case (r, op) => Row.fromSeq(r.toSeq :+ op) }.toSeq)
  }

  /** [[diff]] that prefers the driver-side [[localKeyedDiff]] when both
    * sides fit under `bound` rows (each side costs one bounded
    * limit-collect; the result is a LocalRelation frame) and falls back to
    * the distributed diff otherwise. Emission order identical either way.
    * For inputs that are delta-bounded by construction (touched-key
    * restrictions), this turns a multi-job full-outer diff into two small
    * collects. */
  private[graft] def diffPreferLocal(prev: DataFrame, next: DataFrame,
      keyCols: Seq[String], bound: Int): DataFrame = {
    val schema = next.schema
    def isLocalPlan(df: DataFrame) = df.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
    val local = if (isLocalPlan(prev) && isLocalPlan(next)) {
      // both sides collapsed to LocalRelations (driver-tier state through
      // the optimizer's Project/Filter folding, round 15): collect() is
      // driver-side row conversion — the whole diff costs ZERO Spark jobs
      val prevT = prev.collect()
      val nextT = next.collect()
      if (prevT.length > bound || nextT.length > bound) None
      else localKeyedDiff(prevT.toIndexedSeq, nextT.toIndexedSeq,
        keyCols.map(schema.fieldIndex).toArray, schema)
    } else {
      // ONE side-tagged collect for both frames (the separate per-side
      // limit-collects were two jobs; both sides are delta-bounded by
      // construction, so the fused job is the same size class)
      val cols = schema.fieldNames.toIndexedSeq.map(col)
      val both = prev.select(cols :+ lit(0).as("__side"): _*)
        .unionByName(next.select(cols :+ lit(1).as("__side"): _*))
      // all leaves driver-resident (carried state tiers, touched frames):
      // one partition → the fused collect is ONE single-task job with no
      // exchange, instead of executeTake scaling over the union's legs
      // (round 15). Any distributed leaf keeps the multi-partition plan —
      // the at-scale path.
      val leaves = both.queryExecution.analyzed.collectLeaves()
      val fused =
        if (leaves.nonEmpty && leaves.forall(
            _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
          both.coalesce(1)
        else both
      val tagged = fused.limit(2 * bound + 2).collect()
      val (prevT, nextT) = tagged.partition(_.getInt(schema.length) == 0)
      def untag(r: Row) = Row.fromSeq(r.toSeq.dropRight(1))
      if (prevT.length > bound || nextT.length > bound) None
      else localKeyedDiff(prevT.iterator.map(untag).toIndexedSeq,
        nextT.iterator.map(untag).toIndexedSeq,
        keyCols.map(schema.fieldIndex).toArray, schema)
    }
    local match {
      case Some(ops) =>
        val opSchema = schema.add("op", org.apache.spark.sql.types.StringType)
        next.sparkSession.createDataFrame(
          java.util.Arrays.asList(ops.toIndexedSeq: _*), opSchema)
      case None => diff(Some(prev), next, keyCols)
    }
  }

  /** Local equivalent of Spark's ascending NULLS FIRST ordering for one
    * column type; None where the equivalence isn't certain. */
  private[graft] def localOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    def nullsFirst(cmp: (Any, Any) => Int): Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else cmp(a, b)
    }
    dt match {
      case StringType => Some(nullsFirst { (a, b) =>
        // unsigned byte-wise compare == UTF8String.binaryCompare
        val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(x.length, y.length)
        var i = 0
        var c = 0
        while (i < n && c == 0) {
          c = (x(i) & 0xff) - (y(i) & 0xff)
          i += 1
        }
        if (c != 0) c else x.length - y.length
      })
      case BooleanType => Some(nullsFirst((a, b) =>
        java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])))
      case ByteType | ShortType | IntegerType | LongType => Some(nullsFirst((a, b) =>
        java.lang.Long.compare(a.asInstanceOf[Number].longValue(),
          b.asInstanceOf[Number].longValue())))
      case FloatType => Some(nullsFirst((a, b) =>
        java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])))
      case DoubleType => Some(nullsFirst((a, b) =>
        java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])))
      case _: DecimalType => Some(nullsFirst((a, b) =>
        a.asInstanceOf[java.math.BigDecimal]
          .compareTo(b.asInstanceOf[java.math.BigDecimal])))
      case DateType => Some(nullsFirst((a, b) =>
        a.asInstanceOf[java.sql.Date].compareTo(b.asInstanceOf[java.sql.Date])))
      case TimestampType => Some(nullsFirst((a, b) =>
        a.asInstanceOf[java.sql.Timestamp].compareTo(b.asInstanceOf[java.sql.Timestamp])))
      case TimestampNTZType => Some(nullsFirst((a, b) =>
        a.asInstanceOf[java.time.LocalDateTime]
          .compareTo(b.asInstanceOf[java.time.LocalDateTime])))
      case _ => None
    }
  }
}
