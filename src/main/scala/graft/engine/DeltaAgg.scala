package graft.engine

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Expression, GreaterThan, If, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.functions.{broadcast, col, lit, sum}
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Algebraic delta-accumulation for keyed aggregate cascades — the
  * RisingWave-style aggregate operator: instead of recomputing touched
  * groups against the source's CURRENT snapshot (a base-table scan per
  * epoch, even with the semi-join pushed below the Aggregate), admitted
  * statements fold the source's 4-op changelog directly into carried
  * per-group auxiliary state:
  *
  *   cnt' = cnt + cntΔ⁺ − cntΔ⁻        sum' = sum ⊞ sumΔ⁺ ⊟ sumΔ⁻
  *
  * so per-epoch cost is proportional to the DELTA (plus a map-side state
  * merge), never to the base data. This is the classical decomposable-
  * aggregate IVM rule (Gray et al.'s distributive aggregates; the same
  * algebra Spark itself uses between partial and final aggregation).
  *
  * Admission (everything else falls back to touched-group recompute,
  * which is always correct):
  *  - the analyzed plan is a single root [[Aggregate]] whose child is
  *    multilinear in EXACTLY ONE changelog source (Project/Filter/inner
  *    joins with static dims — validated by the caller's linearity scan);
  *  - every aggregate call is Complete, non-DISTINCT, unfiltered
  *    COUNT(...) or SUM(x) with an integral or decimal x (double/float
  *    sums are excluded on purpose: re-associating their additions could
  *    drift from a batch evaluation at the last ulp, and exactness is the
  *    whole point of the oracle gate);
  *  - output columns are grouping keys or deterministic expressions over
  *    admitted aggregate calls and keys (CAST/round wrappers, folded
  *    HAVING predicates — all fine: the expression is re-evaluated over
  *    the derived aggregate values).
  *
  * NULL semantics: SUM must surface NULL exactly when a group has no
  * non-NULL inputs, so each sum carries a paired non-NULL counter; the
  * visible value is `IF(cnt > 0, sum, NULL)`. A group leaves the state
  * when its row count reaches zero (the cascade's Delete emission).
  */
private[engine] object DeltaAgg {

  /** One admitted aggregate call's auxiliary layout: `auxIdx` indexes the
    * first of its auxiliary columns — [sum, nonNullCnt] for SUM and AVG,
    * [cnt] for COUNT. */
  private final case class Slot(auxIdx: Int, kind: Int) {
    def isPair: Boolean = kind != KindCount
  }
  private val KindCount = 0
  private val KindSum = 1
  private val KindAvg = 2
  private def kindOf(ae: AggregateExpression): Int = ae.aggregateFunction match {
    case _: Sum => KindSum
    case _: Average => KindAvg
    case _ => KindCount
  }

  final class Spec private[DeltaAgg](
      private[DeltaAgg] val keyOutNames: Seq[String],
      private[DeltaAgg] val auxNames: Seq[String],
      private[DeltaAgg] val visibleCols: Seq[Column],
      /** row-count aux column name (a group vanishes at 0) */
      private[DeltaAgg] val rowsCol: String) {
    /** Output column names of the grouping keys (state key columns). */
    def keys: Seq[String] = keyOutNames
  }

  private def isKeyOutput(a: Aggregate, ne: NamedExpression): Boolean = ne match {
    case ar: AttributeReference => a.groupingExpressions.exists(_.semanticEquals(ar))
    case al: Alias => a.groupingExpressions.exists(_.semanticEquals(al.child))
    case _ => false
  }

  private def admittedCall(ae: AggregateExpression): Boolean =
    ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
      ae.aggregateFunction.children.forall(_.deterministic) &&
      (ae.aggregateFunction match {
        case _: Count => true
        case s: Sum => s.child.dataType match {
          case ByteType | ShortType | IntegerType | LongType | _: DecimalType => true
          case _ => false
        }
        // AVG only over decimal: its sum buffer is then decimal (exact
        // under re-association); integral/double children average through
        // a DOUBLE sum, which the exactness contract excludes
        case av: Average => av.child.dataType.isInstanceOf[DecimalType]
        case _ => false
      })

  /** Aggregate calls in deterministic traversal order — identical for the
    * original and a re-targeted analysis of the same statement text. */
  private def calls(a: Aggregate): Seq[AggregateExpression] =
    a.aggregateExpressions.flatMap(_.collect { case ae: AggregateExpression => ae })

  /** Admit `analyzed` (the ORIGINAL statement's plan) and build the spec.
    * None = not decomposable; caller keeps recompute mode. */
  def admit(analyzed: LogicalPlan): Option[Spec] = analyzed match {
    case a: Aggregate =>
      val cs = calls(a)
      if (cs.isEmpty || !cs.forall(admittedCall)) return None
      // slot layout, by traversal order
      var next = 0
      val slotByCall = new java.util.IdentityHashMap[AggregateExpression, Slot]()
      cs.foreach { ae =>
        val slot = Slot(next, kindOf(ae))
        slotByCall.put(ae, slot)
        next += (if (slot.isPair) 2 else 1)
      }
      val auxNames = cs.flatMap { ae =>
        val s = slotByCall.get(ae)
        if (s.isPair) Seq(s"__a${s.auxIdx}", s"__a${s.auxIdx + 1}")
        else Seq(s"__a${s.auxIdx}")
      } :+ RowsCol
      // visible mapping: key outputs pass through; everything else
      // re-evaluates over the derived aggregate values (unresolved
      // attribute references bind against the aux state frame)
      val keyNames = a.aggregateExpressions.filter(isKeyOutput(a, _)).map(_.name)
      val keyForAttr: Map[Long, String] = a.aggregateExpressions.collect {
        case ar: AttributeReference => ar.exprId.id -> ar.name
        case al: Alias => al.child match {
          case ar: AttributeReference => ar.exprId.id -> al.name
          case _ => -1L -> al.name
        }
      }.filter(_._1 >= 0).toMap
      var ok = true
      val vis = a.aggregateExpressions.map { ne =>
        if (isKeyOutput(a, ne)) col(ne.name)
        else {
          val derived = ne.transform {
            case ae: AggregateExpression if slotByCall.containsKey(ae) =>
              val s = slotByCall.get(ae)
              s.kind match {
                case KindSum =>
                  If(GreaterThan(UnresolvedAttribute(s"__a${s.auxIdx + 1}"), Literal(0L)),
                    UnresolvedAttribute(s"__a${s.auxIdx}"),
                    Literal(null, ae.dataType))
                case KindAvg =>
                  // Spark's own finish expression, re-bound to the aux
                  // sum/count columns (their types equal the avg buffer
                  // types, so re-analysis reproduces identical semantics)
                  val av = ae.aggregateFunction.asInstanceOf[Average]
                  av.evaluateExpression.transform {
                    case attr: AttributeReference if attr.exprId == av.sum.exprId =>
                      UnresolvedAttribute(s"__a${s.auxIdx}")
                    case attr: AttributeReference if attr.exprId == av.count.exprId =>
                      UnresolvedAttribute(s"__a${s.auxIdx + 1}")
                  }
                case _ => UnresolvedAttribute(s"__a${s.auxIdx}")
              }
            case ar: AttributeReference =>
              keyForAttr.get(ar.exprId.id) match {
                case Some(n) => UnresolvedAttribute(n)
                case None =>
                  // a non-key, non-aggregate leaf (e.g. an expression key's
                  // raw column reappearing in a compound output) — the
                  // value is not derivable from aux state
                  ok = false; ar
              }
          }
          GraftColumnBridge.column(derived match {
            case n: NamedExpression => n
            case e => Alias(e, ne.name)()
          })
        }
      }
      if (!ok) None
      else Some(new Spec(keyNames, auxNames, vis, RowsCol))
    case _ => None
  }

  private val RowsCol = "__g_rows"

  /** Auxiliary partial-aggregate frame over an analysis of the (possibly
    * delta-re-targeted) statement: same grouping, same key outputs, one
    * [sum, nonNullCnt] / [cnt] pair per admitted call, plus the group row
    * counter. */
  def aux(spark: SparkSession, spec: Spec, analyzed: LogicalPlan): DataFrame = {
    val a = analyzed.collectFirst { case ag: Aggregate => ag }.get
    val cs = calls(a)
    var next = 0
    val auxExprs: Seq[NamedExpression] = cs.flatMap { ae =>
      val kind = kindOf(ae)
      val base = next
      next += (if (kind != KindCount) 2 else 1)
      kind match {
        case KindSum =>
          val child = ae.aggregateFunction.children.head
          Seq(
            Alias(ae, s"__a$base")(),
            Alias(AggregateExpression(Count(Seq(child)), Complete, isDistinct = false,
              None, NamedExpression.newExprId), s"__a${base + 1}")())
        case KindAvg =>
          // the avg folds as its (decimal-exact) sum + non-null count
          val child = ae.aggregateFunction.children.head
          Seq(
            Alias(AggregateExpression(Sum(child), Complete, isDistinct = false,
              None, NamedExpression.newExprId), s"__a$base")(),
            Alias(AggregateExpression(Count(Seq(child)), Complete, isDistinct = false,
              None, NamedExpression.newExprId), s"__a${base + 1}")())
        case _ => Seq(Alias(ae, s"__a$base")())
      }
    } :+ Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false, None, NamedExpression.newExprId), RowsCol)()
    val keyOuts = a.aggregateExpressions.filter(isKeyOutput(a, _))
    GraftColumnBridge.ofRows(spark,
      Aggregate(a.groupingExpressions, keyOuts ++ auxExprs, a.child))
  }

  /** Fold an epoch's insert/retract auxiliary partials into the carried
    * state: rows for touched keys re-sum (state slice ∪ adds ∪ negated
    * dels), untouched rows pass through an anti join against the BROADCAST
    * touched-key set — the state never shuffles. Aux columns cast back to
    * the state schema (decimal addition widens). Groups whose row count
    * reaches zero drop (the caller's diff emits their Deletes). */
  def merge(state: DataFrame, addAux: DataFrame, delAux: DataFrame,
            spec: Spec): DataFrame = {
    val keys = spec.keyOutNames
    val auxCols = spec.auxNames
    def negate(df: DataFrame): DataFrame =
      df.select(keys.map(col) ++ auxCols.map(c => (col(c) * lit(-1)).as(c)): _*)
    if (keys.isEmpty) {
      // global aggregate: ONE row, always touched, NEVER dropped — a
      // global aggregate over an empty input still yields its row
      // (count 0, sums NULL), exactly like the batch evaluation
      return state.unionByName(addAux).unionByName(negate(delAux))
        .groupBy()
        .agg(auxCols.map(c => sum(col(c)).as(c)).head,
             auxCols.map(c => sum(col(c)).as(c)).tail: _*)
        .select(spec.auxNames.map { c =>
          checkedCast(col(c), state.schema(c).dataType).as(c)
        }: _*)
    }
    val touched = addAux.select(keys.map(col): _*)
      .union(delAux.select(keys.map(col): _*)).distinct()
    val kr = touched.toDF(keys.map(k => s"__k_$k"): _*)
    def keyCond(df: DataFrame) =
      keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    val stateTouched = state.join(broadcast(kr), keyCond(state), "left_semi")
    val untouched = state.join(broadcast(kr), keyCond(state), "left_anti")
    val resummed = stateTouched
      .unionByName(addAux)
      .unionByName(negate(delAux))
      .groupBy(keys.map(col): _*)
      .agg(auxCols.map(c => sum(col(c)).as(c)).head,
           auxCols.map(c => sum(col(c)).as(c)).tail: _*)
      .filter(col(spec.rowsCol) > 0)
      // cast aux sums back to the state schema: decimal addition widens
      // the type per fold, and an ever-widening state schema would break
      // both the union above and the persisted snapshot
      .select(keys.map(col) ++ spec.auxNames.map { c =>
        checkedCast(col(c), state.schema(c).dataType).as(c)
      }: _*)
    untouched.unionByName(resummed)
  }

  /** Cast a folded aux value back to the state schema, RAISING when the
    * narrowing cast would silently turn a non-NULL value into NULL
    * (decimal precision overflow under non-ANSI evaluation): the raised
    * error aborts the epoch's fold inside the caller's checkpoint, and
    * [[graft.engine.MaterializedView]]'s foldAux catch drops the spec —
    * so precision overflow degrades to the always-correct touched-group
    * recompute instead of silently corrupting the carried sum. */
  private def checkedCast(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.functions.{lit, raise_error, when}
    val casted = c.cast(dt)
    when(c.isNotNull && casted.isNull,
      raise_error(lit("graft delta-agg fold overflowed the state precision"))
        .cast(dt))
      .otherwise(casted)
  }

  /** The statement's visible output derived from aux state — lazy; the
    * caller checkpoints the (narrow) aux state only. */
  def visible(state: DataFrame, spec: Spec): DataFrame =
    state.select(spec.visibleCols: _*)

  /** The epoch's touched keys as a frame over the aux deltas (already
    * grouped — orders smaller than the state). */
  def touchedKeys(addAux: DataFrame, delAux: DataFrame, spec: Spec): DataFrame =
    addAux.select(spec.keyOutNames.map(col): _*)
      .union(delAux.select(spec.keyOutNames.map(col): _*)).distinct()
}
