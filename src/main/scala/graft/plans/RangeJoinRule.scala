package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite nested-loop range joins into banded equi-joins.
  *
  * A join whose only cross-side predicates are interval bounds —
  * `l.point >= r.lo AND l.point <= r.hi` (either side may hold the
  * point; strict `<`/`>` allowed) — has no equi keys, so Spark plans
  * BroadcastNestedLoopJoin (or a cartesian product): O(|L|·|R|)
  * comparisons, the classic 100 TB scale-killer. The reference keeps
  * such joins expressible as plain theta conditions
  * (src/db_parsing.jl:503-519) and inherits whatever plan the engine
  * picks; this rule upgrades the plan instead of the API.
  *
  * Rewrite (the same shape as [[graft.operators.JoinVerbs.rangeJoin]],
  * but applied transparently by the optimizer):
  *   - band the point side by `x - pmod(x, w)` (exact long arithmetic,
  *     floor-aligned for negatives — no division, no double rounding);
  *   - explode each interval to the band starts it covers with a
  *     stepped `sequence(bandStart(lo), bandStart(hi), w)`, guarded so
  *     NULL/inverted intervals yield zero bands (`sequence(1,0)`
  *     DESCENDS rather than returning empty);
  *   - equi-join on the band key and keep every original conjunct as
  *     the exact filter.
  * A point row lives in exactly ONE band, so each qualifying pair is
  * emitted exactly once — no dedup pass. The one wide stage becomes a
  * hash/sort-merge join on the band key; right-side cost is
  * Σ interval_len / bandWidth extra rows.
  *
  * Activation: set `spark.graft.rangeJoin.bandWidth` (session conf) to
  * the band width in the point column's native units (MICROSECONDS for
  * timestamps — they convert via `unix_micros`; the raw value for
  * integral columns), or to `auto` to let the rule PROBE the interval
  * statistics: one cheap `avg(hi - lo)` aggregation over the interval
  * side at planning time (the same measure-don't-guess shape as
  * `ScaleOps.autoSaltBuckets`), width = mean interval length + 1 so a
  * typical interval explodes to ~2 bands. Probe results are memoized
  * per (interval plan, bounds) so repeated planning reuses the job; a
  * cache hit on a colliding hash can only mis-SIZE the bands, never
  * change results. Unset/0 disables the rule (the default).
  *
  * Scope guards:
  *   - inner joins only (outer variants need unmatched-row recovery the
  *     banded shape doesn't give directly);
  *   - joins that already HAVE a cross-side equi conjunct are left
  *     alone — Catalyst extracts those as hash keys and the range
  *     bounds ride along as post-join filters, which is already the
  *     scalable plan (this also makes the rule idempotent: the rewritten
  *     join carries a band equality, so it never re-matches);
  *   - point/bounds must be deterministic and integral/timestamp-typed
  *     (exact long conversion only — no float banding).
  *
  * Registration: `spark.sql.extensions=graft.GraftExtensions` or
  * `GraftExtensions.register(spark)` (same-session, via
  * `experimental.extraOptimizations`).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BandWidthKey = "spark.graft.rangeJoin.bandWidth"

  /** sentinel for `bandWidth=auto` (probe the interval stats) */
  private val AutoWidth = -1L

  private def configuredWidth: Long = {
    val raw = conf.getConfString(BandWidthKey, "0").trim
    if (raw.equalsIgnoreCase("auto")) AutoWidth
    else try math.max(0L, raw.toLong)
    catch { case _: NumberFormatException => 0L }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = configuredWidth
    if (w == 0L) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, w).getOrElse(j)
    }
  }

  /** (interval plan, bounds) → probed width memo: the optimizer plans
    * the same join repeatedly; the probe job should run once */
  private val probeCache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Long]()

  /** `auto` width: one aggregation over the interval side —
    * `avg(hi - lo)` — at planning time; width = mean length + 1. An
    * empty/all-NULL interval side gets width 1 (any width is correct
    * there: zero intervals explode to zero bands). */
  private def probedWidth(intervalChild: LogicalPlan, loL: Expression, hiL: Expression): Long = {
    val key = (intervalChild.semanticHash(),
      loL.canonicalized.hashCode(), hiL.canonicalized.hashCode())
    val hit = probeCache.get(key)
    if (hit != 0L) return hit
    val spark = org.apache.spark.sql.SparkSession.active
    val len = Alias(Subtract(hiL, loL), "__graft_len")()
    val probe = org.apache.spark.sql.graftshim.GraftShim
      .ofRows(spark, Project(Seq(len), intervalChild))
      .selectExpr("avg(__graft_len)").head()
    val w =
      if (probe.isNullAt(0)) 1L
      else math.max(1L, math.ceil(probe.getDouble(0)).toLong + 1L)
    if (probeCache.size > 64) probeCache.clear()
    probeCache.put(key, w)
    w
  }

  /** exact → long conversions; None = unsupported type.
    * TimestampNTZ matters in practice: parquet written with
    * isAdjustedToUTC=false (pyarrow's default) reads back as NTZ, and
    * the rule silently declining there turns the most common
    * event-time range join back into a nested loop. */
  private def toLong(e: Expression): Option[Expression] = e.dataType match {
    case LongType                                     => Some(e)
    case ByteType | ShortType | IntegerType           => Some(Cast(e, LongType))
    case TimestampType                                => Some(UnixMicros(e))
    case TimestampNTZType                             => Some(NtzMicros(e))
    case _                                            => None
  }

  private def bandStart(x: Expression, w: Long): Expression =
    Subtract(x, Pmod(x, Literal(w)))

  /** One comparison read both ways: (point, bound, boundIsLower). */
  private def boundViews(e: Expression): Seq[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
    case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
    case _                        => Nil
  }

  private def rewrite(j: Join, cond: Expression, width: Long): Option[LogicalPlan] = {
    val left = j.left; val right = j.right
    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left-only
      val r = e.references
      if (r.isEmpty) None
      else if (r.subsetOf(left.outputSet)) Some(true)
      else if (r.subsetOf(right.outputSet)) Some(false)
      else None
    }

    val conjuncts = splitConjunctivePredicates(cond)

    // leave alone if Catalyst already has a hash key for this join
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => sideOf(a).isDefined && sideOf(b).isDefined && sideOf(a) != sideOf(b)
      case EqualNullSafe(a, b) => sideOf(a).isDefined && sideOf(b).isDefined && sideOf(a) != sideOf(b)
      case _                   => false
    }
    if (hasEqui) return None

    // candidate bounds: point on one side, bound on the other, both
    // deterministic, exact-long-convertible
    val candidates = conjuncts.flatMap(boundViews).flatMap {
      case (pt, bd, isLower) =>
        (sideOf(pt), sideOf(bd)) match {
          case (Some(ps), Some(bs))
              if ps != bs && pt.deterministic && bd.deterministic &&
                toLong(pt).isDefined && toLong(bd).isDefined =>
            Some((pt, bd, isLower, ps))
          case _ => None
        }
    }
    val pair: Option[(Expression, Expression, Expression, Boolean)] =
      candidates.iterator.flatMap {
        case (pt, lo, true, ps) =>
          candidates.collectFirst {
            case (pt2, hi, false, ps2) if ps2 == ps && pt2.semanticEquals(pt) =>
              (pt, lo, hi, ps)
          }
        case _ => None
      }.nextOption()
    pair.map { case (pt, lo, hi, pointOnLeft) =>
      val (pointChild, intervalChild) = if (pointOnLeft) (left, right) else (right, left)

      val ptL = toLong(pt).get; val loL = toLong(lo).get; val hiL = toLong(hi).get
      val w = if (width == AutoWidth) probedWidth(intervalChild, loL, hiL) else width
      val bandP = Alias(bandStart(ptL, w), "__graft_band_p")()
      val pointProj = Project(pointChild.output :+ bandP, pointChild)

      val emptyBands =
        Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false))
      // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED without
      // a timezone even for pure-long sequences — bind the session tz.
      val bands = If(
        And(IsNotNull(lo), And(IsNotNull(hi), GreaterThanOrEqual(hiL, loL))),
        Sequence(bandStart(loL, w), bandStart(hiL, w), Some(Literal(w)),
          Some(conf.sessionLocalTimeZone)),
        emptyBands)
      val bandsAlias = Alias(bands, "__graft_bands")()
      val intervalProj = Project(intervalChild.output :+ bandsAlias, intervalChild)
      val bandI = AttributeReference("__graft_band_i", LongType, nullable = false)()
      val gen = Generate(
        Explode(bandsAlias.toAttribute),
        unrequiredChildIndex = Seq(intervalChild.output.size),
        outer = false,
        qualifier = None,
        generatorOutput = Seq(bandI),
        child = intervalProj)

      val (newLeft, newRight) = if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
      val newCond = (EqualTo(bandP.toAttribute, bandI) +: conjuncts).reduce(And)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}

/** TimestampNTZ → epoch micros, exactly and for free: NTZ's internal
  * representation IS the Long micro count, so this is an identity on
  * the physical value (`unix_micros` only accepts TimestampType, and a
  * LongType cast truncates to seconds — both wrong here). */
private[graft] case class NtzMicros(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): NtzMicros =
    copy(child = newChild)
  override def prettyName: String = "ntz_micros"
}

/** The ONE exact timestamp→epoch-micros dispatch (TIMESTAMP via
  * `unix_micros`, TIMESTAMP_NTZ via the [[NtzMicros]] identity —
  * pyarrow-written parquet reads back NTZ, which `unix_micros`
  * rejects). Shared by the range join, the event-analytics operators,
  * and anything else that compares timestamps in integer micros. */
private[graft] object ExactMicros {
  def col(df: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        org.apache.spark.sql.graftshim.GraftShim.column(
          NtzMicros(org.apache.spark.sql.graftshim.GraftShim.expression(df.col(name))))
      case _ => org.apache.spark.sql.functions.unix_micros(df.col(name))
    }
}
