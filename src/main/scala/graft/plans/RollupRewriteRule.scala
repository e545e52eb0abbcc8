package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** MATERIALIZED-ROLLUP REWRITE — the transparent serving layer over
  * [[graft.operators.Rollup]]'s incrementally-maintained aggregate
  * tables: an `Aggregate` over the CURRENT live scan of a registered
  * Delta corpus, whose keys and aggregates the rollup can answer, is
  * rewritten to aggregate the (corpus/|keys|-times smaller) rollup
  * instead. The 100 TB dashboard query — `corpus.groupBy(lang)
  * .agg(count, sum(tokens))` — stops scanning the corpus entirely.
  *
  * Safety gates (ALL must hold, else the plan is left untouched — the
  * rewrite can only ever be an optimization, never a semantics
  * change):
  *  - the aggregate's child is a bare (possibly column-pruned) scan of
  *    EXACTLY the corpus's current live file set — a `versionAsOf`
  *    read, a filtered subset, or a DV/partition-fallback union never
  *    matches;
  *  - the rollup's recorded corpus version equals the corpus's current
  *    version (a stale rollup disables the rewrite, it does not break
  *    it);
  *  - grouping keys ⊆ rollup keys (subset re-aggregates: sums of sums,
  *    sums of counts — both exact);
  *  - aggregates are `count(1)`/`count(*)` (→ `sum(n_rows)`) and
  *    `sum(<integral col>)` for maintained columns (→ the DECIMAL(38,6)
  *    `sum_<col>` cast back to the original type — exact for integral
  *    inputs; DOUBLE sums are deliberately NOT rewritten: float
  *    summation order is observable). No DISTINCT, no FILTER clauses.
  *
  * Output attributes keep their original exprIds (aliases re-anchor
  * them), so the rewrite is invisible to the rest of the plan.
  * Freshness metadata is cached per corpus version — steady-state cost
  * is one log-directory listing per planning pass.
  */
object RollupRewriteRule extends Rule[LogicalPlan] {

  private final case class Reg(rollupPath: String)
  private final case class Cached(
      corpusVersion: Long, rollupVersion: Long, fresh: Boolean,
      liveFiles: Set[String], keyCols: Seq[String], sumCols: Seq[String])

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Reg]
  private val cache = scala.collection.concurrent.TrieMap.empty[String, Cached]

  /** Register `rollupPath` (built by [[graft.operators.Rollup.build]])
    * as the serving aggregate for the Delta corpus at `corpusPath`.
    * Also inject the rule once per session via [[install]]. */
  def register(corpusPath: String, rollupPath: String): Unit = {
    registry.put(corpusPath, Reg(rollupPath)); ()
  }
  def unregister(corpusPath: String): Unit = { registry.remove(corpusPath); cache.remove(corpusPath); () }
  def clear(): Unit = { registry.clear(); cache.clear() }

  /** idempotently add the rule to a session's extra optimizations */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    val spark = SparkSession.active
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        tryRewrite(spark, agg, groupExprs, aggExprs, child).getOrElse(agg)
    }
  }

  private def scanOf(child: LogicalPlan): Option[LogicalRelation] = child match {
    case lr: LogicalRelation => Some(lr)
    case Project(pl, lr: LogicalRelation) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      Some(lr)
    case _ => None
  }

  private def refresh(spark: SparkSession, corpusPath: String, reg: Reg): Option[Cached] = {
    val v = try graft.sources.DeltaScan.latestVersion(spark, corpusPath)
            catch { case scala.util.control.NonFatal(_) => return None }
    val rv = graft.operators.Rollup.currentVersion(spark, reg.rollupPath)
      .getOrElse(return None)
    // validity is keyed on BOTH versions: a corpus append invalidates
    // via v, a Rollup.maintain/rebuild invalidates via rv
    cache.get(corpusPath).filter(c => c.corpusVersion == v && c.rollupVersion == rv)
      .orElse {
        val built = try {
          val (rollupCorpusV, keys, sums, _) =
            graft.operators.Rollup.meta(spark, reg.rollupPath)
          val fresh = rollupCorpusV == v
          val files: Set[String] =
            if (!fresh) Set.empty
            else graft.sources.DeltaScan.read(spark, corpusPath)
              .queryExecution.analyzed.collect {
                case lr: LogicalRelation => lr.relation match {
                  case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
                  case _ => Seq.empty
                }
              }.flatten.toSet
          Some(Cached(v, rv, fresh && files.nonEmpty, files, keys, sums))
        } catch { case scala.util.control.NonFatal(_) => None }
        built.foreach(cache.put(corpusPath, _))
        built
      }
  }

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def tryRewrite(
      spark: SparkSession,
      agg: Aggregate,
      groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val lr = scanOf(child).getOrElse(return None)
    val fsRel = lr.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val scanFiles = fsRel.location.rootPaths.map(_.toString).toSet
    if (scanFiles.isEmpty) return None

    // which registered corpus (if any) does this scan read, in full?
    val hit = registry.iterator.flatMap { case (corpusPath, reg) =>
      refresh(spark, corpusPath, reg)
        .filter(c => c.fresh && c.liveFiles == scanFiles)
        .map(c => (reg, c))
    }.toSeq.headOption
    val (reg, cached) = hit.getOrElse(return None)

    // group keys: attributes, all rollup keys
    val groupAttrs = groupExprs.map {
      case a: AttributeReference if cached.keyCols.contains(a.name) => a
      case _ => return None
    }

    val rollupPlan = graft.operators.Rollup.read(spark, reg.rollupPath)
      .queryExecution.analyzed
    def rollupAttr(name: String): AttributeReference =
      rollupPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.getOrElse(throw new IllegalStateException(s"rollup lacks column $name"))

    val groupByName = groupAttrs.map(a => a.name -> a).toMap

    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      // pass-through grouping columns (bare or aliased)
      case a: AttributeReference if groupByName.contains(a.name) =>
        Alias(rollupAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if groupByName.contains(a.name) =>
        Alias(rollupAttr(a.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => // count(NULL) is always 0, not n_rows
            // Count is non-nullable and returns 0 on empty input;
            // Sum is nullable and returns NULL — Coalesce restores both
            // the value (a global aggregate over an empty rollup) and
            // the output attribute's nullability
            Alias(
              Coalesce(Seq(
                Cast(Sum(rollupAttr("n_rows")).toAggregateExpression(), LongType),
                Literal(0L))),
              name)(exprId = al.exprId)
          case Sum(a: AttributeReference, _)
              if cached.sumCols.contains(a.name) && isIntegral(a.dataType) =>
            Alias(
              Cast(Sum(rollupAttr(s"sum_${a.name}")).toAggregateExpression(),
                al.dataType),
              name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }

    Some(Aggregate(groupAttrs.map(a => rollupAttr(a.name)), newAggExprs, rollupPlan))
  }
}
