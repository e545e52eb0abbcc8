package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan lint: mechanizes the scale audit every operator in
  * this engine was built under — the handful of plan shapes that are
  * fine at gate scale and fatal at 100 TB. Run it in tests (several
  * specs assert individual shapes by string-matching `explain`; this
  * is that check as a structured API) or ad hoc on a composed
  * pipeline before shipping it.
  *
  * Detectors (each returns a [[PlanLint.Finding]] with the offending
  * node):
  *  - `cartesian-product`: `CartesianProductExec` — O(n·m) row pairs;
  *    almost always a missing join key or an unintended cross.
  *  - `global-window`: a window operator with an EMPTY partition spec
  *    — every row flows through ONE task (the trap
  *    [[graft.operators.WindowVerbs]] engineers around).
  *  - `single-partition-exchange`: an exchange whose target
  *    partitioning is `SinglePartition` (global limit/coalesce(1)
  *    funnels) — one task owns the whole dataset.
  *  - `unpushed-scan-filter`: a parquet scan directly under a Filter
  *    whose scan reports NO pushed filters — pushdown was lost
  *    (casts/UDFs around the column are the usual cause). Conservative:
  *    only flags when the filter's condition references scan output
  *    attributes and the scan advertises an empty `PushedFilters`.
  *
  * A finding is advice, not an error: broadcast nested-loop joins, for
  * example, are deliberately NOT flagged (a broadcast-bounded NLJ is
  * the correct shape for small-side predicates like semantic
  * decontamination) — the cartesian detector catches the unbounded
  * case.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  /** SOURCE-level detector for data-sized driver collects in sink
    * code: flags every `.collect()` under `graft/sources/` whose line
    * does not carry a `[lint:bounded]` marker justifying why the
    * collected set is bounded by METADATA (file count, partition
    * count, one-row aggregates), not by data size. This is the check
    * that would have caught `ArrowWrite.write`'s whole-frame collect —
    * a sink that funnels the frame through the driver OOMs at 100 TB
    * however correct it is at gate scale. PlanLintSpec runs it over
    * the repo tree, so an unjustified sink collect is a failing test,
    * not a review note. */
  def lintSinkCollects(sourcesRoot: java.nio.file.Path): Seq[Finding] = {
    import scala.jdk.CollectionConverters._
    // Files.walk holds directory handles until closed (its javadoc
    // requires try-with-resources) — materialize inside the scope
    val walk = java.nio.file.Files.walk(sourcesRoot)
    val files =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .toSeq.sortBy(_.toString)
      finally walk.close()
    files.flatMap { p =>
      val lines = java.nio.file.Files.readAllLines(p).asScala
      lines.zipWithIndex.collect {
        case (line, i)
            if line.contains(".collect()") && !line.contains("lint:bounded") =>
          Finding("unbounded-sink-collect", s"${p.getFileName}:${i + 1}",
            "driver-side .collect() in a source/sink without a [lint:bounded] " +
              "justification — a data-sized collect OOMs the driver at scale; " +
              "use mapPartitions executor writes (ShardedSink) or mark the " +
              "line if the set is metadata-bounded")
      }
    }
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val ep = df.queryExecution.executedPlan
    // AQE wraps the physical plan in AdaptiveSparkPlanExec whose
    // children are Nil — unwrap to its current plan (== initial plan
    // before execution), falling back to the pre-adaptive sparkPlan
    val inner =
      if (ep.getClass.getSimpleName == "AdaptiveSparkPlanExec")
        try ep.getClass.getMethod("executedPlan").invoke(ep).asInstanceOf[SparkPlan]
        catch { case _: Throwable => df.queryExecution.sparkPlan }
      else ep
    lintPlan(inner)
  }

  /** wrappers that sit between logical neighbors in a physical plan */
  private val passThrough = Set(
    "WholeStageCodegenExec", "InputAdapter", "ColumnarToRowExec",
    "ProjectExec", "ReusedExchangeExec")

  @scala.annotation.tailrec
  private def skipWrappers(p: SparkPlan): SparkPlan =
    if (passThrough.contains(p.getClass.getSimpleName) && p.children.size == 1)
      skipWrappers(p.children.head)
    else p

  def lintPlan(plan: SparkPlan): Seq[Finding] = {
    val findings = scala.collection.mutable.ArrayBuffer.empty[Finding]
    def nodeName(p: SparkPlan): String = p.getClass.getSimpleName

    plan.foreach { p =>
      val name = nodeName(p)

      if (name == "CartesianProductExec")
        findings += Finding("cartesian-product", name,
          "O(left·right) pair materialization — add a join key or broadcast a bounded side")

      // an UNCONDITIONED nested-loop join is the same cross product in
      // broadcast clothing; a predicate-ful BNLJ (bounded small side +
      // per-row filter, e.g. semantic decontamination) is NOT flagged
      if (name == "BroadcastNestedLoopJoinExec") {
        val noCond = try {
          p.getClass.getMethods.find(_.getName == "condition")
            .exists(_.invoke(p).asInstanceOf[Option[_]].isEmpty)
        } catch { case _: Throwable => false }
        if (noCond)
          findings += Finding("cartesian-product", name,
            "cross join (nested-loop, no condition) — O(left·right) output rows")
      }

      if (name.contains("WindowExec") || name == "WindowGroupLimitExec") {
        val emptyPart = try {
          p.getClass.getMethods.find(_.getName == "partitionSpec")
            .exists(_.invoke(p).asInstanceOf[Seq[_]].isEmpty)
        } catch { case _: Throwable => false }
        if (emptyPart)
          findings += Finding("global-window", name,
            "window with empty PARTITION BY — all rows in one task; partition or use TakeOrdered shapes")
      }

      if (name.contains("ShuffleExchangeExec") &&
          p.toString.linesIterator.take(1).exists(_.contains("SinglePartition")))
        findings += Finding("single-partition-exchange", name,
          "exchange to a single partition — one task owns the whole dataset")

      // an UNPARTITIONED JDBC scan is ONE task pulling the whole remote
      // table through one connection, whatever the cluster size — fine
      // for dimensions, fatal for facts; use Tidier.readJdbc's
      // partitionColumn overload ([[graft.sources.JdbcScan.readPartitioned]])
      if (name == "RowDataSourceScanExec" || name.contains("JDBC")) {
        val s = p.toString.linesIterator.take(1).mkString
        if (s.contains("JDBCRelation") && s.contains("[numPartitions=1]"))
          findings += Finding("single-partition-jdbc-scan", name,
            "JDBC scan with numPartitions=1 — one executor pulls the whole remote " +
              "table; pass partitionColumn/bounds for a parallel range scan")
      }

      if (name == "FilterExec") {
        p.children.map(skipWrappers).foreach { c =>
          val cs = c.toString.linesIterator.take(1).mkString
          val isParquetScan = cs.contains("FileScan parquet") || cs.contains("Scan parquet")
          // a predicate the scan evaluates (DataFilters) but could not
          // push (PushedFilters) is the lost-pushdown signature — when
          // the predicate COULD have pushed. Arithmetic/function
          // wrappers (x % 20, length(x) > n) are inherently
          // un-pushable: parquet source filters speak bare-column
          // comparisons only, so those never count. `cast(` stays
          // counted deliberately — a cast around the column is the
          // classic FIXABLE pushdown loss this detector exists for.
          def elements(tag: String): Seq[String] = {
            val m = s"$tag: \\[(.*?)\\]".r.findFirstMatchIn(cs)
            m.map(_.group(1).trim).filter(_.nonEmpty).map { body =>
              val out = Seq.newBuilder[String]
              var depth = 0; val cur = new StringBuilder
              body.foreach {
                case '(' => depth += 1; cur += '('
                case ')' => depth -= 1; cur += ')'
                case ',' if depth == 0 => out += cur.result().trim; cur.clear()
                case ch => cur += ch
              }
              out += cur.result().trim
              out.result()
            }.getOrElse(Seq.empty)
          }
          val neverPushable = Seq(" % ", " + ", " - ", " * ", " / ",
            "length(", "substring(", "lower(", "upper(", "abs(", "concat(",
            "coalesce(", "round(", "pmod(", "hash(", "xxhash64(", "crc32(",
            "md5(", "conv(", "regexp", "rlike", "split(", "size(",
            "element_at(", "array_")
          // test the wrapper ONLY on the operand(s) carrying a column
          // reference (`name#id`): a string LITERAL containing ' - ' or
          // 'abs(' must not flag a pushable bare-column comparison, and
          // LIKE-prefix predicates DO push (as StringStartsWith) so
          // 'like(' is not in the list at all
          def columnSide(e: String): String = {
            val ops = Seq(" <=> ", " >= ", " <= ", " != ", " = ", " > ", " < ")
            ops.iterator.map { op =>
              val i = e.indexOf(op)
              if (i < 0) null
              else Seq(e.substring(0, i), e.substring(i + op.length))
                .filter(_.matches("(?s).*#\\d+.*")).mkString(" ")
            }.find(_ != null).getOrElse(e)
          }
          val pushableShaped = elements("DataFilters")
            .count(e => !neverPushable.exists(columnSide(e).toLowerCase.contains))
          if (isParquetScan && pushableShaped > elements("PushedFilters").size)
            findings += Finding("unpushed-scan-filter", nodeName(c),
              "scan evaluates more DataFilters than it pushed — " +
                "pushdown lost (cast/expression around the filtered column?)")
        }
      }
    }
    findings.toSeq
  }
}
