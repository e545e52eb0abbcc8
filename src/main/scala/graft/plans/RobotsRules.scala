package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `robots_rules(body, agent)` → the Allow/Disallow rules a crawler
  * named `agent` must obey, per RFC 9309 (Robots Exclusion Protocol):
  *
  *  - lines are `field: value` with `#` comments; field names are
  *    case-insensitive;
  *  - consecutive `User-agent` lines open a GROUP; a group applies to
  *    an agent by case-insensitive product-token match, `*` matching
  *    every agent; the most specific match wins (an agent-named group
  *    beats `*`), and multiple groups for the same agent MERGE;
  *  - `Allow`/`Disallow` values are path patterns where `*` matches
  *    any run and a trailing `$` anchors the end; an EMPTY Disallow
  *    matches nothing (classic "allow all").
  *
  * Each rule is emitted as struct(allow, pattern, regex) — the regex
  * is the anchored Java-regex translation of the pattern, built once
  * here so per-URL matching is a plain `rlike`.
  */
case class RobotsRules(child: Expression, agent: String)
    extends UnaryExpression with CodegenFallback {

  require(agent.nonEmpty, "agent must be non-empty")

  override def dataType: DataType = ArrayType(RobotsRules.ruleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"robots_rules expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val rules = RobotsRules.parse(input.asInstanceOf[UTF8String].toString, agent)
    new GenericArrayData(rules.map { case (allow, pat, re) =>
      InternalRow(allow, UTF8String.fromString(pat), UTF8String.fromString(re))
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): RobotsRules =
    copy(child = newChild)

  override def prettyName: String = "robots_rules"
}

object RobotsRules {

  val ruleType: StructType = StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = false),
    StructField("regex", StringType, nullable = false)))

  /** (allow, pattern, anchoredRegex) for the group(s) governing
    * `agent`: exact-agent groups if any exist, else the `*` groups */
  private[graft] def parse(body: String, agent: String): Seq[(Boolean, String, String)] = {
    val agentLower = agent.toLowerCase(java.util.Locale.ROOT)
    final case class Group(agents: Seq[String], rules: Seq[(Boolean, String)])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var curAgents = Vector.empty[String]
    var curRules = Vector.empty[(Boolean, String)]
    var inAgentRun = false
    def close(): Unit = {
      if (curAgents.nonEmpty) groups += Group(curAgents, curRules)
      curAgents = Vector.empty; curRules = Vector.empty
    }
    body.split("\r?\n").foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i  => raw.substring(0, i).trim
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) close() // a new agent run opens a new group
            curAgents :+= value.toLowerCase(java.util.Locale.ROOT)
            inAgentRun = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) curRules :+= ((field == "allow", value))
          case _ => inAgentRun = false // sitemap / crawl-delay etc.
        }
      }
    }
    close()
    val exact = groups.filter(_.agents.contains(agentLower))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.toSeq.flatMap(_.rules).map { case (allow, pat) =>
      (allow, pat, toRegex(pat))
    }
  }

  /** pattern → anchored Java regex: `*` = any run, trailing `$` = end
    * anchor, everything else literal */
  private[graft] def toRegex(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val quoted = body.split("\\*", -1)
      .map(p => if (p.isEmpty) "" else java.util.regex.Pattern.quote(p))
      .mkString(".*")
    "^" + quoted + (if (anchored) "$" else "")
  }
}
