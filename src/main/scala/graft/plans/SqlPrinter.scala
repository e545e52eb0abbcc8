package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._

/** Analyzed-LogicalPlan → readable ANSI-SQL-ish text — the user-facing
  * `@show_query` artifact (reference: src/TidierDB_macros.jl:508-569
  * pretty-prints the finalized SQL string it accumulated; Spark builds
  * a plan instead, so this unparses the plan back).
  *
  * Scope: the verb surface (SELECT / WHERE / GROUP BY / HAVING / JOIN /
  * ORDER BY / LIMIT / set ops / window subqueries). Clause runs are
  * FUSED into one SELECT the way a human would write it; any node this
  * printer does not understand renders as a `/* nodeName */` subquery
  * placeholder rather than failing — and [[graft.TidierFrame.showQuery]]
  * falls back to explain output entirely if unparsing throws.
  *
  * Not a round-trippable dialect: expression text comes from Catalyst's
  * `Expression.sql` (readable, engine-flavored) and a WHERE fused under
  * a projection may reference select aliases. The artifact is for
  * humans reading what their pipeline means, like the reference's.
  */
object SqlPrinter {

  def toSql(plan: LogicalPlan): String = render(plan, new Counter)

  private final class Counter {
    private var n = 0
    def next(): String = { n += 1; s"t$n" }
  }

  private def exprSql(e: Expression): String = e match {
    case a: Alias => s"${a.child.sql} AS ${quote(a.name)}"
    case other => other.sql
  }

  private def quote(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name else s"`$name`"

  /** One full SELECT statement for `p`, fusing the clause chain above
    * the first FROM-able node. */
  private def render(p: LogicalPlan, c: Counter): String = {
    var limit: Option[String] = None
    var orderBy: Option[String] = None
    var distinct = false
    var select: Option[String] = None
    var group: Option[String] = None
    var having: List[String] = Nil
    var where: List[String] = Nil
    var cur = p

    cur match {
      case g: GlobalLimit =>
        limit = Some(g.limitExpr.sql)
        cur = g.child match {
          case l: LocalLimit => l.child
          case other => other
        }
      case _ =>
    }
    cur match {
      case s: Sort if s.global =>
        orderBy = Some(s.order.map(_.sql).mkString(", "))
        cur = s.child
      case _ =>
    }
    cur match {
      case d: Distinct => distinct = true; cur = d.child
      case d: Deduplicate if d.keys.map(_.name).toSet == d.child.output.map(_.name).toSet =>
        distinct = true; cur = d.child
      case _ =>
    }
    // filters above an Aggregate are HAVING; all others WHERE
    var peeling = true
    while (peeling) cur match {
      case f: Filter if select.isEmpty =>
        f.child match {
          case ag: Aggregate =>
            having ::= f.condition.sql
            select = Some(ag.aggregateExpressions.map(exprSql).mkString(", "))
            if (ag.groupingExpressions.nonEmpty)
              group = Some(ag.groupingExpressions.map(_.sql).mkString(", "))
            cur = ag.child
          case _ =>
            where ::= f.condition.sql
            cur = f.child
        }
      case pr: Project if select.isEmpty =>
        select = Some(pr.projectList.map(exprSql).mkString(", "))
        cur = pr.child
        // orderBy may sit below the final projection
        cur match {
          case s: Sort if s.global && orderBy.isEmpty =>
            orderBy = Some(s.order.map(_.sql).mkString(", "))
            cur = s.child
          case _ =>
        }
      case ag: Aggregate if select.isEmpty =>
        select = Some(ag.aggregateExpressions.map(exprSql).mkString(", "))
        if (ag.groupingExpressions.nonEmpty)
          group = Some(ag.groupingExpressions.map(_.sql).mkString(", "))
        cur = ag.child
      case f: Filter => // select already fixed: WHERE over the fused FROM
        where ::= f.condition.sql
        cur = f.child
      case _ => peeling = false
    }

    val sb = new StringBuilder
    sb.append("SELECT ")
    if (distinct) sb.append("DISTINCT ")
    sb.append(select.getOrElse("*"))
    sb.append("\nFROM ").append(renderFrom(cur, c))
    if (where.nonEmpty) sb.append("\nWHERE ").append(where.mkString(" AND "))
    group.foreach(g => sb.append("\nGROUP BY ").append(g))
    if (having.nonEmpty) sb.append("\nHAVING ").append(having.mkString(" AND "))
    orderBy.foreach(o => sb.append("\nORDER BY ").append(o))
    limit.foreach(l => sb.append("\nLIMIT ").append(l))
    sb.toString
  }

  private def joinTypeSql(t: JoinType): String = t match {
    case Inner => "JOIN"
    case LeftOuter => "LEFT JOIN"
    case RightOuter => "RIGHT JOIN"
    case FullOuter => "FULL JOIN"
    case LeftSemi => "LEFT SEMI JOIN"
    case LeftAnti => "LEFT ANTI JOIN"
    case Cross => "CROSS JOIN"
    case other => other.sql + " JOIN"
  }

  /** Something legal after FROM: a relation name, a JOIN tree, or a
    * parenthesized subquery with a fresh alias. */
  private def renderFrom(p: LogicalPlan, c: Counter): String = p match {
    case j: Join =>
      val cond = j.condition.map(e => s" ON ${e.sql}").getOrElse("")
      s"${renderFrom(j.left, c)}\n  ${joinTypeSql(j.joinType)} ${renderFrom(j.right, c)}$cond"
    case s: SubqueryAlias =>
      s.child match {
        // alias directly over a leaf: the alias IS the name
        case _: LeafNode => quote(s.alias)
        case child => s"(\n${indent(render(child, c))}\n) ${quote(s.alias)}"
      }
    case u: Union =>
      val body = u.children.map(ch => render(ch, c)).mkString("\nUNION ALL\n")
      s"(\n${indent(body)}\n) ${c.next()}"
    case i: Intersect =>
      val op = if (i.isAll) "INTERSECT ALL" else "INTERSECT"
      s"(\n${indent(render(i.left, c) + s"\n$op\n" + render(i.right, c))}\n) ${c.next()}"
    case e: Except =>
      val op = if (e.isAll) "EXCEPT ALL" else "EXCEPT"
      s"(\n${indent(render(e.left, c) + s"\n$op\n" + render(e.right, c))}\n) ${c.next()}"
    case w: Window =>
      val wx = w.windowExpressions.map(exprSql).mkString(", ")
      s"(\n${indent(s"SELECT *, $wx\nFROM ${renderFrom(w.child, c)}")}\n) ${c.next()}"
    case leaf: LeafNode => leafName(leaf)
    // anything else select-bearing or unknown: its own subquery
    case other @ (_: Project | _: Aggregate | _: Filter | _: Sort |
                  _: GlobalLimit | _: Distinct | _: Deduplicate) =>
      s"(\n${indent(render(other, c))}\n) ${c.next()}"
    case exotic =>
      s"(\n${indent(s"/* ${exotic.nodeName} */\nSELECT ${exotic.output.map(a => quote(a.name)).mkString(", ")}")}\n) ${c.next()}"
  }

  private def leafName(leaf: LeafNode): String = {
    val cls = leaf.getClass.getSimpleName
    // LogicalRelation (v1 file/table scans) via reflection-free match on
    // toString would be brittle; catalogTable is the stable surface
    leaf match {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.catalogTable.map(t => t.identifier.unquotedString).getOrElse {
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              val paths = fs.location.rootPaths.map(_.toString)
              val shown = if (paths.length <= 2) paths.mkString(", ")
                          else paths.take(2).mkString(", ") + s", … ${paths.length - 2} more"
              s"${fs.fileFormat.toString.toLowerCase}.`$shown`"
            case _ => s"/* ${cls} */ rel"
          }
        }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.name()
      case _: LocalRelation => "/* in-memory rows */ local_relation"
      case _ => s"/* $cls */ rel"
    }
  }

  private def indent(s: String): String =
    s.linesIterator.map("  " + _).mkString("\n")
}
