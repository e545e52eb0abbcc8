package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY §2.9) — the one-dialect collapse of
  * the reference's 2,000-LoC expr_to_sql fan-out
  * (reference: src/parsing_duckdb.jl:1-185 and ten siblings).
  *
  * Everything here is a thin combinator over `org.apache.spark.sql
  * .functions._` (codegen'd Catalyst expressions — no UDFs). Anything
  * not covered passes through via `expr("fn(...)")`, mirroring the
  * reference's pass-unknown-functions-verbatim design
  * (reference: src/parsing_duckdb.jl:183).
  */
object Fns {

  // ---- conditionals (reference: src/db_parsing.jl:183-303) ----

  /** `if_else(cond, yes, no[, missing])` — 4-arg form routes NULL
    * conditions to the missing case. */
  def ifElse(cond: Column, yes: Column, no: Column): Column =
    when(cond, yes).otherwise(no)
  def ifElse(cond: Column, yes: Column, no: Column, missingCase: Column): Column =
    when(cond.isNull, missingCase).when(cond, yes).otherwise(no)

  /** `case_when(c1, v1, c2, v2, …[, default])`. */
  def caseWhen(branches: Seq[(Column, Column)], default: Option[Column] = None): Column = {
    val base = branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
      case (acc, (c, v)) => acc.when(c, v)
    }
    default.map(base.otherwise).getOrElse(base)
  }

  // ---- null handling (reference: src/parsing_duckdb.jl:102-103,138-141) ----
  def isMissing(c: Column): Column = c.isNull
  def replaceMissing(c: Column, v: Column): Column = coalesce(c, v)
  def missingIf(c: Column, v: Column): Column = nullif(c, v)

  // ---- strings (reference: src/parsing_duckdb.jl:94-101,159-166) ----

  /** `str_detect(col, s)` — plain string = substring containment;
    * use strDetectRegex for the r"" form. */
  def strDetect(c: Column, s: String): Column = c.contains(s)
  def strDetectRegex(c: Column, re: String): Column = c.rlike(re)
  /** `str_replace` — FIRST occurrence only (DuckDB REGEXP_REPLACE has no
    * 'g' flag; reference: src/parsing_duckdb.jl:159-163). Spark's
    * regexp_replace is global, so we anchor a lazy prefix capture: the ^
    * anchor can only match once, giving exactly one replacement. The
    * user's regex is wrapped in its own group too, so `$0` (whole
    * match) stays expressible: groups become 1=prefix, 2=user's whole
    * match, 3+=user groups — `$0` rewrites to `$2` and `$n` to
    * `$(n+2)`, so a user's `$1` keeps meaning THEIR first group.
    * `\`-escapes pass through untouched, and `${name}` named-group refs
    * are unaffected (Java has no numeric brace form; names don't
    * shift). Pattern-side backreferences (`\1` inside `re`) are out of
    * scope — the reference's engine (RE2) never supported them. */
  def strReplace(c: Column, re: String, rep: String): Column =
    regexp_replace(c, s"^((?s).*?)($re)", "$1" + shiftGroupRefs(rep))

  /** rewrite `$n` → `$(n+2)` and `$0` → `$2` in a Java regex
    * replacement string, honoring `\x` escapes (so `\$` stays a
    * literal dollar) */
  private def shiftGroupRefs(rep: String): String = {
    val sb = new StringBuilder(rep.length + 4)
    var i = 0
    while (i < rep.length) {
      val ch = rep.charAt(i)
      if (ch == '\\' && i + 1 < rep.length) {
        sb.append(ch).append(rep.charAt(i + 1)); i += 2
      } else if (ch == '$' && i + 1 < rep.length && rep.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < rep.length && rep.charAt(j).isDigit) j += 1
        val n = rep.substring(i + 1, j).toInt
        sb.append('$').append(if (n == 0) 2 else n + 2)
        i = j
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
  def strReplaceAll(c: Column, re: String, rep: String): Column =
    regexp_replace(c, re, rep)
  def strRemove(c: Column, re: String): Column = strReplace(c, re, "")
  def strRemoveAll(c: Column, re: String): Column = regexp_replace(c, re, "")

  def startsWithStr(c: Column, p: String): Column = c.startsWith(p)
  def endsWithStr(c: Column, p: String): Column = c.endsWith(p)
  def containsStr(c: Column, p: String): Column = c.contains(p)

  // ---- casts (reference: src/parsing_duckdb.jl:145-153) ----
  def asInteger(c: Column): Column = try_cast(c, "int")
  def asBigint(c: Column): Column = try_cast(c, "bigint")
  def asFloat(c: Column): Column = try_cast(c, "double")
  def asString(c: Column): Column = try_cast(c, "string")
  private def try_cast(c: Column, t: String): Column = c.try_cast(t)

  // ---- dates (reference: src/parsing_duckdb.jl:114-135) ----
  def ymd(c: Column): Column = to_date(c, "yyyy-MM-dd")
  def mdy(c: Column): Column = to_date(c, "MM-dd-yyyy")
  def dmy(c: Column): Column = to_date(c, "dd-MM-yyyy")
  def floorDate(c: Column, unit: String): Column = date_trunc(unit, c)
  /** `difftime(end, start, unit)` → whole units between timestamps. */
  def difftime(end: Column, start: Column, unit: String): Column =
    timestamp_diff(unit, start, end)

  /** Interval constructors `Year(n)`…`Second(n)` for date arithmetic
    * (reference: src/parsing_duckdb.jl:114-125). */
  private val z = lit(0)
  def years(n: Int): Column = make_interval(lit(n), z, z, z, z, z, z)
  def months(n: Int): Column = make_interval(z, lit(n), z, z, z, z, z)
  def weeks(n: Int): Column = make_interval(z, z, lit(n), z, z, z, z)
  def days(n: Int): Column = make_interval(z, z, z, lit(n), z, z, z)
  def hours(n: Int): Column = make_interval(z, z, z, z, lit(n), z, z)
  def minutes(n: Int): Column = make_interval(z, z, z, z, z, lit(n), z)
  def seconds(n: Int): Column = make_interval(z, z, z, z, z, z, lit(n))

  // ---- aggregates named as in the reference (src/parsing_duckdb.jl:23-66) ----
  def mean(c: Column): Column = avg(c)
  def minimum(c: Column): Column = min(c)
  def maximum(c: Column): Column = max(c)
  def std(c: Column): Column = stddev_samp(c)
  def n(): Column = count(lit(1))
  def nDistinct(c: Column*): Column = count_distinct(c.head, c.tail: _*)

  /** cumsum — running sum; gets the ROWS UNBOUNDED PRECEDING frame via
    * WindowRewrite (reference: src/parsing_duckdb.jl:52-58). */
  def cumsum(c: Column): Column = call_function("cumsum", c)

  /** `agg(fn(...))` escape hatch — forces the wrapped call to be
    * evaluated OVER the current window in a mutate, even if the
    * function name is not in the whitelist
    * (reference: src/parsing_duckdb.jl:68-91). */
  def agg(c: Column): Column =
    call_function(graft.functions.WindowRewrite.AggMarker, c)

  // ---- map/array (reference: src/parsing_duckdb.jl:105-113) ----
  /** guarded element lookup: out-of-range / missing key → NULL. */
  def elementAt(c: Column, key: Column): Column = try_element_at(c, key)

  // ---- passthrough escape hatch (reference: src/parsing_duckdb.jl:183) ----
  def sql(exprStr: String): Column = expr(exprStr)
}
