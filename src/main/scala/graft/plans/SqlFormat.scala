package graft.plans

/** SQL pretty-printing + ANSI keyword coloring for `showQuery` — the
  * `format_sql_query` half of the reference's `@show_query`
  * (src/TidierDB_macros.jl:520-569): clause keywords break onto
  * indented lines, and with color on, keyword GROUPS take the
  * reference's exact palette (cyan SELECT/FROM/WITH, green AS, blue
  * join words, yellow GROUP BY, orange CASE…END, light-blue
  * WHERE/HAVING, pink ORDER BY/ASC/DESC/PARTITION). Pure string →
  * string; the SQL text itself ([[SqlPrinter]]) is untouched — strip
  * the escapes and the formatted text remains. */
object SqlFormat {

  private val Reset = "\u001b[0m"

  private def paint(token: String): String = {
    val up = token.toUpperCase.replaceAll("\\s+", " ").trim
    val code = up match {
      case "FROM" | "SELECT" | "WITH" => Some("\u001b[36m")
      case "AS" => Some("\u001b[32m")
      case "ASOF" | "RIGHT" | "LEFT" | "OUTER" | "SEMI" | "JOIN" | "INNER" |
           "ANTI" | "FULL" | "CROSS" | "UNION" => Some("\u001b[34m")
      case "GROUP BY" => Some("\u001b[33m")
      case "CASE" | "WHEN" | "THEN" | "ELSE" | "END" => Some("\u001b[38;5;208m")
      case "WHERE" | "HAVING" => Some("\u001b[94m")
      case "ORDER BY" | "ASC" | "DESC" | "PARTITION" => Some("\u001b[35m")
      case _ => scala.None
    }
    code.map(c => s"$c$token$Reset").getOrElse(token)
  }

  // cte_ names are matched-but-uncolored EXACTLY like the reference:
  // its pattern lists cte_\w+ and its painter's else-branch returns
  // the token unchanged (TidierDB_macros.jl:531,560-562)
  private val KeywordPattern =
    ("\\b(cte_\\w+|WITH|FROM|SELECT|AS|LEFT|RIGHT|OUTER|INNER|FULL|CROSS|" +
      "SEMI|ANTI|JOIN|UNION|ASOF|GROUP\\s+BY|CASE|WHEN|THEN|ELSE|END|" +
      "WHERE|HAVING|ORDER\\s+BY|PARTITION|ASC|DESC)\\b").r

  /** clause keywords onto indented lines, mirroring the reference's
    * replacement list. Like the reference, this is BLIND string
    * replacement over the finalized SQL — a clause keyword inside a
    * string LITERAL also breaks onto a new line (display-only cost the
    * reference accepts too; [[strip]] round-trips the escapes, not the
    * newlines). One deliberate divergence: the reference's CTE rule
    * (`AS (SELECT` → `AS ( \n\tSELECT`) runs AFTER its bare-SELECT
    * rule and therefore never matches — here it runs first, with the
    * bare rule guarded so CTE bodies are not double-broken, making
    * the reference's INTENDED CTE indentation actually appear. */
  def format(sql: String): String = {
    var s = sql
    s = s.replaceAll("(?<=\\)), ", ",\n")
    s = s.replace("AS (SELECT ", "AS ( \n\tSELECT ")
    s = s.replaceAll("(?<!\\t)SELECT ", "\nSELECT ")
    s = s.replace(" FROM ", "\n\tFROM ")
    s = s.replace(" WHERE ", "\n\tWHERE ")
    s = s.replace(" GROUP BY ", "\n\tGROUP BY ")
    s = s.replace(" ORDER BY ", "\n\tORDER BY ")
    s = s.replace(" HAVING ", "\n\tHAVING ")
    s = s.replace(" LEFT JOIN ", "\n\tLEFT JOIN ")
    s = s.replace(" RIGHT JOIN ", "\n\tRIGHT JOIN ")
    s = s.replace(" INNER JOIN ", "\n\tINNER JOIN ")
    s = s.replace(" OUTER JOIN ", "\n\tOUTER JOIN ")
    s = s.replace(" FULL JOIN ", "\n\tFULL JOIN ")
    s = s.replace(" ASOF ", "\n\tASOF ")
    s = s.replace(" LIMIT ", "\n\tLIMIT ")
    s
  }

  /** ANSI-color the keywords of (formatted) SQL */
  def colorize(sql: String): String =
    KeywordPattern.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(paint(m.matched)))

  /** strip ANSI escapes (the spec's round-trip check) */
  def strip(s: String): String = s.replaceAll("\u001b\\[[0-9;]*m", "")
}
