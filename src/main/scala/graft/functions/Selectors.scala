package graft.functions

/** Tidy column selectors — the `parse_tidy_db` analog
  * (reference: src/db_parsing.jl:23-180), resolved against
  * `df.schema.fieldNames` instead of an eagerly-fetched metadata table.
  *
  * Supported surface (reference: src/TidierDB_macros.jl:4-31):
  * bare names, ranges `a:b` (positional, inclusive), `startsWith`,
  * `endsWith`, `contains`, regex `matches`, negation `!sel`,
  * `everything()`.
  */
sealed trait Selector {
  def unary_! : Selector = Selector.Not(this)
}

object Selector {
  final case class Name(n: String) extends Selector
  final case class Range(from: String, to: String) extends Selector
  final case class StartsWith(prefix: String) extends Selector
  final case class EndsWith(suffix: String) extends Selector
  final case class Contains(sub: String) extends Selector
  final case class Matches(regex: String) extends Selector
  final case class Not(inner: Selector) extends Selector
  case object Everything extends Selector

  import scala.language.implicitConversions
  /** Bare string = bare column name, so `select("a", "b")` just works. */
  implicit def fromString(s: String): Selector = Name(s)

  /** Which columns (in schema order for pattern selectors, in listed order
    * for names) does one positive selector match? */
  private def matchOne(schema: Seq[String], s: Selector): Seq[String] = s match {
    case Name(n) =>
      require(schema.contains(n), s"column '$n' not found in ${schema.mkString(", ")}")
      Seq(n)
    case Range(a, b) =>
      val ia = schema.indexOf(a); val ib = schema.indexOf(b)
      require(ia >= 0 && ib >= 0, s"range $a:$b has unknown endpoint")
      if (ia <= ib) schema.slice(ia, ib + 1) else schema.slice(ib, ia + 1).reverse
    case StartsWith(p) => schema.filter(_.startsWith(p))
    case EndsWith(p)   => schema.filter(_.endsWith(p))
    case Contains(p)   => schema.filter(_.contains(p))
    case Matches(re)   => { val r = re.r; schema.filter(c => r.findFirstIn(c).isDefined) }
    case Everything    => schema
    case Not(_)        => Nil // handled by resolve
  }

  /** Resolve a selector list against a schema, preserving the reference's
    * semantics: positives accumulate in order (dedup keeps first
    * occurrence); a list of only negations implies everything-minus
    * (reference: src/db_parsing.jl:120-158). */
  def resolve(schema: Seq[String], sels: Seq[Selector]): Seq[String] = {
    if (sels.isEmpty) return schema
    val allNegative = sels.forall(_.isInstanceOf[Not])
    val base: Seq[String] =
      if (allNegative) schema
      else {
        // seen-set keeps dedup O(1) per column — 10k-wide feature
        // tables would make Vector.contains quadratic
        val seen = scala.collection.mutable.HashSet.empty[String]
        val acc = Vector.newBuilder[String]
        sels.foreach {
          case Not(_) => ()
          case s => matchOne(schema, s).foreach(c => if (seen.add(c)) acc += c)
        }
        acc.result()
      }
    val excluded = sels.collect { case Not(inner) => matchOne(schema, inner) }.flatten.toSet
    base.filterNot(excluded)
  }

  // user-facing constructors mirroring tidyselect
  def startsWith(p: String): Selector = StartsWith(p)
  def endsWith(p: String): Selector = EndsWith(p)
  def contains(p: String): Selector = Contains(p)
  def matches(re: String): Selector = Matches(re)
  def range(from: String, to: String): Selector = Range(from, to)
  def everything(): Selector = Everything
  def not(s: Selector): Selector = Not(s)
}
