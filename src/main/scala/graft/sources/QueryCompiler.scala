package graft.sources

/** ADQL/SQL predicate compilation for remote TAP archives
  * (`db_tier/TAP_query.py:90-171`): query dict → `SELECT … FROM … WHERE`
  * with equality, BETWEEN-range and theta (`<`/`>`/`=` prefixed)
  * conditions, quoting values that need it. This is the pushdown seam a
  * DataSource V2 `SupportsPushDownFilters` implementation emits from
  * Catalyst `sources.Filter`s; the compiler itself is pure.
  */
object QueryCompiler {

  sealed trait Condition { def column: String }
  final case class Eq(column: String, value: String) extends Condition
  final case class Between(column: String, lo: Double, hi: Double) extends Condition
  /** theta condition: operator embedded in the value ("<12.5", ">3", "=x"). */
  final case class Theta(column: String, expr: String) extends Condition
  /** membership condition (OgleIII star-type checkboxes, `ogleIII.py:158-166`). */
  final case class In(column: String, values: Seq[String]) extends Condition

  private val Quoting = Seq(" ", "/", "_", "-", ".", "+") // TAP_query.py:25
  private val SpecialSymb = Set('<', '>', '=') // TAP_query.py:27

  /** `_quoteIfNeeded` (`TAP_query.py:159-171`): non-numeric values
    * containing path-ish characters get single quotes.
    */
  def quoteIfNeeded(raw: String): String = {
    val value = raw.trim
    val isNumeric = value.toDoubleOption.isDefined
    val needQuoting = !isNumeric && Quoting.exists(value.contains)
    if (needQuoting && !value.startsWith("'") && !value.startsWith("\""))
      s"'$value'"
    else value
  }

  /** `_get_select_text` (`TAP_query.py:92-106`): explicit column set =
    * projection pushdown; columns double-quoted, deduplicated.
    */
  def selectText(select: Seq[String]): String =
    select.distinct.filter(_.nonEmpty)
      .map(c => "\"" + c + "\"").mkString("SELECT ", ", ", " ")

  /** `_get_where_text` (`TAP_query.py:115-143`). */
  def whereText(conditions: Seq[Condition]): String = {
    val parts = conditions.map {
      case Between(c, lo, hi) =>
        s"($c BETWEEN ${fmt(lo)} AND ${fmt(hi)})"
      case Theta(c, expr) =>
        val cleaned = {
          val v = expr.trim
          if (v.startsWith("'") || v.startsWith("\"")) v.substring(1, v.length - 1) else v
        }
        if (cleaned.nonEmpty && SpecialSymb(cleaned.head)) s"($c $cleaned)"
        else s"($c = ${quoteIfNeeded(cleaned)})"
      case Eq(c, v) => s"($c = ${quoteIfNeeded(v)})"
      case In(c, vs) => vs.map(v => s"'$v'").mkString(s"($c IN (", ", ", "))")
    }
    "WHERE " + parts.mkString(" AND ")
  }

  /** python str(float): integral doubles keep a trailing ".0" like the
    * reference's string formatting.
    */
  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString

  /** Full statement (`postQuery`, `TAP_query.py:32-80`). */
  def compile(table: String, select: Seq[String], conditions: Seq[Condition]): String = {
    val where = if (conditions.nonEmpty) whereText(conditions) else ""
    (selectText(select) + s"FROM $table " + where).trim
  }

  /** Cone → box rewrite for pushable ranges (`vizier_tap_base.py:185-191` +
    * `base_query.py:85-91`; faithfully no cos(dec) scaling; delta arcsec →
    * degrees).
    */
  def coneToBox(raCol: String, decCol: String, ra: Double, dec: Double,
                deltaArcsec: Double): Seq[Condition] = {
    val d = deltaArcsec / 3600.0
    Seq(Between(raCol, ra - d, ra + d), Between(decCol, dec - d, dec + d))
  }
}
