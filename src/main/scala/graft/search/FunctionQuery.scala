package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Solr function-query mini-language for `bf=` / `boost=` parameters
  * (the strings a Solr user actually types, e.g.
  * `recip(dl,1,100,10)` or `sum(recip(dl,1,100,10),product(0.05,dl))`),
  * parsed ONCE into an AST that renders to BOTH a Spark [[Column]] and a
  * DuckDB SQL fragment — the engine and the oracle twin evaluate the
  * SAME expression tree, so function-query gates cannot drift on
  * floating-point association.
  *
  * Supported functions (the common Solr ValueSource set):
  *   - `recip(x,m,a,b)` = a/(m·x+b) — Solr's recency/brevity shape
  *   - `linear(x,m,c)`  = m·x+c
  *   - `sum(a,b,…)`, `product(a,b,…)` (left-associative fold, ≥2 args)
  *   - `div(a,b)`, `max(a,b)`, `min(a,b)`, `abs(x)`, `sqrt(x)`
  *   - `log(x)` — BASE 10, Solr/Lucene's pinning — and `ln(x)`
  *   - bare field references (stored numeric doc attributes, alphabet
  *     `[a-z_][a-z0-9_]*`) and numeric literals
  *
  * Every literal renders to SQL as `CAST(v AS DOUBLE)` and every
  * operation is fully parenthesized, so the SQL tree is exactly the
  * Column tree. Unknown functions / arity mismatches fail loudly at
  * parse time (Solr's ValueSourceParser error analog). */
object FunctionQuery {

  sealed trait Expr
  final case class Num(v: Double) extends Expr
  final case class Field(name: String) extends Expr
  final case class Call(fn: String, args: Seq[Expr]) extends Expr

  private val FieldRe = """[a-z_][a-z0-9_]*""".r
  private val Arities: Map[String, Int => Boolean] = Map(
    "recip" -> (_ == 4), "linear" -> (_ == 3), "div" -> (_ == 2),
    "max" -> (_ == 2), "min" -> (_ == 2), "abs" -> (_ == 1),
    "sqrt" -> (_ == 1), "log" -> (_ == 1), "ln" -> (_ == 1),
    "sum" -> (_ >= 2), "product" -> (_ >= 2))

  /** Recursive-descent parse of one function-query expression. */
  def parse(s: String): Expr = {
    val (e, rest) = parseExpr(s.trim)
    require(rest.trim.isEmpty, s"function query '$s': trailing '$rest'")
    e
  }

  private def parseExpr(s0: String): (Expr, String) = {
    val s = s0.trim
    require(s.nonEmpty, "function query: empty expression")
    if (s.head.isDigit || s.head == '-' || s.head == '.') {
      // numeric literal: longest prefix that parses as a double
      val i = s.indexWhere(c => c == ',' || c == ')')
      val (tok, rest) = if (i < 0) (s, "") else (s.substring(0, i), s.substring(i))
      val v = tok.trim.toDoubleOption.getOrElse(
        throw new IllegalArgumentException(
          s"function query: bad numeric literal '${tok.trim}'"))
      (Num(v), rest)
    } else {
      val nameEnd = s.indexWhere(c => !(c.isLetterOrDigit || c == '_'))
      val name = if (nameEnd < 0) s else s.substring(0, nameEnd)
      require(FieldRe.matches(name),
        s"function query: bad identifier '$name'")
      val rest = if (nameEnd < 0) "" else s.substring(nameEnd).trim
      if (!rest.startsWith("(")) (Field(name), if (nameEnd < 0) "" else s.substring(nameEnd))
      else {
        val ok = Arities.getOrElse(name,
          throw new IllegalArgumentException(
            s"function query: unknown function '$name'"))
        var cur = rest.substring(1)
        val args = Seq.newBuilder[Expr]
        var done = false
        while (!done) {
          val (a, r) = parseExpr(cur)
          args += a
          val rr = r.trim
          require(rr.nonEmpty, s"function query: unterminated '$name(...'")
          if (rr.head == ')') { cur = rr.substring(1); done = true }
          else {
            require(rr.head == ',',
              s"function query: expected ',' or ')' at '$rr'")
            cur = rr.substring(1)
          }
        }
        val as = args.result()
        require(ok(as.size),
          s"function query: '$name' does not take ${as.size} arguments")
        (Call(name, as), cur)
      }
    }
  }

  /** Render to a Spark Column (the engine side). */
  def toColumn(e: Expr): Column = e match {
    case Num(v)       => lit(v)
    case Field(n)     => col(n)
    case Call("recip", Seq(x, m, a, b)) =>
      toColumn(a) / (toColumn(m) * toColumn(x) + toColumn(b))
    case Call("linear", Seq(x, m, c)) => toColumn(m) * toColumn(x) + toColumn(c)
    case Call("div", Seq(a, b))       => toColumn(a) / toColumn(b)
    case Call("max", Seq(a, b))       => greatest(toColumn(a), toColumn(b))
    case Call("min", Seq(a, b))       => least(toColumn(a), toColumn(b))
    case Call("abs", Seq(x))          => abs(toColumn(x))
    case Call("sqrt", Seq(x))         => sqrt(toColumn(x))
    case Call("log", Seq(x))          => log10(toColumn(x))
    case Call("ln", Seq(x))           => log(toColumn(x))
    case Call("sum", as)              => as.map(toColumn).reduceLeft(_ + _)
    case Call("product", as)          => as.map(toColumn).reduceLeft(_ * _)
    case Call(f, as) =>
      throw new IllegalArgumentException(s"unreachable: $f/${as.size}")
  }

  /** Render to a DuckDB SQL fragment evaluating the identical tree.
    * `fieldRef` maps a field name to its SQL reference in the twin's
    * FROM context (e.g. "dl" → "dl.dl"). */
  def toSql(e: Expr, fieldRef: String => String): String = e match {
    case Num(v)       => s"CAST($v AS DOUBLE)"
    case Field(n)     => fieldRef(n)
    case Call("recip", Seq(x, m, a, b)) =>
      s"(${toSql(a, fieldRef)}/((${toSql(m, fieldRef)}*${toSql(x, fieldRef)})+${toSql(b, fieldRef)}))"
    case Call("linear", Seq(x, m, c)) =>
      s"((${toSql(m, fieldRef)}*${toSql(x, fieldRef)})+${toSql(c, fieldRef)})"
    case Call("div", Seq(a, b)) =>
      s"(${toSql(a, fieldRef)}/${toSql(b, fieldRef)})"
    case Call("max", Seq(a, b)) =>
      s"greatest(${toSql(a, fieldRef)}, ${toSql(b, fieldRef)})"
    case Call("min", Seq(a, b)) =>
      s"least(${toSql(a, fieldRef)}, ${toSql(b, fieldRef)})"
    case Call("abs", Seq(x))  => s"abs(${toSql(x, fieldRef)})"
    case Call("sqrt", Seq(x)) => s"sqrt(${toSql(x, fieldRef)})"
    case Call("log", Seq(x))  => s"log10(${toSql(x, fieldRef)})"
    case Call("ln", Seq(x))   => s"ln(${toSql(x, fieldRef)})"
    case Call("sum", as)      =>
      as.map(toSql(_, fieldRef)).reduceLeft((l, r) => s"($l+$r)")
    case Call("product", as)  =>
      as.map(toSql(_, fieldRef)).reduceLeft((l, r) => s"($l*$r)")
    case Call(f, as) =>
      throw new IllegalArgumentException(s"unreachable: $f/${as.size}")
  }

  /** One-call convenience: parse once, get the (Column, SQL) twins. */
  def twins(s: String, fieldRef: String => String): (Column, String) = {
    val ast = parse(s)
    (toColumn(ast), toSql(ast, fieldRef))
  }
}
