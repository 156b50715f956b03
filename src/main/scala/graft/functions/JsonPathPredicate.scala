package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Compiler from the reference's JSONPath filter-predicate subset to a Catalyst
  * [[Column]].
  *
  * The reference applies user-supplied jayway-JSONPath predicates to the JSON
  * values of a key-range scan — `store/CustomQueryStore.java:91-93` wraps the
  * predicate string as `$.[?(<predicate>)]` and runs it AFTER materializing the
  * whole range into one JSON array (filter-after-materialize, SURVEY §4).
  * Compiling the predicate to a `Column` instead hands it to Catalyst, which
  * collapses it with the range predicate and pushes both into the scan — the
  * idiomatic Spark realization of the same semantics.
  *
  * Grammar (exactly the subset the reference exercises — predicate strings in
  * `test/.../JacksonProtobufMappingProviderTest.java:76-127` and
  * `InteractiveQueriesIntegrationTest.java:273`; anything else is rejected
  * loudly, SURVEY §7.3):
  *
  * {{{
  * orExpr   := andExpr ( '||' andExpr )*
  * andExpr  := unary   ( '&&' unary )*
  * unary    := '!' unary | comparison | '(' orExpr ')'
  * comparison := operand op operand
  * op       := '==' | '!=' | '<=' | '>=' | '<' | '>'
  * operand  := '@.' ident ( '.' ident )* | number | 'string' | true | false | null
  * }}}
  */
object JsonPathPredicate {

  sealed trait Operand
  final case class FieldRef(path: Seq[String]) extends Operand
  final case class NumberLit(value: Double) extends Operand
  final case class StringLit(value: String) extends Operand
  final case class BoolLit(value: Boolean) extends Operand
  case object NullLit extends Operand

  sealed trait Pred
  final case class Cmp(left: Operand, op: String, right: Operand) extends Pred
  final case class And(left: Pred, right: Pred) extends Pred
  final case class Or(left: Pred, right: Pred) extends Pred
  final case class Not(inner: Pred) extends Pred

  final case class ParseException(msg: String, pos: Int)
      extends IllegalArgumentException(s"$msg at position $pos")

  /** Parse a predicate string (the part inside `[?( ... )]`). */
  def parse(input: String): Pred = new Parser(input).parseAll()

  /** Compile to a Catalyst Column over a DataFrame whose columns carry the
    * JSON field names (the aggregate's `symbol`/`buys`/`sells`/...).
    */
  def compile(input: String): Column = toColumn(parse(input), name => col(name))

  /** Compile with a custom field resolver (e.g. fields nested under a struct
    * column, or renamed).
    */
  def compile(input: String, resolver: String => Column): Column =
    toColumn(parse(input), resolver)

  def toColumn(p: Pred, resolver: String => Column): Column = p match {
    case And(l, r) => toColumn(l, resolver) && toColumn(r, resolver)
    case Or(l, r)  => toColumn(l, resolver) || toColumn(r, resolver)
    case Not(i)    => !toColumn(i, resolver)
    case Cmp(l, op, r) =>
      val lc = operandColumn(l, resolver)
      val rc = operandColumn(r, resolver)
      op match {
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case "<"  => lc < rc
        case "<=" => lc <= rc
        case ">"  => lc > rc
        case ">=" => lc >= rc
      }
  }

  private def operandColumn(o: Operand, resolver: String => Column): Column = o match {
    case FieldRef(path)  => path.tail.foldLeft(resolver(path.head))(_.getField(_))
    case NumberLit(v)    => if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15) lit(v.toLong) else lit(v)
    case StringLit(v)    => lit(v)
    case BoolLit(v)      => lit(v)
    case NullLit         => lit(null)
  }

  /** Reference evaluator over an in-memory row (field → Any), used by the
    * ScalaCheck differential tests. Three-valued like the compiled Column
    * (Catalyst SQL logic): a comparison with null is None (unknown), and
    * None propagates through Not/And/Or exactly as SQL does — so
    * `eval(...).contains(true)` matches "row survives the filter".
    * Numeric comparisons are double-based, as jayway's ValueCompare does for
    * mixed numeric types.
    */
  def eval(p: Pred, row: Map[String, Any]): Option[Boolean] = p match {
    case And(l, r) =>
      (eval(l, row), eval(r, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
    case Or(l, r) =>
      (eval(l, row), eval(r, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
    case Not(i) => eval(i, row).map(!_)
    case Cmp(l, op, r) =>
      val lv = evalOperand(l, row)
      val rv = evalOperand(r, row)
      (lv, rv) match {
        case (null, _) | (_, null) => None // SQL: any comparison with null is unknown
        case (a: Double, b: Double) =>
          Some(op match {
            case "==" => a == b;  case "!=" => a != b
            case "<"  => a < b;   case "<=" => a <= b
            case ">"  => a > b;   case ">=" => a >= b
          })
        case (a: String, b: String) =>
          // Catalyst compares UTF8String bytes, i.e. code-POINT order; Java's
          // String.compareTo is UTF-16 code-UNIT order. They diverge for
          // supplementary characters vs U+E000..U+FFFF, so compare code points.
          val c = codePointCompare(a, b)
          Some(op match {
            case "==" => c == 0;  case "!=" => c != 0
            case "<"  => c < 0;   case "<=" => c <= 0
            case ">"  => c > 0;   case ">=" => c >= 0
          })
        case (a: Boolean, b: Boolean) =>
          op match {
            case "==" => Some(a == b);  case "!=" => Some(a != b)
            case _    => throw new IllegalArgumentException(s"bad bool cmp $op")
          }
        case (a, b) =>
          throw new IllegalArgumentException(s"type mismatch: $a $op $b")
      }
  }

  /** Lexicographic compare by Unicode code points — equivalent to comparing
    * the strings' UTF-8 byte sequences, which is what Catalyst's UTF8String
    * ordering does.
    */
  private def codePointCompare(a: String, b: String): Int = {
    var ia = 0; var ib = 0
    while (ia < a.length && ib < b.length) {
      val ca = a.codePointAt(ia)
      val cb = b.codePointAt(ib)
      if (ca != cb) return Integer.compare(ca, cb)
      ia += Character.charCount(ca)
      ib += Character.charCount(cb)
    }
    Integer.compare(a.length - ia, b.length - ib)
  }

  private def evalOperand(o: Operand, row: Map[String, Any]): Any = o match {
    case FieldRef(path) =>
      row.getOrElse(path.mkString("."), null) match {
        case i: Int    => i.toDouble
        case l: Long   => l.toDouble
        case f: Float  => f.toDouble
        case other     => other
      }
    case NumberLit(v) => v
    case StringLit(v) => v
    case BoolLit(v)   => v
    case NullLit      => null
  }

  // ---------------------------------------------------------------- parser

  private final class Parser(s: String) {
    private var i = 0

    def parseAll(): Pred = {
      val p = orExpr()
      skipWs()
      if (i < s.length) fail(s"unexpected trailing input '${s.substring(i)}'")
      p
    }

    private def orExpr(): Pred = {
      var left = andExpr()
      while (peekOp("||")) { consume("||"); left = Or(left, andExpr()) }
      left
    }

    private def andExpr(): Pred = {
      var left = unary()
      while (peekOp("&&")) { consume("&&"); left = And(left, unary()) }
      left
    }

    private def unary(): Pred = {
      skipWs()
      if (i < s.length && s(i) == '!' && (i + 1 >= s.length || s(i + 1) != '=')) {
        i += 1; Not(unary())
      } else if (i < s.length && s(i) == '(') {
        i += 1
        val p = orExpr()
        skipWs()
        if (i >= s.length || s(i) != ')') fail("expected ')'")
        i += 1
        p
      } else comparison()
    }

    private def comparison(): Pred = {
      val l = operand()
      skipWs()
      val op = Seq("==", "!=", "<=", ">=", "<", ">").find(peekOp) match {
        case Some(o) => consume(o); o
        case None    => fail("expected comparison operator")
      }
      val r = operand()
      Cmp(l, op, r)
    }

    private def operand(): Operand = {
      skipWs()
      if (i >= s.length) fail("expected operand")
      s(i) match {
        case '@' =>
          i += 1
          if (i >= s.length || s(i) != '.') fail("expected '.' after '@'")
          val parts = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < s.length && s(i) == '.') {
            i += 1
            val start = i
            while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
            if (i == start) fail("expected field name")
            parts += s.substring(start, i)
          }
          FieldRef(parts.toSeq)
        case q @ ('\'' | '"') =>
          i += 1
          StringLit(stringBody(q))
        case c if c.isDigit || c == '-' || c == '+' =>
          val start = i
          if (s(i) == '-' || s(i) == '+') i += 1
          while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
                 s(i) == 'E' || ((s(i) == '-' || s(i) == '+') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
          val text = s.substring(start, i)
          try NumberLit(text.toDouble)
          catch { case _: NumberFormatException => fail(s"bad number '$text'") }
        case _ if s.startsWith("true", i)  => i += 4; BoolLit(true)
        case _ if s.startsWith("false", i) => i += 5; BoolLit(false)
        case _ if s.startsWith("null", i)  => i += 4; NullLit
        case c => fail(s"unexpected character '$c'")
      }
    }

    /** Body of a string literal after the opening quote. JSON/jayway escape
      * semantics: the common escapes are interpreted; anything else is
      * rejected loudly (grammar policy: exactly the supported subset,
      * SURVEY §7.3).
      */
    private def stringBody(quote: Char): String = {
      val sb = new StringBuilder
      while (i < s.length && s(i) != quote) {
        if (s(i) == '\\') {
          if (i + 1 >= s.length) fail("dangling escape")
          s(i + 1) match {
            case 'n'  => sb.append('\n')
            case 't'  => sb.append('\t')
            case 'r'  => sb.append('\r')
            case '\\' => sb.append('\\')
            case '\'' => sb.append('\'')
            case '"'  => sb.append('"')
            case '/'  => sb.append('/')
            case c    => fail(s"unsupported escape '\\$c'")
          }
          i += 2
        } else { sb.append(s(i)); i += 1 }
      }
      if (i >= s.length) fail("unterminated string literal")
      i += 1
      sb.toString
    }

    private def peekOp(op: String): Boolean = { skipWs(); s.startsWith(op, i) }
    private def consume(op: String): Unit = { skipWs(); i += op.length }
    private def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def fail(msg: String): Nothing = throw ParseException(msg, i)
  }
}
