package graft

import graft.functions.JsonPathPredicate
import graft.functions.JsonPathPredicate._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential test of the predicate compiler: for hundreds of randomly
  * generated predicate trees, the compiled Catalyst `Column` and the in-memory
  * reference evaluator [[JsonPathPredicate.eval]] must agree on every row —
  * including null fields and null literals, where both sides follow SQL
  * three-valued logic (None / NULL = row filtered out).
  *
  * All predicates are evaluated in ONE Spark job (each predicate is a boolean
  * output column), so the suite stays fast.
  */
class JsonPathPredicateDifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rng = new Random(20260812L)

  private val numFields = Seq("buys", "sells", "number_shares")
  private val strFields = Seq("symbol")
  private val boolFields = Seq("flag")
  private val strPool = Seq("AAA", "BBB", "CFLT", "", "ZELK", "a'b")
  private val numPool = Seq(0.0, 1.0, -1.0, 333.0, 400.0, 2.5, 1e6)

  private def genOperandPair(): (Operand, Operand) = rng.nextInt(3) match {
    case 0 => // numeric
      def op() = rng.nextInt(3) match {
        case 0 => FieldRef(Seq(numFields(rng.nextInt(numFields.size))))
        case 1 => NumberLit(numPool(rng.nextInt(numPool.size)))
        case _ => if (rng.nextInt(8) == 0) NullLit else FieldRef(Seq(numFields(rng.nextInt(numFields.size))))
      }
      (op(), op())
    case 1 => // string
      def op() = rng.nextInt(3) match {
        case 0 => FieldRef(Seq(strFields(rng.nextInt(strFields.size))))
        case _ => if (rng.nextInt(8) == 0) NullLit else StringLit(strPool(rng.nextInt(strPool.size)))
      }
      (op(), op())
    case _ => // boolean (==/!= only)
      def op() = rng.nextInt(3) match {
        case 0 => FieldRef(Seq(boolFields(rng.nextInt(boolFields.size))))
        case _ => if (rng.nextInt(8) == 0) NullLit else BoolLit(rng.nextBoolean())
      }
      (op(), op())
  }

  private def genCmp(): Pred = {
    val (l, r) = genOperandPair()
    val boolish = Seq(l, r).exists {
      case FieldRef(p) => boolFields.contains(p.head)
      case BoolLit(_)  => true
      case _           => false
    }
    val ops = if (boolish) Seq("==", "!=") else Seq("==", "!=", "<", "<=", ">", ">=")
    Cmp(l, ops(rng.nextInt(ops.size)), r)
  }

  private def genPred(depth: Int): Pred =
    if (depth <= 0) genCmp()
    else rng.nextInt(5) match {
      case 0 => And(genPred(depth - 1), genPred(depth - 1))
      case 1 => Or(genPred(depth - 1), genPred(depth - 1))
      case 2 => Not(genPred(depth - 1))
      case _ => genCmp()
    }

  /** Render a Pred back to the predicate-string grammar (also exercises the
    * parser: parse(render(p)) must equal p).
    */
  private def render(p: Pred): String = p match {
    case And(l, r) => s"(${render(l)}) && (${render(r)})"
    case Or(l, r)  => s"(${render(l)}) || (${render(r)})"
    case Not(i)    => s"!(${render(i)})"
    case Cmp(l, op, r) => s"${renderOp(l)} $op ${renderOp(r)}"
  }
  private def renderOp(o: Operand): String = o match {
    case FieldRef(path) => "@." + path.mkString(".")
    case NumberLit(v)   => if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else v.toString
    case StringLit(v)   => "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case BoolLit(v)     => v.toString
    case NullLit        => "null"
  }

  private val schema = StructType(Seq(
    StructField("symbol", StringType, nullable = true),
    StructField("buys", DoubleType, nullable = true),
    StructField("sells", DoubleType, nullable = true),
    StructField("number_shares", LongType, nullable = true),
    StructField("flag", BooleanType, nullable = true)
  ))

  private def genRow(): Row = {
    def orNull[A](v: A): Any = if (rng.nextInt(6) == 0) null else v
    Row(
      orNull(strPool(rng.nextInt(strPool.size))),
      orNull(numPool(rng.nextInt(numPool.size))),
      orNull(numPool(rng.nextInt(numPool.size))),
      orNull(rng.nextInt(5000).toLong),
      orNull(rng.nextBoolean())
    )
  }

  test("compiled Column agrees with eval on 300 random predicates x 60 random rows") {
    val rows = Seq.fill(60)(genRow())
    val preds = Seq.fill(300)(genPred(2))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    // parser round-trip
    preds.foreach { p =>
      val s = render(p)
      assert(JsonPathPredicate.parse(s) === p, s"parse(render) mismatch for: $s")
    }

    // one job: every predicate as a boolean output column
    val cols = preds.zipWithIndex.map { case (p, i) =>
      JsonPathPredicate.toColumn(p, org.apache.spark.sql.functions.col).as(s"p$i")
    }
    val out = df.select(cols: _*).collect()

    rows.zip(out).zipWithIndex.foreach { case ((row, got), ri) =>
      val rowMap: Map[String, Any] = schema.fieldNames.zipWithIndex.map {
        case (f, i) => f -> row.get(i)
      }.toMap
      preds.zipWithIndex.foreach { case (p, pi) =>
        val expected: Any = eval(p, rowMap) match { case Some(b) => b; case None => null }
        val actual: Any = if (got.isNullAt(pi)) null else got.getBoolean(pi)
        assert(actual === expected,
          s"row#$ri $rowMap predicate '${render(p)}': spark=$actual eval=$expected")
      }
    }
  }
}
