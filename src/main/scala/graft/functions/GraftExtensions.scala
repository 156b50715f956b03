package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType

import graft.functions.NativeExpressions._

/** SQL registration of the native kernel expressions, two ways:
  *
  *   - [[GraftExtensions]] — the standard extension-library path: set
  *     `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *     `builder.withExtensions(new GraftExtensions)`) and every new session
  *     can call `shingle_hashes(text, 3)` etc. from SQL.
  *   - [[NativeFunctions.register]] — same functions injected into an
  *     ALREADY-RUNNING session's registry (extensions only apply at session
  *     construction; a library handed an existing session needs this).
  *
  * Static int parameters (shingle width, signature length, ...) must be
  * foldable int literals — rejected loudly otherwise, matching the JSONPath
  * compiler's reject-don't-guess policy.
  */
object NativeFunctions {

  private def intArg(fn: String, pos: Int, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def nArgs(fn: String, n: Int, args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")
    args
  }

  /** (name, builder) for every SQL-exposed native function. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "shingle_hashes" -> { args: Seq[Expression] =>
      val Seq(t, n) = nArgs("shingle_hashes", 2, args)
      ShingleHashesExpr(t, intArg("shingle_hashes", 1, n))
    },
    "minhash_signature" -> { args: Seq[Expression] =>
      val Seq(h, k) = nArgs("minhash_signature", 2, args)
      MinHashSignatureExpr(h, intArg("minhash_signature", 1, k))
    },
    "simhash64" -> { args: Seq[Expression] =>
      val Seq(h) = nArgs("simhash64", 1, args)
      SimHash64Expr(h)
    },
    "vec_dot" -> { args: Seq[Expression] =>
      val Seq(a, b) = nArgs("vec_dot", 2, args)
      VecDotExpr(a, b)
    },
    "lsh_buckets" -> { args: Seq[Expression] =>
      val Seq(v, t, b) = nArgs("lsh_buckets", 3, args)
      LshBucketsExpr(v, intArg("lsh_buckets", 1, t), intArg("lsh_buckets", 2, b))
    },
    "char_ngrams" -> { args: Seq[Expression] =>
      val Seq(t, n) = nArgs("char_ngrams", 2, args)
      CharNgramsExpr(t, intArg("char_ngrams", 1, n))
    },
    "word_bigrams" -> { args: Seq[Expression] =>
      val Seq(t) = nArgs("word_bigrams", 1, args)
      WordBigramsExpr(t)
    },
    "winnowing_fingerprints" -> { args: Seq[Expression] =>
      val Seq(t, k, w) = nArgs("winnowing_fingerprints", 3, args)
      WinnowingExpr(t, intArg("winnowing_fingerprints", 1, k),
        intArg("winnowing_fingerprints", 2, w))
    },
    "repetition_ratios" -> { args: Seq[Expression] =>
      val Seq(t) = nArgs("repetition_ratios", 1, args)
      RepetitionRatiosExpr(t)
    },
    "word_window_md5" -> { args: Seq[Expression] =>
      val Seq(t, w) = nArgs("word_window_md5", 2, args)
      WordWindowMd5Expr(t, intArg("word_window_md5", 1, w))
    },
    "shingle_md5_hashes60" -> { args: Seq[Expression] =>
      val Seq(t, n) = nArgs("shingle_md5_hashes60", 2, args)
      ShingleMd5Hashes60Expr(t, intArg("shingle_md5_hashes60", 1, n))
    },
    "winnow_md5_hex" -> { args: Seq[Expression] =>
      val Seq(t, k, w) = nArgs("winnow_md5_hex", 3, args)
      WinnowMd5HexExpr(t, intArg("winnow_md5_hex", 1, k),
        intArg("winnow_md5_hex", 2, w))
    }
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(NativeExpressions.getClass.getName, name)

  /** Register every native function into an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, info(name), builder)
    }

  private[functions] def injectAll(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
}

/** `spark.sql.extensions` entry point (see [[NativeFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    NativeFunctions.injectAll(ext)
}
