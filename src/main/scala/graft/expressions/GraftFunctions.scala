package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL surface for the native expressions: register once and every
  * `spark.sql(...)` query (or SQL-first user) can call the engine's
  * hash/vector kernels directly —
  * `SELECT graft_simhash(text) FROM docs`. Two entry points:
  *
  *  - `GraftFunctions.register(spark)` on a live session;
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard extensions hook, works from pure config).
  *
  * Integer parameters (shingle k, permutation counts, LSH geometry)
  * must be literals — they parameterize codegen, not per-row data.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: argument '$name' must be an integer literal")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.expressions", name, usage),
      builder)

  val all: Seq[FunctionDescription] = Seq(
    fn("graft_simhash", "graft_simhash(text) - 32-bit SimHash of whitespace tokens") { args =>
      arity("graft_simhash", args, 1); SimHash32Expr(args.head)
    },
    fn("graft_fingerprint", "graft_fingerprint(text) - rolling polynomial fingerprint") { args =>
      arity("graft_fingerprint", args, 1); FingerprintExpr(args.head)
    },
    fn("graft_shingle_keys", "graft_shingle_keys(text, k) - distinct xxhash64 word k-gram keys") { args =>
      arity("graft_shingle_keys", args, 2)
      ShingleKeysFastExpr(args.head, intArg(args(1), "graft_shingle_keys", "k"))
    },
    fn("graft_minhash_sig", "graft_minhash_sig(text, k, perms) - MinHash signature (portable base_hash)") { args =>
      arity("graft_minhash_sig", args, 3)
      MinHashSigExpr(args.head, intArg(args(1), "graft_minhash_sig", "k"),
        intArg(args(2), "graft_minhash_sig", "perms"))
    },
    fn("graft_quantize", "graft_quantize(vec) - float vector to exact 1e-6 fixed-point int64") { args =>
      arity("graft_quantize", args, 1); QuantizeVecExpr(args.head)
    },
    fn("graft_dotq", "graft_dotq(a, b) - exact integer dot product of quantized vectors") { args =>
      arity("graft_dotq", args, 2); DotQExpr(args.head, args(1))
    },
    fn("graft_normq", "graft_normq(a) - exact integer squared norm of a quantized vector") { args =>
      arity("graft_normq", args, 1); NormQExpr(args.head)
    },
    fn("graft_lsh_buckets", "graft_lsh_buckets(q, tables, planes, dims) - hyperplane LSH bucket per table") { args =>
      arity("graft_lsh_buckets", args, 4)
      LshBucketsExpr(args.head, intArg(args(1), "graft_lsh_buckets", "tables"),
        intArg(args(2), "graft_lsh_buckets", "planes"),
        intArg(args(3), "graft_lsh_buckets", "dims"))
    },
    fn("graft_bigram_buckets", "graft_bigram_buckets(text, buckets) - hashed-bigram DSIR feature buckets (portable base_hash)") { args =>
      arity("graft_bigram_buckets", args, 2)
      BigramBucketsExpr(args.head, intArg(args(1), "graft_bigram_buckets", "buckets"))
    },
    fn("graft_window_keys", "graft_window_keys(text, l) - rolling L-token window keys for exact substring dedup") { args =>
      arity("graft_window_keys", args, 2)
      WindowKeysExpr(args.head, intArg(args(1), "graft_window_keys", "l"))
    })

  /** Register every graft_* function on a live session. */
  def register(spark: SparkSession): Unit = all.foreach { case (ident, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
