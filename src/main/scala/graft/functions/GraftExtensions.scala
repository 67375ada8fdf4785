package graft.functions

import graft.text.Dedup
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the native kernels, two ways:
  *
  *  1. **Deploy-time**: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (or `SparkSession.builder().withExtensions(new GraftExtensions)`)
  *     injects the functions into every session of the cluster — the
  *     standard Spark extension mechanism, no code changes at call
  *     sites, plain SQL users get `graft_poly_hash(...)` etc.
  *  2. **Runtime**: [[GraftFunctions.register]] adds the same builders
  *     to an existing session's function registry (tests, notebooks).
  *
  * Because these are real Catalyst expressions (foldable, codegen'd),
  * the optimizer treats them like built-ins: constant arguments fold
  * at plan time and calls participate in whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator extension: the native sorted-merge as-of join
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // plan-shaping rules: column pruning through the as-of join node,
    // and auto-rewrite of the union-window as-of idiom onto it
    ext.injectOptimizerRule(_ => graft.plans.AsOfColumnPruning)
    ext.injectOptimizerRule(_ => graft.plans.AsOfAutoRewrite)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  private def one(name: String)(f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.length}")
  }

  private def two(name: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${args.length}")
  }

  /** (name, info, builder) for every exposed kernel. */
  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash", info("graft_poly_hash",
      "polynomial rolling hash (base 131 mod 2^31-1)"),
      one("graft_poly_hash")(PolyHash(_, Poly.Base))),
    ("graft_simhash64", info("graft_simhash64",
      "62-bit SimHash fingerprint of an array<string>"),
      one("graft_simhash64")(SimHash64)),
    ("graft_minhash_sig", info("graft_minhash_sig",
      "64-perm MinHash signature of an array<string>"),
      one("graft_minhash_sig")(MinHashSig(_, Dedup.permA, Dedup.permB))),
    ("graft_vec_dot", info("graft_vec_dot",
      "sequential-double dot product of two array<float>"),
      two("graft_vec_dot")(VecDot)),
    ("graft_vec_norm", info("graft_vec_norm",
      "L2 norm of an array<float>"),
      one("graft_vec_norm")(VecNorm)),
    ("graft_vec_dot_d", info("graft_vec_dot_d",
      "sequential-double dot product of array<float> x array<double>"),
      two("graft_vec_dot_d")(VecDotD)),
    ("graft_shingle_hashes", info("graft_shingle_hashes",
      "distinct word-n-gram polynomial shingle hashes of a string"),
      two("graft_shingle_hashes") { (text, n) =>
        n match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
            ShingleHashes(text, v, Poly.Base)
          case _ => throw new IllegalArgumentException(
            "graft_shingle_hashes expects a literal int n")
        }
      }),
    ("graft_capped_min_ids", info("graft_capped_min_ids",
      "bounded bucket aggregate: struct(total, cap smallest ids)"),
      two("graft_capped_min_ids") { (id, cap) =>
        cap match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
            CappedMinIds(id, v)
          case _ => throw new IllegalArgumentException(
            "graft_capped_min_ids expects a literal int cap")
        }
      }),
    ("graft_char_entropy", info("graft_char_entropy",
      "per-string [distinct codepoints, Shannon entropy in integer micro-nats]"),
      one("graft_char_entropy")(CharEntropy)),
    ("graft_pair_array", info("graft_pair_array",
      "all C(n,2) ordered id pairs of an array<long> as struct(id_a, id_b)"),
      one("graft_pair_array")(PairArray)),
    ("graft_nfc_normalize", info("graft_nfc_normalize",
      "Unicode NFC normalization (twin of DuckDB's nfc_normalize)"),
      one("graft_nfc_normalize")(NfcNormalize)),
  )

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
