package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions._

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`, or call
  * [[GraftExtensions.register]] on an existing session. After that the
  * kernels are usable from `spark.sql(...)`:
  *
  *   SELECT iceberg_bucket(16, l_orderkey), simhash64(text), ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          builder))
    }
    // view DDL + substitution must run BEFORE the resolution batch, whose
    // ResolveSessionCatalog rejects v2 view statements outright
    ext.injectHintResolutionRule(session => new graft.plans.ResolveGraftViews(session))
    // ALTER TABLE ... ADD/DROP PARTITION FIELD (Iceberg DDL Spark lacks)
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue
    case other => sys.error(s"$what must be an integer literal, got $other")
  }

  /** function name -> expression builder (SQL surface of SURVEY §2.10/§2.13) */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "iceberg_bucket" -> (args => IcebergBucket(args(1), intArg(args.head, "numBuckets"))),
    "iceberg_truncate" -> (args => IcebergTruncate(args(1), intArg(args.head, "width"))),
    "simhash64" -> (args => SimHash64(args.head)),
    "minhash_signature" -> (args =>
      MinHashSignature(args.head, intArg(args(1), "shingleSize"), intArg(args(2), "numHashes"))),
    "shingle_hashes" -> (args => ShingleHashes(args.head, intArg(args(1), "n"))),
    "rolling_fingerprint" -> (args => RollingFingerprint(args.head, intArg(args(1), "window"))),
    "lang_id" -> (args => LangId(args.head)),
    "cosine_similarity" -> (args => CosineSimilarity(args.head, args(1))),
    "dot_product" -> (args => DotProduct(args.head, args(1))),
    "vector_norm" -> (args => VectorNorm(args.head)),
    "sign_bits" -> (args =>
      SignBits(args.head, intArg(args(1), "bits"), intArg(args(2), "seed"))),
  )

  /** register on an already-built session (temp functions) */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
