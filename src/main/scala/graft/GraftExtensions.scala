package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.catalyst._

/**
 * SQL surface for the native expressions. Two registration paths:
 *
 *   - `spark.sql.extensions=graft.GraftExtensions` at session build —
 *     the standard `SparkSessionExtensions` plugin route;
 *   - `GraftExtensions.register(spark)` on an existing session.
 *
 * Exposed functions (names prefixed to avoid any builtin collision):
 *   graft_rolling_hash(str), graft_simhash32(array<string>),
 *   graft_shingle_hashes(str, n), graft_shingle_hashes_all(str, n),
 *   graft_minhash_sig(array<long>, k),
 *   graft_dot_f32(array<float>, array<float>),
 *   graft_token_mode_count(str),
 *   graft_feature_hash_summary(str, d),
 *   graft_srp_bucket(array<float>, dim, nPlanes).
 * Integer parameters must be foldable literals (resolved at plan time).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder.andThen(identity)))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case l: org.apache.spark.sql.catalyst.expressions.Literal =>
      l.value.toString.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_rolling_hash" -> ((es: Seq[Expression]) => RollingHashBytes(es.head)),
    "graft_simhash32" -> ((es: Seq[Expression]) => SimHash32(es.head)),
    "graft_shingle_hashes" -> ((es: Seq[Expression]) =>
      ShingleHashes(es.head, litInt(es(1), "shingle width n"))),
    "graft_shingle_hashes_all" -> ((es: Seq[Expression]) =>
      ShingleHashesAll(es.head, litInt(es(1), "shingle width n"))),
    "graft_minhash_sig" -> ((es: Seq[Expression]) =>
      MinHashSig(es.head, litInt(es(1), "signature width k"))),
    "graft_dot_f32" -> ((es: Seq[Expression]) => DotProductF32(es.head, es(1))),
    "graft_token_mode_count" -> ((es: Seq[Expression]) => TokenModeCount(es.head)),
    "graft_feature_hash_summary" -> ((es: Seq[Expression]) =>
      FeatureHashSummary(es.head, litInt(es(1), "dimension count d"))),
    "graft_srp_bucket" -> ((es: Seq[Expression]) =>
      SrpBucketF32(es.head, litInt(es(1), "dim"), litInt(es(2), "nPlanes"))))

  /** Register all functions on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.FunctionRegistryBridge.register(spark, name, builder)
    }
}
