package graft.extensions

import graft.functions.{AvgTokenLenExpr, DetHashExpr, DotProductExpr, NgramSignatureExpr, PunctRatioExpr, StopRatioExpr, TokenCountExpr, TrigramBucketsExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers graft's native Catalyst expressions as
  * SQL functions. Two entry paths:
  *
  *  - config: `spark.sql.extensions=graft.extensions.GraftExtensions`
  *    (cluster deployments — applied at session build);
  *  - programmatic: `GraftExtensions.register(spark)` (idempotent; used by
  *    queries/tests running on an already-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCountExpr].getName, "graft_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_token_count takes one argument")
        TokenCountExpr(args.head)
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes two arguments")
        // cast float (or other numeric-element) arrays up front so
        // graft_dot(embedding, embedding) works directly on the stored
        // array<float> columns
        def toDoubleArray(e: Expression): Expression =
          org.apache.spark.sql.catalyst.expressions.Cast(e,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType))
        DotProductExpr(toDoubleArray(args.head), toDoubleArray(args(1)))
      }),
    unary("graft_simhash", classOf[graft.functions.SimhashExpr],
      graft.functions.SimhashExpr(_)),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinhashExpr].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash takes (text, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash k must be an integer literal, got $other")
        }
        graft.functions.MinhashExpr(args.head, k)
      }),
    (FunctionIdentifier("graft_ngram_sig"),
      new ExpressionInfo(classOf[NgramSignatureExpr].getName, "graft_ngram_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_ngram_sig takes (text, n, k)")
        def litInt(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_ngram_sig $what must be an integer literal, got $other")
        }
        NgramSignatureExpr(args.head, litInt(args(1), "n"), litInt(args(2), "k"))
      }),
    (FunctionIdentifier("graft_trigram_buckets"),
      new ExpressionInfo(classOf[TrigramBucketsExpr].getName,
        "graft_trigram_buckets"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_trigram_buckets takes (text, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_trigram_buckets k must be an integer literal, got $other")
        }
        TrigramBucketsExpr(args.head, k)
      }),
    unary("graft_det_hash", classOf[DetHashExpr], e =>
      DetHashExpr(org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.LongType))),
    unary("graft_nfc", classOf[graft.functions.NfcNormalizeExpr],
      graft.functions.NfcNormalizeExpr(_)),
    unary("graft_punct_ratio", classOf[PunctRatioExpr], PunctRatioExpr(_)),
    unary("graft_avg_token_len", classOf[AvgTokenLenExpr], AvgTokenLenExpr(_)),
    unary("graft_stop_ratio", classOf[StopRatioExpr], StopRatioExpr(_)))

  private def unary(name: String, cls: Class[_], build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes one argument")
        build(args.head)
      })

  /** Idempotent programmatic registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
