package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharNgrams, H60, IntDot, MinHashSig, RollingHash, SparseDot, WindowHashes, WordNgrams}

/** SparkSessionExtensions entry point — registers the library's native
  * Catalyst expressions into the function registry, the idiomatic
  * injection path (`--conf spark.sql.extensions=graft.GraftExtensions`
  * or `.config(...)` at session build). No custom optimizer rules or
  * strategies are injected: SURVEY §4 — Catalyst's standard rewrites
  * cover everything this engine needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private[graft] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"rolling_hash takes 1 argument, got ${children.length}")
        RollingHash(children.head)
      }),
    (FunctionIdentifier("window_hashes"),
      new ExpressionInfo(classOf[WindowHashes].getName, "window_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"window_hashes takes 2 arguments, got ${children.length}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue,
              s"window_hashes: n out of range: $v")
            v.toInt
          case _ => throw new IllegalArgumentException(
            "window_hashes: n must be an integer literal")
        }
        WindowHashes(children.head, n)
      }),
    (FunctionIdentifier("h60"),
      new ExpressionInfo(classOf[H60].getName, "h60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"h60 takes 1 argument, got ${children.length}")
        H60(children.head)
      }),
    (FunctionIdentifier("sparse_dot"),
      new ExpressionInfo(classOf[SparseDot].getName, "sparse_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"sparse_dot takes 2 arguments, got ${children.length}")
        SparseDot(children.head, children(1))
      }),
    (FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"int_dot takes 2 arguments, got ${children.length}")
        IntDot(children.head, children(1))
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"minhash_sig takes 2 arguments, got ${children.length}")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "minhash_sig: k must be an integer literal")
        }
        MinHashSig(children.head, k)
      }),
    (FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"char_ngrams takes 2 arguments, got ${children.length}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "char_ngrams: n must be an integer literal")
        }
        CharNgrams(children.head, n)
      }),
    (FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"word_ngrams takes 2 arguments, got ${children.length}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "word_ngrams: n must be an integer literal")
        }
        WordNgrams(children.head, n)
      }))

  /** Idempotent imperative registration — for sessions built without
    * the extensions conf (e.g. an external harness session). */
  def ensureRegistered(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
