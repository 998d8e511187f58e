package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: k minimum hash values over an
  * ARRAY<STRING> of shingles, in one compiled pass.
  *
  * The composed higher-order-function form
  * (`transform(sequence(0,k-1), i -> array_min(transform(sh, x ->
  * xxhash64(i, x))))`) evaluates k·|sh| interpreted lambda calls per
  * row — the dominant cost of the near-dup pipeline at scale. Here
  * each shingle is hashed twice (xxhash64 with two seeds) and the k
  * per-band values derive from the Kirsch–Mitzenmacher combination
  * h1 + i·h2 — |sh|·2 real hashes instead of |sh|·k, inside a tight
  * JVM loop. The per-band min property and LSH collision statistics
  * are preserved (standard multi-hash simulation); candidate recall is
  * validated by q36's ground-truth oracle, which is hash-scheme
  * independent.
  *
  * CodegenFallback is deliberate: the row-level call overhead is
  * negligible (one call per document) while the inner loop is already
  * compiled Scala — doGenCode would only inline the call site.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && k <= 1024, s"minhash_sig: k out of range: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var e = 0
    while (e < n) {
      val s = arr.getUTF8String(e)
      if (s != null) {
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 1337L)
        var i = 0
        var h = h1
        while (i < k) {
          if (h < mins(i)) mins(i) = h
          h += h2 // Kirsch–Mitzenmacher: band i uses h1 + i·h2
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
