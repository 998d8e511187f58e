package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram extraction: all length-`n` character
  * substrings of a string, as ARRAY<STRING>.
  *
  * The SQL form `transform(sequence(1, length(s)-n+1), i ->
  * substr(s, i, n))` re-scans the string per position (substr is
  * O(position) on UTF-8 bytes), i.e. O(len²) per row in interpreted
  * lambda calls. Here the string is decoded once and grams are sliced
  * in one pass — O(len·n). Character semantics match SQL `substr`
  * (code-point based): supplementary characters count as one, so
  * surrogate pairs are never split.
  *
  * Returns an empty array for strings shorter than `n` — the same
  * contract as the guarded SQL form (DuckDB `range()` is empty there).
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 32, s"char_ngrams: n out of range: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cpCount = s.codePointCount(0, s.length)
    val count = cpCount - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else if (cpCount == s.length) {
      // BMP-only fast path: code units == code points
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(s.substring(i, i + n))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // one pass to mark code-point boundaries (code-unit offsets),
      // then slice on boundaries — surrogate pairs stay whole
      val bounds = new Array[Int](cpCount + 1)
      var cu = 0
      var cp = 0
      while (cp < cpCount) {
        bounds(cp) = cu
        cu += Character.charCount(s.codePointAt(cu))
        cp += 1
      }
      bounds(cpCount) = s.length
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(s.substring(bounds(i), bounds(i + n)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}
