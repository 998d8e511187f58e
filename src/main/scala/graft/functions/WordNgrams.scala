package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram (shingle) extraction: all length-`n` runs of
  * space-separated tokens, joined with single spaces, as ARRAY<STRING>.
  *
  * Exactly equivalent to the SQL form
  * `transform(sequence(0, size(split(s,' ')) - n), i ->
  *   concat_ws(' ', element_at(...), ...))`
  * but in one compiled pass: the HOF form pays an interpreted lambda
  * dispatch plus n element_at calls per position, and dominated the
  * MinHash dedup pipeline's scan stage (the same reasoning as
  * [[CharNgrams]]). Tokenization matches `split(s, ' ')` (Java
  * String.split with limit -1): consecutive spaces produce empty
  * tokens, so gram text is byte-identical to the SQL form.
  *
  * Returns an empty array when the input has fewer than `n` tokens.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 16, s"word_ngrams: n out of range: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val count = words.length - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}
