package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** The engine-portable 60-bit hash used everywhere a hash must
  * reproduce bit-for-bit in the DuckDB oracle: the top 15 hex chars of
  * md5 parse identically via the native [[H60]] expression (fused
  * digest→long, codegen) and DuckDB
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` — 60 bits stays
  * inside the positive int64 range in both engines. ExpressionSpec
  * pins H60 bit-identical to the composed
  * `conv(substring(md5(x), 1, 15), 16, 10)` form it replaced.
  *
  * Single definition: sampling (q59/q60), KMV sketching (q43), and
  * SimHash bit sourcing (q37) must all keep using the SAME
  * construction, or the engines' results silently diverge.
  *
  * Resolved through the function registry, so the session must carry
  * `spark.sql.extensions=graft.GraftExtensions` (every harness session
  * does) or have called `GraftExtensions.ensureRegistered`.
  */
object PortableHash {
  /** 60-bit hash of the column's string form. */
  def h60(c: Column): Column =
    call_function("h60", c.cast("string"))
}
