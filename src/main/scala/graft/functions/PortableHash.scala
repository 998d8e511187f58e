package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, md5, substring}

/** The engine-portable 60-bit hash used everywhere a hash must
  * reproduce bit-for-bit in the DuckDB oracle: the top 15 hex chars of
  * md5 parse identically via Spark `conv(..., 16, 10)` and DuckDB
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` — 60 bits stays
  * inside the positive int64 range in both engines.
  *
  * Single definition: sampling (q59/q60), KMV sketching (q43), and
  * SimHash bit sourcing (q37) must all keep using the SAME
  * construction, or the engines' results silently diverge.
  */
object PortableHash {
  /** 60-bit hash of the column's string form. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
}
