package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** Access bridge for iterative-loop checkpointing (the
  * [[org.apache.spark.sql.execution.streaming.state.GraftStateStoreHygiene]]
  * pattern: a `private[sql]` surface the library legitimately needs,
  * reached from inside the package rather than by reflection).
  *
  * Why it exists: `Dataset.localCheckpoint` pins the materialized rows
  * AND carries the checkpointed plan's ESTIMATED statistics forward as
  * the new `LogicalRDD`'s `originStats`. An iterative loop whose
  * per-iteration plan references the previous checkpoint TWICE — the
  * round-19 fused form `step(p) ⋈ p` that folds the convergence probe
  * into the step's one materialization — then squares that estimate
  * every iteration (size-only join estimation multiplies the two
  * sides), so the BigInt `sizeInBytes` doubles in DIGITS per round:
  * by ~16 iterations the driver burns whole seconds in million-digit
  * BigInt arithmetic inside the optimizer, and past ~25 it dies with
  * java.math's "BigInteger would overflow supported range" (observed
  * on q161's 32-iteration cap at sf0.01 — a pure driver-side
  * estimation artifact; the data is thousands of rows).
  *
  * [[freshLocalCheckpoint]] therefore checkpoints and then rebuilds
  * the DataFrame over the SAME materialized internal RDD via
  * `internalCreateDataFrame`, whose `LogicalRDD` carries NO origin
  * stats (fresh default estimates every iteration — constant-size,
  * exactly like a parquet scan). Same rows, same schema; only the
  * estimate feedback loop is cut.
  */
object FreshCheckpoint {
  def freshLocalCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    val cds = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cds.sparkSession.internalCreateDataFrame(
      cds.queryExecution.toRdd, cds.schema)
  }
}
