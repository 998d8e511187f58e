package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col

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
  * estimate feedback loop is cut. The rebuilt node reports
  * `UnknownPartitioning` — measured (round 20): under AQE, PLAIN
  * `localCheckpoint`'s LogicalRDD ALSO reports UnknownPartitioning
  * (the adaptive wrapper hides the final plan's layout at capture
  * time), so nothing is lost relative to it, and for the
  * PageRank-family loops the unknown layout is strictly useful — the
  * state-side exchange it forces is what lets AQE observe the small
  * per-iteration state and broadcast it over an exchange-free
  * substrate scan (the coocDir rule).
  *
  * [[layoutLocalCheckpoint]] is the opposite trade for loops that
  * JOIN ON a stable key every round: it repartitions to an EXPLICIT
  * partition count on the key (explicit-N hash exchanges are never
  * AQE-coalesced, so the claimed layout is exact by construction),
  * optionally sorts within partitions, checkpoints, and rebuilds the
  * LogicalRDD CLAIMING that HashPartitioning/ordering (what
  * `Dataset.checkpoint` captures in non-adaptive plans) with no origin
  * stats. Rounds that join or aggregate on the key then satisfy their
  * required distribution from the checkpoint — no per-round
  * re-exchange of the pinned side. Claim soundness: repartition(n, k)
  * places rows by exactly `HashPartitioning(k, n)`; sortWithinPartitions
  * orders them; localCheckpoint materializes partitions 1:1 (a map) —
  * so the claimed metadata is true of the stored blocks.
  *
  * Version coupling (ADVICE r19): this leans on Spark-internal
  * surfaces — `asInstanceOf[sql.classic.Dataset]`, `private[sql]`
  * `internalCreateDataFrame`, and `LogicalRDD.copy`'s curried
  * (session, originStats, originConstraints) list — that can shift on
  * a Spark minor bump. FreshCheckpointSpec pins the behaviors (stats
  * reset, claimed layout satisfying a same-key aggregation without an
  * exchange) so a bump that changes either fails the suite, not
  * production. The rebuilt nodes' fallback estimate is
  * `spark.sql.defaultSizeInBytes` (effectively ∞), so the state can
  * never be STATICALLY planned as a broadcast side; that is accepted —
  * a modest constant estimate could mis-broadcast a 100 TB state,
  * while AQE's runtime conversion sees real sizes.
  */
object FreshCheckpoint {
  /** The REAL materialized size of the (eager) checkpoint's persisted
    * blocks, from the block manager — not an estimate. Supplying it as
    * the rebuilt LogicalRDD's stats (constant per iteration — the
    * squaring feedback is still cut) lets the STATIC planner broadcast
    * a small iteration state: measured round 20 on q235 (Katz), the
    * default ∞ estimate forced every iteration's |E|-row join to plan
    * SMJ, and although AQE converted it to a broadcast join at
    * runtime, the edge-side exchange had already materialized by then
    * (AQE re-plans a join only after its child stages ran) — 329 MB of
    * per-query shuffle for a 20 MB edge cache. Real stats are also the
    * honest scale guard: a 100 TB state reports its true size and
    * correctly stays on the shuffle path. */
  private def realStats(cds: org.apache.spark.sql.classic.Dataset[Row],
      rddId: Int): Option[org.apache.spark.sql.catalyst.plans.logical.Statistics] =
    cds.sparkSession.sparkContext.getRDDStorageInfo.find(_.id == rddId)
      .map { i =>
        org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = BigInt(i.memSize + i.diskSize).max(1))
      }

  /** `realSizeStats = false` keeps the ∞ default estimate instead —
    * measured necessary for HITS (q212), whose two-hop step chains two
    * |E| joins off the same cached incidence list: statically
    * broadcasting the state re-plans the chain into per-iteration
    * edge-side exchanges (11.8 s vs 6.6 s paired at sf0.1), while the
    * ∞ estimate keeps AQE's runtime shape. Every other fixpoint
    * measured faster (or flat) with real stats. */
  def freshLocalCheckpoint(df: DataFrame,
      realSizeStats: Boolean = true): DataFrame = {
    val ck = df.localCheckpoint()
    val cds = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cds.queryExecution.analyzed match {
      case lr: LogicalRDD if realSizeStats =>
        org.apache.spark.sql.classic.Dataset.ofRows(cds.sparkSession,
          lr.copy()(cds.sparkSession, realStats(cds, lr.rdd.id), None))
      case _ =>
        cds.sparkSession.internalCreateDataFrame(
          cds.queryExecution.toRdd, cds.schema)
    }
  }

  def layoutLocalCheckpoint(df: DataFrame, keys: Seq[String], n: Int,
      sorted: Boolean = true): DataFrame = {
    require(n > 0, s"layoutLocalCheckpoint: partition count must be > 0, got $n")
    val keyCols = keys.map(col)
    val arranged0 = df.repartition(n, keyCols: _*)
    val arranged =
      if (sorted) arranged0.sortWithinPartitions(keyCols: _*) else arranged0
    val ck = arranged.localCheckpoint()
    val cds = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"layoutLocalCheckpoint: no output column named $k")))
        val part = HashPartitioning(attrs, n)
        val ord =
          if (sorted) attrs.map(a => SortOrder(a, Ascending)) else Nil
        org.apache.spark.sql.classic.Dataset.ofRows(cds.sparkSession,
          lr.copy(outputPartitioning = part, outputOrdering = ord)(
            cds.sparkSession, realStats(cds, lr.rdd.id), None))
      case other =>
        // localCheckpoint stopped returning a bare LogicalRDD — fall
        // back to the layout-free rebuild rather than claim anything
        cds.sparkSession.internalCreateDataFrame(
          cds.queryExecution.toRdd, cds.schema)
    }
  }
}
