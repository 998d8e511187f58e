package graft.sources.shard

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants of the admission allocator
  * ([[ShardPositions.advance]]) and the idempotent producer
  * ([[ShardStream.putIdempotent]]) over randomized shard topologies —
  * seeded, so every run checks the same 200 scenarios. The
  * example-based ShardStreamSpec tests pin the observable contract;
  * this spec pins the allocator's algebra for arbitrary split/merge
  * histories, offsets, and budgets:
  *
  *  1. monotone:      next(id) >= cur(id)
  *  2. bounded:       next(id) <= end(id)
  *  3. conservation:  sum(next - cur) <= budget
  *  4. gate:          a shard whose parents are not all drained at
  *                    `cur` does not advance
  *  5. completion:    budget >= total eligible pending drains every
  *                    eligible shard to `end`
  *  6. fairness:      among eligible shards the allocator did not
  *                    exhaust, takes differ by at most 1 (waterfill)
  */
class AdmissionInvariantSpec extends AnyFunSuite {

  private def opts(stream: String): ShardSourceOptions =
    ShardSourceOptions(stream, IteratorType.TrimHorizon, None, 100L, -1L)

  test("advance satisfies its invariants over 200 random reshard topologies") {
    val rng = new Random(20260813L)
    for (scenario <- 0 until 200) {
      val name = s"adm_inv_$scenario"
      val s = ShardServiceRegistry.create(name, 1 + rng.nextInt(4))
      def appendSome(n: Int): Unit =
        (0 until n).foreach(i => s.putRecord(s"k${rng.nextInt(9)}", Array[Byte](i.toByte), None))
      appendSome(rng.nextInt(30))
      // random reshard history: split or merge open shards, appending between
      (0 until rng.nextInt(4)).foreach { _ =>
        val open = s.shardIds.filterNot(s.isShardSealed)
        if (rng.nextBoolean() || open.size < 2) s.splitShard(open(rng.nextInt(open.size)))
        else {
          val Seq(a, b) = rng.shuffle(open).take(2)
          s.mergeShards(a, b)
        }
        appendSome(rng.nextInt(30))
      }
      val sizes = s.shardIds.map(id => id -> s.size(id)).toMap
      // arbitrary (not necessarily reachable) offsets: the allocator
      // must be safe for ANY checkpointed cur
      val cur = sizes.map { case (id, sz) => id -> (if (sz == 0) 0L else rng.nextLong(sz + 1)) }
      val budget = rng.nextLong(sizes.values.sum + 10L)
      val next = ShardPositions.advance(opts(name), cur, sizes, budget)

      def drained(p: String) = cur.getOrElse(p, 0L) >= sizes(p)
      val eligible = s.shardIds.filter(id =>
        s.parentsOf(id).forall(drained) && sizes(id) > cur(id))
      val takes = s.shardIds.map(id => id -> (next(id) - cur(id))).toMap

      s.shardIds.foreach { id =>
        assert(takes(id) >= 0L, s"[$scenario] $id regressed: cur=${cur(id)} next=${next(id)}")
        assert(next(id) <= sizes(id), s"[$scenario] $id overran end")
        if (!eligible.contains(id))
          assert(takes(id) == 0L,
            s"[$scenario] gated/empty shard $id advanced by ${takes(id)} " +
              s"(parents=${s.parentsOf(id)}, cur=$cur, sizes=$sizes)")
      }
      assert(takes.values.sum <= budget, s"[$scenario] budget exceeded: $takes vs $budget")
      val pendingTotal = eligible.map(id => sizes(id) - cur(id)).sum
      if (budget >= pendingTotal)
        eligible.foreach(id => assert(next(id) == sizes(id),
          s"[$scenario] $id not drained despite sufficient budget"))
      val unexhausted = eligible.filter(id => next(id) < sizes(id)).map(takes)
      if (unexhausted.size > 1)
        assert(unexhausted.max - unexhausted.min <= 1L,
          s"[$scenario] unfair waterfill: $takes (budget=$budget)")
      ShardServiceRegistry.drop(name)
    }
  }

  test("putIdempotent: any replay pattern yields the once-only final state") {
    val rng = new Random(42L)
    for (scenario <- 0 until 50) {
      val ideal = s"idem_ideal_$scenario"
      val replayed = s"idem_replay_$scenario"
      val keys = (0 until 1 + rng.nextInt(4)).map(i => s"key$i")
      val perKey = keys.map(k => k -> (1 + rng.nextInt(6))).toMap
      // once-only application
      val a = ShardServiceRegistry.create(ideal, 2)
      keys.foreach(k => (0 until perKey(k)).foreach(i =>
        a.putIdempotent("job", k, i.toLong, s"$k/$i".getBytes(UTF_8))))
      // at-least-once application: after each key's rows, replay a
      // random prefix-suffix (what a retried sorted task re-sends)
      val b = ShardServiceRegistry.create(replayed, 2)
      keys.foreach { k =>
        (0 until perKey(k)).foreach(i =>
          b.putIdempotent("job", k, i.toLong, s"$k/$i".getBytes(UTF_8)))
        val replayFrom = rng.nextInt(perKey(k))
        (replayFrom until perKey(k)).foreach(i =>
          b.putIdempotent("job", k, i.toLong, s"$k/$i".getBytes(UTF_8)))
      }
      def contents(s: ShardStream): Map[String, Seq[String]] =
        s.shardIds.flatMap(id => s.getRecords(id, 0L, Int.MaxValue))
          .groupBy(_.partitionKey)
          .map { case (k, rs) => k -> rs.sortBy(_.seq).map(r => new String(r.data, UTF_8)).toSeq }
      assert(contents(b) == contents(a),
        s"[$scenario] replayed state diverged from once-only state")
      ShardServiceRegistry.drop(ideal)
      ShardServiceRegistry.drop(replayed)
    }
  }
}
