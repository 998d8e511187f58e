package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level tripwire for the bench-isolation contract (VERDICT
  * r19 #2): a substrate memoized via plain `T.memo` must NOT be
  * checkpoint-backed — RDD-level checkpoint blocks are invisible to
  * `catalog.clearCache()`, so such a memo would survive the bench's
  * per-query isolation and later consumers would time against warmup
  * results (the q164/lpaLabels hole this round closed). Checkpoint-
  * backed substrates belong in `T.memoPinned`, which
  * `dropPinnedSubstrates` releases between queries; persist-backed
  * ones in `memoPersist`, which clearCache releases.
  *
  * The audit is textual (the IndexFreshnessSpec pattern): for every
  * non-pinned memo call in src/main, the builder block must reference
  * neither a checkpoint call nor one of the checkpoint-backed
  * iterative helpers. It is a heuristic tripwire — a reviewer gate,
  * not a proof — but it is exactly the check that would have caught
  * the original hole.
  */
class MemoHygieneSpec extends AnyFunSuite {

  private val checkpointBackedHelpers = Seq(
    "localCheckpoint", "freshLocalCheckpoint",
    "labelPropagation", "iterateToFixpointPpm", "multiSeedDistances",
    "multiSeedSigmaLevels", "weightedSsspDistances",
    "connectedComponents", "kCoreCapped")

  private def repoRoot: Option[java.io.File] = {
    var d = new java.io.File(System.getProperty("user.dir")).getAbsoluteFile
    while (d != null &&
      !new java.io.File(d, "src/main/scala/graft").isDirectory)
      d = d.getParentFile
    Option(d)
  }

  private def scalaSources(root: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f)
      else Seq.empty
    walk(new java.io.File(root, "src/main/scala"))
  }

  test("no plain T.memo / memoPersist builder is checkpoint-backed") {
    val root = repoRoot
    assume(root.isDefined, "src/main/scala/graft not found above user.dir")
    val memoCall = raw"(T\.memo|memoPersist|T\.memoPinned)\(".r
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    for (f <- scalaSources(root.get)) {
      val src = scala.io.Source.fromFile(f, "UTF-8").mkString
      for (m <- memoCall.findAllMatchIn(src)) {
        val kind = m.group(1)
        // skip the builder block of pinned memos — checkpoints are the
        // point there, and dropPinnedSubstrates releases them
        if (kind != "T.memoPinned") {
          // step over the (session, key) argument list
          var i = m.end; var depth = 1
          while (depth > 0 && i < src.length) {
            if (src(i) == '(') depth += 1
            else if (src(i) == ')') depth -= 1
            i += 1
          }
          while (i < src.length && (src(i) == ' ' || src(i) == '\n')) i += 1
          // a forwarding call (`T.memo(s, key)(build)` inside
          // memoPersist) has no literal block to audit
          if (i < src.length && src(i) == '{') {
            var j = i + 1; depth = 1
            while (depth > 0 && j < src.length) {
              if (src(j) == '{') depth += 1
              else if (src(j) == '}') depth -= 1
              j += 1
            }
            val block = src.substring(i, j)
            val hits = checkpointBackedHelpers.filter(block.contains)
            if (hits.nonEmpty) {
              val line = src.substring(0, m.start).count(_ == '\n') + 1
              violations += s"${f.getPath}:$line $kind builder references " +
                s"${hits.mkString(", ")} — use T.memoPinned so the bench " +
                "isolation can release it"
            }
          }
        }
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
