package graft

import org.scalatest.funsuite.AnyFunSuite

/** The requeue defense's record parser (round 14): Bench compares each
  * query's first-pass min against the previous CANONICAL record and
  * re-queues >2x excursions for a late second set — so the parser must
  * read the exact full-vector format Bench itself persists, and fail
  * CLOSED (empty map → defense disabled, run proceeds) on anything
  * else.
  */
class BenchRequeueSpec extends AnyFunSuite {

  test("parses per-query mins from the canonical full-vector format") {
    val line =
      """{"metric":"total","value":40.29,"unit":"sec","queries":{"q01_scan_project":[0.1612,0.1100,0.1099],""" +
        """"q02_agg_groupby":[0.3395,0.1996,0.1752],"q99_broken":-1,"q23_dedup_embedding":[1.52,0.91,0.80,0.84]},"sf":"x"}"""
    val f = java.io.File.createTempFile("bench-requeue", ".json")
    try {
      java.nio.file.Files.writeString(f.toPath, line)
      // previousCanonicalMins resolves under /root/repo — parse via a
      // relative trick is not worth it; test the regex through a copy
      val rel = s"../../${f.getAbsolutePath.stripPrefix("/")}"
      val mins = Bench.previousCanonicalMins(rel)
      assert(mins("q01_scan_project") === 0.1099)
      assert(mins("q02_agg_groupby") === 0.1752)
      assert(mins("q23_dedup_embedding") === 0.80)
      // a failed query (-1, no vector) must yield NO record — it can
      // never gate a requeue into masking a real fix
      assert(!mins.contains("q99_broken"))
    } finally { f.delete(); () }
  }

  test("missing record disables the defense instead of failing the run") {
    assert(Bench.previousCanonicalMins("no-such-record-ever.json").isEmpty)
  }
}
