package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pure contract of the shared committed-view directory math the
  * compaction race fix rests on: folds and readers must derive their
  * scan list from CAPTURED watermarks only.
  */
class GenerationsSpec extends AnyFunSuite {
  private def gen(g: Long) = s"gen-$g"
  private def base(g: Long) = s"base-$g"

  test("no base: generations 0..g") {
    assert(Generations.dirs(-1L, 2L, gen, base) ===
      Seq("gen-0", "gen-1", "gen-2"))
  }

  test("base plus strictly-later generations") {
    assert(Generations.dirs(1L, 3L, gen, base) ===
      Seq("base-1", "gen-2", "gen-3"))
  }

  test("base at the watermark: the base alone") {
    assert(Generations.dirs(3L, 3L, gen, base) === Seq("base-3"))
  }

  test("base AHEAD of a captured watermark (concurrent compact advanced it): base alone, never a negative range") {
    // a reader that captured g before a concurrent compact stamped a
    // newer base must not list phantom generations or duplicate rows —
    // it reads the (newer) base only: monotonic, duplicate-free
    assert(Generations.dirs(5L, 3L, gen, base) === Seq("base-5"))
  }
}
