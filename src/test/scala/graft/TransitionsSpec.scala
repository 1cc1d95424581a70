package graft

import graft.operators.Transitions

class TransitionsSpec extends SparkSuite {
  import spark.implicits._

  test("transition counts and row-normalized probabilities") {
    val ev = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"), ("u1", 4L, "b"),
      ("u2", 1L, "a"), ("u2", 2L, "b"),
      ("u3", 1L, "b")                     // singleton: contributes nothing
    ).toDF("k", "t", "state")
    val out = Transitions.matrix(ev, "k", Seq("t"), "state")
      .orderBy("state", "next_state")
      .as[(String, String, Long, Double)].collect().toList
    // a->b three times (only transition out of a); b->a once
    assert(out === List(("a", "b", 3L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitions never cross sequence keys") {
    val ev = Seq(("u1", 1L, "a"), ("u2", 2L, "b")).toDF("k", "t", "state")
    assert(Transitions.matrix(ev, "k", Seq("t"), "state").count() === 0)
  }

  test("probabilities within a state sum to 1") {
    val ev = Seq(
      ("u", 1L, "a"), ("u", 2L, "b"), ("u", 3L, "a"), ("u", 4L, "c"),
      ("u", 5L, "a"), ("u", 6L, "b")
    ).toDF("k", "t", "state")
    val rows = Transitions.matrix(ev, "k", Seq("t"), "state")
      .where($"state" === "a").select("prob")
      .as[Double].collect()
    assert(math.abs(rows.sum - 1.0) < 1e-9)
  }
}
