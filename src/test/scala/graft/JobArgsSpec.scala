package graft

import org.scalatest.funsuite.AnyFunSuite

class JobArgsSpec extends AnyFunSuite {

  test("parses --key value and --key=value; ignores positionals; bare flag is empty") {
    val got = JobArgs.parse(Seq("pos0", "--a", "1", "--b=2", "pos1", "--flag"))
    assert(got == Map("a" -> "1", "b" -> "2", "flag" -> ""))
  }

  test("resolution order: CLI beats env beats default") {
    val env = Map("K" -> "env", "ONLY_ENV" -> "e")
    val got = JobArgs.resolve(Seq("--K", "cli"), required = Seq("K", "ONLY_ENV"),
      defaults = Map("K" -> "def", "D" -> "d"), env = env)
    assert(got == Map("K" -> "cli", "ONLY_ENV" -> "e", "D" -> "d"))
  }

  test("all missing required keys reported at once") {
    val e = intercept[IllegalArgumentException] {
      JobArgs.resolve(Seq("--present", "1"), required = Seq("present", "m1", "m2"),
        env = Map.empty)
    }
    assert(e.getMessage.contains("m1") && e.getMessage.contains("m2"))
  }

  test("a --key followed by another --key keeps both (first as bare flag)") {
    assert(JobArgs.parse(Seq("--a", "--b", "2")) == Map("a" -> "", "b" -> "2"))
  }
}
