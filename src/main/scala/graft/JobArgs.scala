package graft

/** Job-argument resolution — the Spark-native analogue of the reference's
  * `getResolvedOptions(sys.argv, ['JOB_NAME'])`
  * (`glue_rds_to_redshift.py:10-12`; SURVEY.md §2 S12).
  *
  * Accepts `--key value` and `--key=value` forms, resolves each declared
  * key as CLI > environment > default, and fails fast naming EVERY
  * missing required key (a job that dies on the first of five missing
  * args takes five deploys to fix). Pure function of its inputs — the
  * mains pass `sys.env` so tests can pass their own.
  */
object JobArgs {

  /** `--key value` / `--key=value` pairs from an argv-style list.
    * Positional (non `--`) tokens are ignored — callers that take
    * positional args consume them before calling.
    */
  def parse(argv: Seq[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < argv.length) {
      val a = argv(i)
      if (a.startsWith("--")) {
        val body = a.stripPrefix("--")
        val eq = body.indexOf('=')
        if (eq >= 0) {
          out += body.substring(0, eq) -> body.substring(eq + 1)
        } else if (i + 1 < argv.length && !argv(i + 1).startsWith("--")) {
          out += body -> argv(i + 1)
          i += 1
        } else {
          out += body -> "" // bare flag
        }
      }
      i += 1
    }
    out.result()
  }

  /** Resolve `required` ++ `defaults.keys`: CLI beats environment beats
    * default. Throws listing all missing required keys at once.
    */
  def resolve(argv: Seq[String], required: Seq[String],
              defaults: Map[String, String] = Map.empty,
              env: Map[String, String] = sys.env): Map[String, String] = {
    val cli = parse(argv)
    val keys = (required ++ defaults.keys).distinct
    val resolved = keys.flatMap { k =>
      cli.get(k).orElse(env.get(k)).orElse(defaults.get(k)).map(k -> _)
    }.toMap
    val missing = required.filterNot(resolved.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"missing required job arguments: ${missing.mkString(", ")}")
    resolved
  }
}
