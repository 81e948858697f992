package graft

/** The reference query set q01-q20 (FIXTURES.md §3) — shared by the golden
  * generator, the oracle suite, and the engine identity tests. */
object EngineQueries {
  val all: Seq[(String, (String, Double))] = Seq(
    "q01" -> ("whale", 0.0),
    "q02" -> ("blue whale", 0.0),
    "q03" -> ("\"blue whale\"", 0.0),
    "q04" -> ("\"\"blue whale\"\"", 0.0),
    "q05" -> ("\"blue whale\" OR \"query engine\"", 0.0),
    "q06" -> ("\"blue whale\" AND \"query engine\"", 0.0),
    "q07" -> ("NOT \"blue whale\"", 0.0),
    "q08" -> ("(\"blue whale\" OR \"query engine\") NOT \"red fish\"", 0.0),
    "q09" -> ("\"blue whale\" whale engine", 0.0),
    "q10" -> ("don't", 0.0),
    "q11" -> ("state-of-the-art", 0.0),
    "q12" -> ("running", 0.0),
    "q13" -> ("the", 0.0),
    "q14" -> ("\"whale blue\"", 0.0),
    "q15" -> ("\"blue blue\"", 0.0),
    "q16" -> ("zzzunknown", 0.0),
    "q17" -> ("whale", 0.5),
    "q18" -> ("not \"blue whale\"", 0.0),
    "q19" -> ("\"a b c\"", 0.0),
    "q20" -> ("((\"x\" AND \"y\") OR \"z\") NOT \"w\"", 0.0))
}
