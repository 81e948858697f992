import graft.GraftParams
import graft.corpus.TranscriptGen
import graft.oracle.RefOracle

/** Regenerate the checked-in golden top-k fixtures from the
  * reference-faithful oracle (FIXTURES.md §3). Run on fixture changes:
  * sbt "runMain DriveGolden". */
object DriveGolden {
  def main(args: Array[String]): Unit = {
    val oracle = new RefOracle(TranscriptGen.generateLocal(40))
    val queries = graft.EngineQueries.all
    val dir = new java.io.File("src/test/resources/golden")
    dir.mkdirs()
    queries.foreach { case (name, (q, accuracy)) =>
      val top = oracle.search(q, accuracy, 10)
      val json = top.map { case (d, s) => s"""{"docId":$d,"score":$s}""" }
        .mkString("[\n  ", ",\n  ", "\n]")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"src/test/resources/golden/$name.json"), json)
    }
    println(s"wrote ${queries.size} golden files")
  }
}
