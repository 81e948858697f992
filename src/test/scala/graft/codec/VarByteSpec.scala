package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class VarByteSpec extends AnyFunSuite {

  private def randomBlock(rnd: Random): IndexedSeq[VarByte.Posting] = {
    val n = rnd.nextInt(200)
    var docId = 0L
    (0 until n).map { _ =>
      docId += 1 + rnd.nextLong(1L << rnd.nextInt(40))
      val tf = 1 + rnd.nextInt(40)
      var pos = 0
      val positions = Array.fill(tf) { pos += rnd.nextInt(1000); pos }
      VarByte.Posting(docId, tf, 1 + rnd.nextInt(100000), positions)
    }
  }

  test("round-trip property: decode(encode(x)) == x  (500 random blocks)") {
    val rnd = new Random(42)
    for (_ <- 0 until 500) {
      val ps = randomBlock(rnd)
      val decoded = VarByte.decodeBlock(VarByte.encodeBlock(ps))
      assert(decoded.length == ps.length)
      decoded.zip(ps).foreach { case (d, o) =>
        assert(d.docId == o.docId && d.tf == o.tf && d.docLen == o.docLen)
        assert(d.positions.toSeq == o.positions.toSeq)
      }
    }
  }

  test("varlong boundaries round-trip") {
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong,
      (1L << 35) - 1, Long.MaxValue)
    val out = new java.io.ByteArrayOutputStream()
    vals.foreach(VarByte.writeVarLong(out, _))
    val r = new VarByte.Reader(out.toByteArray)
    vals.foreach(v => assert(r.readVarLong() == v))
    assert(!r.hasMore)
  }

  test("compression beats raw fixed-width on dense runs") {
    val ps = (0 until 4096).map(i =>
      VarByte.Posting(1000000L + i * 3, 2, 50, Array(5, 17)))
    val enc = VarByte.encodeBlock(ps)
    val rawSize = 4096 * (8 + 4 + 4 + 2 * 4)
    assert(enc.length < rawSize / 3, s"encoded ${enc.length} vs raw $rawSize")
  }

  test("empty block") {
    assert(VarByte.decodeBlock(VarByte.encodeBlock(Nil)).isEmpty)
    assert(VarByte.decodeBlockScores(VarByte.encodeBlock(Nil)).isEmpty)
  }

  test("encodeBlock rejects tf/positions mismatches and mixed blocks") {
    val ok = Seq(
      VarByte.Posting(1L, 2, 10, Array(3, 7)),
      VarByte.Posting(5L, 1, 4, Array(2)))
    VarByte.decodeBlock(VarByte.encodeBlock(ok)) // sanity: valid block passes
    intercept[IllegalArgumentException] { // |positions| != tf
      VarByte.encodeBlock(Seq(VarByte.Posting(1L, 3, 10, Array(3, 7))))
    }
    intercept[IllegalArgumentException] { // mixed: one with, one without
      VarByte.encodeBlock(Seq(
        VarByte.Posting(1L, 2, 10, Array(3, 7)),
        VarByte.Posting(5L, 1, 4, Array.empty[Int])))
    }
  }

  test("scores-only decode matches full decode, no positions materialized") {
    val rnd = new Random(7)
    for (_ <- 0 until 100) {
      val ps = randomBlock(rnd)
      val enc = VarByte.encodeBlock(ps)
      val scores = VarByte.decodeBlockScores(enc)
      val full = VarByte.decodeBlock(enc)
      assert(scores.length == full.length)
      scores.zip(full).foreach { case (s, f) =>
        assert(s.docId == f.docId && s.tf == f.tf && s.docLen == f.docLen)
        assert(s.positions.isEmpty)
      }
    }
  }
}
