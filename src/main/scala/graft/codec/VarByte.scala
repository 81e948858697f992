package graft.codec

import java.io.{ByteArrayOutputStream}

/** Variable-byte (7-bit continuation) + delta codec for posting blocks.
  *
  * The reference persists one uncompressed BSON document per term
  * (/root/reference/source/DataBase.cpp:32-89). At 10^12-turn scale the
  * head-term posting lists must be compressed and split into bounded
  * blocks; this codec packs a sorted run of postings into one binary cell:
  *
  *   block := varint(n)
  *            n × varint(docId delta)        // vs previous docId (first vs 0)
  *            n × ( varint(tf) varint(docLen)
  *                  tf × varint(position delta) )  // positions sorted asc
  *
  * Pure Scala over Array[Byte]; used inside typed map stages (a custom
  * Catalyst Expression adds nothing for v1 — SURVEY.md §4.3).
  */
object VarByte {

  def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint requires non-negative, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def readVarLong(): Long = {
      var shift = 0; var result = 0L
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        result |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      result | ((b & 0x7fL) << shift)
    }
    def hasMore: Boolean = pos < bytes.length
  }

  /** Delta+varbyte encode one ascending position list (used from the
    * tokenizer onward, so position payloads stay compressed through every
    * shuffle and table — at 10^12 turns the shuffle bytes are the build's
    * scarce resource). */
  def encodePositions(positions: scala.collection.Seq[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(positions.length + 4)
    var prev = 0L
    positions.foreach { p => writeVarLong(out, p - prev); prev = p.toLong }
    out.toByteArray
  }

  def decodePositions(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null || bytes.isEmpty) return Array.empty
    val r = new Reader(bytes)
    val buf = new scala.collection.mutable.ArrayBuffer[Int](bytes.length)
    var prev = 0L
    while (r.hasMore) { prev += r.readVarLong(); buf += prev.toInt }
    buf.toArray
  }

  /** One posting inside a block. */
  final case class Posting(docId: Long, tf: Int, docLen: Int, positions: Array[Int])

  /** Encode postings (must be sorted by docId asc; positions asc).
    *
    * Layout v2 (Tables.FormatVersion 5) splits the payload into a SCORES
    * section (docIds, then tf/docLen pairs) and an OPTIONAL length-prefixed
    * positions section, so the term-scoring path (WAND) decodes only the
    * scores, and a positions-free scoring index (what IndexBuilder writes —
    * phrases read the postings table, which keeps full positions) spends
    * exactly one byte on the empty section:
    *
    *   block := varint(n)
    *            n × varint(docId delta)
    *            n × ( varint(tf) varint(docLen) )
    *            varint(positionsByteLen)
    *            [ n × ( tf × varint(position delta) ) ]
    */
  def encodeBlock(postings: Seq[Posting]): Array[Byte] = {
    // decodeBlock infers hasPositions from posLen > 0 and then reads exactly
    // tf varints per posting — mixed or tf-mismatched input would encode
    // fine and silently misdecode, so the invariant is enforced here
    // (ADVICE r2): per posting |positions| ∈ {0, tf}, uniform across the
    // block (all-empty or all-populated).
    postings.foreach { p =>
      require(p.positions.isEmpty || p.positions.length == p.tf,
        s"posting docId=${p.docId}: positions.length=${p.positions.length} != tf=${p.tf}")
    }
    require(postings.forall(_.positions.isEmpty) ||
      postings.forall(p => p.tf == 0 || p.positions.nonEmpty),
      "mixed block: some postings carry positions, others (tf>0) do not")
    val out = new ByteArrayOutputStream(postings.size * 8)
    writeVarLong(out, postings.size.toLong)
    var prev = 0L
    postings.foreach { p =>
      writeVarLong(out, p.docId - prev); prev = p.docId
    }
    postings.foreach { p =>
      writeVarLong(out, p.tf.toLong)
      writeVarLong(out, p.docLen.toLong)
    }
    val pos = new ByteArrayOutputStream()
    postings.foreach { p =>
      var prevPos = 0L
      var i = 0
      while (i < p.positions.length) {
        writeVarLong(pos, p.positions(i) - prevPos)
        prevPos = p.positions(i).toLong
        i += 1
      }
    }
    val posBytes = pos.toByteArray
    writeVarLong(out, posBytes.length.toLong)
    out.write(posBytes, 0, posBytes.length)
    out.toByteArray
  }

  private val noPositions = Array.empty[Int]

  /** Decode only the scores section — (docId, tf, docLen) with a shared
    * empty positions array. The WAND term path uses this; the positions
    * bytes at the tail are never read. */
  def decodeBlockScores(bytes: Array[Byte]): Array[Posting] = {
    val r = new Reader(bytes)
    val n = r.readVarLong().toInt
    val docIds = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) { prev += r.readVarLong(); docIds(i) = prev; i += 1 }
    val out = new Array[Posting](n)
    i = 0
    while (i < n) {
      val tf = r.readVarLong().toInt
      val dl = r.readVarLong().toInt
      out(i) = Posting(docIds(i), tf, dl, noPositions)
      i += 1
    }
    out
  }

  /** Full decode; positions are empty when the block was encoded without
    * them (positionsByteLen == 0). */
  def decodeBlock(bytes: Array[Byte]): Array[Posting] = {
    val r = new Reader(bytes)
    val n = r.readVarLong().toInt
    val docIds = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) { prev += r.readVarLong(); docIds(i) = prev; i += 1 }
    val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    i = 0
    while (i < n) { tfs(i) = r.readVarLong().toInt; dls(i) = r.readVarLong().toInt; i += 1 }
    val posLen = r.readVarLong()
    val hasPositions = posLen > 0
    val out = new Array[Posting](n)
    i = 0
    while (i < n) {
      val tf = tfs(i)
      val positions = if (!hasPositions) noPositions else {
        val ps = new Array[Int](tf)
        var prevPos = 0L
        var j = 0
        while (j < tf) { prevPos += r.readVarLong(); ps(j) = prevPos.toInt; j += 1 }
        ps
      }
      out(i) = Posting(docIds(i), tf, dls(i), positions)
      i += 1
    }
    out
  }
}
