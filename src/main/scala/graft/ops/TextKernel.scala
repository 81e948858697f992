package graft.ops

/** Typed per-row twins of the TextOps / Pipeline Catalyst expressions.
  *
  * Spark evaluates higher-order array expressions (`transform`, `filter`,
  * `aggregate`) INTERPRETED (CodegenFallback): at 10M docs the round-5
  * text operators were lambda-evaluation-bound (~16k docs/s/node for q47 —
  * VERDICT r5 item 2). These kernels compute the identical values — same
  * token boundaries, same integer counts, same IEEE divisions — in plain
  * JVM loops inside `mapPartitions`, which is the documented fix (guide
  * §1.2 step 2 / §4.2: once the plan shape is right, make the per-task
  * work fast). Every function documents the exact Catalyst expression it
  * replaces; OpsSpec's driver-recompute tests and the DuckDB contract rows
  * pin the equivalence.
  */
private[graft] object TextKernel {

  /** Bit-identical twin of Spark's `lower()`: ASCII fast path, and the
    * exact UTF8String.toLowerCase fallback for any non-ASCII input (so
    * locale/Unicode edge cases cannot diverge from the expression path). */
  def sparkLower(text: String): String = {
    val n = text.length
    var i = 0
    var hasUpper = false
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 0x80)
        return org.apache.spark.unsafe.types.UTF8String.fromString(text)
          .toLowerCase.toString
      if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (!hasUpper) text
    else {
      val a = new Array[Char](n)
      var j = 0
      while (j < n) {
        val c = text.charAt(j)
        a(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        j += 1
      }
      new String(a)
    }
  }

  @inline private def isLowerAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** `regexp_extract_all(lower(text), "[a-z0-9]+", 0)` — maximal runs of
    * [a-z0-9] over the lowered string (the char class is explicit ASCII,
    * so a scan and the regex engine agree on every input). */
  def lowerTokens(text: String): Array[String] = {
    val s = sparkLower(text)
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuilder.ofRef[String]
    var i = 0
    while (i < n) {
      if (isLowerAlnum(s.charAt(i))) {
        var j = i + 1
        while (j < n && isLowerAlnum(s.charAt(j))) j += 1
        out += s.substring(i, j)
        i = j
      } else i += 1
    }
    out.result()
  }

  /** `size(regexp_extract_all(lower(text), "[a-z0-9]+", 0))` without
    * materializing the tokens. */
  def lowerTokenCount(text: String): Int = {
    val s = sparkLower(text)
    val n = s.length
    var i = 0
    var c = 0
    while (i < n) {
      if (isLowerAlnum(s.charAt(i))) {
        c += 1
        var j = i + 1
        while (j < n && isLowerAlnum(s.charAt(j))) j += 1
        i = j
      } else i += 1
    }
    c
  }

  /** `size(regexp_extract_all(text, "[A-Za-z0-9]+", 0))` (original case). */
  def alnumRunCount(text: String): Int = {
    val n = text.length
    var i = 0
    var c = 0
    while (i < n) {
      if (isAlnum(text.charAt(i))) {
        c += 1
        var j = i + 1
        while (j < n && isAlnum(text.charAt(j))) j += 1
        i = j
      } else i += 1
    }
    c
  }

  /** The per-document repetition/language signals of TextOps.langId +
    * TextOps.repetitionFilter (and the fused Pipeline projection), from
    * one tokenize pass: token count, stop-word hit count (every
    * occurrence, like `size(filter(toks, array_contains(stops, _)))`),
    * distinct-token count, max token multiplicity, max bigram
    * multiplicity (bigram = space-joined adjacent pair; tokens contain no
    * spaces, so pair identity ≡ joined-string identity). */
  final case class RepSignals(
      nTokens: Int, hits: Int, nDistinct: Int, topTok: Int, topBigram: Int)

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextOps.StopWords.foreach(s.add)
    s
  }

  /** `size(filter(toks, t => array_contains(stops, t)))` — every
    * occurrence counts, exactly like the expression. */
  def stopHits(toks: Array[String]): Int = {
    var i = 0
    var h = 0
    while (i < toks.length) {
      if (stopSet.contains(toks(i))) h += 1
      i += 1
    }
    h
  }

  def repSignals(toks: Array[String], needBigrams: Boolean): RepSignals = {
    val n = toks.length
    if (n == 0) return RepSignals(0, 0, 0, 0, 0)
    // token -> dense id, counts indexed by id
    val ids = new java.util.HashMap[String, Integer](math.min(n * 2, 1 << 16))
    val cnt = new scala.collection.mutable.ArrayBuffer[Int](math.min(n, 1 << 12))
    val idOf = new Array[Int](n)
    var hits = 0
    var topTok = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      if (stopSet.contains(t)) hits += 1
      var id = ids.get(t)
      if (id == null) {
        id = Integer.valueOf(cnt.length)
        ids.put(t, id)
        cnt += 0
      }
      val c = cnt(id.intValue()) + 1
      cnt(id.intValue()) = c
      if (c > topTok) topTok = c
      idOf(i) = id.intValue()
      i += 1
    }
    var topBigram = 0
    if (needBigrams && n >= 2) {
      val bg = new java.util.HashMap[java.lang.Long, Integer](math.min(n * 2, 1 << 16))
      var j = 1
      while (j < n) {
        val key = java.lang.Long.valueOf((idOf(j - 1).toLong << 32) | (idOf(j).toLong & 0xffffffffL))
        val c0 = bg.get(key)
        val c = if (c0 == null) 1 else c0.intValue() + 1
        bg.put(key, Integer.valueOf(c))
        if (c > topBigram) topBigram = c
        j += 1
      }
    }
    RepSignals(n, hits, cnt.length, topTok, topBigram)
  }

  /** The q12 quality counters in ONE char scan (vs four regex passes):
    * code-point count (Spark `length()`), [A-Za-z0-9]+ run count, and the
    * q12 punct/digit/upper single-char class counts. */
  final case class QualitySignals(
      nChars: Int, nWords: Int, punct: Int, digits: Int, uppers: Int)

  def qualitySignals(text: String): QualitySignals = {
    val n = text.length
    var punct = 0
    var digits = 0
    var uppers = 0
    var words = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      val alnum = isAlnum(c)
      if (alnum && !inRun) words += 1
      inRun = alnum
      if (c >= '0' && c <= '9') digits += 1
      else if (c >= 'A' && c <= 'Z') uppers += 1
      if ((c >= 0x21 && c <= 0x2f) || (c >= 0x3a && c <= 0x40) ||
        (c >= 0x5b && c <= 0x60) || (c >= 0x7b && c <= 0x7e)) punct += 1
      i += 1
    }
    QualitySignals(text.codePointCount(0, n), words, punct, digits, uppers)
  }

  /** TextOps.tokenNgrams as a driver/executor function: the DISTINCT
    * space-joined token n-grams of `text` (first occurrences, order
    * irrelevant to callers — they consume it as a set). <n tokens → the
    * whole token sequence as one gram; no tokens → none. */
  def distinctGrams(text: String, n: Int): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    if (text == null) return out
    val toks = lowerTokens(text)
    if (toks.length == 0) return out
    if (toks.length < n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < toks.length) {
        if (i > 0) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out.add(sb.toString)
      return out
    }
    val seen = new java.util.HashSet[String]((toks.length - n + 1) * 2)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      if (seen.add(g)) out.add(g)
      i += 1
    }
    out
  }

  /** `array_sort`'s comparator for strings: UTF8String binary order =
    * unsigned lexicographic comparison of the UTF-8 bytes (equal to
    * String.compareTo for ASCII; differs for some non-ASCII, so the
    * kernel must use THIS order, not the JVM's UTF-16 order). */
  val utf8Compare: java.util.Comparator[String] = new java.util.Comparator[String] {
    def compare(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
  }

  /** The q48 window fingerprint: `conv(substring(md5(win), 1, 15), 16, 10)
    * ::long` = the top 60 bits of the md5 of the UTF-8 bytes of the
    * space-joined `window`-token span (first 15 hex nibbles = first-8-
    * bytes-as-big-endian-long >>> 4). Emits one hash per span position. */
  def windowHashes(toks: Array[String], window: Int,
      md: java.security.MessageDigest): Array[Long] = {
    val nw = toks.length - (window - 1)
    if (nw <= 0) return Array.emptyLongArray
    val out = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < window) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    out
  }
}
