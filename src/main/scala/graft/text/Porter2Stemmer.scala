package graft.text

/** From-scratch Porter2 ("english" Snowball) stemmer.
  *
  * Implemented from the published algorithm description
  * (snowballstem.org/algorithms/english/stemmer.html). The reference engine
  * stems every indexed and query token with libstemmer's "english" stemmer
  * (/root/reference/source/WordProcessor.cpp:32-50, applied at
  * InvertedIndex.cpp:141 and BM25Ranker.cpp:334), so rank-identity of BM25
  * scores requires a bit-exact reproduction. Verified against the system
  * libstemmer on ~11.8k golden pairs (src/test/resources/porter2_golden.tsv).
  *
  * Pure function, thread-safe, no allocation beyond one StringBuilder —
  * safe to call from executor-side flatMap at full rate.
  */
object Porter2Stemmer {

  private val exceptions1: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("skis", "ski"); m.put("skies", "sky"); m.put("dying", "die")
    m.put("lying", "lie"); m.put("tying", "tie"); m.put("idly", "idl")
    m.put("gently", "gentl"); m.put("ugly", "ugli"); m.put("early", "earli")
    m.put("only", "onli"); m.put("singly", "singl")
    // invariants
    m.put("sky", "sky"); m.put("news", "news"); m.put("howe", "howe")
    m.put("atlas", "atlas"); m.put("cosmos", "cosmos"); m.put("bias", "bias")
    m.put("andes", "andes")
    m
  }

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  @inline private def isDouble(a: Char, b: Char): Boolean =
    a == b && (a == 'b' || a == 'd' || a == 'f' || a == 'g' || a == 'm' ||
      a == 'n' || a == 'p' || a == 'r' || a == 't')

  @inline private def validLiEnding(c: Char): Boolean =
    c == 'c' || c == 'd' || c == 'e' || c == 'g' || c == 'h' || c == 'k' ||
      c == 'm' || c == 'n' || c == 'r' || c == 't'

  def stem(word: String): String = {
    val ex = exceptions1.get(word)
    if (ex != null) return ex
    if (word.length < 3) return word

    val b = new StringBuilder(word)
    var yFound = false

    // ---- prelude -----------------------------------------------------
    if (b.charAt(0) == '\'') b.deleteCharAt(0)
    if (b.nonEmpty && b.charAt(0) == 'y') { b.setCharAt(0, 'Y'); yFound = true }
    var i = 1
    while (i < b.length) {
      if (b.charAt(i) == 'y' && isVowel(b.charAt(i - 1))) {
        b.setCharAt(i, 'Y'); yFound = true
      }
      i += 1
    }

    // ---- mark_regions ------------------------------------------------
    def findR(start: Int): Int = {
      var j = start
      while (j < b.length && !isVowel(b.charAt(j))) j += 1
      while (j < b.length && isVowel(b.charAt(j))) j += 1
      if (j < b.length) j + 1 else b.length
    }
    def startsWith(p: String): Boolean =
      b.length >= p.length && {
        var k = 0; var ok = true
        while (ok && k < p.length) { ok = b.charAt(k) == p.charAt(k); k += 1 }
        ok
      }
    val r1 =
      if (startsWith("gener")) 5
      else if (startsWith("commun")) 6
      else if (startsWith("arsen")) 5
      else findR(0)
    val r2 = findR(r1)

    // ---- suffix helpers (r1/r2 are absolute offsets; deletions only
    //      shorten the tail so the offsets stay valid) -----------------
    def ends(s: String): Boolean = {
      val off = b.length - s.length
      off >= 0 && {
        var k = 0; var ok = true
        while (ok && k < s.length) { ok = b.charAt(off + k) == s.charAt(k); k += 1 }
        ok
      }
    }
    def inR1(suffLen: Int): Boolean = b.length - suffLen >= r1
    def inR2(suffLen: Int): Boolean = b.length - suffLen >= r2
    def drop(n: Int): Unit = b.delete(b.length - n, b.length)
    def replace(n: Int, repl: String): Unit = { drop(n); b.append(repl) }
    /** any lowercase vowel strictly before index `until` */
    def hasVowelBefore(until: Int): Boolean = {
      var j = 0; var found = false
      while (!found && j < until) { found = isVowel(b.charAt(j)); j += 1 }
      found
    }
    /** word[0,len) ends in a short syllable */
    def endsShortSyllable(len: Int): Boolean = {
      if (len == 2) isVowel(b.charAt(0)) && !isVowel(b.charAt(1))
      else if (len >= 3) {
        val c = b.charAt(len - 1); val v = b.charAt(len - 2); val p = b.charAt(len - 3)
        !isVowel(p) && isVowel(v) && !isVowel(c) && c != 'w' && c != 'x' && c != 'Y'
      } else false
    }

    // ---- Step 0: longest of  '  's  's'  ------------------------------
    if (ends("'s'")) drop(3)
    else if (ends("'s")) drop(2)
    else if (ends("'")) drop(1)

    // ---- Step 1a -------------------------------------------------------
    if (ends("sses")) replace(4, "ss")
    else if (ends("ied") || ends("ies")) {
      if (b.length - 3 > 1) replace(3, "i") else replace(3, "ie")
    } else if (ends("ss") || ends("us")) { /* nothing */ }
    else if (ends("s")) {
      // delete if a vowel exists before the char immediately preceding the s
      if (b.length >= 2 && hasVowelBefore(b.length - 2)) drop(1)
    }

    // ---- exception2 ----------------------------------------------------
    if (exceptions2.contains(b.toString)) return b.toString

    // ---- Step 1b -------------------------------------------------------
    {
      val suff =
        if (ends("eedly")) "eedly" else if (ends("ingly")) "ingly"
        else if (ends("edly")) "edly" else if (ends("eed")) "eed"
        else if (ends("ing")) "ing" else if (ends("ed")) "ed" else null
      if (suff != null) {
        if (suff == "eed" || suff == "eedly") {
          if (inR1(suff.length)) replace(suff.length, "ee")
        } else {
          if (hasVowelBefore(b.length - suff.length)) {
            drop(suff.length)
            if (ends("at") || ends("bl") || ends("iz")) b.append('e')
            else if (b.length >= 2 && isDouble(b.charAt(b.length - 2), b.charAt(b.length - 1))) drop(1)
            else if (r1 >= b.length && endsShortSyllable(b.length)) b.append('e')
          }
        }
      }
    }

    // ---- Step 1c -------------------------------------------------------
    if (b.length >= 3) {
      val c = b.charAt(b.length - 1)
      if ((c == 'y' || c == 'Y') && !isVowel(b.charAt(b.length - 2)))
        b.setCharAt(b.length - 1, 'i')
    } else if (b.length == 2) {
      // preceded by a non-vowel which is not the first letter: impossible
    }

    // ---- Step 2 (longest among; condition: suffix in R1) ---------------
    {
      if (ends("ization")) { if (inR1(7)) replace(7, "ize") }
      else if (ends("fulness")) { if (inR1(7)) replace(7, "ful") }
      else if (ends("ousness")) { if (inR1(7)) replace(7, "ous") }
      else if (ends("iveness")) { if (inR1(7)) replace(7, "ive") }
      else if (ends("ational")) { if (inR1(7)) replace(7, "ate") }
      else if (ends("tional")) { if (inR1(6)) replace(6, "tion") }
      else if (ends("biliti")) { if (inR1(6)) replace(6, "ble") }
      else if (ends("lessli")) { if (inR1(6)) replace(6, "less") }
      else if (ends("entli")) { if (inR1(5)) replace(5, "ent") }
      else if (ends("ation")) { if (inR1(5)) replace(5, "ate") }
      else if (ends("alism")) { if (inR1(5)) replace(5, "al") }
      else if (ends("aliti")) { if (inR1(5)) replace(5, "al") }
      else if (ends("ousli")) { if (inR1(5)) replace(5, "ous") }
      else if (ends("iviti")) { if (inR1(5)) replace(5, "ive") }
      else if (ends("fulli")) { if (inR1(5)) replace(5, "ful") }
      else if (ends("enci")) { if (inR1(4)) replace(4, "ence") }
      else if (ends("anci")) { if (inR1(4)) replace(4, "ance") }
      else if (ends("abli")) { if (inR1(4)) replace(4, "able") }
      else if (ends("izer")) { if (inR1(4)) replace(4, "ize") }
      else if (ends("ator")) { if (inR1(4)) replace(4, "ate") }
      else if (ends("alli")) { if (inR1(4)) replace(4, "al") }
      else if (ends("ogi")) {
        if (inR1(3) && b.length >= 4 && b.charAt(b.length - 4) == 'l') replace(3, "og")
      }
      else if (ends("bli")) { if (inR1(3)) replace(3, "ble") }
      else if (ends("li")) {
        if (inR1(2) && b.length >= 3 && validLiEnding(b.charAt(b.length - 3))) drop(2)
      }
    }

    // ---- Step 3 (condition: suffix in R1) -------------------------------
    {
      if (ends("ational")) { if (inR1(7)) replace(7, "ate") }
      else if (ends("tional")) { if (inR1(6)) replace(6, "tion") }
      else if (ends("alize")) { if (inR1(5)) replace(5, "al") }
      else if (ends("icate")) { if (inR1(5)) replace(5, "ic") }
      else if (ends("iciti")) { if (inR1(5)) replace(5, "ic") }
      else if (ends("ative")) { if (inR2(5)) drop(5) }
      else if (ends("ical")) { if (inR1(4)) replace(4, "ic") }
      else if (ends("ness")) { if (inR1(4)) drop(4) }
      else if (ends("ful")) { if (inR1(3)) drop(3) }
    }

    // ---- Step 4 (condition: suffix in R2) -------------------------------
    {
      if (ends("ement")) { if (inR2(5)) drop(5) }
      else if (ends("ance")) { if (inR2(4)) drop(4) }
      else if (ends("ence")) { if (inR2(4)) drop(4) }
      else if (ends("able")) { if (inR2(4)) drop(4) }
      else if (ends("ible")) { if (inR2(4)) drop(4) }
      else if (ends("ment")) { if (inR2(4)) drop(4) }
      else if (ends("ant")) { if (inR2(3)) drop(3) }
      else if (ends("ent")) { if (inR2(3)) drop(3) }
      else if (ends("ism")) { if (inR2(3)) drop(3) }
      else if (ends("ate")) { if (inR2(3)) drop(3) }
      else if (ends("iti")) { if (inR2(3)) drop(3) }
      else if (ends("ous")) { if (inR2(3)) drop(3) }
      else if (ends("ive")) { if (inR2(3)) drop(3) }
      else if (ends("ize")) { if (inR2(3)) drop(3) }
      else if (ends("ion")) {
        if (inR2(3) && b.length >= 4 &&
          (b.charAt(b.length - 4) == 's' || b.charAt(b.length - 4) == 't')) drop(3)
      }
      else if (ends("al")) { if (inR2(2)) drop(2) }
      else if (ends("er")) { if (inR2(2)) drop(2) }
      else if (ends("ic")) { if (inR2(2)) drop(2) }
    }

    // ---- Step 5 ---------------------------------------------------------
    if (b.nonEmpty && b.charAt(b.length - 1) == 'e') {
      if (inR2(1) || (inR1(1) && !endsShortSyllable(b.length - 1))) drop(1)
    } else if (b.nonEmpty && b.charAt(b.length - 1) == 'l') {
      if (inR2(1) && b.length >= 2 && b.charAt(b.length - 2) == 'l') drop(1)
    }

    // ---- postlude -------------------------------------------------------
    if (yFound) {
      var j = 0
      while (j < b.length) { if (b.charAt(j) == 'Y') b.setCharAt(j, 'y'); j += 1 }
    }
    b.toString
  }
}
