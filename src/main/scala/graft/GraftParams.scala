package graft

/** Ranker constants, reference-identical defaults:
  * K1/B (/root/reference/source/BM25Ranker.cpp:9-10), PHRASE_BOOST and
  * EXACT_MATCH_WEIGHT as overridden by main
  * (/root/reference/source/main.cpp:19-22); TERM_FREQUENCY_WEIGHT is derived
  * as 1 − EXACT_MATCH_WEIGHT (BM25Ranker.cpp:17-24).
  *
  * `stemBareTerms = false` mirrors the reference exactly: unquoted query
  * terms are looked up RAW in the index (BM25Ranker.cpp:350-353 uses the
  * lexer token with no normalize/stem), so `Running` matches nothing while
  * `run` matches the stem key. Set true for the saner opt-in behavior.
  */
final case class GraftParams(
    k1: Double = 1.5,
    b: Double = 0.75,
    phraseBoost: Double = 1.35,
    exactMatchWeight: Double = 0.6,
    stemBareTerms: Boolean = false,
    topK: Int = 100,
    /** operand-size ceiling for the driver-side boolean algebra; above it
      * the engine falls back to the fully distributed algebra */
    driverAlgebraMaxDocs: Int = 2000000) {
  def termFrequencyWeight: Double = 1 - exactMatchWeight
}
