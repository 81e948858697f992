package graft.ops

/** Deterministic, engine-reproducible randomness for the dedup/similarity
  * family. Everything here is pure integer arithmetic over either wrapping
  * 64-bit (splitmix64) or the Mersenne field GF(2^61−1), chosen so an
  * independent SQL engine (the driver's DuckDB oracle) can recompute the
  * exact same values with plain HUGEINT arithmetic — `scala.util.Random`
  * Gaussians are NOT reproducible outside the JVM, which is what kept the
  * LSH family un-oracled in rounds 1–2.
  */
object DetHash {

  /** Mersenne prime 2^61 − 1: the modulus of the universal-hash family.
    * Products of two residues fit in 122 bits — inside DuckDB's HUGEINT
    * with no overflow checks tripped, and inside JVM Math.multiplyHigh. */
  val P: Long = (1L << 61) - 1

  /** splitmix64 finalizer (Steele et al., public domain in JDK
    * SplittableRandom) — full-avalanche 64-bit mixer; wrapping Long
    * arithmetic, so any engine reproduces it. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** (a·b) mod P for 0 ≤ a,b < P. The 122-bit product is (hi·2^64 + lo);
    * 2^64 ≡ 8 (mod 2^61−1), so the reduction is one shift-free fold. */
  @inline def mulModP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // < 2^58 for a,b < 2^61
    val lo = a * b // low 64 bits, unsigned
    val s = (hi * 8) % P + java.lang.Long.remainderUnsigned(lo, P)
    if (s >= P) s - P else s
  }

  /** k universal-hash permutation coefficients h_i(x) = (a_i·x + b_i) mod P
    * (a_i ∈ [1, P−1], b_i ∈ [0, P−1]), derived from the mix64 stream so
    * both the engine and the SQL-literal table in the oracle agree. */
  def permCoeffs(k: Int, seed: Long = 0x5EEDL): Array[(Long, Long)] =
    Array.tabulate(k) { i =>
      val a = java.lang.Long.remainderUnsigned(mix64(seed + 2L * i), P - 1) + 1
      val b = java.lang.Long.remainderUnsigned(mix64(seed + 2L * i + 1), P)
      (a, b)
    }

  /** Random-SIGN hyperplane (Rademacher ±1 components) for sign-LSH —
    * a valid SRP family (Charikar 2002 needs only symmetric i.i.d.
    * components), and, unlike Gaussian draws, expressible as a SQL literal
    * array. Component (p, i) takes the low bit of mix64 over a distinct
    * odd-stride lattice so planes are independent across (seed, p, i). */
  def signPlane(plane: Int, dims: Int, seed: Long): Array[Double] =
    Array.tabulate(dims) { i =>
      if ((mix64(seed * 0x9E3779B97F4A7C15L + plane.toLong * 0x100000001B3L + i) & 1L) == 1L) 1.0
      else -1.0
    }

  def signPlanes(planes: Int, dims: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(planes)(p => signPlane(p, dims, seed))
}
