package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes: every variant is one `groupBy` on a bounded-width key
  * (hash / band bucket), i.e. a single shuffle whose reduce-side state per
  * key is tiny; pairwise work only happens inside near-dup buckets
  * (candidate pairs), never across the corpus.
  */
object Dedup {

  /** Exact dedup by content hash: keep the smallest doc_id per md5(text).
    * Map-side partial agg → one shuffle of (hash, id) pairs. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("content_md5"), col("doc_id"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("content_md5"))

  /** Word n-gram shingle set of a text (lowercased word tokens). */
  def shingles(text: String, n: Int): Set[String] = {
    val toks = graft.text.TextPipeline.tokenize(text).map(_.toLowerCase)
    if (toks.length < n) if (toks.isEmpty) Set.empty else Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Deterministic 64-bit shingle hash (md5-based so any engine can
    * reproduce it; Spark's hash() is engine-specific). */
  def shingleHash64(s: String, seed: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((seed.toString + ":" + s).getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(md).getLong
  }

  /** MinHash signature: k independent permutations approximated by seeded
    * hashes; signature(i) = min over shingles of hash_i(shingle). */
  def minHashSignature(sh: Set[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    sh.foreach { s =>
      var i = 0
      while (i < k) {
        val h = shingleHash64(s, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** MinHash + LSH banding: docs sharing any band bucket are candidate
    * pairs; verified candidates = estimated Jaccard ≥ threshold.
    *
    * shingle→minhash is a doc-local flatMap; banding explodes k/r rows per
    * doc; the single shuffle groups by (band, bucket-hash). Candidate
    * verification re-reads only candidate docs (broadcast-joined at small
    * candidate counts, shuffle-joined at scale).
    */
  def minHashLsh(
      spark: SparkSession,
      docs: DataFrame,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val rows = bands // r = k / bands
    val r = k / bands
    val sigs: Dataset[(Long, Array[Long])] = docs.select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) => (id, minHashSignature(shingles(text, shingleN), k)) }
    val banded = sigs.flatMap { case (id, sig) =>
      (0 until bands).iterator.map { b =>
        val bandSig = sig.slice(b * r, (b + 1) * r).mkString(",")
        (b, bandSig, id, sig)
      }
    }.toDF("band", "band_sig", "doc_id", "sig")
    val pairs = banded.as("l").join(banded.as("r"),
        $"l.band" === $"r.band" && $"l.band_sig" === $"r.band_sig" &&
          $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("doc_a"), $"r.doc_id".as("doc_b"),
        $"l.sig".as("sig_a"), $"r.sig".as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    pairs.as[(Long, Long, Seq[Long], Seq[Long])]
      .map { case (a, b, sa, sb) =>
        val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
        (a, b, est)
      }
      .toDF("doc_a", "doc_b", "est_jaccard")
      .filter($"est_jaccard" >= threshold)
      .orderBy($"doc_a", $"doc_b")
  }

  /** SimHash: 64-bit weighted-bit fingerprint; near-dups differ in few
    * bits. Doc-local computation, dedup by fingerprint or bit-band. */
  def simHash64(text: String): Long = {
    val toks = graft.text.TextPipeline.tokenize(text).map(_.toLowerCase)
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    toks.groupBy(identity).foreach { case (t, occs) =>
      val h = shingleHash64(t, 0)
      val w = occs.length
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += w else acc(i) -= w
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def simHash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, simHash64(t)) }
      .toDF("doc_id", "simhash")
      .orderBy($"doc_id")
  }

  /** Exact word-n-gram Jaccard for candidate pairs (the verify step after
    * any LSH/banding pass). */
  def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else (a intersect b).size.toDouble / (a union b).size.toDouble

  /** Exact ALL-PAIRS n-gram Jaccard — the contract/oracle-scale ground
    * truth (O(n²) pairs: use only on bounded inputs; the 100 TB path is
    * ngramJaccardPairs, which prunes candidates with MinHash LSH first).
    * Shingle sets are computed once per doc (not per pair). */
  def ngramJaccardBrute(
      spark: SparkSession,
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    val sh = docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, shingles(t, shingleN).toSeq) }
      .toDF("doc_id", "sh")
    sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), $"doc_a" < $"doc_b")
      .as[(Long, Seq[String], Long, Seq[String])]
      .map { case (a, sa, b, sb) => (a, b, jaccard(sa.toSet, sb.toSet)) }
      .toDF("doc_a", "doc_b", "jaccard")
      .filter($"jaccard" >= threshold)
      .orderBy($"doc_a", $"doc_b")
  }

  /** N-gram-Jaccard near-dup pairs, bucketed by fingerprint-prefix to keep
    * the self-join bounded (the exact verify over LSH candidates). */
  def ngramJaccardPairs(
      spark: SparkSession,
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    val lsh = minHashLsh(spark, docs, shingleN, threshold = 0.0)
    val texts = docs.select("doc_id", "text")
    val withA = lsh.join(texts.withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("text", "text_a"), Seq("doc_a"))
    val withB = withA.join(texts.withColumnRenamed("doc_id", "doc_b")
      .withColumnRenamed("text", "text_b"), Seq("doc_b"))
    withB.select($"doc_a", $"doc_b", $"text_a", $"text_b")
      .as[(Long, Long, String, String)]
      .map { case (a, b, ta, tb) =>
        (a, b, jaccard(shingles(ta, shingleN), shingles(tb, shingleN)))
      }
      .toDF("doc_a", "doc_b", "jaccard")
      .filter($"jaccard" >= threshold)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Exact ALL-PAIRS embedding-cosine near-dup — contract/oracle-scale
    * ground truth (O(n²) pairs over broadcast-nested-loop; bounded inputs
    * only — at corpus scale use embeddingNearDup's hyperplane buckets).
    * Pure Catalyst (`zip_with`/`aggregate` cosine), whole-stage codegen'd. */
  def embeddingNearDupExact(embeddings: DataFrame, threshold: Double): DataFrame = {
    val l = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val r = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    l.join(r, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Similarity.cosineCol(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Embedding-cosine near-dup pairs over an LSH-style bucket (random
    * hyperplane signs, seeded) — the scale path for embedding dedup. */
  def embeddingNearDup(
      spark: SparkSession,
      embeddings: DataFrame,
      planesOpt: Option[Int] = None,
      threshold: Double = 0.95,
      seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val dims = embeddings.select(size(col("embedding"))).as[Int].head()
    val planes = planesOpt.getOrElse(Similarity.adaptivePlanes(embeddings.count()))
    val rnd = new scala.util.Random(seed)
    val hyper = Array.fill(planes, dims)(rnd.nextGaussian())
    val bHyper = spark.sparkContext.broadcast(hyper)
    val sigs = embeddings.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val h = bHyper.value
        var sig = 0L
        var p = 0
        while (p < h.length) {
          var dot = 0.0; var i = 0
          while (i < v.length) { dot += h(p)(i) * v(i); i += 1 }
          if (dot >= 0) sig |= (1L << p)
          p += 1
        }
        (id, v, sig)
      }.toDF("vec_id", "embedding", "bucket")
    val pairs = sigs.as("l").join(sigs.as("r"),
        $"l.bucket" === $"r.bucket" && $"l.vec_id" < $"r.vec_id")
      .select($"l.vec_id".as("vec_a"), $"r.vec_id".as("vec_b"),
        $"l.embedding".as("emb_a"), $"r.embedding".as("emb_b"))
    pairs.as[(Long, Long, Seq[Float], Seq[Float])]
      .map { case (a, b, va, vb) => (a, b, Similarity.cosine(va, vb)) }
      .toDF("vec_a", "vec_b", "cosine")
      .filter($"cosine" >= threshold)
      .orderBy($"vec_a", $"vec_b")
  }
}
