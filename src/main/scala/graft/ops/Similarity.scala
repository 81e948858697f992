package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k as pure Catalyst higher-order
  * functions (`zip_with` + `aggregate`) — whole-stage-codegen'd, scans the
  * table once, TakeOrderedAndProject for the top-k (no full sort).
  *
  * Scale path: IVF — k seeded hyperplane buckets (or centroid assignment)
  * prune the scan to the probe's bucket(s); brute force only inside.
  */
object Similarity {

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** dot(a, b) over array<double> columns, as a codegen'd expression. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosineCol(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    dotCol(ad, bd) / (sqrt(dotCol(ad, ad)) * sqrt(dotCol(bd, bd)))
  }

  /** Brute-force cosine top-k against the embedding of `queryId`.
    * The 1-row query side is broadcast; plan = scan + codegen'd cosine +
    * TakeOrderedAndProject. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosineCol(col("embedding"), col("q_embedding")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: assign every vector to a hyperplane-sign bucket
    * (seeded, deterministic), search only buckets within `probeHamming`
    * bits of the query's bucket. Trades recall for a pruned scan — the
    * 100 TB path where brute force is a full-corpus read. */
  /** planes sized so the expected bucket occupancy stays ~64: more data →
    * more planes → finer buckets; the probe cost stays bounded. */
  def adaptivePlanes(n: Long): Int =
    math.min(20, math.max(2, math.ceil(math.log(n / 64.0) / math.log(2)).toInt))

  /** Hyperplane-sign bucket of a vector (bit p = sign of v·hyper(p)). */
  def hyperplaneSig(v: Seq[Float], hyper: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < hyper.length) {
      var dot = 0.0; var i = 0
      while (i < v.length) { dot += hyper(p)(i) * v(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** IVF-flat ANN: vectors are assigned to their max-cosine centroid cell
    * (centroids = a deterministic seeded sample of the corpus, broadcast —
    * the k-means-free variant; a trained codebook drops in by replacing
    * `centroids`); a query scans only its `nProbe` closest cells. The
    * 100 TB shape: the cell column is a partition key, so a probe is a
    * partition-pruned scan; assignment is one broadcast map pass.
    */
  def ivfTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val n = embeddings.count()
    val rnd = new scala.util.Random(seed)
    val centroidIds = Seq.fill(nCells * 2)(math.abs(rnd.nextLong()) % n)
      .distinct.take(nCells).sorted
    val centroids = embeddings.filter($"vec_id".isin(centroidIds: _*))
      .select("embedding").as[Seq[Float]].collect()
    require(centroids.nonEmpty, "no centroids sampled")
    val bC = spark.sparkContext.broadcast(centroids)
    val cellOf = (v: Seq[Float]) => {
      val cs = bC.value
      var best = 0; var bestCos = Double.MinValue; var i = 0
      while (i < cs.length) {
        val c = cosine(v, cs(i))
        if (c > bestCos) { bestCos = c; best = i }
        i += 1
      }
      best
    }
    val assigned = embeddings.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, cellOf(v)) }
      .toDF("vec_id", "embedding", "cell")
    val qVec = embeddings.filter($"vec_id" === queryId)
      .select("embedding").as[Seq[Float]].head()
    val probeCells = centroids.indices
      .sortBy(i => -cosine(qVec, centroids(i))).take(nProbe).toSet
    val bQ = spark.sparkContext.broadcast(qVec)
    assigned
      .filter($"vec_id" =!= queryId && $"cell".isin(probeCells.toSeq: _*))
      .as[(Long, Seq[Float], Int)]
      .map { case (id, v, _) => (id, cosine(v, bQ.value)) }
      .toDF("vec_id", "cosine")
      .orderBy($"cosine".desc, $"vec_id".asc)
      .limit(k)
  }

  def lshTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      planesOpt: Option[Int] = None,
      probeHamming: Int = 1,
      seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val dims = embeddings.select(size(col("embedding"))).as[Int].head()
    val planes = planesOpt.getOrElse(adaptivePlanes(embeddings.count()))
    val rnd = new scala.util.Random(seed)
    val hyper = Array.fill(planes, dims)(rnd.nextGaussian())
    val bHyper = spark.sparkContext.broadcast(hyper)
    val withBucket = embeddings.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, hyperplaneSig(v, bHyper.value)) }
      .toDF("vec_id", "embedding", "bucket")
    val (qVec, qBucket) = withBucket.filter($"vec_id" === queryId)
      .as[(Long, Seq[Float], Long)].head() match { case (_, v, bkt) => (v, bkt) }
    val bQ = spark.sparkContext.broadcast(qVec)
    withBucket
      .filter($"vec_id" =!= queryId)
      .filter(bit_count($"bucket".bitwiseXOR(lit(qBucket))) <= probeHamming)
      .as[(Long, Seq[Float], Long)]
      .map { case (id, v, _) => (id, cosine(v, bQ.value)) }
      .toDF("vec_id", "cosine")
      .orderBy($"cosine".desc, $"vec_id".asc)
      .limit(k)
  }
}
