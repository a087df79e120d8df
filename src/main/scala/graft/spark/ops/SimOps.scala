package graft.spark.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * (sign-random-projection) approximate variant as the scale path.
  *
  * Scale notes: brute force is a broadcast nested loop of the (small)
  * query set against the corpus — one pass, no shuffle of the big side;
  * the LSH variant buckets the corpus once (row-local code computation +
  * one shuffle on bucket id) and probes only matching buckets, turning
  * top-k into a per-bucket local problem.
  */
object SimOps {

  /** Cosine similarity of two float-array columns, computed in double
    * precision with sequential accumulation (bit-compatible with the
    * DuckDB oracle's list_dot_product over DOUBLE[]).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force cosine top-k for the query vectors (vec_id in
    * `queryIds`), excluding self-matches. Returns
    * (query_id, neighbor_id, rank, sim rounded to 4dp).
    */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = emb.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(queries))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("embedding")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  // ---- LSH-bucketed ANN (scale path) ----
  // Multi-table sign-random-projection LSH (OR-amplification): L tables of
  // b hyperplane bits each; queries probe their bucket plus all hamming-1
  // buckets per table. Tunables trade candidate volume for recall — the
  // defaults hit >=0.9 recall on the near-uniform synthetic embeddings
  // while scanning a fraction of the corpus; clustered real embeddings
  // allow far fewer probes.

  val Tables = 8
  val BitsPerTable = 4

  /** Deterministic pseudo-random hyperplane component for (plane, dim). */
  @inline private[ops] def planeComp(p: Int, d: Int): Double = {
    val h = DedupOps.mix64(p.toLong * 1048573L + d.toLong + 0x9e3779b97f4a7c15L)
    // map to [-1, 1)
    (h >> 11).toDouble / (1L << 52).toDouble
  }

  /** Per-table sign-projection codes (row-local, no shuffle). */
  def bucketCodes(v: Array[Float]): Array[Int] = {
    Array.tabulate(Tables) { t =>
      var code = 0
      var bp = 0
      while (bp < BitsPerTable) {
        val p = t * BitsPerTable + bp
        var s = 0.0
        var d = 0
        while (d < v.length) { s += v(d) * planeComp(p, d); d += 1 }
        if (s > 0) code |= (1 << bp)
        bp += 1
      }
      code
    }
  }

  /** Approximate cosine top-k via multi-table multi-probe LSH. Recall vs
    * brute force asserted in SparkOpsSpec and oracle-gated by
    * e2_ann_recall.
    *
    * Candidate generation and dedup operate on (query_id, vec_id) ID PAIRS
    * only — the full float vectors are attached afterwards via two
    * broadcast joins, so no embedding payload is ever shuffled or hashed
    * through the distinct() (at 768-dim float that payload would dominate
    * the exchange).
    */
  def annTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val coded = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        bucketCodes(v).zipWithIndex.map { case (c, t) => (id, t, c) }
      }
      .toDF("vec_id", "table", "code")

    val probes = emb.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        bucketCodes(v).zipWithIndex.flatMap { case (c, t) =>
          (Seq(c) ++ (0 until BitsPerTable).map(bp => c ^ (1 << bp)))
            .map(pc => (id, t, pc))
        }
      }
      .toDF("query_id", "table", "code")

    // map-only over the coded corpus (probes broadcast), then a shuffle of
    // bare id pairs for the multi-table dedup
    val candIds = coded.join(broadcast(probes), Seq("table", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()

    val qVecs = emb.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

    // re-attach one vector copy per side: candidate list and query vectors
    // are both small relative to the corpus -> broadcast, big side map-only
    val scored = emb.join(broadcast(candIds), "vec_id")
      .join(broadcast(qVecs), "query_id")
      .withColumn("sim", round(cosine(col("q_emb"), col("embedding")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("sim"))
  }

  /** One-row ANN quality gate: recall of [[annTopK]] against
    * [[bruteForceTopK]] on the same queries. Deterministic (both sides
    * are), so the driver oracle can assert it as a constant row.
    */
  def annRecallGate(emb: DataFrame, queryIds: Seq[Long], k: Int,
                    minRecall: Double = 0.9): DataFrame = {
    val bf = bruteForceTopK(emb, queryIds, k).select(col("query_id"), col("neighbor_id"))
    val ann = annTopK(emb, queryIds, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    bf.join(ann, Seq("query_id", "neighbor_id"), "left")
      .agg(
        countDistinct(col("query_id")).cast("int").as("n_queries"),
        lit(k).as("k"),
        (sum(coalesce(col("hit"), lit(0L))) / count(lit(1)) >= minRecall).as("recall_ok"))
  }
}
