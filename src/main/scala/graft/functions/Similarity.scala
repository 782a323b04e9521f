package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, OpFamily}
import graft.sources.Tables

/** Similarity search over embedding columns (north-star addition).
  *
  * All vector math is fixed-point: components are quantized to int64
  * thousandths, so dot products and norms are exact integers — results
  * are bit-identical across engines, summation orders, and partitioning
  * (a deliberate choice for cross-engine verifiability; see SURVEY §5).
  *
  * S1 is the brute-force baseline (broadcast the small query set, scan
  * the corpus once). S2 is the scale path: random-hyperplane LSH with
  * integer-arithmetic planes derived from (plane, dim) index hashing —
  * the corpus partitions by bucket and each probe touches one bucket.
  */
object Similarity extends OpFamily {

  /** float embedding → int64 thousandths. */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * lit(1000), 0).cast("long"))

  def quantizeSql(c: String): String =
    s"list_transform($c, x -> CAST(round(CAST(x AS DOUBLE)*1000, 0) AS BIGINT))"

  /** Exact int64 dot product — a custom codegen'd Catalyst expression
    * ([[graft.functions.expressions.LongDotProduct]]); the
    * `aggregate(zip_with(...))` composition is semantically identical
    * but interpreted and codegen-breaking. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(expressions.LongDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Σ v_i² (exact int64). */
  def sqNorm(v: Column): Column = dot(v, v)

  def sqNormSql(v: String): String =
    s"CAST(list_sum(list_transform($v, x -> x * x)) AS BIGINT)"

  /** cos(a,b) = dot/(√(na·nb)) with exact int64 dot and norms. */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b).cast("double") / sqrt((na * nb).cast("double"))

  def cosineSql(a: String, b: String, na: String, nb: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i])) AS DOUBLE)" +
      s"/sqrt(CAST($na * $nb AS DOUBLE))"

  /** Random-hyperplane LSH bucket (8 planes ⇒ 256 buckets). Plane
    * weights are small ints derived from the (plane, dim) index pair —
    * deterministic, engine-neutral, exact. Backed by the codegen'd
    * [[graft.functions.expressions.LshBucket]] kernel (one fused
    * integer loop; the compositional `aggregate(zip_with(...))` form is
    * interpreted and allocates per plane per row). */
  def lshBucket(v: Column): Column = lshBucket(v, 8, 0)

  /** Banded form: 2^planes buckets from band `band`'s disjoint plane
    * family. The plane count scales with the corpus (block size is
    * n/2^planes); OR-ing 2+ bands recovers the recall a single wider
    * band gives up. */
  def lshBucket(v: Column, planes: Int, band: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(expressions.LshBucket(ColumnBridge.expression(v), planes, band))
  }

  /** The compositional formula the kernel replaces — kept for the
    * equivalence spec. */
  private[graft] def lshBucketComposed(v: Column): Column =
    aggregate(sequence(lit(0L), lit(7L)), lit(0L), (acc, j) =>
      acc + when(
        aggregate(
          zip_with(v, sequence(lit(1L), lit(64L)),
            (x, dd) => x * ((j * lit(73856093L) + dd * lit(19349663L)) % 97 - 48)),
          lit(0L), (a, x) => a + x) >= 0,
        pow(lit(2.0), j).cast("long")).otherwise(lit(0L)))

  def lshBucketSql(v: String): String = lshBucketSql(v, 8, 0)

  def lshBucketSql(v: String, planes: Int, band: Int): String = {
    val base = band * planes
    s"CAST(list_sum(list_transform(range(0, $planes), j -> " +
      s"CASE WHEN list_sum(list_transform(range(1, 65), d -> " +
      s"$v[d] * ((($base + j)*73856093 + d*19349663) % 97 - 48))) >= 0 " +
      s"THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END)) AS BIGINT)"
  }

  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("nn", sqNorm(col("v")))

  private val quantizedCte =
    s"""q AS (SELECT vec_id, ${quantizeSql("embedding")} AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${sqNormSql("v")} AS nn FROM q)""".stripMargin

  // S1: brute-force cosine top-10 — queries (vec_id < 5) broadcast
  // against the corpus; one corpus scan, ranking window per query.
  private def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val all = quantized(s, d)
    val queries = broadcast(all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("qnn")))
    val corpus = all.filter(col("vec_id") >= 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(queries)
      .select(col("q_id"), col("vec_id"),
        cosine(col("qv"), col("v"), col("qnn"), col("nn")).as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
  }

  private val cosineTopKSql =
    s"""WITH $quantizedCte,
       |x AS (
       |  SELECT q.vec_id AS q_id, c.vec_id,
       |    ${cosineSql("q.v", "c.v", "q.nn", "c.nn")} AS cos_sim
       |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id >= 5),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn FROM x)
       |SELECT q_id, vec_id, cos_sim, rn FROM r WHERE rn <= 10""".stripMargin

  // S2: LSH-bucketed ANN — probe only the query's bucket, rank top-5.
  private def annLsh(s: SparkSession, d: String): DataFrame = {
    val all = quantized(s, d).withColumn("bucket", lshBucket(col("v")))
    val queries = broadcast(all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("qnn"),
        col("bucket")))
    val corpus = all.filter(col("vec_id") >= 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(queries, Seq("bucket"))
      .select(col("q_id"), col("vec_id"), col("bucket"),
        cosine(col("qv"), col("v"), col("qnn"), col("nn")).as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
  }

  private val annLshSql =
    s"""WITH $quantizedCte,
       |bk AS (SELECT vec_id, v, nn, ${lshBucketSql("v")} AS bucket FROM n),
       |x AS (
       |  SELECT q.vec_id AS q_id, c.vec_id, q.bucket,
       |    ${cosineSql("q.v", "c.v", "q.nn", "c.nn")} AS cos_sim
       |  FROM bk q JOIN bk c ON q.bucket = c.bucket AND q.vec_id < 5 AND c.vec_id >= 5),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn FROM x)
       |SELECT q_id, vec_id, bucket, cos_sim, rn FROM r WHERE rn <= 5""".stripMargin

  // S3: IVF — partition the corpus into k Voronoi cells around
  // deterministic sampled-k-means centroids ([[ivfCentroids]]); a probe
  // searches its `probes` nearest cells (probes/k of the corpus at
  // scale). All cell-assignment arithmetic is exact int64:
  // dist²(v,c) = |v|² + |c|² − 2·v·c.
  //
  // Corpus cell assignment is ONE TRUE hash aggregation: the
  // (dist2, cid) ordering packs into a single int64 (dist2·1024 + cid,
  // exact — dist2 ≤ 64·2000² ≈ 2.6e8 so the product stays far inside
  // int64), so the argmin is a plain `min` over a long — map-side
  // partial combine, fixed-width buffer, NO sort. (A `min_by` over a
  // struct LOOKS like the right call but its struct aggregation buffer
  // forces SortAggregate — a full sort of corpus×k; a row_number window
  // does the same. Verified via ExplainAudit.) The vector payload
  // re-attaches with a shuffled-hash join on vec_id — hash all the way
  // down.
  private val cellEnc = 1024L // packing base; supports k up to 1024

  /** IVF centroid init — sampled k-means-style, fully deterministic
    * and engine-neutral:
    *  1. multiplicative-hash sample of the corpus (uniform over ids —
    *     unlike the former "first k vectors", where adjacent ids can be
    *     correlated);
    *  2. k seeds = the k smallest-hash sample vectors (hash order ≈ a
    *     uniform random draw);
    *  3. one Lloyd refinement step over the sample: nearest-seed
    *     assignment via the same packed-min hash-agg the corpus
    *     assignment uses, then a per-cell per-dimension integer mean
    *     (round-half-away — identical in both engines).
    * k guidance: ≈√n cells balances probe work and cell size at ~√n
    * each. The sample is O(n/sampleMod) rows but the refinement output
    * is k vectors — driver-broadcastable at any corpus size (tune
    * sampleMod so the sample itself stays executor-friendly; the
    * single-task ranking window below runs on the SAMPLE, never the
    * corpus). */
  private[graft] def ivfCentroids(all: DataFrame, k: Int, sampleMod: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("vec_id"))
    val sample = all
      .withColumn("h",
        pmod((col("vec_id") % lit(1000003L)) * lit(2654435761L), lit(1000000007L)))
      .filter(pmod(col("h"), lit(sampleMod)) === 0)
      .cache()
    val seeds = broadcast(sample
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select((col("rn") - 1).cast("long").as("cid"), col("v").as("cv"), col("nn").as("cnn")))
    val assign = sample.join(seeds)
      .select(col("vec_id"),
        ((col("nn") + col("cnn") - lit(2L) * dot(col("v"), col("cv"))) * lit(cellEnc)
          + col("cid")).as("pk"))
      .groupBy("vec_id").agg(min(col("pk")).as("pk"))
      .select(col("vec_id"), pmod(col("pk"), lit(cellEnc)).as("cid"))
    sample.join(assign, "vec_id")
      .select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos")
      .agg(round(sum(col("col")).cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("m"))
      .groupBy("cid")
      .agg(collect_list(struct(col("pos"), col("m"))).as("pm"))
      .select(col("cid"),
        transform(array_sort(col("pm")), e => e.getField("m")).as("cv"))
      .withColumn("cnn", sqNorm(col("cv")))
  }

  private[graft] def ivf(s: SparkSession, d: String, k: Int, probes: Int): DataFrame = {
    require(k <= cellEnc, s"k=$k exceeds packing base $cellEnc")
    val all = quantized(s, d)
    val cent = broadcast(ivfCentroids(all, k, sampleMod = 4L))
    val cellOf = all.join(cent)
      .select(col("vec_id"),
        ((col("nn") + col("cnn") - lit(2L) * dot(col("v"), col("cv"))) * lit(cellEnc)
          + col("cid")).as("pk"))
      .groupBy("vec_id").agg(min(col("pk")).as("pk"))
      .select(col("vec_id"), (col("pk") % lit(cellEnc)).as("cell"))
    val assigned = all.join(cellOf.hint("shuffle_hash"), Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("nn"), col("cell"))
      // consumed by both the probe and corpus sides — materialize the
      // assignment once (at scale: a persisted/bucketed index table)
      .cache()
    val qcells = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nn").as("qnn"))
      .join(cent)
      .select(col("q_id"), col("qv"), col("qnn"), col("cid"),
        (col("qnn") + col("cnn") - lit(2L) * dot(col("qv"), col("cv"))).as("dist2"))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("dist2"), col("cid"))))
      .filter(col("rn") <= probes)
      .select(col("q_id"), col("qv"), col("qnn"), col("cid").as("cell"))
    val corpus = assigned.filter(col("vec_id") >= 5)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(broadcast(qcells), Seq("cell"))
      .select(col("q_id"), col("vec_id"), col("cell"),
        cosine(col("qv"), col("v"), col("qnn"), col("nn")).as("cos_sim"))
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .filter(col("rn") <= 5)
  }

  private def annIvf(s: SparkSession, d: String): DataFrame = ivf(s, d, 16, 1)

  private val annIvfSql =
    s"""WITH $quantizedCte,
       |samp AS (
       |  SELECT vec_id, v, nn, ((vec_id % 1000003) * 2654435761) % 1000000007 AS h
       |  FROM n WHERE (((vec_id % 1000003) * 2654435761) % 1000000007) % 4 = 0),
       |seeds AS (
       |  SELECT CAST(rn - 1 AS BIGINT) AS cid, v AS cv, nn AS cnn FROM (
       |    SELECT *, row_number() OVER (ORDER BY h, vec_id) AS rn FROM samp)
       |  WHERE rn <= 16),
       |sd AS (
       |  SELECT s.vec_id, c.cid,
       |    s.nn + c.cnn - 2 * CAST(list_sum(list_transform(range(1, len(s.v)+1), i -> s.v[i] * c.cv[i])) AS BIGINT) AS dist2
       |  FROM samp s, seeds c),
       |sa AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn FROM sd)
       |  WHERE rn = 1),
       |dim AS (
       |  SELECT a.cid, i.i AS pos, s.v[i.i] AS x
       |  FROM sa a JOIN samp s USING (vec_id), (SELECT unnest(range(1, 65)) AS i) i),
       |cm AS (
       |  SELECT cid, pos,
       |    CAST(round(CAST(sum(x) AS DOUBLE)/CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
       |  FROM dim GROUP BY 1, 2),
       |cent AS (
       |  SELECT cid, list(m ORDER BY pos) AS cv,
       |    CAST(list_sum(list_transform(list(m ORDER BY pos), y -> y*y)) AS BIGINT) AS cnn
       |  FROM cm GROUP BY 1),
       |ad AS (
       |  SELECT vec_id, v, nn, cid,
       |    nn + cnn - 2 * CAST(list_sum(list_transform(range(1, len(v)+1), i -> v[i] * cv[i])) AS BIGINT) AS dist2
       |  FROM n, cent),
       |cellof AS (
       |  SELECT vec_id, v, nn, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn FROM ad)
       |  WHERE rn = 1),
       |x AS (
       |  SELECT q.vec_id AS q_id, c.vec_id, q.cell,
       |    ${cosineSql("q.v", "c.v", "q.nn", "c.nn")} AS cos_sim
       |  FROM cellof q JOIN cellof c ON q.cell = c.cell AND q.vec_id < 5 AND c.vec_id >= 5),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn FROM x)
       |SELECT q_id, vec_id, cell, cos_sim, rn FROM r WHERE rn <= 5""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("cosine_topk", cosineTopK, Some(cosineTopKSql)),
    Op("ann_lsh", annLsh, Some(annLshSql)),
    Op("ann_ivf", annIvf, Some(annIvfSql)))
}
