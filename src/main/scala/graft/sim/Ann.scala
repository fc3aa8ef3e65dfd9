package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  *  - `bruteForceTopK` — exact cosine top-k: the correctness baseline.
  *    Query×candidate join, codegen'd higher-order-function dot products.
  *  - `lshBuckets` / `annTopK` — random-hyperplane LSH: deterministic
  *    md5-derived hyperplanes, `planes`-bit bucket signatures, search
  *    restricted to same-bucket candidates (multi-probe over Hamming-1
  *    neighbours optional). The scale path: bucketing is one hash
  *    aggregation, search joins only within buckets — survives a
  *    billion-vector table where the cross join cannot.
  */
object Ann {

  private def toD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Native codegen dot product (functions.DotProduct); summation order is
    * identical to the HOF formulation, so results are bit-equal. Callers
    * must have VectorFunctions.register'd the session (the public entry
    * points below do). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbours for each query id: (query_id, rank,
    * neighbor_id, sim). Deterministic tie-break on neighbor id. */
  def bruteForceTopK(emb: DataFrame, queryIds: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     roundTo: Int = 4): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val v = emb.select(col(idCol), toD(col(vecCol)).as("v"))
    val q = v.join(queryIds.withColumnRenamed(queryIds.columns.head, idCol), Seq(idCol))
      .select(col(idCol).as("query_id"), col("v").as("qv"))
    val c = v.select(col(idCol).as("neighbor_id"), col("v").as("cv"))
    val sims = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), roundTo).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Deterministic hyperplane weight for (plane, dim): md5-derived value
    * in [-1, 1). */
  private def planeWeight(plane: Column, dim: Column): Column =
    graft.text.TextOps.md5u32(concat(lit("plane:"), plane, lit(":"), dim)) /
      lit((1L << 31).toDouble) - 1.0

  /** LSH bucket per vector: `planes`-bit signature of hyperplane signs.
    * Returns (id, bucket). */
  def lshBuckets(emb: DataFrame, planes: Int = 12,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val spark = emb.sparkSession
    val dims = emb.select(posexplode(toD(col(vecCol)))).select(col("pos").as("dim"), lit(1))
      .agg(max("dim")).head().getInt(0) + 1
    val grid = spark.range(planes).select(col("id").cast("int").as("plane"))
      .crossJoin(spark.range(dims).select(col("id").cast("int").as("dim")))
      .select(col("plane"), col("dim"), planeWeight(col("plane"), col("dim")).as("w"))
    val comps = emb.select(col(idCol), posexplode(toD(col(vecCol))).as(Seq("dim", "x")))
      .join(broadcast(grid), Seq("dim"))
      .groupBy(col(idCol), col("plane")).agg(sum(col("x") * col("w")).as("proj"))
    comps
      .groupBy(col(idCol))
      .agg(sum(when(col("proj") >= 0, expr("shiftleft(1L, plane)")).otherwise(0L))
        .as("bucket"))
  }

  /** Approximate top-k: exact cosine ranking restricted to same-bucket
    * candidates. Returns (query_id, rank, neighbor_id, sim). */
  def annTopK(emb: DataFrame, queryIds: DataFrame, k: Int, planes: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding",
              roundTo: Int = 4): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val buckets = lshBuckets(emb, planes, idCol, vecCol)
    val v = emb.select(col(idCol), toD(col(vecCol)).as("v")).join(buckets, Seq(idCol))
    val q = v.join(queryIds.withColumnRenamed(queryIds.columns.head, idCol), Seq(idCol))
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("bucket"))
    val c = v.select(col(idCol).as("neighbor_id"), col("v").as("cv"), col("bucket"))
    val sims = q.join(c, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), roundTo).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
