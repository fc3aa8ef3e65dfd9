package graft.bsp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling for hub-dominated keys (the web-graph reality: a handful
  * of domains receive a large share of all links). Three tiers, used in
  * this order:
  *
  *  1. map-side partial aggregation — every superstep message aggregation
  *     combines hub destinations before the exchange (free, automatic);
  *  2. AQE skew-join splitting — ON at query boundaries (OFF only inside
  *     superstep loops, see IterativeConf);
  *  3. explicit SALTING (this module) — for equi-joins whose skewed side
  *     AQE cannot split (custom pipelines, pre-AQE cache boundaries):
  *     the skewed side gets a deterministic salt in [0, S), the other
  *     side is replicated S times, and the join key becomes (key, salt),
  *     spreading each hot key over S partitions.
  */
object Skew {

  /** Salted equi-join on `key`: `skewed` is the hub-heavy probe side,
    * `dim` the replicated side (rows multiply by `salts` — keep it the
    * smaller table). Result equals skewed.join(dim, key, joinType) exactly;
    * only the physical distribution changes. The salt is a deterministic
    * hash of the skewed row's other columns plus its input partition id
    * (no rand(): retries and speculative tasks stay consistent — the
    * partition id is a function of the upstream deterministic
    * partitioning, not of scheduling). The partition-id term also covers
    * the two cases a pure payload hash mishandles: a skewed DF with ONLY
    * the key column (hash() with zero args is an error), and
    * duplicate/constant-payload rows of one hot key, which would all land
    * on a single salt. Identical rows inside one input partition still
    * share a salt — salt spread is bounded by (payload cardinality ×
    * input partitions) per key. Supported joinType: inner, left. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val spark = skewed.sparkSession
    val saltCol = "__graft_salt"
    val discriminators =
      skewed.columns.filter(_ != key).map(col).toSeq :+ spark_partition_id()
    val salted = skewed.withColumn(saltCol,
      pmod(hash(discriminators: _*), lit(salts)).cast("int"))
    val replicated = dim.crossJoin(
      spark.range(salts).select(col("id").cast("int").as(saltCol)))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Two-phase (salted) aggregation for skewed group keys when the
    * aggregate is algebraic (sum/count/min/max): group by (key, salt)
    * first, then re-aggregate partials per key. Spark's hash aggregate
    * already partial-aggregates map-side, so this matters only for
    * aggregates forced through a shuffle without partials (e.g.
    * collect_list of hot keys) — provided for completeness. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame = {
    val saltCol = "__graft_salt"
    // salt by the producing partition, NOT hash(value): constant or
    // low-cardinality values of a hot key (the common count-style sum of
    // 1s) would all hash to one salt and get zero spread — the exact
    // failure mode saltedJoin documents
    df.withColumn(saltCol, pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(key), col(saltCol)).agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
