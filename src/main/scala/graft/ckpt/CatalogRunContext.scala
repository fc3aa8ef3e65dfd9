package graft.ckpt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bsp.{RunContext, StepStat}
import scala.collection.mutable.ArrayBuffer

/** Durable superstep bookkeeping (north rule: "every superstep checkpoints
  * per-partition lineage and metrics to Iceberg so runs resume
  * mid-iteration after failure").
  *
  * Tables written under the catalog root:
  *   state/<runId>     snapshot id = superstep; full vertex state
  *   metrics/<runId>   appended rows (run_id, algo, step, partition, rows,
  *                     edges_scattered, messages, delta, wall_ms);
  *                     partition = -1 is the superstep-global row, other
  *                     rows are the per-partition lineage of the snapshot
  *
  * A snapshot is only visible once its manifest commits (atomic rename), so
  * a kill mid-write leaves the previous superstep as the resume point; the
  * algorithm restarts at max-committed-step + 1 and never recomputes
  * earlier supersteps. `every` controls the durable STATE-checkpoint
  * cadence (1 = the north-rule every-superstep mode); intermediate steps
  * still cut lineage via localCheckpoint. Metrics flush durably once per
  * superstep at record() time — after the step's global row exists — so
  * the durable metrics never lag the committed state by a step. */
final class CatalogRunContext(
    val catalog: Catalog,
    val runId: String,
    spark: SparkSession,
    every: Int = 1) extends RunContext {

  private case class MetricRow(algo: String, step: Int, partition: Int, rows: Long,
      edgesScattered: Long, messages: Long, delta: Double, wallMs: Double)

  private val stateTable = s"state/$runId"
  private val metricsTable = s"metrics/$runId"
  private val stepStats = ArrayBuffer.empty[StepStat]
  private val pending = ArrayBuffer.empty[MetricRow]
  private var resumedFrom = 0L

  override def startStep: Int =
    catalog.latestSnapshot(stateTable).getOrElse(0L).toInt

  override def restoreOrInit(init: DataFrame): DataFrame =
    catalog.latestSnapshot(stateTable) match {
      case Some(step) =>
        resumedFrom = step
        val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
        catalog.readSnapshot(spark, stateTable, step)
          .repartition(p, col(init.columns.head)).localCheckpoint(true)
      case None => init.localCheckpoint(true)
    }

  override def checkpoint(state: DataFrame, step: Int): DataFrame = {
    // lazy: a committing step is materialised by the parquet write below;
    // an intermediate step by the caller's own delta aggregate — same
    // one-job-per-superstep fusion as LocalRunContext
    val ck = state.localCheckpoint(false)
    if (step % every == 0) {
      catalog.writeSnapshot(ck, stateTable, step)
      // per-partition lineage of the committed snapshot
      import spark.implicits._
      val parts = ck.groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows")).as[(Int, Long)].collect()
      pending.synchronized {
        parts.foreach { case (pid, rows) =>
          pending += MetricRow("lineage", step, pid, rows, 0L, 0L, 0.0, 0.0)
        }
      }
    }
    ck
  }

  override def record(stat: StepStat): Unit = {
    pending.synchronized {
      stepStats += stat
      pending += MetricRow(stat.algo, stat.step, -1, -1L, stat.edgesScattered,
        stat.messages, stat.delta, stat.wallMs)
    }
    // flush once per superstep, AFTER the step's global row is recorded —
    // the callers record() right after checkpoint(), so a committed step's
    // durable metrics include its own row (previously the flush ran inside
    // checkpoint() and every committed snapshot's metrics lagged one step,
    // permanently losing the final step's row on run end or crash)
    flushMetrics()
  }

  override def stats: Seq[StepStat] = stepStats.toSeq

  def resumedFromStep: Long = resumedFrom

  def flushMetrics(): Unit = pending.synchronized {
    if (pending.nonEmpty) {
      import spark.implicits._
      val rows = pending.toSeq.map(m =>
        (runId, m.algo, m.step, m.partition, m.rows, m.edgesScattered, m.messages,
          m.delta, m.wallMs))
      catalog.append(
        spark.createDataset(rows).coalesce(1).toDF(
          "run_id", "algo", "step", "partition", "rows", "edges_scattered",
          "messages", "delta", "wall_ms"),
        metricsTable)
      pending.clear()
    }
  }

  /** All metrics committed so far for this run. */
  def metrics(): Option[DataFrame] = catalog.readAll(spark, metricsTable)
}
