package graft.bsp

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** One superstep's lineage/metrics row (north rule: "every superstep
  * checkpoints per-partition lineage and metrics — edges scattered, messages
  * exchanged, convergence delta"). The analogue of the reference's
  * incremental proto cache (raphtory/src/serialise/incremental.rs). */
case class StepStat(
    algo: String,
    step: Int,
    edgesScattered: Long,
    messages: Long,
    delta: Double,
    wallMs: Double)

/** Superstep bookkeeping for iterative algorithms: lineage cutting,
  * durable checkpoints, resume, and per-step metrics. Algorithms call
  * `restoreOrInit` once and `checkpoint`/`record` once per superstep; the
  * implementation decides whether state lives in executor memory
  * (LocalRunContext) or in the Icebergish catalog (graft.ckpt.CatalogRunContext)
  * from which a killed run resumes mid-iteration. */
trait RunContext {
  /** Step to resume from (0 = fresh run). */
  def startStep: Int
  /** Either the restored step-`startStep` state or the materialised init. */
  def restoreOrInit(init: DataFrame): DataFrame
  /** Persist the new state and cut its lineage; returns the state to keep
    * iterating on. Must preserve partitioning. */
  def checkpoint(state: DataFrame, step: Int): DataFrame
  def record(stat: StepStat): Unit
  def stats: Seq[StepStat]
  /** Barrier at loop end: durable implementations may overlap snapshot
    * writes with the next superstep's compute; algorithms call this once
    * after the last superstep so every commit is on disk before the run's
    * result is acted on. In-memory contexts: no-op. */
  def finish(): Unit = ()
}

/** In-memory run context: localCheckpoint (executor-memory snapshot,
  * lineage truncated, hash partitioning preserved) + in-process metrics.
  * Per-superstep checkpoints are LAZY: every superstep loop follows the
  * checkpoint with a full-scan aggregate action (delta / convergence
  * check), which materialises the snapshot in the SAME Spark job — one job
  * per superstep instead of two, halving the fixed scheduling+driver cost
  * that dominates small supersteps at high core counts. */
class LocalRunContext extends RunContext {
  private val buf = ArrayBuffer.empty[StepStat]
  override def startStep: Int = 0
  override def restoreOrInit(init: DataFrame): DataFrame = init.localCheckpoint(true)
  override def checkpoint(state: DataFrame, step: Int): DataFrame = state.localCheckpoint(false)
  override def record(stat: StepStat): Unit = buf.synchronized { buf += stat }
  override def stats: Seq[StepStat] = buf.toSeq
}

object RunContext {
  def none: RunContext = new LocalRunContext
}
