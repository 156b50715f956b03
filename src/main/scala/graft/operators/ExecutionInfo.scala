package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Q11 — execution-info / latency instrumentation: the reference's opt-in
  * per-query timing + result-count string
  * (`store/CustomQueryStore.java:103,113-117`, surfaced through
  * `QueryResponse.executionInfo`).
  *
  * Spark-native realization: an `observe()` metric riding the query (counted
  * by the executors as rows stream past — no second pass, no extra action)
  * plus wall-clock around the collect and the physical plan for inspection.
  */
object ExecutionInfo {

  final case class Info(rowCount: Long, elapsedMs: Long, plan: String) {
    /** The reference's human-readable form: "retrieved N results in X ms". */
    def render: String = s"retrieved $rowCount results in $elapsedMs ms"
  }

  /** Execute the query, returning its rows plus execution info. The row count
    * comes from an observed metric (exact, computed in-flight), the plan from
    * the same QueryExecution that ran.
    */
  def collectWithInfo(df: DataFrame, name: String = "graft_exec_info"): (Array[Row], Info) = {
    val observed = df.observe(name, count(lit(1)).as("rows"))
    val t0 = System.nanoTime()
    val rows = observed.collect()
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    val rowCount = observed.queryExecution.observedMetrics.get(name) match {
      case Some(m) => m.getAs[Long]("rows")
      case None    => rows.length.toLong // metric missing only for empty plans
    }
    (rows, Info(rowCount, elapsedMs, observed.queryExecution.executedPlan.toString))
  }
}
