package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/** A5 — the per-run metric record the reference emits as Beam counters
  * (`Delta Load Scripts/ods_delta_load2.py:53,142-150`,
  * `parse_country_ods_delta_load2.py:42-43,84-85`: `rows_in` /
  * `rows_filtered` / `rows_written` per job).
  *
  * Spark-first shape: the counts come from `df.observe` metrics collected as
  * a side effect of the table writes that run anyway (zero extra scans); this
  * object only persists the driver-side scalars as a tiny long-format table
  * (`job_execution_id, stage, metric, value, insertion_ts`) so operators can
  * query load history with plain SQL — the role the reference's Dataflow job
  * metrics UI plays. One append of a handful of rows per run: metadata-cost
  * at any scale.
  *
  * Durability contract (deliberate): the run log is NOT part of the replay
  * protocol. A crash between the final T_ODS commit and this append loses
  * the batch's `delta_load` record, and the subsequent replay — whose delta
  * slice is empty because the batch already committed — logs
  * `rows_*_appended = 0` under the same job id. Operators reading history
  * should treat a zero-row delta record as "no-op OR replay of a committed
  * batch"; the warehouse tables themselves are exact either way. Promoting
  * the log into the commit path would buy nothing (the tables are the source
  * of truth) at the cost of a write barrier on every batch.
  */
object RunLog {

  def append(spark: SparkSession, path: String, jobId: String, stage: String,
      counters: Map[String, Long], insertionTs: Timestamp): Unit = {
    if (counters.isEmpty) return
    import spark.implicits._
    counters.toSeq.sortBy(_._1)
      .map { case (metric, v) => (jobId, stage, metric, v, insertionTs) }
      .toDF("job_execution_id", "stage", "metric", "value", "insertion_ts")
      .coalesce(1)
      .write.mode("append").parquet(path)
  }
}
