package graft.pipeline

import java.sql.Timestamp

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.archive.Archive
import graft.dw.{DimBuilder, FactBuilder, Merge}
import graft.ingest.Staging
import graft.ods.{OdsTransform, PlaceParser}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Warehouse layout: one parquet directory per layer table, mirroring the
  * reference's BigQuery datasets (STG_ds / ODS_ds / DW_ds, SURVEY §1.2).
  */
final case class Warehouse(root: String) {
  val stg: String = s"$root/stg/T_STG_day_earthquake"
  val ods: String = s"$root/ods/ods_day_earthquake"
  val tOds: String = s"$root/ods/T_ODS_day_earthquake"
  def dim(name: String): String = s"$root/dw/$name"
  val fact: String = s"$root/dw/T_FACT_Events"
  val rejected: String = s"$root/rejected"
  val archive: String = s"$root/archive"
  val runLog: String = s"$root/run_log"

  val dimNames: Seq[String] = Seq("T_DIM_Network", "T_DIM_RegionCountry",
    "T_DIM_Seismic_Activity_Type", "T_DIM_magCategory", "T_DIM_depthCategory",
    "T_DIM_date")
}

/** Stage sequencing (SURVEY §3.2): the reference's five sequential Dataflow
  * jobs collapse to function calls over DataFrames in one SparkSession; each
  * layer is still written out to preserve the layered-warehouse contract
  * (and its restartability). `Controller.run` reproduces the Airflow
  * branch: filename prefix picks the full or delta chain
  * (`load_controller_DAG.py:186-188`).
  */
object Controller {

  def run(spark: SparkSession, rawPattern: String, states: DataFrame,
      wh: Warehouse, jobId: String, insertionTs: Timestamp): Unit = {
    val newest = Staging.latestFile(spark, rawPattern)
    if (Archive.isFullLoad(newest.split('/').last))
      FullLoad.run(spark, rawPattern, states, wh, jobId, insertionTs)
    else
      DeltaLoad.run(spark, rawPattern, states, wh, jobId, insertionTs)
  }

  private[pipeline] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private[pipeline] def dimKeys(name: String): Seq[String] = name match {
    case "T_DIM_Network" => Seq("LB_NetworkSymbol")
    case "T_DIM_RegionCountry" => Seq("LB_Region", "LB_Country")
    case "T_DIM_Seismic_Activity_Type" => Seq("LB_type")
    case "T_DIM_magCategory" => Seq("LB_magCategoryName", "LB_magCategoryDescription")
    case "T_DIM_depthCategory" => Seq("LB_depthCategoryName", "LB_depthCategoryDescription")
    case "T_DIM_date" => Seq("DT_date", "LB_DayOfWeek", "ID_DayOfWeekNb",
      "ID_WeekNb", "LB_MonthName", "ID_MonthNb", "ID_Quarter", "ID_Year")
  }

  private[pipeline] def dimId(name: String): String = name match {
    case "T_DIM_Network" => "ID_Network_ID"
    case "T_DIM_RegionCountry" => "ID_RegionCountry_ID"
    case "T_DIM_Seismic_Activity_Type" => "ID_type_ID"
    case "T_DIM_magCategory" => "ID_magCategory_ID"
    case "T_DIM_depthCategory" => "ID_depthCategory_ID"
    case "T_DIM_date" => "ID_date_ID"
  }
}

/** The full-load chain: STG → ODS → place parse → DW truncate-reload →
  * archive (`load_controller_DAG.py:187`).
  */
object FullLoad {

  def run(spark: SparkSession, rawPattern: String, states: DataFrame,
      wh: Warehouse, jobId: String, insertionTs: Timestamp): Unit = {
    // stage 1 — RAW → STG (truncate) + rejected side channel; A5 counters
    // land in the run log
    val stgMetrics = Staging.run(spark, rawPattern, wh.stg,
      s"${wh.rejected}/${insertionTs.getTime}", jobId, insertionTs.toString)

    // stages 2–4 — ODS, T_ODS, six dims and the fact are all derived from
    // the just-written STG through IN-MEMORY frames (each layer persisted;
    // parquet round-trips are value-exact for these types, so the written
    // layer and the frame passed forward are identical by construction) and
    // their eight table writes are submitted as ONE batch of concurrent
    // jobs: every write is to its own path, dependencies flow through the
    // caches (block-level locking makes concurrent first materialization
    // compute-once), and the chain's wall time drops from the sum of
    // sequential write barriers to roughly its longest dependency path.
    // On a cluster this is the same standard overlap of sibling jobs'
    // scheduling fixed costs; restartability is unchanged — every layer is
    // still on disk when run() returns.
    val ods = OdsTransform.toOds(spark.read.parquet(wh.stg), insertionTs).persist()
    val tOds = PlaceParser.parsePlaces(ods, states, insertionTs).persist()
    val dims = FactBuilder.buildDims(tOds)
    val byName = Map(
      "T_DIM_Network" -> dims.network,
      "T_DIM_RegionCountry" -> dims.regionCountry,
      "T_DIM_Seismic_Activity_Type" -> dims.seismicType,
      "T_DIM_magCategory" -> dims.magCategory,
      "T_DIM_depthCategory" -> dims.depthCategory,
      "T_DIM_date" -> dims.date)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.global
      // register every persist BEFORE submitting the concurrent jobs, so no
      // future's cache lookup can race a sibling's registration
      byName.values.foreach(_.persist())
      // A5 — row counts ride the writes that run anyway via observe
      val obsTOds = Observation()
      val obsFact = Observation()
      Await.result(Future.sequence(
        // the staging metrics record is a metadata-sized append with no
        // reader in this chain — it overlaps the layer writes instead of
        // serializing between stage 1 and stage 2
        Future(RunLog.append(spark, wh.runLog, jobId, "staging",
          stgMetrics.counters, insertionTs)) +:
        Future(ods.write.mode("overwrite").parquet(wh.ods)) +:
        Future(tOds.observe(obsTOds, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(wh.tOds)) +:
        Future(FactBuilder.buildFact(tOds, dims, jobId, insertionTs)
          .observe(obsFact, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(wh.fact)) +:
        byName.toSeq.map { case (name, df) =>
          Future(df.write.mode("overwrite").parquet(wh.dim(name)))
        }), Duration.Inf)
      RunLog.append(spark, wh.runLog, jobId, "full_load", Map(
        "rows_tods_written" -> obsTOds.get("n").asInstanceOf[Long],
        "rows_fact_written" -> obsFact.get("n").asInstanceOf[Long]),
        insertionTs)
    } finally {
      byName.values.foreach(_.unpersist(blocking = false))
      tOds.unpersist(blocking = false)
      ods.unpersist(blocking = false)
    }

    // stage 5 — archive processed raw files
    Archive.archiveMatching(spark, rawPattern, wh.archive)
  }
}

/** The delta chain: STG truncate → ODS append (key dedup) → T_ODS append
  * (key dedup) → dim extension + fact MERGE → archive
  * (`load_controller_DAG.py:188`; stages per `Delta Load Scripts`).
  * A delta into an empty warehouse degenerates to a full load.
  */
object DeltaLoad {

  import Controller.{dimId, dimKeys, exists}

  def run(spark: SparkSession, rawPattern: String, states: DataFrame,
      wh: Warehouse, jobId: String, insertionTs: Timestamp): Unit = {
    // a crash mid-MERGE-swap must not masquerade as an empty warehouse —
    // that would silently rebuild from only the newest landing file
    Merge.recover(spark, wh.fact)
    if (!exists(spark, wh.fact)) {
      FullLoad.run(spark, rawPattern, states, wh, jobId, insertionTs)
      return
    }

    // stage 1 — RAW → STG (staging truncates on delta too, stg_delta_load.py:133)
    val stgMetrics = Staging.run(spark, rawPattern, wh.stg,
      s"${wh.rejected}/${insertionTs.getTime}", jobId, insertionTs.toString)
    // metadata-sized metrics append with no reader in this chain: overlap
    // the warehouse stages, but REQUIRE it durable before warehouseStages'
    // own closing 'delta_load' append — two concurrent parquet appends to
    // the same run-log directory share (and delete on commit) the same
    // <path>/_temporary, so an overlap could lose rows or fail the run
    // after the warehouse tables committed. The preRunLog barrier keeps the
    // overlap with the heavy stages and closes only the append-vs-append
    // window (FullLoad gets the same ordering from its Future.sequence).
    implicit val ec: ExecutionContext = ExecutionContext.global
    val stgLog = Future(RunLog.append(spark, wh.runLog, jobId, "staging",
      stgMetrics.counters, insertionTs))

    warehouseStages(spark, states, wh, jobId, insertionTs,
      preRunLog = () => Await.result(stgLog, Duration.Inf))
    Await.result(stgLog, Duration.Inf)

    // stage 5 — archive
    Archive.archiveMatching(spark, rawPattern, wh.archive)
  }

  /** Delta stages 2–4 (ODS/T_ODS appends, dim extension, fact MERGE),
    * reading the already-truncate-written STG layer. Shared verbatim by the
    * batch chain above and the streaming per-micro-batch delta
    * ([[graft.streaming.DeltaStream.startDeltaLoad]]), so both paths have
    * identical warehouse semantics by construction.
    *
    * Scale shape: every stage-4 build (six dim extensions, the staged fact)
    * reads the cached DELTA SLICE — the place-parsed rows this batch
    * actually appends — never a re-scan of the whole T_ODS. Dim values and
    * dates present only in older rows are already in the dimension tables
    * by induction (the full load built them from the whole table, every
    * delta extends them), so extending from the slice yields the same new
    * rows the full re-scan would, at delta cost instead of table cost; fact
    * rows for old events are untouched by the MERGE's anti-join, exactly
    * the reference's `WHEN MATCHED` contract (`dw2_delta_load2.py:101-131`
    * updates only staged keys). An empty delta (every landed event already
    * warehoused) skips dim extension and the fact MERGE outright — no
    * full-fact rewrite for a no-op batch.
    *
    * Replay safety (crash / streaming foreachBatch retry): the batch's
    * commits are ORDERED — dim appends, then the fact swap (the dim await
    * is [[Merge.atomicOverwrite]]'s `preSwap` barrier, so a visible fact
    * never references unwritten dim ids), then the T_ODS commit LAST (its
    * parquet bytes are pre-written to an invisible pending dir during
    * stage 4; the commit itself is a metadata-only rename).
    * Because the delta slice is derived from T_ODS, a rerun after a crash
    * anywhere before that final append recomputes the SAME slice (T_ODS
    * unchanged) and re-runs stage 4 idempotently: dim extension anti-joins
    * find already-appended values (their committed surrogate ids are
    * reused, max-key continuation is stable), the MERGE re-upserts the
    * same keys, and only then does T_ODS absorb the slice. A crash after
    * the T_ODS append means everything else already committed — the rerun's
    * slice is empty and the batch is a no-op. The ODS append is
    * independently idempotent (key-deduped against its own table) and free
    * to overlap. `failpoint` is a test hook injecting crashes at the
    * commit boundaries; production callers leave the default no-op.
    */
  /** `preRunLog` runs immediately before this batch's closing RunLog
    * append — the batch caller parks its concurrent 'staging' log append
    * behind it so two appends never target the run-log dir at once.
    */
  def warehouseStages(spark: SparkSession, states: DataFrame, wh: Warehouse,
      jobId: String, insertionTs: Timestamp,
      failpoint: String => Unit = _ => (),
      preRunLog: () => Unit = () => ()): Unit = {
    // The fresh ODS frame feeds both appends and is cached. The T_ODS-shaped
    // delta slice (parsed + key-deduped against the table) feeds every
    // stage-4 build AND the final T_ODS append. Its dedup side is the T_ODS
    // key set, snapshotted with an EAGER localCheckpoint up front:
    // appending to wh.tOds makes Spark recache-by-path every cached plan
    // whose scan is under that path with a fresh file listing, so a slice
    // that read T_ODS directly would re-dedupe against its own append if
    // any of its cached blocks were evicted before the append job ran.
    // Checkpointing the narrow ID list freezes the pre-append view at a
    // fraction of the cost of checkpointing the slice itself.
    val freshOds = OdsTransform.toOds(spark.read.parquet(wh.stg), insertionTs)
      .dropDuplicates("ID_Event").persist()
    val tOdsIds = spark.read.parquet(wh.tOds).select("ID_Event").localCheckpoint()
    val delta = OdsTransform.dedupeAgainstExisting(
        PlaceParser.parsePlaces(freshOds, states, insertionTs), tOdsIds)
      .persist()
    implicit val ec: ExecutionContext = ExecutionContext.global
    // stage 2 — the ODS append touches only its own table and is key-deduped
    // against it, so it is replay-safe in isolation: run it in the
    // background, overlapping all of stage 4. A5 — the appended-row count
    // rides the write via observe.
    val obsOds = Observation()
    val odsAppend = Future {
      OdsTransform.dedupeAgainstExisting(freshOds,
          spark.read.parquet(wh.ods).select("ID_Event"))
        .observe(obsOds, count(lit(1)).as("n"))
        .write.mode("append").parquet(wh.ods)
    }
    // every background write this batch started; the finally drains them all
    // so a stage-4 failure can't leave a zombie job racing a same-JVM retry
    val background = scala.collection.mutable.ArrayBuffer[Future[Unit]](odsAppend)
    try {
      // stage 4 — incremental dims (max-key continuation) + fact MERGE,
      // all from the delta slice
      if (!delta.isEmpty) {
        // Pre-write the T_ODS slice to a pending dir CONCURRENTLY with the
        // stage-4 builds; the pending dir is invisible to T_ODS readers, so
        // replay ordering is preserved while the heavy write overlaps the
        // merge instead of serializing after it. Only the metadata-only
        // rename below (Merge.commitAppend) is the post-merge commit.
        val pendingTOds = s"${wh.tOds}__pending"
        val obsTOds = Observation()
        val tOdsStage = Future {
          delta.observe(obsTOds, count(lit(1)).as("n"))
            .write.mode("overwrite").parquet(pendingTOds)
        }
        background += tOdsStage
        val dims = FactBuilder.buildDims(delta) // value columns only matter below
        // each dim's extend runs as a concurrent job (same rationale as
        // FullLoad stage 4). Each chain computes its handful of NEW rows,
        // snapshots them with an eager localCheckpoint (same recache-by-path
        // reasoning as the delta slice: the frame must survive its own
        // append), and returns the post-extension dimension as existing ∪
        // fresh IN MEMORY — content-identical to the post-append table.
        // The appends themselves START only at the merge's preSwap barrier,
        // AFTER the staged-fact tmp write has fully executed: `existing` is
        // a lazy scan of the dim path, so an append committing while the
        // fact build is still listing that path would make existing ∪ fresh
        // carry the new row TWICE — join multiplication, duplicate fact
        // rows (a real race, seen under full-suite load). Deferring the
        // tiny localCheckpoint'd appends to the barrier closes the window
        // at ~ms cost and keeps the commit order unchanged: dims durable
        // before the new fact version becomes visible.
        val chains = Await.result(Future.sequence(wh.dimNames.map { name =>
          Future {
            val existing = spark.read.parquet(wh.dim(name))
            val src = name match {
              case "T_DIM_Network" => dims.network
              case "T_DIM_RegionCountry" => dims.regionCountry
              case "T_DIM_Seismic_Activity_Type" => dims.seismicType
              case "T_DIM_magCategory" => dims.magCategory
              case "T_DIM_depthCategory" => dims.depthCategory
              case "T_DIM_date" => dims.date
            }
            // date-dim IDs are intrinsic (yyyymmdd, dw2_delta_load2.py:329-333):
            // new dates append as-is; surrogate-keyed dims continue from max id
            val fresh =
              (if (name == "T_DIM_date")
                DimBuilder.antiJoinNullSafe(src, existing, Seq("ID_date_ID"))
              else DimBuilder.extend(existing, src,
                dimKeys(name).map(col), dimKeys(name), dimId(name)))
                .localCheckpoint()
            (name, existing.unionByName(fresh), fresh)
          }
        }), Duration.Inf)
        val full = chains.map(c => c._1 -> c._2).toMap
        val staged = FactBuilder.buildFact(delta,
          FactBuilder.Dims(full("T_DIM_Network"), full("T_DIM_RegionCountry"),
            full("T_DIM_Seismic_Activity_Type"), full("T_DIM_magCategory"),
            full("T_DIM_depthCategory"), full("T_DIM_date")),
          jobId, insertionTs)
        Merge.mergeInto(spark, wh.fact, staged, preSwap = () => {
          // barrier: start the six dim appends (fact tmp write is complete,
          // no reader of the dim paths is in flight) and require them + the
          // ODS append durable before the swap
          val appends = chains.map { case (name, _, fresh) =>
            Future(fresh.write.mode("append").parquet(wh.dim(name)))
          }
          background ++= appends
          Await.result(Future.sequence(odsAppend +: appends), Duration.Inf)
          failpoint("pre-fact-swap") // dims committed, fact not yet visible
        })
        failpoint("post-merge") // fact visible, T_ODS commit not yet run
        // stage 3 — T_ODS absorbs the slice LAST: this is the commit that
        // makes the batch invisible to a replay, so everything the slice
        // feeds must already be durable. The parquet bytes were written to
        // the pending dir during stage 4; only the rename happens here.
        Await.result(tOdsStage, Duration.Inf)
        Merge.commitAppend(spark, pendingTOds, wh.tOds)
        Await.result(odsAppend, Duration.Inf)
        preRunLog()
        // A5 — all three observed writes are durable; persist the run record
        RunLog.append(spark, wh.runLog, jobId, "delta_load", Map(
          "rows_ods_appended" -> obsOds.get("n").asInstanceOf[Long],
          "rows_tods_appended" -> obsTOds.get("n").asInstanceOf[Long]),
          insertionTs)
      } else {
        Await.result(odsAppend, Duration.Inf)
        preRunLog()
        RunLog.append(spark, wh.runLog, jobId, "delta_load", Map(
          "rows_ods_appended" -> obsOds.get("n").asInstanceOf[Long],
          "rows_tods_appended" -> 0L), insertionTs)
      }
    } finally {
      // if stage 4 threw, the background writes (ODS append, pending T_ODS
      // slice) may still be running: unpersisting their source frames under
      // them — or letting a same-JVM foreachBatch retry race their commits
      // against the retry's dedup reads / pending-dir overwrite — could
      // duplicate rows. Drain them first; their own failures are secondary
      // to any in-flight primary exception.
      background.foreach { f =>
        try Await.ready(f, Duration.Inf) catch { case _: Throwable => () }
      }
      delta.unpersist(blocking = false)
      freshOds.unpersist(blocking = false)
    }
  }
}
