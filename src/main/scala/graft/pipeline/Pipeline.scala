package graft.pipeline

import java.sql.Timestamp

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.archive.Archive
import graft.dw.{DimBuilder, FactBuilder, Merge}
import graft.ingest.Staging
import graft.ods.{OdsTransform, PlaceParser}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
    // stage 1 — RAW → STG (truncate) + rejected side channel
    Staging.run(spark, rawPattern, wh.stg,
      s"${wh.rejected}/${insertionTs.getTime}", jobId, insertionTs.toString)

    // stage 2 — STG → typed ODS (truncate)
    OdsTransform.toOds(spark.read.parquet(wh.stg), insertionTs)
      .write.mode("overwrite").parquet(wh.ods)

    // stage 3 — region/country parse → T_ODS (truncate)
    PlaceParser.parsePlaces(spark.read.parquet(wh.ods), states, insertionTs)
      .write.mode("overwrite").parquet(wh.tOds)

    // stage 4 — star schema truncate-reload. The ODS scan and the six
    // (tiny) dimensions are cached for the stage: every dimension is
    // consumed twice — once by its own write, once as a broadcast input to
    // the fact join — and without the cache each consumption re-runs the
    // scan + distinct + number subtree.
    val tOds = spark.read.parquet(wh.tOds).persist()
    val dims = FactBuilder.buildDims(tOds)
    val byName = Map(
      "T_DIM_Network" -> dims.network,
      "T_DIM_RegionCountry" -> dims.regionCountry,
      "T_DIM_Seismic_Activity_Type" -> dims.seismicType,
      "T_DIM_magCategory" -> dims.magCategory,
      "T_DIM_depthCategory" -> dims.depthCategory,
      "T_DIM_date" -> dims.date)
    try {
      // the six dimension writes are independent of each other — submit
      // them as concurrent jobs (to different paths) instead of a
      // sequential loop; on a cluster this is the standard way to overlap
      // small sibling jobs' scheduling fixed costs
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(Future.sequence(byName.toSeq.map { case (name, df) =>
        Future(df.persist().write.mode("overwrite").parquet(wh.dim(name)))
      }), Duration.Inf)
      FactBuilder.buildFact(tOds, dims, jobId, insertionTs)
        .write.mode("overwrite").parquet(wh.fact)
    } finally {
      byName.values.foreach(_.unpersist(blocking = false))
      tOds.unpersist(blocking = false)
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
    Staging.run(spark, rawPattern, wh.stg,
      s"${wh.rejected}/${insertionTs.getTime}", jobId, insertionTs.toString)

    warehouseStages(spark, states, wh, jobId, insertionTs)

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
    */
  def warehouseStages(spark: SparkSession, states: DataFrame, wh: Warehouse,
      jobId: String, insertionTs: Timestamp): Unit = {
    // The fresh ODS frame feeds both appends and is cached. The T_ODS-shaped
    // delta slice (parsed + key-deduped against the table) feeds the T_ODS
    // append AND every stage-4 build — it is snapshotted with an EAGER
    // localCheckpoint, not persist(): appending it to wh.tOds makes Spark
    // recache-by-path every cached plan reading that path with a fresh file
    // listing, so a persisted slice would silently re-dedupe against its own
    // append and come back empty. The checkpoint truncates lineage to RDD
    // blocks with no path dependency, freezing the pre-append view.
    val freshOds = OdsTransform.toOds(spark.read.parquet(wh.stg), insertionTs)
      .dropDuplicates("ID_Event").persist()
    val delta = OdsTransform.dedupeAgainstExisting(
        PlaceParser.parsePlaces(freshOds, states, insertionTs),
        spark.read.parquet(wh.tOds).select("ID_Event"))
      .localCheckpoint()
    implicit val ec: ExecutionContext = ExecutionContext.global
    try {
      // stages 2+3 — the ODS and T_ODS appends touch different tables and
      // share only the cached freshOds: submit them as concurrent jobs
      Await.result(Future.sequence(Seq(
        Future {
          OdsTransform.dedupeAgainstExisting(freshOds,
              spark.read.parquet(wh.ods).select("ID_Event"))
            .write.mode("append").parquet(wh.ods)
        },
        Future { delta.write.mode("append").parquet(wh.tOds) })), Duration.Inf)
    } finally freshOds.unpersist(blocking = false)

    try {
      // stage 4 — incremental dims (max-key continuation) + fact MERGE,
      // all from the delta slice
      if (!delta.isEmpty) {
        val dims = FactBuilder.buildDims(delta) // value columns only matter below
        // each dim's extend-and-append touches only its own path — run the
        // six chains as concurrent jobs (same rationale as FullLoad stage 4)
        val full = Await.result(Future.sequence(wh.dimNames.map { name =>
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
              if (name == "T_DIM_date")
                DimBuilder.antiJoinNullSafe(src, existing, Seq("ID_date_ID"))
              else DimBuilder.extend(existing, src,
                dimKeys(name).map(col), dimKeys(name), dimId(name))
            fresh.write.mode("append").parquet(wh.dim(name))
            name -> spark.read.parquet(wh.dim(name))
          }
        }), Duration.Inf).toMap
        val staged = FactBuilder.buildFact(delta,
          FactBuilder.Dims(full("T_DIM_Network"), full("T_DIM_RegionCountry"),
            full("T_DIM_Seismic_Activity_Type"), full("T_DIM_magCategory"),
            full("T_DIM_depthCategory"), full("T_DIM_date")),
          jobId, insertionTs)
        Merge.mergeInto(spark, wh.fact, staged)
      }
    } finally delta.unpersist(blocking = false) // checkpoint blocks; safe no-op if none
  }
}
