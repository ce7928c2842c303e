package graft.archive

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** K6 + P16 — landing-file archival.
  *
  * Reference behavior: `move_to_archive_full_load.py:16-33` /
  * `move_to_archive_delta_load.py:16-33` — copy each processed RAWDATA file
  * to `ARCHIVE/<date-partition>/` (partition extracted from the filename by
  * regex) and delete the original. Here the copy+delete pair is a Hadoop
  * `FileSystem.rename` — atomic and metadata-only on a real filesystem or
  * HDFS, so archival cost is independent of file size.
  */
object Archive {

  private val DeltaRe = """all_day_(\d{8})[-_]\d{6}""".r.unanchored
  // 6-digit alternative first: regex alternation is ordered and unanchored,
  // so the 2-digit branch would otherwise clip "202407" to "20"
  private val FullRe = """whole_month_(\d{6}|\d{2})""".r.unanchored

  /** P16 — date partition from the filename (`move_to_archive_*_load.py:21`);
    * files matching neither pattern land in `unpartitioned/`.
    */
  def datePartition(fileName: String): String = fileName match {
    case DeltaRe(d) => d
    case FullRe(d) => d
    case _ => "unpartitioned"
  }

  /** P15 — load-mode routing predicate (`load_controller_DAG.py:6-13`). */
  def isFullLoad(fileName: String): Boolean = fileName.startsWith("whole_month_")

  /** Move every file matching `pattern` to `archiveRoot/<partition>/`.
    * Returns the destination paths.
    */
  def archiveMatching(spark: SparkSession, pattern: String,
      archiveRoot: String): Seq[String] = {
    val glob = new Path(pattern)
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(glob)).getOrElse(Array.empty).toSeq.map { st =>
      val name = st.getPath.getName
      val dest = new Path(s"$archiveRoot/${datePartition(name)}/$name")
      fs.mkdirs(dest.getParent)
      require(fs.rename(st.getPath, dest), s"archive rename failed: ${st.getPath} -> $dest")
      dest.toString
    }
  }
}
