package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** S5 — HTTP feed ingest, the reference's only entry point outside the
  * engine (`cloud_function.py:11-41`): on the 1st of the month, download
  * the full previous-month USGS query (full load); any other day, the
  * all-day summary feed (delta load); write the payload as a landing CSV
  * whose filename prefix routes the load mode downstream
  * (`whole_month_*` / `all_day_*`, `load_controller_DAG.py:6-13` →
  * [[graft.archive.Archive.isFullLoad]]).
  *
  * Driver-side utility, not a Spark operator — it runs once per feed pull.
  * The reference's GCS upload + Airflow DAG trigger collapse to a local
  * landing-file write + the caller invoking
  * [[graft.pipeline.Controller.run]] on the same directory. The transport
  * is injectable so the branch/filename/write logic is testable offline.
  *
  * The clock is a parameter: the reference evaluates "today" in fixed
  * UTC+3 (`cloud_function.py:13-14`), so callers should pass
  * `LocalDateTime.now(ZoneOffset.ofHours(3))`.
  */
object FeedIngest {

  final case class Plan(url: String, fileName: String)

  /** Which feed to pull and what to name the landing file —
    * `cloud_function.py:20-31` verbatim semantics (month-only zero-padded
    * suffix for full loads, second-resolution timestamp for deltas).
    */
  def plan(now: LocalDateTime): Plan =
    if (now.getDayOfMonth == 1) {
      val lastMonth = now.toLocalDate.withDayOfMonth(1).minusDays(1)
      val start = lastMonth.withDayOfMonth(1) // ISO yyyy-MM-dd, as strftime('%Y-%m-%d')
      // no endtime bound — reference parity (cloud_function.py:24): the
      // "previous month" query also returns current-day events up to the
      // request instant; downstream key dedup absorbs the overlap
      Plan(
        s"https://earthquake.usgs.gov/fdsnws/event/1/query?format=csv&starttime=$start",
        f"whole_month_${lastMonth.getMonthValue}%02d.csv")
    } else {
      val ts = now.format(DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss"))
      Plan("https://earthquake.usgs.gov/earthquakes/feed/v1.0/summary/all_day.csv",
        s"all_day_$ts.csv")
    }

  /** Pull the planned feed and write it into `landingDir`; returns the
    * landing file path. Pass a fake `fetch` for offline use/testing.
    */
  def ingest(landingDir: String, now: LocalDateTime,
      fetch: String => Array[Byte] = httpFetch): Path = {
    val p = plan(now)
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    Files.write(dir.resolve(p.fileName), fetch(p.url))
  }

  /** Default transport (`requests.get` analogue, `cloud_function.py:37-39`):
    * non-200 responses fail loudly instead of landing an error page.
    */
  def httpFetch(url: String): Array[Byte] = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 200, s"Download failed: ${resp.statusCode()}")
    resp.body()
  }
}
