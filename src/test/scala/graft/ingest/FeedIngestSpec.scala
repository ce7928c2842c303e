package graft.ingest

import java.nio.file.{Files, Path}
import java.time.LocalDateTime

import graft.archive.Archive
import org.scalatest.funsuite.AnyFunSuite

/** S5 — feed-pull branch/filename semantics (`cloud_function.py:20-31`) and
  * their agreement with the downstream routing (`load_controller_DAG.py:6-13`
  * / `move_to_archive_*_load.py:21`). Pure logic + fake transport; no
  * network.
  */
class FeedIngestSpec extends AnyFunSuite {

  test("plan: 1st of month → full previous-month query, whole_month_MM name") {
    val p = FeedIngest.plan(LocalDateTime.parse("2025-03-01T04:30:00"))
    assert(p.fileName === "whole_month_02.csv")
    assert(p.url ===
      "https://earthquake.usgs.gov/fdsnws/event/1/query?format=csv&starttime=2025-02-01")
    assert(Archive.isFullLoad(p.fileName))
  }

  test("plan: January 1st rolls the full load back to December") {
    val p = FeedIngest.plan(LocalDateTime.parse("2025-01-01T00:10:00"))
    assert(p.fileName === "whole_month_12.csv")
    assert(p.url.endsWith("starttime=2024-12-01"))
  }

  test("plan: any other day → all-day feed with timestamped delta name") {
    val p = FeedIngest.plan(LocalDateTime.parse("2025-03-02T10:20:30"))
    assert(p.fileName === "all_day_20250302-102030.csv")
    assert(p.url ===
      "https://earthquake.usgs.gov/earthquakes/feed/v1.0/summary/all_day.csv")
    assert(!Archive.isFullLoad(p.fileName))
    // archive partition extraction sees the same filename shape
    assert(Archive.datePartition(p.fileName) === "20250302")
  }

  test("ingest: writes the fetched payload under the planned landing name") {
    val dir: Path = Files.createTempDirectory("feed_ingest_spec")
    val payload = "time,latitude\n2025-03-02T00:00:00Z,10\n"
    var fetched: String = null
    val out = FeedIngest.ingest(dir.toString,
      LocalDateTime.parse("2025-03-02T10:20:30"),
      fetch = { url => fetched = url; payload.getBytes("UTF-8") })
    assert(out.getFileName.toString === "all_day_20250302-102030.csv")
    assert(Files.readString(out) === payload)
    assert(fetched.endsWith("all_day.csv"))
  }
}
