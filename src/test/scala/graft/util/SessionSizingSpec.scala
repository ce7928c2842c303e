package graft.util

import org.scalatest.funsuite.AnyFunSuite

class SessionSizingSpec extends AnyFunSuite {

  test("initialPartitions hits the two measured anchors: 32 at sf0.1, 256 at sf10") {
    // ~18 MB compressed (the sf0.1 dir) -> the chains' round-8 optimum
    assert(GraftSession.initialPartitions(18L << 20, 32) === 32)
    // ~300 MB compressed (the sf10 probe dir) -> the gram-shuffle shape
    assert(GraftSession.initialPartitions(300L << 20, 32) === 256)
  }

  test("initialPartitions floors at cpus, caps at 4096, rounds to powers of two") {
    assert(GraftSession.initialPartitions(0L, 32) === 32)
    assert(GraftSession.initialPartitions(-1L, 8) === 8)
    // 100 TB: capped — the launcher raises the cap with the executor count
    assert(GraftSession.initialPartitions(100L << 40, 32) === 4096)
    // monotone non-decreasing in inputBytes, always a power of two
    var prev = 0
    for (mb <- Seq(1L, 4L, 40L, 400L, 4000L, 40000L)) {
      val p = GraftSession.initialPartitions(mb << 20, 32)
      assert(p >= prev && Integer.bitCount(p) === 1)
      prev = p
    }
  }

  test("dirBytes sums a directory tree and returns 0 for a missing path") {
    val dir = java.nio.file.Files.createTempDirectory("sizing").toFile
    try {
      val sub = new java.io.File(dir, "t.parquet"); sub.mkdir()
      java.nio.file.Files.write(new java.io.File(sub, "a").toPath, Array.fill(10)(1.toByte))
      java.nio.file.Files.write(new java.io.File(dir, "b").toPath, Array.fill(5)(1.toByte))
      assert(GraftSession.dirBytes(dir.getPath) === 15L)
      assert(GraftSession.dirBytes(dir.getPath + "/nope") === 0L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
