package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fixture precondition for the multimodal pack (ADVICE r3,
  * Multimodal.scala): q45/q64/q65 compute over UTF-8 BYTES on the
  * Spark side while their DuckDB oracles index CHARS — the two only
  * agree when `documents.text` is pure ASCII (1 byte == 1 char). DuckDB
  * has no byte-of-blob accessor, so the oracle cannot express the byte
  * semantics directly; this spec makes the ASCII precondition an
  * enforced invariant instead of a silent assumption. If a non-ASCII
  * corpus ever ships, this fails loudly before the hash gate diverges.
  */
class MultimodalFixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-fixture-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d, "documents.parquet").exists())

  test("at least one scale factor is present to check") {
    assert(sfDirs.nonEmpty)
  }

  // ---- q252 decode kernel on crafted rasters ----------------------
  // aHashBands decodes the payload as an 8-column grayscale raster
  // (H = len div 8 complete rows) and block-averages to 8×8. These
  // rasters have hand-computable hashes, pinning the decode path —
  // not just the banding plumbing — to known pixel geometry.

  test("q252 aHash: top-half dark / bottom-half bright raster") {
    // 16 full rows: rows 0-7 are 0x00, rows 8-15 are 0xFF. Cells in
    // hash rows 0-3 average 0, rows 4-7 average 255; mean = 127 →
    // bits 0..31 clear, bits 32..63 set → bands (0, 0, 0xFFFF, 0xFFFF).
    val bytes = Array.fill(64)(0.toByte) ++ Array.fill(64)(0xFF.toByte)
    assert(graft.operators.Multimodal.aHashBands(bytes).toSeq ==
      Seq(0L, 0L, 0xFFFFL, 0xFFFFL))
  }

  test("q252 aHash: vertical stripe raster (odd columns bright)") {
    // every row = 0,255,0,255,... : each cell is exactly its column
    // value; mean = 127 → bit pattern 0b1010101010101010 per hash row.
    val row = Array.tabulate(8)(c => if (c % 2 == 1) 0xFF.toByte else 0.toByte)
    val bytes = Array.fill(16)(row).flatten
    assert(graft.operators.Multimodal.aHashBands(bytes).toSeq ==
      Seq(0xAAAAL, 0xAAAAL, 0xAAAAL, 0xAAAAL))
  }

  test("q252 aHash: partial trailing row is cropped, not decoded") {
    // identical raster, one with 5 trailing slack bytes — a codec
    // honors declared dims, so the hash must not change
    val base = Array.tabulate(128)(i => (i * 7 % 251).toByte)
    val slack = base ++ Array.fill(5)(0x55.toByte)
    assert(graft.operators.Multimodal.aHashBands(base).toSeq ==
      graft.operators.Multimodal.aHashBands(slack).toSeq)
  }

  test("q252 aHash: uneven row blocks average independently (H=10)") {
    // H = 10 rows: hash row r covers raster rows [r·10/8,(r+1)·10/8)
    // — blocks of 1 or 2 rows (r=3 gets rows 3-4, r=7 gets rows 8-9).
    // Raster row 0 is all 200, rows 1-9 all 8 → hash row 0 averages
    // 200, the rest 8; mean = (8·200 + 56·8)/64 = 32 → only hash
    // row 0's cells exceed it → band 1 = 0x00FF, bands 2-4 = 0.
    val bytes = (Array.fill(8)(200.toByte) ++ Array.fill(72)(8.toByte))
    assert(graft.operators.Multimodal.aHashBands(bytes).toSeq ==
      Seq(0xFFL, 0L, 0L, 0L))
  }

  // ---- q64 frame-decode kernel on crafted streams ------------------
  // frameLumas decodes consecutive 64-byte frames to integer mean
  // luma; these streams have hand-computable lumas per frame.

  test("q64 frameLumas: constant frames decode to their fill value") {
    // frame 0 all 10s, frame 1 all 200s → lumas (10, 200)
    val bytes = Array.fill(64)(10.toByte) ++ Array.fill(64)(200.toByte)
    assert(graft.operators.Multimodal.frameLumas(bytes).toSeq == Seq(10L, 200L))
  }

  test("q64 frameLumas: mean floors and trailing partial frame is cropped") {
    // frame of 32×0 + 32×255 → mean = 8160/64 = 127 (exact); 63 slack
    // bytes after it must not produce a second frame
    val bytes = (Array.fill(32)(0.toByte) ++ Array.fill(32)(0xFF.toByte)
      ++ Array.fill(63)(0x77.toByte))
    assert(graft.operators.Multimodal.frameLumas(bytes).toSeq == Seq(127L))
  }

  test("q64 frameLumas: empty stream decodes to zero frames") {
    assert(graft.operators.Multimodal.frameLumas(Array.fill(63)(1.toByte)).isEmpty)
  }

  // ---- q65 resample kernel on crafted rasters ----------------------
  // boxResize 2×2 box-averages the 8-column raster to 4 columns ×
  // H div 2 rows, integer floor per output pixel.

  test("q65 boxResize: checkerboard averages to the exact midpoint floor") {
    // rows alternate 0,255 within each 2×2 block → every output pixel
    // is (0+255+255+0)/4 = 127
    val row01 = Array.tabulate(8)(c => if (c % 2 == 0) 0.toByte else 0xFF.toByte)
    val row10 = Array.tabulate(8)(c => if (c % 2 == 0) 0xFF.toByte else 0.toByte)
    val bytes = Array(row01, row10, row01, row10).flatten
    assert(graft.operators.Multimodal.boxResize(bytes).toSeq == Seq.fill(8)(127L))
  }

  test("q65 boxResize: position is preserved, not just the pixel multiset") {
    // a single bright 2×2 block at (row 0, cols 2-3) must land at
    // output index 1 and nowhere else
    val bytes = Array.tabulate(32) { i =>
      val r = i / 8; val c = i % 8
      if (r < 2 && (c == 2 || c == 3)) 0xC8.toByte else 0.toByte
    }
    assert(graft.operators.Multimodal.boxResize(bytes).toSeq ==
      Seq(0L, 200L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("q65 boxResize: odd trailing input row is cropped") {
    // H = 5 rows → 2 output rows; the 5th raster row (all 255) is
    // slack and must not shift any average
    val base = Array.fill(32)(40.toByte)
    val odd = base ++ Array.fill(8)(0xFF.toByte)
    assert(graft.operators.Multimodal.boxResize(odd).toSeq ==
      graft.operators.Multimodal.boxResize(base).toSeq)
  }

  // ---- q45 container-header kernels --------------------------------
  // bmpCoreHeader/parseBmpCore implement the real BITMAPCOREHEADER
  // layout; these pin the byte layout itself (golden bytes), the
  // build→parse round-trip, and the quarantine reject paths.

  test("q45 bmpCoreHeader: golden byte layout (real BMP core header)") {
    val h = graft.operators.Multimodal.bmpCoreHeader(640, 480, 1000)
    assert(h.length == 26)
    assert(h(0) == 'B'.toByte && h(1) == 'M'.toByte)
    // file size LE32 = 26 + 1000 = 1026 = 0x0402
    assert((h(2) & 0xff) == 0x02 && (h(3) & 0xff) == 0x04 &&
      h(4) == 0 && h(5) == 0)
    // data offset LE32 = 26; core header size LE32 = 12
    assert((h(10) & 0xff) == 26 && h(11) == 0 && h(12) == 0 && h(13) == 0)
    assert((h(14) & 0xff) == 12 && h(15) == 0 && h(16) == 0 && h(17) == 0)
    // width 640 = 0x0280 LE16; height 480 = 0x01E0 LE16
    assert((h(18) & 0xff) == 0x80 && (h(19) & 0xff) == 0x02)
    assert((h(20) & 0xff) == 0xE0 && (h(21) & 0xff) == 0x01)
    // planes = 1, bpp = 8
    assert((h(22) & 0xff) == 1 && h(23) == 0)
    assert((h(24) & 0xff) == 8 && h(25) == 0)
  }

  test("q45 parseBmpCore: build→parse round-trips the geometry") {
    for ((w, hh) <- Seq((1, 1), (509, 3), (640, 480), (65535, 65535))) {
      val payload = graft.operators.Multimodal.bmpCoreHeader(w, hh, 7) ++
        Array.fill(7)(42.toByte)
      assert(graft.operators.Multimodal.parseBmpCore(payload) ==
        ((w.toLong, hh.toLong, 26L)))
    }
  }

  test("q45 parseBmpCore: rejects bad magic, short buffers, wrong header size") {
    val good = graft.operators.Multimodal.bmpCoreHeader(8, 8, 0)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(graft.operators.Multimodal.parseBmpCore(badMagic) == ((-1L, -1L, -1L)))
    assert(graft.operators.Multimodal.parseBmpCore(good.take(20)) ==
      ((-1L, -1L, -1L)))
    val badSize = good.clone(); badSize(14) = 40.toByte // BITMAPINFOHEADER
    assert(graft.operators.Multimodal.parseBmpCore(badSize) == ((-1L, -1L, -1L)))
  }

  for (dir <- sfDirs) {
    test(s"documents.text is pure ASCII at $dir (byte==char precondition for q45/q64/q65)") {
      // octet_length(UTF-8 bytes) == char length iff every char is ASCII
      val offenders = Tables.documents(spark, dir)
        .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
        .select(col("doc_id"))
        .limit(5)
        .collect()
      assert(offenders.isEmpty,
        s"non-ASCII documents.text rows (doc_ids ${offenders.mkString(",")}) in $dir — " +
          "q45/q64/q65 byte-indexed results would diverge from their char-indexed oracles")
    }
  }
}
