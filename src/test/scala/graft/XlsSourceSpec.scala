package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.sources.XlsSource

/** BIFF8 .xls reader: writer round-trips through both OLE2 layouts
  * (mini-stream and regular FAT), plus hand-crafted record streams for
  * the cell types the fixture writer doesn't emit (SST/LABELSST with
  * CONTINUE splits, RK, MULRK, BOOLERR, FORMULA+STRING, BLANK).
  */
class XlsSourceSpec extends SparkSpec {

  test("writeWorkbook round-trips via the mini-stream OLE2 path (< 4096 bytes)") {
    import spark.implicits._
    val dir = tmpDir("xls_mini")
    XlsSource.writeWorkbook(s"$dir/small.xls", Seq(
      "data" -> Seq(Seq("1", "alpha, one", "10.5"), Seq("2", "beta", "20")),
      "extra" -> Seq(Seq("3.25", "x\"y"))))
    assert(new java.io.File(s"$dir/small.xls").length() < 4096 + 2048,
      "fixture must be small enough to exercise the mini-stream")
    val rows = XlsSource.read(spark, dir, "all")
      .orderBy($"sheet", $"row_idx")
      .select($"sheet", $"cells").collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    assert(rows === Seq(
      ("data", Seq("1.0", "alpha, one", "10.5")),
      ("data", Seq("2.0", "beta", "20.0")),
      ("extra", Seq("3.25", "x\"y"))))
    // sheet selector
    val one = XlsSource.read(spark, dir, "extra")
    assert(one.select($"sheet").distinct().collect().map(_.getString(0)).toSeq
      === Seq("extra"))
  }

  test("writeWorkbook round-trips via the regular-FAT OLE2 path (>= 4096 bytes)") {
    import spark.implicits._
    val dir = tmpDir("xls_fat")
    val rows = (0 until 200).map(i => Seq(i.toString, s"name_$i", (i * 1.5).toString))
    XlsSource.writeWorkbook(s"$dir/big.xls", Seq("bulk" -> rows))
    val got = XlsSource.read(spark, dir, "all")
      .orderBy($"row_idx").select($"cells").collect().map(_.getSeq[String](0))
    assert(got.length == 200)
    assert(got(0) === Seq("0.0", "name_0", "0.0"))
    assert(got(199) === Seq("199.0", "name_199", "298.5"))
  }

  test("multi-FAT-sector container round-trips (~1 MB workbook)") {
    val dir = tmpDir("xls_multifat")
    val rows = (0 until 15000).map(i => Seq(i.toString, s"payload row $i"))
    XlsSource.writeWorkbook(s"$dir/wide.xls", Seq("bulk" -> rows))
    val size = new java.io.File(s"$dir/wide.xls").length()
    assert(size > 128 * 512, s"must exceed one FAT sector's 64KB mapping: $size")
    val got = XlsSource.parseWorkbook(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/wide.xls")), "all")
    assert(got.length == 15000)
    assert(got.head._3 === Seq("0.0", "payload row 0"))
    assert(got.last._3 === Seq("14999.0", "payload row 14999"))
  }

  // ---- hand-crafted BIFF stream covering the non-writer record types ----

  private def rec(id: Int, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(id.toShort).putShort(data.length.toShort).put(data)
    b.array()
  }
  private def le(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); f(b); b.array()
  }
  private def bof(dt: Int) = rec(0x0809, le(16) { b =>
    b.putShort(0x0600.toShort).putShort(dt.toShort)
      .putShort(0.toShort).putShort(0.toShort).putInt(0).putInt(0)
  })

  private def craftWorkbook(): Array[Byte] = {
    // SST: 3 unique strings — [0] compressed split across CONTINUE,
    // [1] wide (high-byte) chars, [2] rich-text with 1 run to skip
    val sstData = le(8 + 3 + 5) { b =>
      b.putInt(3).putInt(3) // cstTotal, cstUnique
      b.putShort(10.toShort).put(0.toByte) // cch=10, compressed
      b.put("hello".getBytes(StandardCharsets.ISO_8859_1)) // 5 of 10 chars
    }
    val continueData = le(1 + 5 + (3 + 4) + (3 + 2 + 2 + 4)) { b =>
      b.put(0.toByte) // grbit restated: still compressed
      b.put("world".getBytes(StandardCharsets.ISO_8859_1)) // remaining 5
      b.putShort(2.toShort).put(1.toByte) // [1]: cch=2, wide
      b.put("é€".getBytes(StandardCharsets.UTF_16LE))
      b.putShort(2.toShort).put(8.toByte) // [2]: cch=2, rich (1 run)
      b.putShort(1.toShort) // cRun
      b.put("ab".getBytes(StandardCharsets.ISO_8859_1))
      b.putInt(0) // the run to skip
    }
    def cell(id: Int, rw: Int, c: Int, tail: Array[Byte]): Array[Byte] =
      rec(id, le(6 + tail.length) { b =>
        b.putShort(rw.toShort).putShort(c.toShort).putShort(0.toShort).put(tail)
      })
    val sheet = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      out.write(cell(0x00FD, 0, 0, le(4)(_.putInt(0)))) // LABELSST -> helloworld
      out.write(cell(0x00FD, 0, 1, le(4)(_.putInt(1)))) // -> é€
      out.write(cell(0x00FD, 0, 2, le(4)(_.putInt(2)))) // -> ab
      // RK: int30 (1234), double (0.75), int/100 (123.45)
      out.write(cell(0x027E, 1, 0, le(4)(_.putInt((1234 << 2) | 2))))
      val dblRk = ((java.lang.Double.doubleToLongBits(0.75) >>> 32) & 0xFFFFFFFCL).toInt
      out.write(cell(0x027E, 1, 1, le(4)(_.putInt(dblRk))))
      out.write(cell(0x027E, 1, 2, le(4)(_.putInt((12345 << 2) | 2 | 1))))
      // MULRK row 2: cols 1-2 (ixfe+rk pairs, then colLast)
      out.write(rec(0x00BD, le(4 + 12 + 2) { b =>
        b.putShort(2.toShort).putShort(1.toShort)
        b.putShort(0.toShort).putInt((7 << 2) | 2)
        b.putShort(0.toShort).putInt((8 << 2) | 2)
        b.putShort(2.toShort)
      }))
      // BOOLERR: true, then #DIV/0!
      out.write(cell(0x0205, 3, 0, le(2) { b => b.put(1.toByte).put(0.toByte) }))
      out.write(cell(0x0205, 3, 1, le(2) { b => b.put(0x07.toByte).put(1.toByte) }))
      // FORMULA cached number 6.5 (flags+chn+cce zeroed, no tokens)
      out.write(cell(0x0006, 4, 0, le(8 + 2 + 4 + 2)(_.putDouble(6.5))))
      // FORMULA cached string + following STRING record "fx"
      out.write(cell(0x0006, 4, 1, le(8 + 2 + 4 + 2) { b =>
        b.put(0.toByte).put(0.toByte).putInt(0).putShort(0xFFFF.toShort)
      }))
      out.write(rec(0x0207, le(3 + 2) { b =>
        b.putShort(2.toShort).put(0.toByte)
        b.put("fx".getBytes(StandardCharsets.ISO_8859_1))
      }))
      // BLANK at row 5 → "" cell
      out.write(cell(0x0201, 5, 0, Array.empty))
      out.write(rec(0x000A, Array.empty))
      out.toByteArray
    }
    val globalsPrefix = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0005))
      out.toByteArray
    }
    def boundsheet(pos: Int) = rec(0x0085, le(6 + 2 + 5) { b =>
      b.putInt(pos).putShort(0.toShort)
      b.put(5.toByte).put(0.toByte)
      b.put("craft".getBytes(StandardCharsets.ISO_8859_1))
    })
    val sstRec = rec(0x00FC, sstData)
    val contRec = rec(0x003C, continueData)
    val eof = rec(0x000A, Array.empty)
    val globalsLen =
      globalsPrefix.length + boundsheet(0).length + sstRec.length +
        contRec.length + eof.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(globalsPrefix)
    out.write(boundsheet(globalsLen))
    out.write(sstRec)
    out.write(contRec)
    out.write(eof)
    out.write(sheet)
    out.toByteArray
  }

  test("writeWorkbookCells emits BOOLERR records the reader renders as True/False/literals") {
    import spark.implicits._
    import graft.sources.Cell
    val dir = tmpDir("xls_boolerr")
    XlsSource.writeWorkbookCells(s"$dir/typed.xls", Seq(
      "t" -> Seq(
        Seq(Cell.Bool(true), Cell.Bool(false), Cell.Text("mix")),
        Seq(Cell.Err(0x07), Cell.Err(0x2A), Cell.Err(0x00)),
        Seq(Cell.Err(0x0F), Cell.Err(0x17), Cell.Err(0x1D), Cell.Err(0x24)))))
    val rows = XlsSource.read(spark, dir, "all")
      .orderBy($"row_idx").select($"cells").as[Seq[String]].collect()
    assert(rows(0) === Seq("True", "False", "mix"))
    assert(rows(1) === Seq("#DIV/0!", "#N/A", "#NULL!"))
    assert(rows(2) === Seq("#VALUE!", "#REF!", "#NAME?", "#NUM!"))
    // invalid codes are rejected at construction, not written as garbage
    assertThrows[IllegalArgumentException](Cell.Err(0x05))
  }

  test("hand-crafted BIFF records: SST+CONTINUE, RK, MULRK, BOOLERR, FORMULA, BLANK") {
    val rows = XlsSource.parseWorkbook(XlsSource.cfbWrap(craftWorkbook()), "all")
    val bySheet = rows.map { case (s, i, c) => (s, i) -> c }.toMap
    assert(rows.forall(_._1 == "craft"))
    assert(bySheet((("craft", 0))) === Seq("helloworld", "é€", "ab"))
    assert(bySheet((("craft", 1))) === Seq("1234.0", "0.75", "123.45"))
    assert(bySheet((("craft", 2))) === Seq("", "7.0", "8.0"), "MULRK starts at col 1")
    assert(bySheet((("craft", 3))) === Seq("True", "#DIV/0!"))
    assert(bySheet((("craft", 4))) === Seq("6.5", "fx"))
    assert(bySheet((("craft", 5))) === Seq(""))
  }

  test("SST string changing encoding at a CONTINUE boundary (compressed → wide)") {
    // one string, cch=4: "ab" compressed in the SST record, "é€" wide in
    // the CONTINUE — the continued chunk's grbit switches fHighByte on
    val sst = le(8 + 3 + 2) { b =>
      b.putInt(1).putInt(1)
      b.putShort(4.toShort).put(0.toByte) // cch=4, compressed so far
      b.put("ab".getBytes(StandardCharsets.ISO_8859_1))
    }
    val cont = le(1 + 4) { b =>
      b.put(1.toByte) // restated grbit: wide from here
      b.put("é€".getBytes(StandardCharsets.UTF_16LE))
    }
    val sheet = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      out.write(rec(0x00FD, le(10) { b =>
        b.putShort(0.toShort).putShort(0.toShort).putShort(0.toShort).putInt(0)
      }))
      out.write(rec(0x000A, Array.empty))
      out.toByteArray
    }
    def boundsheet(pos: Int) = rec(0x0085, le(6 + 2 + 1) { b =>
      b.putInt(pos).putShort(0.toShort)
      b.put(1.toByte).put(0.toByte).put('s'.toByte)
    })
    val globalsLen = bof(0x0005).length + boundsheet(0).length +
      rec(0x00FC, sst).length + rec(0x003C, cont).length +
      rec(0x000A, Array.empty).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(bof(0x0005))
    out.write(boundsheet(globalsLen))
    out.write(rec(0x00FC, sst))
    out.write(rec(0x003C, cont))
    out.write(rec(0x000A, Array.empty))
    out.write(sheet)
    val rows = XlsSource.parseWorkbook(XlsSource.cfbWrap(out.toByteArray), "all")
    assert(rows === Seq(("s", 0, Seq("abé€"))))
  }

  test("randomized cell grids round-trip through BOTH writer/reader pairs (seeded)") {
    val rnd = new scala.util.Random(20260812L)
    // sample by CODE POINT (a per-code-unit pick would split the 🚀
    // surrogate pair into invalid lone surrogates no real text contains)
    val alphabets = Seq(
      "abcdefgh XYZ09._-|,;'\"\\/<>&",      // ASCII incl. XML/CSV-active chars
      "αβγδεζ héllo wörld 東京 🚀",          // wide + astral
      "0123456789.eE+-")                    // numeric-looking fragments
      .map(s => s.codePoints().toArray.map(Character.toString))
    def randomCell(): String = {
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until rnd.nextInt(12)).map(_ => a(rnd.nextInt(a.length))).mkString
    }
    def expected(v: String): String =
      if (graft.sources.ExcelSource.isNumericText(v))
        graft.sources.ExcelSource.renderDouble(v.toDouble)
      else v
    (1 to 5).foreach { trial =>
      val rows = (0 until 1 + rnd.nextInt(8)).map { _ =>
        (0 until 1 + rnd.nextInt(6)).map(_ => randomCell())
      }
      val want = rows.map(_.map(expected))
      val dir = tmpDir(s"xls_prop_$trial")
      XlsSource.writeWorkbook(s"$dir/t.xls", Seq("p" -> rows))
      val gotXls = XlsSource.parseWorkbook(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/t.xls")), "all")
        .map(_._3)
      assert(gotXls === want, s"xls trial $trial: rows=$rows")
      graft.sources.ExcelSource.writeWorkbook(s"$dir/t.xlsx", Seq("p" -> rows))
      val gotXlsx = graft.sources.ExcelSource.parseWorkbook(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/t.xlsx")), "all")
        .map(_._3)
      assert(gotXlsx === want, s"xlsx trial $trial: rows=$rows")
    }
  }

  test("SST header field straddling a CONTINUE boundary assembles byte-wise") {
    // string 1's cch u16 splits across the record boundary: low byte ends
    // the SST record, high byte opens the CONTINUE — the cursor must pull
    // the high byte from the next SEGMENT, not read the CONTINUE's own
    // 4-byte record header out of the raw stream as data
    val sst = le(8 + (3 + 2) + 1) { b =>
      b.putInt(2).putInt(2) // cstTotal, cstUnique
      b.putShort(2.toShort).put(0.toByte) // string 0: cch=2, compressed
      b.put("ab".getBytes(StandardCharsets.ISO_8859_1))
      b.put(3.toByte) // string 1: LOW byte of cch=3
    }
    val cont = le(1 + 1 + 3) { b =>
      b.put(0.toByte) // HIGH byte of cch
      b.put(0.toByte) // grbit: compressed
      b.put("xyz".getBytes(StandardCharsets.ISO_8859_1))
    }
    val sheet = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      out.write(rec(0x00FD, le(10) { b =>
        b.putShort(0.toShort).putShort(0.toShort).putShort(0.toShort).putInt(0)
      }))
      out.write(rec(0x00FD, le(10) { b =>
        b.putShort(0.toShort).putShort(1.toShort).putShort(0.toShort).putInt(1)
      }))
      out.write(rec(0x000A, Array.empty))
      out.toByteArray
    }
    def boundsheet(pos: Int) = rec(0x0085, le(6 + 2 + 1) { b =>
      b.putInt(pos).putShort(0.toShort)
      b.put(1.toByte).put(0.toByte).put('s'.toByte)
    })
    val globalsLen = bof(0x0005).length + boundsheet(0).length +
      rec(0x00FC, sst).length + rec(0x003C, cont).length +
      rec(0x000A, Array.empty).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(bof(0x0005))
    out.write(boundsheet(globalsLen))
    out.write(rec(0x00FC, sst))
    out.write(rec(0x003C, cont))
    out.write(rec(0x000A, Array.empty))
    out.write(sheet)
    val rows = XlsSource.parseWorkbook(XlsSource.cfbWrap(out.toByteArray), "all")
    assert(rows === Seq(("s", 0, Seq("ab", "xyz"))))
  }

  test("oversized workbooks fail loudly with the limit named, before any read") {
    import graft.sources.ExcelSource
    val direct = intercept[IllegalArgumentException] {
      ExcelSource.guardSize("big.xlsx", ExcelSource.MaxWorkbookBytes + 1)
    }
    assert(direct.getMessage.contains("MaxWorkbookBytes"))
    assert(direct.getMessage.contains("256 MiB"))
    // end-to-end: a sparse file over the limit trips the DRIVER-side
    // pre-scan at DataFrame construction — no executor touches the bytes
    val dir = tmpDir("xls_big")
    val raf = new java.io.RandomAccessFile(s"$dir/huge.xls", "rw")
    try raf.setLength(ExcelSource.MaxWorkbookBytes + 1) finally raf.close()
    val viaRead = intercept[IllegalArgumentException] {
      XlsSource.read(spark, dir)
    }
    assert(viaRead.getMessage.contains("MaxWorkbookBytes"))
    assert(viaRead.getMessage.contains("huge.xls"))
  }

  test("decodeRk: int30, double, and the /100 flag") {
    assert(XlsSource.decodeRk(((1234L << 2) | 2)) === 1234.0)
    assert(XlsSource.decodeRk(((-5L << 2) | 2) & 0xFFFFFFFFL) === -5.0)
    val dblBits = (java.lang.Double.doubleToLongBits(0.75) >>> 32) & 0xFFFFFFFCL
    assert(XlsSource.decodeRk(dblBits) === 0.75)
    assert(XlsSource.decodeRk(((12345L << 2) | 3) & 0xFFFFFFFFL) === 123.45)
  }

  test("truncated containers never crash: every prefix parses or rejects cleanly") {
    val dir = tmpDir("xls_trunc")
    XlsSource.writeWorkbook(s"$dir/t.xls", Seq(
      "data" -> (0 until 40).map(i => Seq(i.toString, s"row $i text", (i * 1.1).toString))))
    val full = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/t.xls"))
    // prefixes stepping through header, directory, FAT, and stream sectors
    (full.length to 0 by -997) ++ Seq(512, 513, 1024, 1536, 2048) foreach { n =>
      val cut = java.util.Arrays.copyOf(full, n)
      try {
        XlsSource.parseWorkbook(cut, "all") // partial rows are fine
        ()
      } catch {
        case _: IllegalArgumentException => () // clean rejection is fine
        case e: Throwable =>
          fail(s"truncation at $n bytes must not leak ${e.getClass.getSimpleName}: $e")
      }
    }
  }

  test("BIFF5 'Book' stream and non-OLE2 bytes fail with clear errors") {
    val biff5 = {
      // reuse the CFB wrapper but rename the stream by patching the
      // directory entry name is fiddly — simplest: a workbook whose only
      // stream is named Book via a copy of cfbWrap output with the
      // UTF-16 name patched in place
      val bytes = XlsSource.cfbWrap(Array.fill[Byte](64)(0))
      val name = "Workbook".getBytes(StandardCharsets.UTF_16LE)
      val book = ("Book".getBytes(StandardCharsets.UTF_16LE) ++
        Array.fill[Byte](name.length - 8)(0))
      // directory entry 1 starts at sector 0 (offset 512) + 128
      System.arraycopy(book, 0, bytes, 512 + 128, book.length)
      // name length field at entry+64: "Book" = 8 bytes + terminator
      bytes(512 + 128 + 64) = 10.toByte
      bytes
    }
    val e1 = intercept[IllegalArgumentException] {
      XlsSource.parseWorkbook(biff5, "all")
    }
    assert(e1.getMessage.contains("BIFF5"))
    val e2 = intercept[IllegalArgumentException] {
      XlsSource.parseWorkbook("not an ole2 file at all, just text".getBytes ++
        Array.fill[Byte](600)(0), "all")
    }
    assert(e2.getMessage.contains("OLE2"))
  }
}
