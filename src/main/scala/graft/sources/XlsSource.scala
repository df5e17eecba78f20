package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Legacy Excel (.xls, BIFF8) multi-sheet source — completes the
  * reference's `*.xls*` acceptance (`/root/reference/adffunction/
  * __init__.py:97-101` filters `.xls` case-insensitively and
  * `SharedCode/HelperFunction.py:20` opens it with xlrd). Same Spark shape
  * as [[ExcelSource]]: files distributed via `binaryFile`, parsed
  * per-partition with JDK-only primitives, one row per sheet row with the
  * identical `(file, sheet, row_idx, cells)` schema and cell rendering.
  * The rendering contract is the REPO's xlsx contract (`str(float)`
  * numerics, `True`/`False` bools, `#DIV/0!`-style error literals) so the
  * two in-repo sources are mutually consistent; note xlrd's raw
  * `row_values` would instead surface bools as 1.0/0.0 and errors as
  * numeric codes — the reference pipeline stringifies those differently.
  *
  * Two public formats are parsed from scratch:
  *  - the OLE2/CFB compound container ([MS-CFB]): header → DIFAT → FAT →
  *    directory → the `Workbook` stream, including the mini-FAT path for
  *    streams under the 4096-byte cutoff;
  *  - the BIFF8 record stream ([MS-XLS]): globals substream (BOF,
  *    BOUNDSHEET, SST with CONTINUE splits) then one worksheet substream
  *    per sheet (LABELSST / NUMBER / RK / MULRK / LABEL / BOOLERR /
  *    FORMULA+STRING / BLANK / MULBLANK).
  *
  * BIFF5/7 workbooks (a `Book` stream, no `Workbook`) are rejected with a
  * clear error rather than misparsed.
  *
  * Scale: identical to ExcelSource — one task per workbook; a folder of
  * thousands of legacy files parallelizes per-file, the reference's own
  * unit of work.
  */
object XlsSource {

  def read(spark: SparkSession, path: String, sheets: String = "all"): DataFrame = {
    ExcelSource.guardInputSizes(spark, path, ".xls")
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.[xX][lL][sS]")
      .load(path)
      .select(col("path"), col("content"))
    val enc = org.apache.spark.sql.Encoders.row(ExcelSource.Schema)
    bin.flatMap { r =>
      val file = r.getString(0)
      val bytes = r.getAs[Array[Byte]](1)
      parseWorkbook(bytes, sheets).map { case (sheet, idx, cells) =>
        Row(file, sheet, idx, cells)
      }
    }(enc)
  }

  /** Sheet-row iterator over one workbook's bytes (ExcelSource contract). */
  def parseWorkbook(bytes: Array[Byte], sheets: String): Seq[(String, Int, Seq[String])] = {
    val wb = cfbStream(bytes, "Workbook").getOrElse {
      if (cfbStream(bytes, "Book").isDefined)
        throw new IllegalArgumentException(
          "BIFF5/BIFF7 .xls (a 'Book' stream) is not supported — only BIFF8 " +
            "(Excel 97+, a 'Workbook' stream). Re-save the file in Excel 97+ or xlsx.")
      throw new IllegalArgumentException(
        "not an Excel BIFF8 workbook: no 'Workbook' stream in the OLE2 container")
    }
    val records = readRecords(wb)
    val sst = parseSstFrom(wb, records)
    val bounds = parseBoundsheets(wb, records)
    val selected =
      if (sheets == "all") bounds
      else {
        val want = sheets.split(",").map(_.trim).toSet
        bounds.filter { case (n, _) => want.contains(n) }
      }
    selected.flatMap { case (name, off) =>
      parseSheet(wb, off, sst).zipWithIndex.map { case (cells, i) => (name, i, cells) }
    }
  }

  // ---------------------------------------------------------------- OLE2

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  private def u16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    u16(b, o) | (u16(b, o + 2) << 16)
  private def u32(b: Array[Byte], o: Int): Long = i32(b, o) & 0xFFFFFFFFL
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL

  /** Read the named stream out of a CFB compound file, if present. */
  private[sources] def cfbStream(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    if (bytes.length < 512 ||
        u32(bytes, 0) != 0xE011CFD0L || u32(bytes, 4) != 0xE11AB1A1L)
      throw new IllegalArgumentException(
        "not an OLE2 compound file (bad magic) — is this really a .xls workbook?")
    val sectorShift = u16(bytes, 30)
    val sectorSize = 1 << sectorShift
    val miniShift = u16(bytes, 32)
    val miniSize = 1 << miniShift
    val firstDirSector = u32(bytes, 48)
    val miniCutoff = u32(bytes, 56)
    val firstMiniFat = u32(bytes, 60)
    val firstDifat = u32(bytes, 68)

    def sectorAt(id: Long): Int = ((id + 1) << sectorShift).toInt

    // DIFAT: 109 FAT sector ids in the header + chained DIFAT sectors.
    val fatSectors = mutable.ArrayBuffer[Long]()
    (0 until 109).foreach { i =>
      val s = u32(bytes, 76 + i * 4)
      if (s != FreeSect && s != EndOfChain) fatSectors += s
    }
    var difat = firstDifat
    val perDifat = sectorSize / 4 - 1
    var guard = 0
    while (difat != EndOfChain && difat != FreeSect && guard < 100000) {
      val base = sectorAt(difat)
      (0 until perDifat).foreach { i =>
        val s = u32(bytes, base + i * 4)
        if (s != FreeSect && s != EndOfChain) fatSectors += s
      }
      difat = u32(bytes, base + perDifat * 4)
      guard += 1
    }
    // FAT as a flat next-pointer table indexed by sector id.
    val perFat = sectorSize / 4
    val fat = new Array[Long](fatSectors.length * perFat)
    fatSectors.zipWithIndex.foreach { case (fs, i) =>
      val base = sectorAt(fs)
      (0 until perFat).foreach { j =>
        // corrupt DIFAT entries can point past EOF — treat as end-of-chain
        // so a truncated file degrades to short reads, not a raw AIOOBE
        fat(i * perFat + j) =
          if (base + j * 4 + 4 <= bytes.length) u32(bytes, base + j * 4) else EndOfChain
      }
    }

    def chain(start: Long): Seq[Long] = {
      val out = mutable.ArrayBuffer[Long]()
      var s = start
      var g = 0
      while (s != EndOfChain && s != FreeSect && g < fat.length + 1) {
        out += s
        s = if (s < fat.length) fat(s.toInt) else EndOfChain
        g += 1
      }
      out.toSeq
    }

    /** Clamped sector copy: a truncated file yields short data (the BIFF
      * record scanner stops gracefully) rather than an out-of-bounds crash.
      */
    def writeSector(out: java.io.ByteArrayOutputStream, src: Array[Byte],
        base: Int, len: Int): Unit =
      if (base >= 0 && base < src.length)
        out.write(src, base, math.min(len, src.length - base))

    def readChain(start: Long, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start).foreach(s => writeSector(out, bytes, sectorAt(s), sectorSize))
      val raw = out.toByteArray
      // a corrupt directory size can exceed the chain's actual bytes —
      // never allocate past what the file really holds
      java.util.Arrays.copyOf(raw, math.min(size, raw.length.toLong).toInt)
    }

    // Directory entries are 128 bytes through the directory chain.
    val dir = {
      val out = new java.io.ByteArrayOutputStream()
      chain(firstDirSector).foreach(s => writeSector(out, bytes, sectorAt(s), sectorSize))
      out.toByteArray
    }
    case class Entry(name: String, objType: Int, start: Long, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64) // bytes incl. UTF-16 null terminator
      val n = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(n, u8(dir, o + 66), u32(dir, o + 116), u32(dir, o + 120))
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("OLE2 container has no root directory entry"))

    entries.find(e => e.objType == 2 && e.name == name).map { e =>
      if (e.size >= miniCutoff) readChain(e.start, e.size)
      else {
        // mini stream: 64-byte sectors inside the root entry's chain,
        // mapped by the mini-FAT.
        val miniStream = readChain(root.start, root.size)
        val miniFat = {
          val out = new java.io.ByteArrayOutputStream()
          chain(firstMiniFat).foreach(s => writeSector(out, bytes, sectorAt(s), sectorSize))
          out.toByteArray
        }
        val out = new java.io.ByteArrayOutputStream()
        var s = e.start
        var g = 0
        while (s != EndOfChain && s != FreeSect && g < miniFat.length / 4 + 1) {
          writeSector(out, miniStream, (s * miniSize).toInt, miniSize)
          s = if (s.toInt * 4 + 4 <= miniFat.length) u32(miniFat, s.toInt * 4) else EndOfChain
          g += 1
        }
        val raw = out.toByteArray
        java.util.Arrays.copyOf(raw, math.min(e.size, raw.length.toLong).toInt)
      }
    }
  }

  // ---------------------------------------------------------------- BIFF

  /** (id, dataOffset, dataLen) for every record in the stream. A record
    * whose declared length runs past the stream end (truncated file) stops
    * the scan instead of letting parsers read out of bounds.
    */
  private def readRecords(wb: Array[Byte]): Seq[(Int, Int, Int)] = {
    val out = mutable.ArrayBuffer[(Int, Int, Int)]()
    var o = 0
    while (o + 4 <= wb.length) {
      val id = u16(wb, o)
      val len = u16(wb, o + 2)
      if (id == 0 || o + 4 + len > wb.length) o = wb.length
      else { out += ((id, o + 4, len)); o += 4 + len }
    }
    out.toSeq
  }

  private val RcBof = 0x0809
  private val RcEof = 0x000A
  private val RcContinue = 0x003C
  private val RcSst = 0x00FC
  private val RcBoundsheet = 0x0085
  private val RcLabelSst = 0x00FD
  private val RcNumber = 0x0203
  private val RcRk = 0x027E
  private val RcMulRk = 0x00BD
  private val RcLabel = 0x0204
  private val RcBoolErr = 0x0205
  private val RcFormula = 0x0006
  private val RcString = 0x0207
  private val RcBlank = 0x0201
  private val RcMulBlank = 0x00BE

  /** xlrd-compatible error literals for BIFF error codes (shared with the
    * typed writers via [[Cell.ErrorLiteral]]).
    */
  private val ErrorText = Cell.ErrorLiteral

  /** Bool rendering per the repo's xlsx contract (ExcelSource `t="b"` →
    * `True`/`False`); xlrd's raw row_values would give 1.0/0.0 instead.
    */
  private def boolText(v: Int): String = if (v == 1) "True" else "False"

  /** XLUnicodeString body: grbit byte at `grbitOff`, then `cch` chars —
    * wide UTF-16LE or compressed Latin-1 per the fHighByte bit. `maxBytes`
    * caps the char read at the record boundary. Shared by BOUNDSHEET
    * names, LABEL cells, and FORMULA STRING results.
    */
  private def xlString(wb: Array[Byte], cch: Int, grbitOff: Int, maxBytes: Int): String =
    if ((u8(wb, grbitOff) & 1) != 0)
      new String(wb, grbitOff + 1, math.min(cch * 2, maxBytes),
        java.nio.charset.StandardCharsets.UTF_16LE)
    else
      new String(wb, grbitOff + 1, math.min(cch, maxBytes),
        java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Sheet names + absolute BOF offsets from BOUNDSHEET records, in
    * declared order (mirrors the xlsx sheet-order contract).
    */
  private def parseBoundsheets(wb: Array[Byte], records: Seq[(Int, Int, Int)]): Seq[(String, Int)] =
    records.collect { case (RcBoundsheet, o, len) =>
      // ShortXLUnicodeString: cch u8, grbit u8, chars
      (xlString(wb, u8(wb, o + 6), o + 7, len - 8), i32(wb, o))
    }

  /** SST: shared strings, split across CONTINUE records at character
    * boundaries. A cursor over the record+continuation segments re-reads
    * the per-segment grbit byte when a string's characters resume in a
    * new segment ([MS-XLS] 2.5.293: each continued chunk restates its own
    * fHighByte).
    */
  private def parseSstFrom(wb: Array[Byte], records: Seq[(Int, Int, Int)]): Vector[String] = {
    val idx = records.indexWhere(_._1 == RcSst)
    if (idx < 0) return Vector.empty
    val segs = mutable.ArrayBuffer[(Int, Int)]()
    segs += ((records(idx)._2, records(idx)._3))
    var j = idx + 1
    while (j < records.length && records(j)._1 == RcContinue) {
      segs += ((records(j)._2, records(j)._3)); j += 1
    }
    var seg = 0
    var off = 0
    def remaining: Int = segs(seg)._2 - off
    def nextSeg(): Unit = { seg += 1; off = 0 }
    def ensure(): Unit = { while (remaining == 0 && seg + 1 < segs.length) nextSeg() }
    def rdU8(): Int = { ensure(); val v = u8(wb, segs(seg)._1 + off); off += 1; v }
    // multi-byte header fields assemble BYTE-WISE through the cursor: a
    // field that straddles a CONTINUE boundary (malformed but possible)
    // must continue in the next segment, not silently consume the next
    // record's 4-byte header as data
    def rdU16(): Int = { val lo = rdU8(); lo | (rdU8() << 8) }
    def rdU32(): Long = {
      val lo = rdU16().toLong; lo | (rdU16().toLong << 16)
    }
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        ensure()
        val take = math.min(left, remaining.toLong).toInt
        off += take; left -= take
        if (remaining == 0 && left > 0) nextSeg()
      }
    }
    val cstUnique = { rdU32(); rdU32() } // cstTotal skipped, keep unique
    val out = mutable.ArrayBuffer[String]()
    var i = 0L
    while (i < cstUnique && seg < segs.length) {
      val cch = rdU16()
      var grbit = rdU8()
      val fRich = (grbit & 8) != 0
      val fExt = (grbit & 4) != 0
      val cRun = if (fRich) rdU16() else 0
      val cbExt = if (fExt) rdU32() else 0L
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      var truncated = false
      while (read < cch && !truncated) {
        if (remaining == 0) {
          if (seg + 1 >= segs.length) truncated = true // ran off the last segment
          else {
            nextSeg()
            grbit = rdU8() // continued chunk restates fHighByte
          }
        }
        if (!truncated) {
          val wide = (grbit & 1) != 0
          val unit = if (wide) 2 else 1
          val canChars = math.min(cch - read, remaining / unit)
          val base = segs(seg)._1 + off
          if (wide) {
            var c = 0
            while (c < canChars) { sb.append(u16(wb, base + c * 2).toChar); c += 1 }
          } else {
            var c = 0
            while (c < canChars) { sb.append((u8(wb, base + c) & 0xFF).toChar); c += 1 }
          }
          off += canChars * unit
          read += canChars
          if (read < cch && remaining < unit) {
            if (seg + 1 < segs.length) { nextSeg(); grbit = rdU8() }
            else truncated = true // partial final char: stop rather than spin
          }
        }
      }
      skip(cRun.toLong * 4 + cbExt)
      out += sb.toString
      i += 1
    }
    out.toVector
  }

  /** One worksheet substream → dense rows of rendered string cells. */
  private def parseSheet(wb: Array[Byte], bofOff: Int, sst: Vector[String]): Seq[Seq[String]] = {
    val cells = mutable.Map[(Int, Int), String]() // (row, col) → value
    var maxRow = -1
    def put(rw: Int, colIdx: Int, v: String): Unit = {
      cells((rw, colIdx)) = v
      if (rw > maxRow) maxRow = rw
    }
    var o = bofOff
    require(u16(wb, o) == RcBof, s"BOUNDSHEET offset $bofOff is not a BOF record")
    var pendingString: Option[(Int, Int)] = None
    var done = false
    var depth = 0
    while (!done && o + 4 <= wb.length) {
      val id = u16(wb, o)
      val len = u16(wb, o + 2)
      val d = o + 4
      if (d + len > wb.length) done = true // truncated record: stop
      else id match {
        case RcBof => depth += 1
        case RcEof => depth -= 1; if (depth == 0) done = true
        case RcLabelSst =>
          put(u16(wb, d), u16(wb, d + 2), sst.lift(i32(wb, d + 6)).getOrElse(""))
        case RcNumber =>
          put(u16(wb, d), u16(wb, d + 2), ExcelSource.renderDouble(f64(wb, d + 6)))
        case RcRk =>
          put(u16(wb, d), u16(wb, d + 2), ExcelSource.renderDouble(decodeRk(u32(wb, d + 6))))
        case RcMulRk =>
          val rw = u16(wb, d)
          val colFirst = u16(wb, d + 2)
          val n = (len - 6) / 6
          (0 until n).foreach { k =>
            put(rw, colFirst + k, ExcelSource.renderDouble(decodeRk(u32(wb, d + 4 + k * 6 + 2))))
          }
        case RcLabel =>
          put(u16(wb, d), u16(wb, d + 2), xlString(wb, u16(wb, d + 6), d + 8, len - 9))
        case RcBoolErr =>
          val v = u8(wb, d + 6)
          val s = if (u8(wb, d + 7) == 0) boolText(v)
            else ErrorText.getOrElse(v, s"#ERR$v")
          put(u16(wb, d), u16(wb, d + 2), s)
        case RcFormula =>
          val rw = u16(wb, d); val c = u16(wb, d + 2)
          if (u16(wb, d + 12) == 0xFFFF) {
            val v = u8(wb, d + 8)
            u8(wb, d + 6) match {
              case 0 => pendingString = Some((rw, c)) // value in next STRING record
              case 1 => put(rw, c, boolText(v))
              case 2 => put(rw, c, ErrorText.getOrElse(v, s"#ERR$v"))
              case _ => put(rw, c, "") // cached blank
            }
          } else put(rw, c, ExcelSource.renderDouble(f64(wb, d + 6)))
        case RcString =>
          pendingString.foreach { case (rw, c) =>
            put(rw, c, xlString(wb, u16(wb, d), d + 2, len - 3))
          }
          pendingString = None
        case RcBlank =>
          put(u16(wb, d), u16(wb, d + 2), "")
        case RcMulBlank =>
          val rw = u16(wb, d)
          val colFirst = u16(wb, d + 2)
          val n = (len - 6) / 2
          (0 until n).foreach(k => put(rw, colFirst + k, ""))
        case _ =>
      }
      o = d + len
    }
    val byRow = cells.groupBy { case ((r, _), _) => r }
    (0 to maxRow).map { rw =>
      byRow.get(rw) match {
        case None => Seq.empty[String]
        case Some(m) =>
          val maxCol = m.keys.map(_._2).max
          val arr = Array.fill(maxCol + 1)("")
          m.foreach { case ((_, c), v) => arr(c) = v }
          arr.toSeq
      }
    }
  }

  /** RK value: 30-bit payload + ×0.01 flag + int-vs-double flag. */
  private[graft] def decodeRk(rk: Long): Double = {
    val base =
      if ((rk & 2) != 0) (rk.toInt >> 2).toDouble // sign-extended 30-bit int
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  // ------------------------------------------------------------- writer

  /** Minimal deterministic BIFF8 .xls writer (fixture/sink mirror of
    * [[ExcelSource.writeWorkbook]]): numeric-looking cells become NUMBER
    * records, everything else a wide-char LABEL (no SST — inline labels
    * keep the writer order-independent). The stream is wrapped in the
    * smallest valid OLE2 container ([[cfbWrap]]): streams under the
    * 4096-byte cutoff take the spec-mandated mini-stream path, larger
    * ones regular 512-byte FAT sectors — so fixtures exercise both
    * reader layouts.
    */
  def writeWorkbook(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit =
    writeWorkbookCells(path, sheets.map { case (n, rows) =>
      n -> rows.map(_.map(Cell.Text(_): Cell))
    })

  /** Typed-cell variant of [[writeWorkbook]]: bool and error cells become
    * BOOLERR records ([MS-XLS] 2.4.24: rw, col, ixfe, bBoolErr, fError) —
    * the record shape the reader's [[parseSheet]] RcBoolErr branch
    * decodes — so the 'True'/'False'/error-literal rendering contract is
    * exercised by real written workbooks (see [[Cell]]).
    */
  def writeWorkbookCells(path: String, sheets: Seq[(String, Seq[Seq[Cell]])]): Unit = {
    val bo = java.nio.ByteOrder.LITTLE_ENDIAN
    def rec(id: Int, data: Array[Byte]): Array[Byte] = {
      // BIFF8 caps record payloads at 8224 bytes; longer content needs
      // CONTINUE records, which this minimal writer does not emit — fail
      // loudly instead of wrapping the u16 length and corrupting the file
      require(data.length <= 8224,
        s"cell/record payload of ${data.length} bytes exceeds the BIFF8 " +
          "8224-byte record cap (strings up to ~4000 chars); split the cell " +
          "or use the xlsx writer for long content")
      val b = java.nio.ByteBuffer.allocate(4 + data.length).order(bo)
      b.putShort(id.toShort).putShort(data.length.toShort).put(data)
      b.array()
    }
    def bof(dt: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16).order(bo)
      b.putShort(0x0600.toShort).putShort(dt.toShort)
        .putShort(0x0DBB.toShort).putShort(0x07CC.toShort)
        .putInt(0x000000C9).putInt(0x00000206)
      rec(RcBof, b.array())
    }
    def boolErrRec(rw: Int, colIdx: Int, value: Int, fError: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8).order(bo)
      b.putShort(rw.toShort).putShort(colIdx.toShort).putShort(0.toShort)
        .put(value.toByte).put(fError.toByte)
      rec(RcBoolErr, b.array())
    }
    def cellRec(rw: Int, colIdx: Int, cell: Cell): Array[Byte] = cell match {
      case Cell.Bool(v) => boolErrRec(rw, colIdx, if (v) 1 else 0, 0)
      case Cell.Err(code) => boolErrRec(rw, colIdx, code, 1)
      case Cell.Text(v) if ExcelSource.isNumericText(v) =>
        val b = java.nio.ByteBuffer.allocate(14).order(bo)
        b.putShort(rw.toShort).putShort(colIdx.toShort).putShort(0.toShort)
          .putDouble(v.toDouble)
        rec(RcNumber, b.array())
      case Cell.Text(v) =>
        val chars = v.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
        val b = java.nio.ByteBuffer.allocate(9 + chars.length).order(bo)
        b.putShort(rw.toShort).putShort(colIdx.toShort).putShort(0.toShort)
          .putShort(v.length.toShort).put(1.toByte).put(chars)
        rec(RcLabel, b.array())
    }
    val sheetStreams = sheets.map { case (_, rows) =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      rows.zipWithIndex.foreach { case (cellsRow, ri) =>
        cellsRow.zipWithIndex.foreach { case (v, ci) => out.write(cellRec(ri, ci, v)) }
      }
      out.write(rec(RcEof, Array.empty))
      out.toByteArray
    }
    def boundsheet(name: String, pos: Int): Array[Byte] = {
      require(name.length <= 31, // Excel's own sheet-name limit; also keeps
        s"sheet name '$name' exceeds 31 chars") // the u8 cch from wrapping
      val chars = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      val b = java.nio.ByteBuffer.allocate(8 + chars.length).order(bo)
      b.putInt(pos).putShort(0.toShort)
        .put(name.length.toByte).put(1.toByte).put(chars)
      rec(RcBoundsheet, b.array())
    }
    // globals size is needed for the BOUNDSHEET offsets → two passes with
    // placeholder offsets (sizes don't change, only the u32 position field)
    def globals(positions: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0005))
      sheets.zip(positions).foreach { case ((n, _), p) => out.write(boundsheet(n, p)) }
      out.write(rec(RcEof, Array.empty))
      out.toByteArray
    }
    val globalsLen = globals(sheets.map(_ => 0)).length
    val positions = sheetStreams.scanLeft(globalsLen)(_ + _.length).init
    val wbStream = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(globals(positions))
      sheetStreams.foreach(out.write)
      out.toByteArray
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), cfbWrap(wbStream))
  }

  private val EOC = 0xFFFFFFFE // end of chain (writer-side constant)
  private val FREE = 0xFFFFFFFF

  /** Wrap one stream named `Workbook` in a minimal OLE2 container.
    * Streams ≥ 4096 bytes go in regular 512-byte FAT sectors; smaller
    * ones take the spec-mandated mini-stream path (64-byte sectors inside
    * the root entry's chain, mapped by a mini-FAT) — so both reader code
    * paths are exercised by real fixtures.
    */
  private[graft] def cfbWrap(stream: Array[Byte]): Array[Byte] = {
    val bo = java.nio.ByteOrder.LITTLE_ENDIAN
    val mini = stream.length < 4096
    // payload sectors: the stream itself (regular) or the mini-stream
    // container holding it (64-byte mini sectors padded into 512s)
    val payload =
      if (!mini) stream
      else java.util.Arrays.copyOf(stream, ((stream.length + 63) / 64) * 64)
    val nPayload = (payload.length + 511) / 512
    val nMiniFat = if (mini) 1 else 0
    // FAT sectors map every sector incl. themselves: smallest F with
    // F*128 >= 1(dir) + F + nMiniFat + nPayload
    val nFat = (1 + nMiniFat + nPayload + 126) / 127
    require(nFat <= 109,
      s"fixture workbook too large for the header DIFAT: $nFat FAT sectors (~7 MB cap)")
    val firstMiniFatSector = 1 + nFat
    val firstPayload = 1 + nFat + nMiniFat
    val nTotalSectors = 1 + nFat + nMiniFat + nPayload
    val total = java.nio.ByteBuffer
      .allocate(512 * (1 + nTotalSectors)).order(bo)
    // header
    total.putInt(0xE011CFD0).putInt(0xE11AB1A1).putLong(0L).putLong(0L)
    total.putShort(0x003E.toShort).putShort(0x0003.toShort) // minor/major
    total.putShort(0xFFFE.toShort) // byte order
    total.putShort(9.toShort).putShort(6.toShort) // sector/mini shifts
    total.put(Array.fill[Byte](6)(0))
    total.putInt(0) // num dir sectors (v3: 0)
    total.putInt(nFat)
    total.putInt(0) // first directory sector = sector 0
    total.putInt(0) // transaction
    total.putInt(4096) // mini cutoff
    total.putInt(if (mini) firstMiniFatSector else EOC) // first mini-FAT sector
    total.putInt(nMiniFat)
    total.putInt(EOC) // first DIFAT sector: none (≤109 FAT ids fit the header)
    total.putInt(0) // num DIFAT sectors
    (0 until 109).foreach(i => total.putInt(if (i < nFat) 1 + i else FREE))
    // sector 0: directory (4 × 128-byte entries)
    def dirEntry(name: String, objType: Int, start: Int, size: Int,
        child: Int = -1): Array[Byte] = {
      val e = java.nio.ByteBuffer.allocate(128).order(bo)
      val chars = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      e.put(chars)
      e.position(64)
      e.putShort(if (name.isEmpty) 0 else (chars.length + 2).toShort)
      e.put(objType.toByte)
      e.put(1.toByte) // color: black
      e.putInt(-1).putInt(-1).putInt(child) // siblings, child
      e.position(116)
      e.putInt(start)
      e.putInt(size).putInt(0)
      e.array()
    }
    if (mini) {
      // root holds the mini-stream container; Workbook addresses mini sectors
      total.put(dirEntry("Root Entry", 5, firstPayload, payload.length, child = 1))
      total.put(dirEntry("Workbook", 2, 0, stream.length))
    } else {
      total.put(dirEntry("Root Entry", 5, EOC, 0, child = 1))
      total.put(dirEntry("Workbook", 2, firstPayload, stream.length))
    }
    total.put(dirEntry("", 0, FREE, 0))
    total.put(dirEntry("", 0, FREE, 0))
    // sectors 1..nFat: the FAT, one next-pointer per sector
    (0 until nFat * 128).foreach { s =>
      total.putInt(
        if (s == 0) EOC // directory: single-sector chain
        else if (s >= 1 && s <= nFat) 0xFFFFFFFD // FATSECT markers
        else if (mini && s == firstMiniFatSector) EOC // mini-FAT chain
        else if (s >= firstPayload && s < firstPayload + nPayload)
          { if (s == firstPayload + nPayload - 1) EOC else s + 1 }
        else FREE)
    }
    // mini case: the mini-FAT — chain of 64-byte mini sectors
    if (mini) {
      val nMini = (stream.length + 63) / 64
      (0 until nMini).foreach { i =>
        total.putInt(if (i == nMini - 1) EOC else i + 1)
      }
      (nMini until 128).foreach(_ => total.putInt(FREE))
    }
    // payload sectors
    total.put(payload)
    total.array()
  }
}

