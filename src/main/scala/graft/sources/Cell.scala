package graft.sources

/** Typed workbook cell for the fixture/sink writers ([[ExcelSource.
  * writeWorkbookCells]], [[XlsSource.writeWorkbookCells]]). The reference
  * ingests whatever cell types a real workbook holds (xlrd surfaces
  * bools and formula errors, `/root/reference/SharedCode/HelperFunction
  * .py:34-42`); the string-only writers can't produce such cells, so the
  * repo's bool/error RENDERING contract ('True'/'False', xlrd's error
  * literals) was previously pinned only by hand-crafted byte fixtures.
  * This ADT lets a writer emit genuinely typed cells in BOTH formats so
  * the rendering is oracle-checked end-to-end (`q_excel_bool_err`).
  */
sealed trait Cell

object Cell {

  /** Text cell. Canonical numeric text is written as a NUMBER cell and
    * reads back via the str(float) rendering — the same contract as the
    * string-based writers ([[ExcelSource.isNumericText]]).
    */
  final case class Text(v: String) extends Cell

  /** Boolean cell: xlsx `t="b"`, BIFF8 BOOLERR with fError=0. Renders as
    * `True`/`False` (the repo's xlsx contract; xlrd's raw row_values
    * would give 1.0/0.0 — see `XlsSource.boolText`).
    */
  final case class Bool(v: Boolean) extends Cell

  /** Error cell by BIFF error code: xlsx `t="e"` stores the rendered
    * literal, BIFF8 BOOLERR (fError=1) stores the code byte. Only the
    * seven codes of [MS-XLS] 2.5.97.2 are valid.
    */
  final case class Err(code: Int) extends Cell {
    require(ErrorLiteral.contains(code),
      s"invalid BIFF error code 0x${code.toHexString}; valid: " +
        ErrorLiteral.keys.toSeq.sorted.map(c => s"0x${c.toHexString}").mkString(", "))
  }

  /** BIFF error code → xlrd-compatible literal ([MS-XLS] 2.5.97.2);
    * shared by the BIFF reader/writer and the xlsx error-cell writer.
    */
  val ErrorLiteral: Map[Int, String] = Map(
    0x00 -> "#NULL!", 0x07 -> "#DIV/0!", 0x0F -> "#VALUE!", 0x17 -> "#REF!",
    0x1D -> "#NAME?", 0x24 -> "#NUM!", 0x2A -> "#N/A")
}
