package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal XML record source — JDK-only (`javax.xml.stream` StAX pull
  * parser), the same zero-dependency discipline as the Excel sources.
  * Input layout: each file is `<root><REC><f>v</f>…</REC>…</root>`;
  * `read` returns one row per `rowTag` element with the requested
  * DIRECT-child element texts as string columns (absent children stay
  * null; unknown and non-leaf children — those with nested elements —
  * are skipped structurally by depth-count). Entity escaping and
  * CDATA are the parser's job, never a regex; DTDs are disabled (XXE —
  * external entities in untrusted feeds must not resolve).
  *
  * Scale shape: `binaryFile` scan, one task per file (XML is not
  * line-splittable — the file is the parallelism unit, exactly like the
  * workbook sources); downstream transforms see ordinary string columns.
  * Typed casts are schema-on-read at the query layer.
  */
object XmlSource {

  def read(spark: SparkSession, path: String, rowTag: String,
      fields: Seq[String]): DataFrame = {
    val schema = StructType(
      StructField("file", StringType) +:
        StructField("row_idx", LongType) +:
        fields.map(StructField(_, StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val fileName = r.getString(0).split("/").last
          parseRecords(r.getAs[Array[Byte]](1), rowTag).zipWithIndex.map {
            case (rec, i) =>
              Row.fromSeq(fileName +: i.toLong +: fields.map(rec.getOrElse(_, null)))
          }
        }
      }(enc)
  }

  /** All `rowTag` records of one document as field→text maps. */
  private[graft] def parseRecords(bytes: Array[Byte], rowTag: String): Seq[Map[String, String]] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val rd = f.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[Map[String, String]]
    try {
      while (rd.hasNext) {
        rd.next()
        if (rd.isStartElement && rd.getLocalName == rowTag) {
          var rec = Map.empty[String, String]
          var done = false
          while (!done && rd.hasNext) {
            rd.next()
            if (rd.isStartElement) {
              // Walk the child to its matching end tag by depth-counting —
              // never getElementText, which throws on nested elements. A
              // child with element children is non-leaf: structurally
              // skipped, no value recorded (the documented contract).
              val name = rd.getLocalName
              val sb = new StringBuilder
              var depth = 1
              var leaf = true
              while (depth > 0 && rd.hasNext) {
                rd.next()
                if (rd.isStartElement) { depth += 1; leaf = false }
                else if (rd.isEndElement) depth -= 1
                else if (leaf && depth == 1) {
                  val t = rd.getEventType
                  import javax.xml.stream.XMLStreamConstants._
                  if (t == CHARACTERS || t == CDATA || t == SPACE ||
                      t == ENTITY_REFERENCE) sb.append(rd.getText)
                }
              }
              if (leaf) rec += name -> sb.toString
            } else if (rd.isEndElement && rd.getLocalName == rowTag) done = true
          }
          out += rec
        }
      }
    } finally rd.close()
    out.result()
  }

  /** Deterministic fixture/sink writer: one document containing `rows`
    * as `rowTag` records under `rootTag`, every value element-escaped by
    * the XMLStreamWriter (round-trips `<&>"` verbatim).
    */
  def writeXml(rootTag: String, rowTag: String,
      rows: Seq[Seq[(String, String)]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = javax.xml.stream.XMLOutputFactory.newInstance()
      .createXMLStreamWriter(bos, "UTF-8")
    w.writeStartDocument("UTF-8", "1.0")
    w.writeStartElement(rootTag)
    rows.foreach { fields =>
      w.writeStartElement(rowTag)
      fields.foreach { case (k, v) =>
        w.writeStartElement(k)
        w.writeCharacters(v)
        w.writeEndElement()
      }
      w.writeEndElement()
    }
    w.writeEndElement()
    w.writeEndDocument()
    w.close()
    bos.toByteArray
  }
}
