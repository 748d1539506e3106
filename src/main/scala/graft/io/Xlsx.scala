package graft.io

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S2 — Excel (.xlsx) source, matching `pd.read_excel`'s defaults
  * (/root/reference/app.py:150-151): first worksheet, first row as
  * header, pandas-style type inference (all-integral -> long, numeric ->
  * double, else string; blanks -> null).
  *
  * No external dependency: .xlsx is a zip of SpreadsheetML parts, parsed
  * here with `java.util.zip` + the JDK's StAX reader. Parsing is
  * DRIVER-side by design — the reference's Excel path is an interactive
  * upload capped at ~10 MB (a .xlsx is one deflate stream; there is no
  * parallel scan to be had without re-encoding), and the result enters
  * the same DataFrame pipeline as every other source. At cluster scale,
  * land data as CSV/Parquet instead; this source exists for operator
  * parity with the reference's upload path.
  *
  * Supported cell types: shared strings (t="s"), inline strings
  * (t="inlineStr"), formula-cached strings (t="str"), booleans (t="b"),
  * numbers (no t), and DATE-STYLED numerics — the style table
  * (xl/styles.xml cellXfs -> numFmt) is parsed, cells whose format is a
  * date/time format are converted from their 1900-system serial to a
  * timestamp exactly as pandas/openpyxl do (epoch 1899-12-30, which
  * absorbs Excel's phantom 1900-02-29 for modern dates).
  */
object Xlsx {

  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) = readRaw(path)
    val nCols = header.length
    // pandas-style inference per column over data rows
    val types: Seq[DataType] = (0 until nCols).map { i =>
      val vs = rows.flatMap(r => Option(r(i)))
      if (vs.isEmpty) StringType
      else if (vs.forall(_.isInstanceOf[Boolean])) BooleanType
      else if (vs.forall(_.isInstanceOf[java.sql.Timestamp])) TimestampType
      else if (vs.forall(_.isInstanceOf[Double])) {
        if (vs.forall { v =>
          val d = v.asInstanceOf[Double]
          d == math.rint(d) && math.abs(d) < ExactLongBound
        }) LongType else DoubleType
      } else StringType
    }
    val schema = StructType(header.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val data: java.util.List[Row] = new java.util.ArrayList[Row](rows.size)
    rows.foreach { r =>
      val vals = (0 until nCols).map { i =>
        (r(i), types(i)) match {
          case (null, _) => null
          case (v: Double, LongType) => v.toLong
          case (v: Double, DoubleType) => v
          case (v: Boolean, BooleanType) => v
          case (v: java.sql.Timestamp, TimestampType) => v
          case (v, StringType) => renderCell(v)
          case (v, t) => throw new IllegalStateException(s"unexpected $v: $t")
        }
      }
      data.add(Row.fromSeq(vals))
    }
    spark.createDataFrame(data, schema)
  }

  /** 1900-date-system serial -> timestamp, the pandas/openpyxl
    * convention: whole days from 1899-12-30 plus the day fraction,
    * rounded to the nearest millisecond. */
  private[graft] def serialToTimestamp(serial: Double): java.sql.Timestamp = {
    val epoch = java.time.LocalDate.of(1899, 12, 30)
    val days = math.floor(serial).toLong
    val millis = math.round((serial - days) * 86400000.0)
    val ldt = epoch.plusDays(days).atStartOfDay().plus(
      java.time.Duration.ofMillis(millis))
    java.sql.Timestamp.valueOf(ldt)
  }

  private[graft] def timestampToSerial(ts: java.sql.Timestamp): Double = {
    val epoch = java.time.LocalDate.of(1899, 12, 30).atStartOfDay()
    val d = java.time.Duration.between(epoch, ts.toLocalDateTime)
    d.toMillis / 86400000.0
  }

  /** Style index -> "is a date/time format". Builtin date numFmtIds per
    * the SpreadsheetML spec, plus custom formats whose code contains
    * date tokens (y/m/d/h/s) outside quoted literals and [] sections. */
  private def readDateStyles(zip: ZipFile): Set[Int] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return Set.empty
    val builtinDate: Set[Int] =
      ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet
    val customDate = mutable.Set.empty[Int]
    val xfFmts = mutable.ArrayBuffer.empty[Int]
    var inCellXfs = false
    withXml(zip, entry) { r =>
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              val id = Option(attr(r, "numFmtId")).map(_.toInt)
              val code = Option(attr(r, "formatCode")).getOrElse("")
              val bare = code.replaceAll("\"[^\"]*\"", "")
                .replaceAll("\\[[^\\]]*\\]", "")
              if (id.isDefined && bare.exists(c => "ymdhs".indexOf(c.toLower) >= 0))
                customDate += id.get
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmts += Option(attr(r, "numFmtId")).map(_.toInt).getOrElse(0)
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ =>
        }
      }
    }
    xfFmts.zipWithIndex.collect { case (fmt, i)
      if builtinDate.contains(fmt) || customDate.contains(fmt) => i }.toSet
  }

  /** Exactly-representable-long bound (2^53) shared by inference and all
    * integral renderings, so a value is "an exact long" consistently. */
  private val ExactLongBound = 9.007199254740992e15

  private def renderCell(v: Any): String = v match {
    case null => ""
    case d: Double if d == math.rint(d) && math.abs(d) < ExactLongBound =>
      d.toLong.toString // 3.0 -> "3", like pandas' object cast of ints
    case other => other.toString
  }

  /** Header strings + data rows (cell = null | Double | Boolean | String),
    * padded to the widest row. Data columns beyond the header get
    * pandas-style "Unnamed: i" names (pd.read_excel keeps them; silently
    * truncating a source operator would be data loss). */
  private def readRaw(path: String): (Array[String], Seq[Array[Any]]) = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val dateStyles = readDateStyles(zip)
      val sheetPath = firstSheetPath(zip)
      val entry = Option(zip.getEntry(sheetPath)).getOrElse(
        throw new IllegalArgumentException(s"$path: missing $sheetPath"))
      val rows = readSheet(zip, entry, shared, dateStyles)
      if (rows.isEmpty)
        throw new IllegalArgumentException(s"$path: empty worksheet")
      val width = rows.map(_.length).max
      val header = (0 until width).map { i =>
        val h = if (i < rows.head.length) rows.head(i) else null
        if (h == null) s"Unnamed: $i" else renderCell(h)
      }.toArray
      val data = rows.tail.map { r =>
        if (r.length == width) r
        else {
          val padded = new Array[Any](width)
          System.arraycopy(r, 0, padded, 0, r.length)
          padded
        }
      }
      (header, data)
    } finally zip.close()
  }

  /** First sheet in workbook order, resolved through the workbook rels
    * (sheet order and part names need not agree); falls back to the
    * conventional xl/worksheets/sheet1.xml. */
  private def firstSheetPath(zip: ZipFile): String = {
    val fallback = "xl/worksheets/sheet1.xml"
    val wb = zip.getEntry("xl/workbook.xml")
    val rels = zip.getEntry("xl/_rels/workbook.xml.rels")
    if (wb == null || rels == null) return fallback
    var firstRid: String = null
    withXml(zip, wb) { r =>
      while (r.hasNext && firstRid == null) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet")
          firstRid = attr(r, "id") // r:id — StAX local-name match below
      }
    }
    if (firstRid == null) return fallback
    var target: String = null
    withXml(zip, rels) { r =>
      while (r.hasNext && target == null) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            attr(r, "Id") == firstRid)
          target = attr(r, "Target")
      }
    }
    if (target == null) fallback
    else if (target.startsWith("/")) target.substring(1)
    else s"xl/$target"
  }

  /** OOXML `_xHHHH_` escape decoding (what openpyxl/POI do): cell strings
    * containing XML-1.0-invalid characters are stored escaped; decode on
    * read so the writer's [[writeSingleSheet]] round-trips them. */
  private val escapeRe = java.util.regex.Pattern.compile("_x([0-9A-Fa-f]{4})_")
  private[graft] def unescape(s: String): String = {
    if (s == null || !s.contains("_x")) return s
    val m = escapeRe.matcher(s)
    val sb = new StringBuffer
    while (m.find())
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))
    m.appendTail(sb)
    sb.toString
  }

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val out = mutable.ArrayBuffer.empty[String]
    withXml(zip, entry) { r =>
      var sb: StringBuilder = null
      var inT = false
      // rich-text runs (<r><t>...</t></r>) concatenate naturally — every
      // <t> under the <si> appends — but PHONETIC runs (<rPh>, furigana
      // annotations) also carry <t> and must be EXCLUDED: the cell value
      // is the base text only (pandas/openpyxl parity)
      var inPh = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => sb = new StringBuilder
            case "rPh" => inPh = true
            case "t" if sb != null && !inPh => inT = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inT =>
            sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" => inT = false
            case "rPh" => inPh = false
            case "si" => out += unescape(sb.toString); sb = null
            case _ =>
          }
          case _ =>
        }
      }
    }
    out.toIndexedSeq
  }

  private def readSheet(zip: ZipFile, entry: ZipEntry,
      shared: IndexedSeq[String], dateStyles: Set[Int]): Seq[Array[Any]] = {
    val rows = mutable.ArrayBuffer.empty[Array[Any]]
    withXml(zip, entry) { r =>
      var row: mutable.ArrayBuffer[Any] = null
      var cellCol = -1
      var cellType = ""
      var cellStyle = -1
      var text: StringBuilder = null
      var inV = false
      // exclude phonetic-run <t> inside inline rich strings (see
      // readSharedStrings)
      var inPh = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[Any]
            case "c" if row != null =>
              cellCol = colIndex(attr(r, "r"), row.length)
              cellType = Option(attr(r, "t")).getOrElse("")
              cellStyle = Option(attr(r, "s")).map(_.toInt).getOrElse(-1)
            case "rPh" => inPh = true
            case "v" | "t" if cellCol >= 0 && !inPh =>
              inV = true; if (text == null) text = new StringBuilder
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inV =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" | "t" => inV = false
            case "rPh" => inPh = false
            case "c" if cellCol >= 0 =>
              val raw = if (text == null) null else text.toString
              text = null
              val v: Any = if (raw == null || (raw.trim.isEmpty && cellType != "inlineStr" && cellType != "str"))
                null // empty <v/> -> blank cell, not a parse error
              else cellType match {
                case "s" =>
                  // malformed/out-of-range shared-string refs degrade to
                  // the raw text, matching the numeric-cell policy below
                  // (round 2 threw a bare IndexOutOfBounds on bad files)
                  try {
                    val idx = raw.trim.toInt
                    if (idx >= 0 && idx < shared.length) shared(idx) else raw
                  } catch { case _: NumberFormatException => raw }
                case "inlineStr" | "str" => unescape(raw)
                case "b" => raw.trim == "1"
                case "e" => raw // error cells (#DIV/0! etc.) surface as text
                case _ =>
                  // malformed numeric cells degrade to text (pandas keeps
                  // the column as object) rather than failing the read
                  try {
                    val d = raw.trim.toDouble
                    if (dateStyles.contains(cellStyle)) serialToTimestamp(d)
                    else d
                  } catch { case _: NumberFormatException => raw }
              }
              while (row.length <= cellCol) row += null
              if (v != null) row(cellCol) = v
              cellCol = -1
            case "row" if row != null =>
              rows += row.toArray; row = null
            case _ =>
          }
          case _ =>
        }
      }
    }
    rows.toSeq
  }

  /** "BC7" -> 54 (0-based); cells without an address fall back to the
    * next free position. */
  private def colIndex(ref: String, fallback: Int): Int = {
    if (ref == null) return fallback
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    if (acc == 0) fallback else acc - 1
  }

  private val xmlFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false) // no external entities
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def withXml(zip: ZipFile, entry: ZipEntry)
      (body: XMLStreamReader => Unit): Unit = {
    val in = zip.getInputStream(entry)
    val reader = xmlFactory.createXMLStreamReader(in)
    try body(reader)
    finally { reader.close(); in.close() }
  }

  private def attr(r: XMLStreamReader, local: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  // ------------------------------------------------------------------
  // Writer — minimal single-sheet workbook (shared-strings cells for
  // strings, numeric cells for numbers). Driver-side like the HTML
  // report sink: an interactive export, not a cluster write path.
  // ------------------------------------------------------------------

  def writeSingleSheet(df: DataFrame, path: String, maxRows: Int = 100000,
      truncate: Boolean = false): Unit = {
    val header = df.columns.toSeq
    // fetch one row past the cap so over-size inputs are DETECTED: silent
    // truncation is data loss (the same stance the reader takes on
    // Unnamed: i columns). Explicit opt-in via truncate=true.
    val fetched = df.limit(maxRows + 1).collect().toSeq
    val rows = if (fetched.size <= maxRows) fetched
      else if (!truncate) throw new IllegalArgumentException(
        s"writeSingleSheet: input exceeds maxRows=$maxRows; pass " +
          "truncate=true to export the first maxRows rows")
      else {
        System.err.println(
          s"[xlsx] WARNING: truncating export to first $maxRows rows")
        fetched.take(maxRows)
      }
    val sstIndex = mutable.LinkedHashMap.empty[String, Int]
    def sst(s: String): Int =
      sstIndex.getOrElseUpdate(s, sstIndex.size)
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) { val rem = (n - 1) % 26; sb.insert(0, ('A' + rem).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    // XML entity escaping + OOXML _xHHHH_ encoding for XML-1.0-ILLEGAL
    // characters (u0000-u0008 etc. — round 2 emitted them raw, which
    // produces a sharedStrings.xml both this reader and Excel reject).
    // A literal run that itself looks like an escape gets its underscore
    // encoded (_x005F_) so [[unescape]] round-trips exactly.
    def looksLikeEscape(s: String, i: Int): Boolean =
      i + 6 < s.length && s.charAt(i + 1) == 'x' && s.charAt(i + 6) == '_' &&
        (2 to 5).forall(j => Character.digit(s.charAt(i + j), 16) >= 0)
    def invalidXml(c: Char): Boolean =
      (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ||
        c == 0xFFFE.toChar || c == 0xFFFF.toChar
    def esc(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '&') sb.append("&amp;")
        else if (c == '<') sb.append("&lt;")
        else if (c == '>') sb.append("&gt;")
        else if (c == '_' && looksLikeEscape(s, i)) sb.append("_x005F_")
        else if (invalidXml(c)) sb.append(f"_x${c.toInt}%04X_")
        else sb.append(c)
        i += 1
      }
      sb.toString
    }
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(ref: String, v: Any): String = v match {
      case null => ""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
      // style 1 = builtin date-time numFmt 22 (see stylesXml below)
      case t: java.sql.Timestamp =>
        s"""<c r="$ref" s="1"><v>${timestampToSerial(t)}</v></c>"""
      case d: java.sql.Date =>
        s"""<c r="$ref" s="1"><v>${timestampToSerial(
          java.sql.Timestamp.valueOf(d.toLocalDate.atStartOfDay))}</v></c>"""
      case t: java.time.Instant =>
        s"""<c r="$ref" s="1"><v>${timestampToSerial(
          java.sql.Timestamp.from(t))}</v></c>"""
      case s => s"""<c r="$ref" t="s"><v>${sst(s.toString)}</v></c>"""
    }
    def rowXml(rn: Int, vals: Seq[Any]): Unit = {
      sheet.append(s"""<row r="$rn">""")
      vals.zipWithIndex.foreach { case (v, i) =>
        sheet.append(cell(s"${colRef(i)}$rn", v))
      }
      sheet.append("</row>")
    }
    rowXml(1, header)
    rows.zipWithIndex.foreach { case (r, i) => rowXml(i + 2, r.toSeq) }
    sheet.append("</sheetData></worksheet>")

    val sstXml = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append(s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sstIndex.size}" uniqueCount="${sstIndex.size}">""")
      sstIndex.keys.foreach(s => sb.append(s"<si><t>${esc(s)}</t></si>"))
      sb.append("</sst>")
      sb.toString
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
        |</Types>""".stripMargin
    // xf index 1 applies builtin numFmt 22 ("m/d/yy h:mm") — the reader's
    // date-style detection must classify it as a date style
    val stylesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<fonts count="1"><font/></fonts>
        |<fills count="1"><fill/></fills>
        |<borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>
        |<cellXfs count="2">
        |<xf numFmtId="0" applyNumberFormat="0"/>
        |<xf numFmtId="22" applyNumberFormat="1"/>
        |</cellXfs>
        |</styleSheet>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
        |<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
        |</Relationships>""".stripMargin

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/styles.xml", stylesXml)
      put("xl/sharedStrings.xml", sstXml)
      put("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }
}
