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

  /** Driver-side size cap for [[read]] (bytes, compressed file size).
    * The parse is deliberately single-node (scaladoc above) and a .xlsx
    * deflate stream can expand 10-50x in memory — without a guard a
    * multi-GB upload would OOM the driver silently. 256 MB compressed
    * is far beyond the reference's ~10 MB interactive cap while still
    * bounding driver heap; override via the parameter for a bigger
    * driver, or land the data as CSV/Parquet for a parallel scan. */
  val DefaultMaxBytes: Long = 256L * 1024 * 1024

  def read(spark: SparkSession, path: String,
      maxBytes: Long = DefaultMaxBytes): DataFrame = {
    val size = new java.io.File(path).length()
    require(size <= maxBytes,
      s".xlsx file is $size bytes (cap $maxBytes): Xlsx.read parses on " +
        "the DRIVER (single deflate stream, no parallel scan) and a " +
        "file this size risks driver OOM - convert to CSV/Parquet for " +
        "a distributed read, or raise maxBytes explicitly")
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

  // ------------------------------------------------------------------
  // Number-format rendering — the "what Excel displays" projection.
  // Codes are ECMA-376 §18.8.30/31 (public spec); the builtin id table
  // below is the spec's Table of implied formats, restricted to the ids
  // that actually render (fractions and elapsed-time fall back to
  // General, documented on renderFormatted).
  // ------------------------------------------------------------------

  private[graft] val builtinFormats: Map[Int, String] = Map(
    0 -> "General", 1 -> "0", 2 -> "0.00", 3 -> "#,##0", 4 -> "#,##0.00",
    9 -> "0%", 10 -> "0.00%", 11 -> "0.00E+00",
    14 -> "m/d/yyyy", 15 -> "d-mmm-yy", 16 -> "d-mmm", 17 -> "mmm-yy",
    18 -> "h:mm AM/PM", 19 -> "h:mm:ss AM/PM", 20 -> "h:mm",
    21 -> "h:mm:ss", 22 -> "m/d/yy h:mm",
    37 -> "#,##0 ;(#,##0)", 38 -> "#,##0 ;[Red](#,##0)",
    39 -> "#,##0.00;(#,##0.00)", 40 -> "#,##0.00;[Red](#,##0.00)",
    45 -> "mm:ss", 49 -> "@")

  /** xf index -> format code: custom numFmts by id, then builtins,
    * else General. */
  private def readStyleFormats(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return IndexedSeq.empty
    val custom = mutable.Map.empty[Int, String]
    val xfs = mutable.ArrayBuffer.empty[Int]
    var inCellXfs = false
    withXml(zip, entry) { r =>
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              (Option(attr(r, "numFmtId")), Option(attr(r, "formatCode"))) match {
                case (Some(id), Some(code)) => custom(id.toInt) = code
                case _ =>
              }
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfs += Option(attr(r, "numFmtId")).map(_.toInt).getOrElse(0)
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ =>
        }
      }
    }
    xfs.map(id =>
      custom.getOrElse(id, builtinFormats.getOrElse(id, "General")))
      .toIndexedSeq
  }

  /** ;-sections of a format code (quote-aware split). */
  private[graft] def formatSections(code: String): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    code.foreach {
      case '"' => inQ = !inQ; sb.append('"')
      case ';' if !inQ => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    out += sb.toString
    out.toIndexedSeq
  }

  /** Strip [Red]/[$-409]/[h]-style bracket meta (display metadata, not
    * value tokens). Quote-aware: a '[' inside a quoted literal is
    * content, not meta. */
  private def stripMeta(sec: String): String = {
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < sec.length) {
      val c = sec.charAt(i)
      if (c == '"') { inQ = !inQ; sb.append(c); i += 1 }
      else if (c == '[' && !inQ) {
        val end = sec.indexOf(']', i + 1)
        i = if (end < 0) sec.length else end + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def hasDateTokens(sec: String): Boolean = {
    val bare = sec.replaceAll("\"[^\"]*\"", "")
    bare.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  /** Render a raw cell value through an Excel number-format code — the
    * display string a user sees in Excel. Supported: General; numeric
    * sections with #/0 digit patterns, thousands grouping, percent
    * scaling, quoted/escaped literals, `_x` width-space, `*x` fill
    * (dropped); scientific `0.00E+00`; up to 4 ;-sections with standard
    * sign selection; date/time tokens (y/m/d/h/s runs, AM/PM,
    * m-means-minutes next to h/s). Fractions (`?/?`) and elapsed hours
    * (`[h]`) render as General — documented gap, they have no DataFrame
    * consumer here. Values are never format-dependent ([[read]] is the
    * typed view); this is a pure display projection. */
  def renderFormatted(v: Any, code: String): String = {
    val secs = formatSections(code)
    v match {
      case null => ""
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case s: String =>
        if (secs.length >= 4) renderTextSection(s, secs(3))
        else if (stripMeta(code).contains('@')) renderTextSection(s, secs(0))
        else s
      case ts: java.sql.Timestamp => renderDateSection(ts, stripMeta(secs(0)))
      case d: Double =>
        val sec =
          if (d > 0 || secs.length == 1) secs(0)
          else if (d < 0) secs(1)
          else if (secs.length >= 3) secs(2)
          else secs(0)
        val s = stripMeta(sec)
        val trimmed = s.trim
        if (trimmed.isEmpty || trimmed.equalsIgnoreCase("General") ||
            s.contains('?'))
          renderCell(d)
        else if (hasDateTokens(s))
          renderDateSection(serialToTimestamp(d), s)
        else
          renderNumericSection(d, s, autoSign = secs.length == 1 || d > 0)
      case other => other.toString
    }
  }

  /** Text section: literals with `@` replaced by the cell string. */
  private def renderTextSection(s: String, sec0: String): String = {
    val sec = stripMeta(sec0)
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < sec.length) {
      val c = sec.charAt(i)
      if (c == '"') { inQ = !inQ; i += 1 }
      else if (inQ) { sb.append(c); i += 1 }
      else if (c == '@') { sb.append(s); i += 1 }
      else if (c == '\\' && i + 1 < sec.length) { sb.append(sec.charAt(i + 1)); i += 2 }
      else if (c == '_') { sb.append(' '); i += 2 }
      else if (c == '*') i += 2
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val monthNames = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val dayNames = Array("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  /** Date/time token rendering. Excel's `m` ambiguity (month vs minute)
    * resolves to minutes when the previous time token is an hour or the
    * next letter token is seconds; `h` is 12-hour iff the section has an
    * AM/PM marker. */
  private def renderDateSection(ts: java.sql.Timestamp, sec: String): String = {
    val ldt = ts.toLocalDateTime
    val up = sec.toUpperCase
    val hasAmPm = up.contains("AM/PM") || up.contains("A/P")
    val sb = new StringBuilder
    var i = 0
    var lastWasHour = false
    def run(cl: Char): Int = {
      var j = i
      while (j < sec.length && sec.charAt(j).toLower == cl) j += 1
      j - i
    }
    def nextTokenIsSecond(from: Int): Boolean = {
      var j = from
      while (j < sec.length && !sec.charAt(j).isLetter) j += 1
      j < sec.length && sec.charAt(j).toLower == 's'
    }
    while (i < sec.length) {
      val c = sec.charAt(i)
      val cl = c.toLower
      if (c == '"') {
        val end = sec.indexOf('"', i + 1)
        sb.append(sec.substring(i + 1, if (end < 0) sec.length else end))
        i = if (end < 0) sec.length else end + 1
      } else if (sec.regionMatches(true, i, "AM/PM", 0, 5)) {
        sb.append(if (ldt.getHour < 12) "AM" else "PM"); i += 5
      } else if (sec.regionMatches(true, i, "A/P", 0, 3)) {
        sb.append(if (ldt.getHour < 12) "A" else "P"); i += 3
      } else if (cl == 'y') {
        val n = run('y')
        sb.append(if (n >= 4) f"${ldt.getYear}%04d" else f"${ldt.getYear % 100}%02d")
        lastWasHour = false; i += n
      } else if (cl == 'm') {
        val n = run('m')
        if (lastWasHour || nextTokenIsSecond(i + n))
          sb.append(if (n >= 2) f"${ldt.getMinute}%02d" else ldt.getMinute.toString)
        else n match {
          case 1 => sb.append(ldt.getMonthValue.toString)
          case 2 => sb.append(f"${ldt.getMonthValue}%02d")
          case 3 => sb.append(monthNames(ldt.getMonthValue - 1).substring(0, 3))
          case _ => sb.append(monthNames(ldt.getMonthValue - 1))
        }
        lastWasHour = false; i += n
      } else if (cl == 'd') {
        val n = run('d')
        n match {
          case 1 => sb.append(ldt.getDayOfMonth.toString)
          case 2 => sb.append(f"${ldt.getDayOfMonth}%02d")
          case 3 => sb.append(dayNames(ldt.getDayOfWeek.getValue - 1).substring(0, 3))
          case _ => sb.append(dayNames(ldt.getDayOfWeek.getValue - 1))
        }
        lastWasHour = false; i += n
      } else if (cl == 'h') {
        val n = run('h')
        val h = if (hasAmPm) { val x = ldt.getHour % 12; if (x == 0) 12 else x }
          else ldt.getHour
        sb.append(if (n >= 2) f"$h%02d" else h.toString)
        lastWasHour = true; i += n
      } else if (cl == 's') {
        val n = run('s')
        sb.append(if (n >= 2) f"${ldt.getSecond}%02d" else ldt.getSecond.toString)
        lastWasHour = false; i += n
      } else if (c == '\\' && i + 1 < sec.length) {
        sb.append(sec.charAt(i + 1)); i += 2
      } else if (c == '_') { sb.append(' '); i += 2 }
      else if (c == '*') i += 2
      else {
        // separators (':', '/', ' ') carry the h→m adjacency; any other
        // letter token breaks it
        if (c.isLetter) lastWasHour = false
        sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Numeric section rendering: split into (prefix, digit core, suffix),
    * apply percent scaling, HALF_UP display rounding to the core's
    * decimal pattern, grouping, min-integer-digit padding, and the
    * `0.00E+00` scientific form when the suffix opens with an exponent
    * token. `autoSign` prepends '-' for negatives rendered through the
    * shared section (an explicit negative section styles the sign
    * itself, e.g. parentheses). */
  private def renderNumericSection(d: Double, sec: String,
      autoSign: Boolean): String = {
    // percent scaling: every unquoted % multiplies by 100
    var pct = 0
    var inQ = false
    sec.foreach { c =>
      if (c == '"') inQ = !inQ else if (c == '%' && !inQ) pct += 1
    }
    val scaled = math.abs(d) * math.pow(100.0, pct)
    // locate the digit core (unquoted run of #0,.)
    val coreChars = "#0,."
    var coreStart = -1
    var coreEnd = -1
    inQ = false
    var i = 0
    while (i < sec.length) {
      val c = sec.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == '\\') i += 1
      else if (!inQ && coreChars.indexOf(c) >= 0) {
        if (coreStart < 0) coreStart = i
        coreEnd = i + 1
      } else if (!inQ && coreStart >= 0 && coreChars.indexOf(c) < 0) {
        i = sec.length - 1 // core ended; literals continue in suffix
      }
      i += 1
    }
    if (coreStart < 0) // no digits anywhere: pure literal section
      return (if (autoSign && d < 0) "-" else "") + renderTextSection("", sec)
    val prefix = renderTextSection("", sec.substring(0, coreStart))
    val core = sec.substring(coreStart, coreEnd)
    var suffixRaw = sec.substring(coreEnd)
    // scientific: suffix opens with E+00 / e-0 etc.
    val expMatch = "^[Ee]([+-])(0+)".r.findFirstMatchIn(suffixRaw)
    val (body, expStr) = expMatch match {
      case Some(m) =>
        suffixRaw = suffixRaw.substring(m.end)
        val exp = if (scaled == 0.0) 0
          else math.floor(math.log10(scaled)).toInt
        val mant = if (scaled == 0.0) 0.0 else scaled / math.pow(10.0, exp)
        val sign = if (exp < 0) "-"
          else if (m.group(1) == "+") "+" else ""
        val digits = ("%0" + m.group(2).length + "d").format(math.abs(exp))
        (renderCore(mant, core), s"E$sign$digits")
      case None => (renderCore(scaled, core), "")
    }
    val suffix = renderTextSection("", suffixRaw)
    (if (autoSign && d < 0) "-" else "") + prefix + body + expStr + suffix
  }

  /** Format a non-negative value through a #/0 digit pattern. */
  private def renderCore(x: Double, core: String): String = {
    val dot = core.indexOf('.')
    val intPat = if (dot < 0) core else core.substring(0, dot)
    val decPat = if (dot < 0) "" else core.substring(dot + 1)
    val maxDec = decPat.count(c => c == '0' || c == '#')
    val minDec = decPat.count(_ == '0')
    val minInt = intPat.count(_ == '0')
    val grouping = intPat.contains(',')
    val bd = java.math.BigDecimal.valueOf(x)
      .setScale(maxDec, java.math.RoundingMode.HALF_UP)
    val plain = bd.toPlainString
    val (ip0, dp0) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case p => (plain.substring(0, p), plain.substring(p + 1))
    }
    // trim optional (#) trailing decimal zeros down to minDec
    var dp = dp0
    while (dp.length > minDec && dp.nonEmpty && dp.last == '0')
      dp = dp.substring(0, dp.length - 1)
    var ip = ip0
    while (ip.length < minInt) ip = "0" + ip
    // "#.##" renders 0.5 as ".5" (no forced integer zero)
    if (minInt == 0 && ip == "0" && dp.nonEmpty) ip = ""
    if (grouping && ip.length > 3) {
      val sb = new StringBuilder
      val off = ip.length % 3
      var j = 0
      while (j < ip.length) {
        if (j > 0 && (j - off) % 3 == 0) sb.append(',')
        sb.append(ip.charAt(j))
        j += 1
      }
      ip = sb.toString
    }
    if (dp.isEmpty) ip else s"$ip.$dp"
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

  /** A parsed cell: typed value + the style (xf) index it carried, kept
    * so the formatted view ([[readFormatted]]) can resolve its number
    * format code. */
  private final case class Cell(v: Any, style: Int)

  /** Header strings + data rows (cell = null | Double | Boolean | String),
    * padded to the widest row. Data columns beyond the header get
    * pandas-style "Unnamed: i" names (pd.read_excel keeps them; silently
    * truncating a source operator would be data loss). */
  private def readRaw(path: String): (Array[String], Seq[Array[Any]]) = {
    val (header, cells) = readRawCells(path)
    (header, cells.map(_.map(c => if (c == null) null else c.v)))
  }

  private def readRawCells(path: String): (Array[String], Seq[Array[Cell]]) = {
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
        if (h == null) s"Unnamed: $i" else renderCell(h.v)
      }.toArray
      val data = rows.tail.map { r =>
        if (r.length == width) r
        else {
          val padded = new Array[Cell](width)
          System.arraycopy(r, 0, padded, 0, r.length)
          padded
        }
      }
      (header, data)
    } finally zip.close()
  }

  /** The "what Excel displays" view: every column read as STRING, each
    * cell rendered through its style's number-format code (see
    * [[renderFormatted]]). Values themselves are never format-dependent
    * (read() is the typed view, pandas parity); this projection exists
    * for display-faithful QA/diff of spreadsheets whose formats carry
    * meaning (percentages, currency, padded ids). */
  def readFormatted(spark: SparkSession, path: String): DataFrame = {
    val fmts = {
      val zip = new ZipFile(path)
      try readStyleFormats(zip) finally zip.close()
    }
    val (header, cells) = readRawCells(path)
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data: java.util.List[Row] = new java.util.ArrayList[Row](cells.size)
    cells.foreach { r =>
      data.add(Row.fromSeq(r.map { c =>
        if (c == null) null
        else {
          val code = if (c.style >= 0 && c.style < fmts.length) fmts(c.style)
            else "General"
          renderFormatted(c.v, code)
        }
      }.toSeq))
    }
    spark.createDataFrame(data, schema)
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
      shared: IndexedSeq[String], dateStyles: Set[Int]): Seq[Array[Cell]] = {
    val rows = mutable.ArrayBuffer.empty[Array[Cell]]
    withXml(zip, entry) { r =>
      var row: mutable.ArrayBuffer[Cell] = null
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
            case "row" => row = mutable.ArrayBuffer.empty[Cell]
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
              if (v != null) row(cellCol) = Cell(v, cellStyle)
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

  /** `formats` attaches an Excel number-format code to named columns
    * (custom numFmt ids 164+, one cellXf per distinct code) — cells keep
    * their raw typed values; the code only affects display and the
    * [[readFormatted]] projection. */
  def writeSingleSheet(df: DataFrame, path: String, maxRows: Int = 100000,
      truncate: Boolean = false,
      formats: Map[String, String] = Map.empty): Unit = {
    val header = df.columns.toSeq
    // distinct custom codes -> (numFmtId 164+, cellXf index 2+)
    val customCodes = formats.values.toSeq.distinct
    val styleOfCode: Map[String, Int] =
      customCodes.zipWithIndex.map { case (c, k) => c -> (2 + k) }.toMap
    val colStyle: IndexedSeq[Int] = header.map(h =>
      formats.get(h).map(styleOfCode).getOrElse(-1)).toIndexedSeq
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
    def cell(ref: String, v: Any, style: Int): String = {
      // column format code (if any) wins; timestamps default to the
      // builtin date xf 1; plain numerics stay unstyled
      val numS = if (style >= 0) s""" s="$style"""" else ""
      val tsS = if (style >= 0) s""" s="$style"""" else """ s="1""""
      v match {
        case null => ""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case n: Byte => s"""<c r="$ref"$numS><v>$n</v></c>"""
        case n: Short => s"""<c r="$ref"$numS><v>$n</v></c>"""
        case n: Int => s"""<c r="$ref"$numS><v>$n</v></c>"""
        case n: Long => s"""<c r="$ref"$numS><v>$n</v></c>"""
        case n: Float => s"""<c r="$ref"$numS><v>$n</v></c>"""
        case n: Double => s"""<c r="$ref"$numS><v>$n</v></c>"""
        case n: java.math.BigDecimal => s"""<c r="$ref"$numS><v>$n</v></c>"""
        // style 1 = builtin date-time numFmt 22 (see stylesXml below)
        case t: java.sql.Timestamp =>
          s"""<c r="$ref"$tsS><v>${timestampToSerial(t)}</v></c>"""
        case d: java.sql.Date =>
          s"""<c r="$ref"$tsS><v>${timestampToSerial(
            java.sql.Timestamp.valueOf(d.toLocalDate.atStartOfDay))}</v></c>"""
        case t: java.time.Instant =>
          s"""<c r="$ref"$tsS><v>${timestampToSerial(
            java.sql.Timestamp.from(t))}</v></c>"""
        case s => s"""<c r="$ref" t="s"><v>${sst(s.toString)}</v></c>"""
      }
    }
    def rowXml(rn: Int, vals: Seq[Any], styled: Boolean): Unit = {
      sheet.append(s"""<row r="$rn">""")
      vals.zipWithIndex.foreach { case (v, i) =>
        sheet.append(cell(s"${colRef(i)}$rn", v,
          if (styled) colStyle(i) else -1))
      }
      sheet.append("</row>")
    }
    rowXml(1, header, styled = false)
    rows.zipWithIndex.foreach { case (r, i) =>
      rowXml(i + 2, r.toSeq, styled = true) }
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
    // date-style detection must classify it as a date style. Custom
    // column formats follow as numFmt 164+/xf 2+ (order = styleOfCode).
    val stylesXml = {
      // format codes live in an XML ATTRIBUTE: embedded quotes (e.g.
      // `0.00 "kg"`) must be entity-escaped on top of esc()'s text rules
      val custom = customCodes.zipWithIndex.map { case (c, k) =>
        s"""<numFmt numFmtId="${164 + k}" formatCode="${
          esc(c).replace("\"", "&quot;")}"/>"""
      }.mkString
      val customXfs = customCodes.zipWithIndex.map { case (_, k) =>
        s"""<xf numFmtId="${164 + k}" applyNumberFormat="1"/>"""
      }.mkString
      val numFmts = if (customCodes.isEmpty) ""
        else s"""<numFmts count="${customCodes.size}">$custom</numFmts>"""
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |$numFmts
        |<fonts count="1"><font/></fonts>
        |<fills count="1"><fill/></fills>
        |<borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>
        |<cellXfs count="${2 + customCodes.size}">
        |<xf numFmtId="0" applyNumberFormat="0"/>
        |<xf numFmtId="22" applyNumberFormat="1"/>
        |$customXfs
        |</cellXfs>
        |</styleSheet>""".stripMargin
    }
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
