package graft

import java.nio.file.Files

import graft.io.{HtmlReport, SampleData, Sinks, Sources, Xlsx}

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("S2 xlsx roundtrip: mixed types, nulls, pandas-style inference") {
    val path = Files.createTempDirectory("graft_xlsx").resolve("t.xlsx").toString
    val df = Seq(
      (1L, Some(1.5), Some("alpha & <beta>"), Some(true)),
      (2L, None, Some("gamma"), Some(false)),
      (3L, Some(2.0), None, None))
      .toDF("id", "v", "s", "flag")
    Xlsx.writeSingleSheet(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "v", "s", "flag"))
    // integral column -> long, mixed-decimal -> double, text -> string,
    // boolean cells -> boolean (pd.read_excel inference shape)
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.schema("s").dataType.typeName == "string")
    assert(back.schema("flag").dataType.typeName == "boolean")
    val rows = back.orderBy($"id")
      .as[(Long, Option[Double], Option[String], Option[Boolean])]
      .collect().toSeq
    assert(rows == Seq(
      (1L, Some(1.5), Some("alpha & <beta>"), Some(true)),
      (2L, None, Some("gamma"), Some(false)),
      (3L, Some(2.0), None, None)))
  }

  test("S2 xlsx driver-side size guard rejects files over the cap") {
    val path = Files.createTempDirectory("graft_xlsx_cap")
      .resolve("big.xlsx").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    Xlsx.writeSingleSheet(df, path)
    val size = new java.io.File(path).length()
    // a cap below the file size must refuse with the CSV/Parquet pointer
    val e = intercept[IllegalArgumentException] {
      Xlsx.read(spark, path, maxBytes = size - 1)
    }
    assert(e.getMessage.contains("CSV/Parquet"))
    // at or above the size it reads fine
    assert(Xlsx.read(spark, path, maxBytes = size).count() == 2)
  }

  test("S2 xlsx date-styled cells roundtrip as timestamps (1900-system serials)") {
    val path = Files.createTempDirectory("graft_xlsx3").resolve("d.xlsx").toString
    val t1 = java.sql.Timestamp.valueOf("2024-03-15 13:45:30")
    val t2 = java.sql.Timestamp.valueOf("1999-12-31 00:00:00")
    val df = Seq((1L, t1), (2L, t2)).toDF("id", "when")
    Xlsx.writeSingleSheet(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.schema("when").dataType.typeName == "timestamp")
    val got = back.orderBy($"id").select($"when")
      .as[java.sql.Timestamp].collect().toSeq
    assert(got == Seq(t1, t2), s"got $got")
    // serial conversion agrees with the pandas/openpyxl epoch convention
    assert(Xlsx.serialToTimestamp(45366.0) ==
      java.sql.Timestamp.valueOf("2024-03-15 00:00:00"))
  }

  test("S2 xlsx data columns beyond the header become Unnamed: i (no data loss)") {
    // hand-build a sheet whose data row is wider than its header row
    val dir = Files.createTempDirectory("graft_xlsx4")
    val path = dir.resolve("w.xlsx").toString
    val narrow = Seq(("a", 1L)).toDF("h1", "h2")
    Xlsx.writeSingleSheet(narrow, path)
    // widen the data row by appending a cell in column C of row 2
    val zin = new java.util.zip.ZipFile(path)
    val sheetXml = new String(zin.getInputStream(
      zin.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
      .replace("""</row></sheetData>""",
        """<c r="C2"><v>7</v></c></row></sheetData>""")
    val others = Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
      "xl/_rels/workbook.xml.rels", "xl/styles.xml", "xl/sharedStrings.xml")
      .map(n => n -> zin.getInputStream(zin.getEntry(n)).readAllBytes())
    zin.close()
    val path2 = dir.resolve("w2.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path2))
    others.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry() }
    zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(sheetXml.getBytes("UTF-8")); zos.closeEntry(); zos.close()
    val back = Xlsx.read(spark, path2)
    assert(back.columns.toSeq == Seq("h1", "h2", "Unnamed: 2"))
    assert(back.select("`Unnamed: 2`").as[Long].collect().toSeq == Seq(7L))
  }

  test("S2 xlsx rich-text shared strings concatenate runs; phonetic runs excluded") {
    // rewrite the shared-strings part: one plain <si>, one rich-text
    // <si> split across runs, one Japanese <si> carrying an <rPh>
    // furigana annotation (whose <t> must NOT leak into the value —
    // pandas/openpyxl parity), one inline rich string in the sheet
    val dir = Files.createTempDirectory("graft_xlsx5")
    val path = dir.resolve("r.xlsx").toString
    val df = Seq(("x", "y"), ("x2", "y2")).toDF("c1", "c2")
    Xlsx.writeSingleSheet(df, path)
    val zin = new java.util.zip.ZipFile(path)
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">""" +
        "<si><t>c1</t></si><si><t>c2</t></si>" +
        "<si><r><rPr><b/></rPr><t>rich </t></r><r><t>text</t></r></si>" +
        "<si><r><t>東京</t></r><rPh sb=\"0\" eb=\"2\"><t>とうきょう</t></rPh></si>" +
        "</sst>"
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c></row>""" +
        """<row r="3"><c r="A3" t="inlineStr"><is><r><t>in</t></r><r><t>line</t></r>""" +
        """<rPh sb="0" eb="1"><t>NOPE</t></rPh></is></c><c r="B3" t="s"><v>2</v></c></row>""" +
        "</sheetData></worksheet>"
    val others = Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
      "xl/_rels/workbook.xml.rels", "xl/styles.xml")
      .map(n => n -> zin.getInputStream(zin.getEntry(n)).readAllBytes())
    zin.close()
    val path2 = dir.resolve("r2.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path2))
    others.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry() }
    zos.putNextEntry(new java.util.zip.ZipEntry("xl/sharedStrings.xml"))
    zos.write(sst.getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(sheetXml.getBytes("UTF-8")); zos.closeEntry(); zos.close()
    val back = Xlsx.read(spark, path2)
    val rows = back.select("c1", "c2").as[(String, String)].collect().toSeq
    assert(rows.contains(("rich text", "東京")),
      s"rich-text concat + phonetic exclusion failed: $rows")
    assert(rows.contains(("inline", "rich text")),
      s"inline rich string failed: $rows")
    assert(!rows.exists(r => r._1.contains("NOPE") || r._2.contains("と")),
      s"phonetic text leaked: $rows")
  }

  test("S2 xlsx feeds the standard cleaning pipeline (header + inference)") {
    val path = Files.createTempDirectory("graft_xlsx2").resolve("d.xlsx").toString
    val dirty = Seq(("a", Some(10.0)), ("b", None), ("a", Some(10.0)))
      .toDF("name", "amount")
    Xlsx.writeSingleSheet(dirty, path)
    val back = Xlsx.read(spark, path)
    // exact duplicate detection works on the xlsx-sourced frame
    val dups = graft.profile.Profiler.duplicateCount(back)
    assert(dups == 1L)
  }

  test("partitioned write prunes at planning: partition filter reaches the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Seq((1L, "a", "R"), (2L, "b", "N"), (3L, "c", "R"))
      .toDF("id", "s", "flag")
      .write.mode("overwrite").partitionBy("flag").parquet(dir)
    val q = spark.read.parquet(dir).filter($"flag" === "R")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters:") &&
      scan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*flag[^\\]]*\\].*"),
      s"partition filter must prune at planning, plan:\n$scan")
    // and the pruned read returns only the R partition
    assert(q.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("S1/K1 csv roundtrip: write with header, read back with inferred schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    Sinks.csv(df, s"$dir/out", singleFile = true)
    val back = Sources.csv(spark, s"$dir/out")
    assert(back.count() == 2)
    assert(back.schema("id").dataType.typeName == "integer" ||
      back.schema("id").dataType.typeName == "long") // inference picks an int type
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.where($"s" === "a").count() == 1)
  }

  test("S1 explicit-schema csv read (single-pass scale path)") {
    val dir = Files.createTempDirectory("graft_csv2").toString
    Sinks.csv(Seq((1L, "x")).toDF("id", "s"), s"$dir/out", singleFile = true)
    val back = Sources.csv(spark, s"$dir/out",
      org.apache.spark.sql.types.StructType.fromDDL("id LONG, s STRING"))
    assert(back.as[(Long, String)].collect().toSeq == Seq((1L, "x")))
  }

  test("K2 html report renders insights, log, escaped samples") {
    val before = Seq(("<b>raw</b>", 1)).toDF("name", "n")
    val after = Seq(("clean", 2)).toDF("name", "n")
    val html = HtmlReport.render(before, after,
      missionsLog = Seq("Dropped 2 duplicate rows"),
      insights = Seq("Rows before: 1, rows after: 1"))
    assert(html.contains("Dropped 2 duplicate rows"))
    assert(html.contains("&lt;b&gt;raw&lt;/b&gt;")) // escaped, not injected
    assert(html.contains("<th>name</th>"))
    val path = Files.createTempDirectory("graft_html").resolve("r.html")
    HtmlReport.write(path.toString, html)
    assert(Files.readString(path).startsWith("<html>"))
  }

  test("sample data loads through createDataFrame with declared schema") {
    val df = SampleData.load(spark)
    assert(df.schema.fieldNames.toSeq ==
      Seq("order_id", "date", "price", "quantity", "category"))
    assert(df.where($"category".isNull).count() > 0)
  }

  test("S2 xlsx XML-illegal control chars round-trip via _xHHHH_ escaping") {
    val path = Files.createTempDirectory("graft_xlsx5").resolve("c.xlsx").toString
    val tricky = "ctl:\u0001 bell:\u0007 tab:\t lookalike:_x0041_ ok"
    val df = Seq((1L, tricky)).toDF("id", "s")
    Xlsx.writeSingleSheet(df, path)
    // the emitted sharedStrings.xml must be valid XML (round 2 wrote the
    // raw control bytes) and the reader must decode back to the original
    val got = Xlsx.read(spark, path).select($"s").as[String].collect()
    assert(got.toSeq == Seq(tricky))
  }

  test("K? xlsx write refuses silent truncation; truncate=true caps rows") {
    val dir = Files.createTempDirectory("graft_xlsx6")
    val df = (1 to 12).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    val p1 = dir.resolve("refuse.xlsx").toString
    val e = intercept[IllegalArgumentException] {
      Xlsx.writeSingleSheet(df, p1, maxRows = 10)
    }
    assert(e.getMessage.contains("maxRows"))
    val p2 = dir.resolve("trunc.xlsx").toString
    Xlsx.writeSingleSheet(df, p2, maxRows = 10, truncate = true)
    assert(Xlsx.read(spark, p2).count() == 10)
  }

  test("S2 xlsx malformed shared-string refs degrade to text, not exceptions") {
    val dir = Files.createTempDirectory("graft_xlsx7")
    val path = dir.resolve("bad.xlsx").toString
    val df = Seq((1L, "ok")).toDF("id", "s")
    Xlsx.writeSingleSheet(df, path)
    // corrupt the sheet: point one cell at shared-string index 999 and
    // another at a non-numeric index
    val zin = new java.util.zip.ZipFile(path)
    val entries = new scala.collection.mutable.LinkedHashMap[String, Array[Byte]]
    val en = zin.entries()
    while (en.hasMoreElements) {
      val e = en.nextElement()
      entries(e.getName) = zin.getInputStream(e).readAllBytes()
    }
    zin.close()
    val sheet = new String(entries("xl/worksheets/sheet1.xml"), "UTF-8")
      .replace("</sheetData>",
        """<row r="3"><c r="A3" t="s"><v>999</v></c><c r="B3" t="s"><v>junk</v></c></row></sheetData>""")
    entries("xl/worksheets/sheet1.xml") = sheet.getBytes("UTF-8")
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(bytes); zos.closeEntry()
    }
    zos.close()
    val back = Xlsx.read(spark, path).orderBy($"id")
    val vals = back.select($"s").as[String].collect().toSeq
    assert(vals == Seq("ok", "junk")) // bad refs surfaced as raw text
  }

  test("S2 number-format rendering: unit coverage of the code families") {
    import Xlsx.renderFormatted
    // General + plain digit patterns
    assert(renderFormatted(3.0, "General") == "3")
    assert(renderFormatted(3.14159, "General") == "3.14159")
    assert(renderFormatted(1234.567, "0") == "1235") // display HALF_UP
    assert(renderFormatted(1234.567, "0.00") == "1234.57")
    assert(renderFormatted(1234567.891, "#,##0") == "1,234,568")
    assert(renderFormatted(1234567.891, "#,##0.00") == "1,234,567.89")
    assert(renderFormatted(0.5, "#.##") == ".5")
    assert(renderFormatted(0.5, "0.##") == "0.5")
    assert(renderFormatted(7.0, "000") == "007")
    // percent scaling
    assert(renderFormatted(0.345, "0%") == "35%")
    assert(renderFormatted(0.345, "0.0%") == "34.5%")
    // scientific
    assert(renderFormatted(12345.0, "0.00E+00") == "1.23E+04")
    assert(renderFormatted(0.00123, "0.00E+00") == "1.23E-03")
    assert(renderFormatted(0.0, "0.00E+00") == "0.00E+00")
    // literals: quoted, escaped, currency
    assert(renderFormatted(9.5, "0.00 \"kg\"") == "9.50 kg")
    assert(renderFormatted(9.5, "$#,##0.00") == "$9.50")
    // sections: negative styled by its own section (no auto sign)
    assert(renderFormatted(-1234.5, "#,##0.00;(#,##0.00)") == "(1,234.50)")
    assert(renderFormatted(-1234.5, "#,##0.00") == "-1,234.50")
    assert(renderFormatted(0.0, "0.00;(0.00);\"zero\"") == "zero")
    // text section / @ placeholder
    assert(renderFormatted("hi", "@") == "hi")
    assert(renderFormatted("hi", "\"[\"@\"]\"") == "[hi]")
    // dates: month-vs-minute disambiguation, 12h vs 24h
    val ts = java.sql.Timestamp.valueOf("2024-03-07 14:05:09")
    assert(renderFormatted(ts, "yyyy-mm-dd") == "2024-03-07")
    assert(renderFormatted(ts, "m/d/yy") == "3/7/24")
    assert(renderFormatted(ts, "d-mmm-yy") == "7-Mar-24")
    assert(renderFormatted(ts, "mmmm d, yyyy") == "March 7, 2024")
    assert(renderFormatted(ts, "h:mm") == "14:05")
    assert(renderFormatted(ts, "hh:mm:ss") == "14:05:09")
    assert(renderFormatted(ts, "h:mm AM/PM") == "2:05 PM")
    assert(renderFormatted(ts, "m/d/yy h:mm") == "3/7/24 14:05")
    assert(renderFormatted(ts, "mm:ss") == "05:09")
    // a raw serial under a date-token section renders as its date
    val serial = Xlsx.timestampToSerial(ts)
    assert(renderFormatted(serial, "yyyy-mm-dd hh:mm:ss") == "2024-03-07 14:05:09")
    // booleans and nulls
    assert(renderFormatted(true, "General") == "TRUE")
    assert(renderFormatted(null, "0.00") == "")
  }

  test("S2 formatted view: column formats written, rendered on read") {
    val path = Files.createTempDirectory("graft_xlsx8").resolve("f.xlsx").toString
    val ts = java.sql.Timestamp.valueOf("2024-03-07 14:05:09")
    val df = Seq(
      (1L, 0.125, 1234567.891, ts, "note"),
      (2L, 0.5, -42.0, ts, "x"))
      .toDF("id", "rate", "amount", "when", "s")
    Xlsx.writeSingleSheet(df, path, formats = Map(
      "rate" -> "0.0%",
      "amount" -> "#,##0.00;(#,##0.00)",
      "when" -> "yyyy-mm-dd hh:mm"))
    // typed view is format-independent (values untouched)
    val typed = Xlsx.read(spark, path).orderBy($"id")
    assert(typed.select($"rate").as[Double].collect().toSeq == Seq(0.125, 0.5))
    // formatted view renders every column as display strings
    val disp = Xlsx.readFormatted(spark, path).orderBy($"id")
    assert(disp.schema.fields.forall(_.dataType.typeName == "string"))
    val got = disp.select($"rate", $"amount", $"when", $"s")
      .as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("12.5%", "1,234,567.89", "2024-03-07 14:05", "note"),
      ("50.0%", "(42.00)", "2024-03-07 14:05", "x")))
    // unformatted numeric column renders General
    assert(disp.select($"id").as[String].collect().toSeq == Seq("1", "2"))
  }

  test("fixed-width round trip: numbers left-pad, strings right-pad, " +
      "null writes blank and reads back null, overflow fails loudly") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_fixw").resolve("t").toString
    val df = Seq(
      (1L, Some("ab"), Some(2.5)),
      (22L, None, None),
      (333L, Some("c"), Some(10.25)))
      .toDF("k", "s", "v")
      .select($"k", $"s", $"v".cast("decimal(6,2)").as("v"))
    Sinks.fixedWidth(df, dir, Seq("k" -> 4, "s" -> 4, "v" -> 7),
      singleFile = true)
    // the raw lines ARE the format contract: 1-based offsets, numeric
    // left-pad, string right-pad, null -> all blanks
    val lines = spark.read.text(dir).as[String].collect().sorted.toSeq
    assert(lines == Seq(
      "   1ab     2.50",
      "  22           ",
      " 333c     10.25"), s"layout drifted: $lines")
    val back = Sources.fixedWidth(spark, dir, Seq(
      ("k", 4, LongType), ("s", 4, StringType),
      ("v", 7, DecimalType(6, 2))))
      .as[(Long, Option[String], Option[BigDecimal])].collect()
      .sortBy(_._1).toSeq
    assert(back == Seq(
      (1L, Some("ab"), Some(BigDecimal("2.50"))),
      (22L, None, None),
      (333L, Some("c"), Some(BigDecimal("10.25")))), s"roundtrip: $back")
    // a value wider than its field corrupts every later offset on the
    // line — must FAIL the write, never truncate silently
    val wide = Seq((12345L, Some("x"), Option.empty[Double]))
      .toDF("k", "s", "v")
    val ex = intercept[Exception] {
      Sinks.fixedWidth(wide, dir + "_o", Seq("k" -> 4, "s" -> 4, "v" -> 7))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("fixed-width overflow")),
      s"expected a loud overflow failure, got: ${messages(ex)}")
  }

  test("fixed-width malformed field reads null under ANSI-on " +
      "(try_cast), never fails the job") {
    import org.apache.spark.sql.types._
    // hand-written lines with a corrupt numeric field: classic-ETL
    // permissive convention = null + downstream quarantine, and this
    // session runs Spark 4's ansi.enabled default (true), where a plain
    // .cast would throw mid-scan (ADVICE r12)
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "fixture assumes the ANSI-on default this repo ships under")
    val dir = Files.createTempDirectory("graft_fixw_bad").toString
    Files.write(java.nio.file.Paths.get(dir, "part.txt"), java.util.List.of(
      "   1ab     2.50",
      "  XXcd      bad", // k and v both malformed -> null, s survives
      " 333e     10.25"))
    val back = Sources.fixedWidth(spark, dir, Seq(
      ("k", 4, LongType), ("s", 4, StringType),
      ("v", 7, DecimalType(6, 2))))
      .as[(Option[Long], Option[String], Option[BigDecimal])].collect()
      .sortBy(_._2).toSeq
    assert(back == Seq(
      (Some(1L), Some("ab"), Some(BigDecimal("2.50"))),
      (None, Some("cd"), None),
      (Some(333L), Some("e"), Some(BigDecimal("10.25")))),
      s"malformed-field convention drifted: $back")
  }

  test("WARC roundtrip: records survive sharded write + binaryFile " +
      "read, warcinfo shard headers are typed (not dropped by the " +
      "parser), Content-Length is UTF-8 octets not chars") {
    import graft.io.Warc
    val dir = java.nio.file.Files
      .createTempDirectory("graft_warc_spec").toString
    val src = Seq(
      ("http://x/doc/1", "<p>hello</p>"),
      // multi-byte payload: 'é' is 2 octets — char count would be 11
      ("http://x/doc/2", "<p>café</p>"),
      // payload containing record-marker text must NOT desync the
      // length-delimited parser
      ("http://x/doc/3", "WARC/1.0\r\n\r\nnot a header"))
      .toDF("uri", "payload")
    Warc.write(src, "uri", "payload", dir, nFiles = 2)
    val back = Warc.read(spark, dir)
    val info = back.filter($"warc_type" === "warcinfo").count()
    assert(info == 2, s"one warcinfo per shard, got $info")
    val resp = back.filter($"warc_type" === "response")
      .select("target_uri", "content_length", "payload")
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    assert(resp.map(_._1) ==
      Seq("http://x/doc/1", "http://x/doc/2", "http://x/doc/3"))
    assert(resp(0) == ("http://x/doc/1", 12L, "<p>hello</p>"))
    assert(resp(1)._2 == 12L, // 11 chars, 12 octets
      s"Content-Length must count octets: ${resp(1)}")
    assert(resp(1)._3 == "<p>café</p>")
    assert(resp(2)._3 == "WARC/1.0\r\n\r\nnot a header",
      "length-delimited parse must not scan payload for markers")
  }

  test("WARC parser is tolerant: truncated trailing record keeps the " +
      "complete records before it; garbage-only input parses empty") {
    import graft.io.Warc
    val good = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/a\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999\r\n\r\nshort"
    val recs = Warc.parseRecords(
      (good + truncated).getBytes("UTF-8")).toSeq
    assert(recs.map(r => (r.target_uri, r.payload)) ==
      Seq(("http://x/a", "hi")))
    assert(Warc.parseRecords("not a warc at all".getBytes("UTF-8"))
      .isEmpty)
  }
}
