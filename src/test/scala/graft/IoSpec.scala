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
}
