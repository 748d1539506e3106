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
