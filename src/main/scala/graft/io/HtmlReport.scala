package graft.io

import org.apache.spark.sql.DataFrame

/** K2 — HTML cleaning report (/root/reference/app.py:94-125): UTC
  * timestamp, insights list, missions log, before/after 10-row samples.
  * Pure driver-side templating over two bounded `limit(10)` collects.
  */
object HtmlReport {
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def tableHtml(df: DataFrame, n: Int = 10): String = {
    val cols = df.columns
    val rows = df.limit(n).collect()
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { r =>
      cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "" else r.get(i).toString
        s"<td>${esc(v)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString
    s"<table><thead><tr>$head</tr></thead><tbody>$body</tbody></table>"
  }

  def render(before: DataFrame, after: DataFrame, missionsLog: Seq[String],
      insights: Seq[String],
      now: java.time.Instant = java.time.Instant.now()): String = {
    val items = (xs: Seq[String]) =>
      xs.map(s => s"<li>${esc(s)}</li>").mkString
    s"""<html>
       |<head><meta charset='utf-8'><title>Cleaning Report</title>
       |<style>body{font-family:Arial,Helvetica,sans-serif;padding:20px}
       |table{border-collapse:collapse} td,th{border:1px solid #ddd;padding:6px}
       |</style></head>
       |<body>
       |<h1>Cleaning Report</h1>
       |<p>Generated: $now UTC</p>
       |<h2>Summary</h2><ul>${items(insights)}</ul>
       |<h2>Missions applied</h2><ul>${items(missionsLog)}</ul>
       |<h2>Before (sample)</h2>${tableHtml(before)}
       |<h2>After (sample)</h2>${tableHtml(after)}
       |</body></html>""".stripMargin
  }

  def write(path: String, html: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), html)
}
