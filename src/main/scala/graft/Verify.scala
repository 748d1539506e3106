package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args(2+) (dev-only, never passed by the driver): restrict the run
    // to the named queries for fast local iteration with tools/check.py
    val sfDir = args(0); val outDir = args(1)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench: big enough not to thrash across 225 queries, small
      // enough not to bloat heap with retained generated classes
      // (static conf, must be set before the session starts; r8 A/B)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // bound memory across the suite: release the SQL cache AND
      // persistent RDD blocks — localCheckpoints (the dedup family's
      // lineage cuts) live as the latter and clearCache alone leaks
      // them, which r3's judge measured as suite-context memory
      // pressure (92s in-suite vs 1.6s isolated on one face)
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
    // RocksDB state-store parity (VERDICT r5 Next #7): re-run the five
    // core streaming faces under the production provider and require
    // byte-identical results vs the default-provider dump above, so a
    // provider-specific regression can't hide behind the HDFS-backed
    // default. Runs in the official full pass and whenever a listed
    // face is explicitly selected.
    val rocksFaces = Seq("q_stream_hourly", "q_stream_append",
      "q_stream_dedup", "q_stream_sessions", "q_stream_join",
      // r8 session-4: the two new custom-keyed-state faces (ordered
      // EWMA window, KMV min-set) re-run under the production provider
      "q_stream_ewma", "q_stream_kmv",
      // r9: the streaming CMS bucket frame (complete-mode agg state)
      // and the A-ES weighted-sample max-set keyed state
      "q_stream_cms", "q_stream_wsample")
      .filter(n => only.isEmpty || only(n))
    if (rocksFaces.nonEmpty) {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = try Some(spark.conf.get(key)) catch { case _: Throwable => None }
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
        ".state.RocksDBStateStoreProvider")
      val parity = rocksFaces.map { name =>
        val status =
          try {
            val rocks = SparkEntry.queries(name)(spark, sfDir)
              .collect().map(_.toString).sorted.toSeq
            val dumped = spark.read.parquet(s"$outDir/$name")
              .collect().map(_.toString).sorted.toSeq
            if (rocks == dumped) "match"
            else s"MISMATCH (rocksdb ${rocks.size} rows vs ${dumped.size})"
          } catch { case e: Throwable =>
            s"ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName)}"
          }
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        name -> status
      }
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      System.err.println("[verify] rocksdb parity: " +
        parity.map { case (n, st) => s"$n=$st" }.mkString(", "))
      val pj = parity.map { case (n, st) =>
        "\"" + n + "\":\"" + st.replace("\\", "\\\\").replace("\"", "\\\"")
          .replaceAll("[\\n\\r\\t]", " ") + "\""
      }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/rocksdb_parity.json"), pj)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // census-diff gate (VERDICT r14 Next #9), OPT-IN: the gate rebuilds
    // every face's plan in its own fixed-config session (sf0.001,
    // local[8]) and exits 2 on an unexplained exchange/join-count jump
    // vs the committed plan_census.json. Off by default so the driver's
    // wall-capped correctness run never pays for it; the round gate
    // sequence and CI-style local runs set SPARK_GRAFT_CENSUS_GATE=1.
    if (sys.env.get("SPARK_GRAFT_CENSUS_GATE").contains("1"))
      graft.tools.CensusGate.main(Array("/root/testdata/sf0.001"))
  }
}
