package graft

import org.apache.spark.sql.functions._

import graft.ext.TextStats
import graft.functions.{GraftFunctions, Hashing}

class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("registered graft_* functions work from spark.sql") {
    GraftFunctions.register(spark)
    Seq((1L, "Hello World"), (2L, "abc")).toDF("id", "t")
      .createOrReplaceTempView("sql_docs")
    val rows = spark.sql(
      """SELECT id, graft_hash64(t) h, graft_rolling_hash(lower(t)) rh,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) d
        |FROM sql_docs ORDER BY id""".stripMargin).collect()
    val colH = Seq("Hello World", "abc").toDF("t")
      .select(Hashing.hash64($"t")).as[Long].collect()
    assert(rows.map(_.getLong(1)).toSeq == colH.toSeq) // SQL == Column API
    assert(rows.forall(_.getDouble(3) == 11.0))
  }

  test("graft_minhash rejects a non-literal k with a clear error") {
    GraftFunctions.register(spark)
    Seq(Tuple1(Seq(1L, 2L))).toDF("h").createOrReplaceTempView("sql_h")
    val e = intercept[Exception](
      spark.sql("SELECT graft_minhash(h, CAST(length('xx') AS INT)) FROM sql_h").collect())
    assert(e.getMessage.contains("literal INT"))
  }

  test("GraftExtensions: a session built with the extension resolves graft_* with no register() call") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // keep the shared test session to restore
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf read from the
      // SparkContext at session build — unreachable under the suite's
      // shared context, so drive the same class through the builder's
      // withExtensions hook (identical injection path)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
      val r = s2.sql(
        """SELECT graft_hash64('abc') h,
          |  size(graft_winnow('the quick brown fox jumps over it', 16, 8)) nw""".stripMargin)
        .collect().head
      val expected = {
        import prev.implicits._
        Seq("abc").toDF("t").select(Hashing.hash64($"t")).as[Long].collect().head
      }
      assert(r.getLong(0) == expected, "extension-injected fn == Column API")
      assert(r.getInt(1) >= 1)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_shingles UDTF rows equal the wordShingles column formula") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog!"),
      (2L, "short text"), // fewer than n tokens -> one whole-text shingle
      (3L, "a a a a a")) // repeated tokens -> distinct collapses
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("udtf_docs")
    val viaUdtf = spark.sql(
      """SELECT doc_id, collect_list(shingle) s
        |FROM udtf_docs LATERAL VIEW graft_shingles(text, 3) g AS pos, shingle
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      .as[(Long, Seq[String])].collect().toSeq
    val viaColumn = df.orderBy($"doc_id")
      .select($"doc_id", graft.ext.Dedup.wordShingles($"text", 3))
      .as[(Long, Seq[String])].collect().toSeq
    // collect_list after LATERAL VIEW preserves per-doc generator order
    // (one generate per row, no shuffle before the agg at this size)
    assert(viaUdtf.map(_._1) == viaColumn.map(_._1))
    assert(viaUdtf.map(_._2.sorted) == viaColumn.map(_._2.sorted))
    assert(viaUdtf(1)._2 == Seq("short text"))
  }

  test("withLangId staged DataFrame face matches the Column face") {
    val df = Seq("the cat and the dog is in that house", "xyzzy qwerty")
      .toDF("text")
    val staged = TextStats.withLangId(df, "text")
      .select("predicted").as[String].collect().toSeq
    val column = df.select(TextStats.langId($"text")).as[String].collect().toSeq
    assert(staged == column && staged == Seq("en", "und"))
  }
}
