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

  test("withLangId staged DataFrame face matches the Column face") {
    val df = Seq("the cat and the dog is in that house", "xyzzy qwerty")
      .toDF("text")
    val staged = TextStats.withLangId(df, "text")
      .select("predicted").as[String].collect().toSeq
    val column = df.select(TextStats.langId($"text")).as[String].collect().toSeq
    assert(staged == column && staged == Seq("en", "und"))
  }
}
