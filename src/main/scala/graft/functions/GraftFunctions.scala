package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL face of the custom expression library: register once per session,
  * then every function is callable from `spark.sql(...)` — the SQL
  * surface the reference lacks entirely (SURVEY §2.5).
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT graft_hash64(text) FROM docs")
  * }}}
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_hash64" -> ((es: Seq[Expression]) => StringHash64(es.head)),
    "graft_rolling_hash" -> ((es: Seq[Expression]) => RollingHash(es.head)),
    "graft_simhash32" -> ((es: Seq[Expression]) => SimHash32(es.head)),
    "graft_dot" -> ((es: Seq[Expression]) => DotProductD(es(0), es(1))),
    "graft_normalize" -> ((es: Seq[Expression]) => NormalizeD(es.head)),
    "graft_minhash" -> ((es: Seq[Expression]) =>
      MinHashSig(es.head, intArg(es(1), "graft_minhash(k)"))),
    "graft_char_shingles" -> ((es: Seq[Expression]) =>
      CharShingleHashes(es.head, intArg(es(1), "graft_char_shingles(k)"))),
    "graft_winnow" -> ((es: Seq[Expression]) =>
      WinnowFingerprints(es.head, intArg(es(1), "graft_winnow(k)"),
        intArg(es(2), "graft_winnow(w)"))),
    // UDTF: one row per distinct word n-gram (LATERAL VIEW / SELECT-list)
    "graft_shingles" -> ((es: Seq[Expression]) =>
      ShingleExplode(es.head, intArg(es(1), "graft_shingles(n)"))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
