package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextStats}
import graft.functions.Hashing

/** Stage-cost breakdown of the shared 13-gram shingle-hash pipeline
  * that the decontaminate/contamination/prep/curate tier rides:
  * tokenize-only vs +gram-string build vs +md5 hash vs a rolling
  * linear-combine alternative over per-token hashes. Decides whether
  * gram hashing is worth an oracle-coordinated change. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[shingle] $name%-22s $dt%6.2fs (n=$n)")
        dt
      }
    }
    val toks = docs.select(col("doc_id"),
      TextStats.tokens(TextStats.normalized(col("text"))).as("t"))
    time("tokens-only") {
      toks.select(sum(size(col("t")))).head().getLong(0)
    }
    // gram strings without hashing
    val grams = toks.withColumn("g",
      when(size(col("t")) >= 13,
        transform(sequence(lit(0), size(col("t")) - 13),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(13)))))
        .otherwise(array(concat_ws(" ", col("t")))))
    time("+gram strings") {
      grams.select(sum(size(col("g")))).head().getLong(0)
    }
    // forced-eval variants: a size() consumer lets Catalyst prune the
    // element-wise lambda entirely (transform preserves length), so sum
    // the VALUES instead
    time("grams forced") {
      grams.select(sum(aggregate(col("g"), lit(0L),
        (acc, x) => acc + length(x)))).head().getLong(0)
    }
    val hashed = grams.withColumn("h",
      transform(col("g"), s => Hashing.hash64(s)))
    time("+md5 forced") {
      hashed.select(sum(aggregate(col("h"), lit(0L),
        (acc, x) => acc + (x % 1000000007L)))).head().getLong(0)
    }
    // the actual face shape: explode + join benchmark + groupBy
    val d = docs
    time("decontaminate face") {
      Dedup.decontaminate(
        d.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 50 === 0), "text", n = 13).count()
    }
    // bisect: corpus explode alone, bench side alone, join sans groupBy
    val corpusGrams = d.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("id"),
        explode(Dedup.shingleHashes(col("text"), 13)).as("h"))
    time("corpus explode") { corpusGrams.count() }
    val benchHashes = d.filter(col("doc_id") % 50 === 0)
      .select(explode(Dedup.shingleHashes(col("text"), 13)).as("h"))
      .distinct()
    time("bench distinct") { benchHashes.count() }
    time("join no groupBy") {
      corpusGrams.join(benchHashes, Seq("h")).count()
    }
    // explode cost anatomy
    time("explode tokens") {
      toks.select(explode(col("t"))).count()
    }
    time("explode grams") {
      grams.select(col("doc_id"), explode(col("g"))).count()
    }
    time("explode hashes") {
      hashed.select(col("doc_id"), explode(col("h"))).count()
    }
    time("explode raw split") {
      docs.select(explode(split(col("text"), " "))).count()
    }
    // fix candidate A: explode the INDEX, build the gram per exploded
    // row — tokens referenced post-generate as a plain attribute, so
    // tokenization cannot be inlined into a per-element lambda
    time("index-explode grams") {
      toks
        .select(col("doc_id"), col("t"),
          explode(when(size(col("t")) >= 13,
            sequence(lit(0), size(col("t")) - 13, lit(1)))
            .otherwise(array(lit(-1)))).as("i"))
        .select(col("doc_id"),
          Hashing.hash64(when(col("i") >= 0,
            concat_ws(" ", slice(col("t"), col("i") + 1, lit(13))))
            .otherwise(concat_ws(" ", col("t")))).as("h"))
        .count()
    }
    // fix candidate B: persist barrier before explode
    val gp = grams.persist()
    time("explode persisted") {
      gp.select(col("doc_id"), explode(col("g"))).count()
    }
    gp.unpersist()
    spark.stop()
  }
}
