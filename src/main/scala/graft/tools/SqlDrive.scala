package graft.tools
import org.apache.spark.sql.SparkSession
object SqlDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    spark.sql("SELECT 1 AS id, 'hello world' AS t").createOrReplaceTempView("d")
    val ok = spark.sql("SELECT graft_hash64(t) h, graft_simhash32(graft_char_shingles(t, 3)) sh FROM d").collect()
    println(s"[sd] happy: ${ok.mkString(",")}")
    try {
      spark.sql("SELECT graft_minhash(array(1L), CAST(rand()*4 AS INT)) FROM d").collect()
      println("[sd] ERROR: non-literal k accepted!")
    } catch {
      case e: Exception => println(s"[sd] non-literal k rejected: ${e.getMessage.linesIterator.next().take(100)}")
    }
    spark.stop()
  }
}
