package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    println("=== q1_agg ===")
    operators.Relational.q1Agg(spark, d).explain("formatted")
    println("=== knn_search ===")
    operators.VectorSearch.knnSearch(spark, d).explain("formatted")
    spark.stop()
  }
}
