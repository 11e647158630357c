package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = graft.operators.PrefixSum.runningTotal(
      (1L to 100L).map(i=>(i,1L)).toDF("k","v").repartition(4), "k","v","run")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
