package graft
import org.apache.spark.sql.SparkSession

/** Probe main: the t_bm25_wand pruning measurement — candidate pairs
  * vs exactly-scored survivor pairs on a given corpus dir (the
  * SURVEY §22 evidence rows; the OperatorsSpec zipf leg pins the
  * same numbers on a corpus where the pruning provably bites).
  */
object WandCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (cand, scored) = graft.operators.Text.bm25WandCounts(spark, args(0))
    println(s"WANDCOUNT cand=$cand scored=$scored pct=${100.0 * scored / cand}")
    spark.stop()
  }
}
