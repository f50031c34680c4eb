package graft
import org.apache.spark.sql.SparkSession
/** Plan inspector: `runMain graft.Explain <query> [sfDir] [mode]` prints
  * the query's plan (default mode "formatted") without executing it —
  * the per-operator audit loop (PushedFilters / WholeStageCodegen /
  * Exchange placement) for any SparkEntry query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
