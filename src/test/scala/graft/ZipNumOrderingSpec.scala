package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ZipNumOrderingSpec extends AnyFunSuite with SparkTestSession {

  test("reported output ordering elides per-partition sorts on the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ord").resolve("c").toString
    (0 until 200).map(i =>
      f"org,o$i%04d)/ 20120101000000 http://o$i.org/ text/html 200 D - - 1 $i f.gz")
      .toDF("line").coalesce(1).sortWithinPartitions("line")
      .write.format("zipnum").option("linesPerBlock", "20")
      .mode("overwrite").save(dir)
    val df = spark.read.format("zipnum").load(dir)
      .sortWithinPartitions("urlkey", "timestamp")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"sort should be elided:\n$plan")
    // and with column pruning that drops timestamp, ordering is not
    // reported, so the sort must stay
    val pruned = spark.read.format("zipnum").load(dir)
      .select("urlkey").sortWithinPartitions("urlkey")
    // (no assertion on pruned plan shape — just verify it still runs)
    assert(pruned.count() == 200)
    assert(df.count() == 200)
  }
}
