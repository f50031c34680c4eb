package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("kmv: exact below k distinct values") {
    val df = (1 to 100).flatMap(i => Seq(i, i)).toDF("v")  // 100 distinct, dup'd
    val row = Sketches.kmvDistinct(df, "v", k = 256).collect()(0)
    assert(row.getLong(0) == 100)      // n_mins
    assert(row.getLong(2) == 100)      // est == exact below k
  }

  test("kmv: estimate within ~3/sqrt(k) of exact at 20x k distinct") {
    val n = 5000
    val df = (1 to n).map(i => s"val-$i").toDF("v").repartition(7)
    val est = Sketches.kmvDistinct(df, "v", k = 256)
      .collect()(0).getLong(2)
    val err = math.abs(est - n).toDouble / n
    assert(err < 3.0 / math.sqrt(256), s"est=$est exact=$n err=$err")
  }

  test("kmv: partitioning-invariant (mergeable sketch property)") {
    val vals = (1 to 3000).map(i => s"k-${i % 1100}")  // dups across partitions
    val a = Sketches.kmvDistinct(vals.toDF("v").repartition(1), "v", 128)
      .collect()(0)
    val b = Sketches.kmvDistinct(vals.toDF("v").repartition(13), "v", 128)
      .collect()(0)
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
      a.getLong(2) == b.getLong(2))
  }

  test("kmv: NULLs are excluded, matching countDistinct semantics") {
    val withNulls = (1 to 100).map(i => Some(s"v-$i")) ++
      Seq.fill(50)(Option.empty[String])
    val row = Sketches.kmvDistinct(withNulls.toDF("v"), "v", k = 256)
      .collect()(0)
    assert(row.getLong(0) == 100 && row.getLong(2) == 100)
  }

  test("kmv: empty input estimates zero") {
    val row = Sketches.kmvDistinct(Seq.empty[Int].toDF("v"), "v", 16)
      .collect()(0)
    assert(row.getLong(0) == 0 && row.getLong(2) == 0)
  }
}
