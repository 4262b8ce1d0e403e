package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(7)
    (1 to 2000).map(i => (s"k${i % 17}", rnd.nextDouble(), i.toLong))
      .toDF("key", "score", "id")
  }

  test("TopKPerKey equals the window row_number formulation") {
    val custom = TopKPerKey(df, Seq("key"),
        Seq(("score", true), ("id", false)), k = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq

    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id".asc)
    val windowed = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq

    assert(custom == windowed)
  }

  test("TopKPerKey handles k larger than group size and single groups") {
    val small = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 9.0, 3L)).toDF("key", "score", "id")
    val out = TopKPerKey(small, Seq("key"), Seq(("score", true)), k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(3))).sortBy(x => (x._1, x._3))
    assert(out.toSeq == Seq(("a", 2.0, 1), ("a", 1.0, 2), ("b", 9.0, 1)))
  }

  test("TopKPerKey.windowed (the spill-safe fallback) matches the heap operator") {
    val heap = TopKPerKey(df, Seq("key"), Seq(("score", true), ("id", false)), k = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    val win = TopKPerKey.windowed(df, Seq("key"), Seq(("score", true), ("id", false)), k = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    assert(heap == win)
  }

  test("plan contains the custom exec node with an inserted exchange") {
    val out = TopKPerKey(df, Seq("key"), Seq(("score", true)), k = 2)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey ["), p) // exec node (Spark strips "Exec")
    assert(p.contains("Exchange hashpartitioning(key"), p)
  }
}
