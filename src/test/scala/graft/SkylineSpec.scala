package graft

import graft.operators.Skyline

/** Two-phase distributed skyline vs brute-force dominance. */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("two-phase skyline equals brute force and is partitioning-invariant") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 2000)
      .map(_ => (rnd.nextInt(1000).toDouble, rnd.nextInt(1000).toLong)).distinct
    def dom(q: (Double, Long), p: (Double, Long)) =
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2)
    val brute = pts.filter(p => !pts.exists(q => dom(q, p))).toSet
    val df = pts.toDF("a", "b")
    val got = Skyline.skyline2(df, "a", "b").as[(Double, Long)].collect().toSet
    assert(got === brute)
    val got2 = Skyline.skyline2(df.repartition(17), "a", "b")
      .as[(Double, Long)].collect().toSet
    assert(got2 === brute)
    // 2-D frontier shape: sorted by a, b strictly decreases
    val sorted = got.toSeq.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Seq((_, b1), (_, b2)) => b2 < b1
      case _ => true
    })
  }
}
