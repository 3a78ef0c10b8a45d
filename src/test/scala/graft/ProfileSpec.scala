package graft

import graft.operators.Profile

/** tableStats: both execution strategies produce the identical stats
  * table, and the stats are right on a hand-built frame. */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-pass and single-pass tableStats agree; known answers") {
    val df = Seq((1, Option("a")), (2, Option("b")), (2, None), (3, Option("a")))
      .toDF("k", "s")
    val multi = Profile.tableStats(df, Seq("k", "s"))
      .orderBy("column").collect().toSeq
    val single = Profile.tableStats(df, Seq("k", "s"), singlePass = true)
      .orderBy("column").collect().toSeq
    assert(multi === single)
    val k = multi(0)
    assert(k.getString(0) === "k" && k.getLong(1) === 4 && k.getLong(2) === 4 &&
      k.getLong(3) === 3 && k.getString(4) === "1" && k.getString(5) === "3")
    val s = multi(1)
    assert(s.getString(0) === "s" && s.getLong(2) === 3 && s.getLong(3) === 2 &&
      s.getString(4) === "a" && s.getString(5) === "b")
  }
}
