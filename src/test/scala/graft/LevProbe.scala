package graft

/** Micro-probe: throughput of Spark's capped levenshtein on
  * fixture-shaped inputs (driver-side loop over UTF8Strings), to decide
  * whether a custom DP kernel is worth building. Not a contract surface. */
object LevProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(1)
    val words = Array("alpha", "beta", "gamma", "delta", "omega", "sigma",
      "kappa", "lambda", "zeta", "theta")
    def doc(n: Int): String =
      (1 to n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    def mutate(s: String, edits: Int): String = {
      val sb = new StringBuilder(s)
      (1 to edits).foreach { _ =>
        val i = rnd.nextInt(sb.length)
        rnd.nextInt(3) match {
          case 0 => sb.setCharAt(i, ('a' + rnd.nextInt(26)).toChar)
          case 1 => sb.insert(i, ('a' + rnd.nextInt(26)).toChar)
          case 2 => sb.deleteCharAt(i)
        }
      }
      sb.toString
    }
    val base = (1 to 200).map(_ => doc(300)) // ~1800 chars
    val pairs = base.map(s => (UTF8String.fromString(s),
      UTF8String.fromString(mutate(s, 5 + rnd.nextInt(50)))))
    val farPairs = (1 to 200).map(_ => (UTF8String.fromString(doc(300)),
      UTF8String.fromString(doc(300))))
    def bench(nm: String, ps: Seq[(UTF8String, UTF8String)], reps: Int): Unit = {
      var sink = 0L
      val t0 = System.nanoTime()
      (1 to reps).foreach { _ =>
        ps.foreach { case (a, b) => sink += a.levenshteinDistance(b, 64) }
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"LEVPROBE $nm: ${ps.size * reps} calls in $dt%.2fs = " +
        f"${dt * 1e6 / (ps.size * reps)}%.1f us/call (sink=$sink)")
    }
    def benchNew(nm: String, ps: Seq[(UTF8String, UTF8String)], reps: Int): Unit = {
      var sink = 0L
      val t0 = System.nanoTime()
      (1 to reps).foreach { _ =>
        ps.foreach { case (a, b) =>
          sink += graft.functions.LevCapped.distance(a, b, 64) }
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"LEVPROBE $nm [kernel]: ${ps.size * reps} calls in $dt%.2fs = " +
        f"${dt * 1e6 / (ps.size * reps)}%.1f us/call (sink=$sink)")
    }
    bench("warmup", pairs, 3)
    benchNew("warmup", pairs, 3)
    bench("near(<=55 edits)", pairs, 10)
    benchNew("near(<=55 edits)", pairs, 10)
    bench("far(unrelated)", farPairs, 10)
    benchNew("far(unrelated)", farPairs, 10)
    println("avg len = " + pairs.map(_._1.numChars()).sum / pairs.size)
  }
}
