package graft

import graft.functions.Portable
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property tests for the portable (engine-agnostic) primitives. */
class PortableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def md5Prefix(s: String, n: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(n), 16)
  }

  test("hash28 equals the md5-hex-prefix definition") {
    import spark.implicits._
    val words = Seq("abc", "the quick brown fox", "", "key agg row")
    val got = words.toDF("s").select(Portable.hash28(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == words.map(md5Prefix(_, 7)))
    assert(got.forall(h => h >= 0 && h < (1L << 28)))
  }

  test("hash28Jvm equals the Column form and the md5-hex-prefix definition") {
    import spark.implicits._
    // the JVM twin must stay bit-identical to the Column/SQL forms — a
    // drift surfaces here as a named primitive failure, not as a confusing
    // downstream oracle mismatch (cms buckets, ANN plane weights)
    val words = Seq("abc", "0:42", "2:user_17", "plane_3_61", "", "key agg row")
    val viaColumn = words.toDF("s")
      .select(Portable.hash28(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(words.map(Portable.hash28Jvm) == viaColumn)
    assert(words.map(Portable.hash28Jvm) == words.map(md5Prefix(_, 7)))
  }

  test("shingles: n-gram count and content") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq("a b c d", "x y", "p q r").toDF("text")
      .select(Portable.tokens(col("text")).as("w"))
      .select(Portable.shingles(col("w"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b c", "b c d"), Nil, List("p q r")))
  }

  test("minhash permutation arithmetic stays in 64-bit range") {
    val maxH = (1L << 28) - 1
    Portable.MinhashPerms.foreach { case (a, b) =>
      assert(a > 0 && b >= 0)
      assert(a <= Int.MaxValue, "multiplier bounded")
      // a*h + b for max h must not overflow Long
      assert(a <= Long.MaxValue / maxH - 1)
      assert(BigInt(a) * maxH + b == BigInt(a * maxH + b))
    }
  }

  test("property: windowed-count invariant — counts sum to row count") {
    // SURVEY.md §5 item 4: sum of per-window counts == number of events,
    // under random event-time permutations
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(50)
      val base = 1704100000000L
      val times = Seq.fill(n)(base + rnd.nextInt(600000).toLong)
      val df = times.map(t => (new java.sql.Timestamp(t), rnd.nextInt(3)))
        .toDF("ts", "user_id")
      val total = df.groupBy(window(col("ts"), "1 minute"), col("user_id"))
        .count().agg(sum("count")).collect()(0).getLong(0)
      assert(total == n)
    }
  }
}
