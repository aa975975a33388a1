package graft

import graft.functions.EditDistanceUtil
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Banded bounded edit distance vs the builtin, exhaustively and in-plan. */
class EditDistanceSpec extends SparkSuite {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  private def fullLev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  test("within(a, b, k) decides exactly lev <= k on random pairs, k = 0..4") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    def word() = Seq.fill(rnd.nextInt(9))(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 3000) {
      val (a, b) = (word(), word())
      val d = fullLev(a, b)
      for (k <- 0 to 4)
        assert(EditDistanceUtil.within(u(a), u(b), k) === (d <= k),
          s"a=$a b=$b k=$k d=$d")
    }
  }

  test("edge cases: empty strings, identical, band boundary") {
    assert(EditDistanceUtil.within(u(""), u(""), 0))
    assert(EditDistanceUtil.within(u(""), u("abc"), 3))
    assert(!EditDistanceUtil.within(u(""), u("abc"), 2))
    assert(EditDistanceUtil.within(u("same"), u("same"), 0))
    assert(!EditDistanceUtil.within(u("abc"), u("xyz"), 2))
    assert(EditDistanceUtil.within(u("abc"), u("xyz"), 3))
  }

  test("registered expression agrees with the builtin inside a plan (codegen path)") {
    val rnd = new scala.util.Random(11)
    def word() = Seq.fill(rnd.nextInt(8) + 1)("abcd"(rnd.nextInt(4))).mkString
    val pairs = Seq.fill(500)((word(), word())).toDF("a", "b")
    val disagree = pairs
      .withColumn("fast", call_function("lev_within", col("a"), col("b"), lit(2)))
      .withColumn("exact", levenshtein(col("a"), col("b")) <= 2)
      .filter(col("fast") =!= col("exact"))
    assert(disagree.count() === 0)
  }
}
