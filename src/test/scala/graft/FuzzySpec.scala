package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Fuzzy

/** Property tests for the exact edit-distance join: the prefix-filter
  * candidate generator must be COMPLETE (vs a brute-force nested loop)
  * on random mutated corpora and on the adversarial low-gram regime
  * (short / highly repetitive strings) the gram bound cannot cover.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet")

  private def baseString(i: Int): String = {
    val r = new scala.util.Random(i)
    Seq.fill(4 + r.nextInt(3))(words(r.nextInt(words.length))).mkString(" ")
  }

  private def mutate(s: String, seed: Int, edits: Int): String = {
    val r = new scala.util.Random(seed * 7919 + edits)
    var cur = s
    (0 until edits).foreach { _ =>
      val pos = if (cur.isEmpty) 0 else r.nextInt(cur.length)
      r.nextInt(3) match {
        case 0 if cur.nonEmpty => cur = cur.take(pos) + cur.drop(pos + 1)
        case 1 =>
          cur = cur.take(pos) + ('a' + r.nextInt(26)).toChar + cur.drop(pos)
        case _ if cur.nonEmpty =>
          cur = cur.updated(pos, ('a' + r.nextInt(26)).toChar)
        case _ => cur = "x"
      }
    }
    cur
  }

  private def assertMatchesBruteForce(df: DataFrame, k: Int,
                                      expectNonEmpty: Boolean = true): Unit = {
    val got = Fuzzy.editDistanceJoin(df, "id", "s", k)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ref = df.as("a").join(df.as("b"), expr("a.id < b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .where(col("d") <= k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == ref,
      s"missing=${(ref -- got).take(5)} extra=${(got -- ref).take(5)}")
    if (expectNonEmpty) assert(ref.nonEmpty, "fixture produced no pairs")
  }

  test("editDistanceJoin == brute force on a mutated corpus (k=2)") {
    val rows = (0 until 40).flatMap { i =>
      val base = baseString(i)
      // edits 1..3 vs k=2: some copies qualify, some fall just outside
      Seq((i * 10L, base), (i * 10L + 1L, mutate(base, i, 1 + i % 3)))
    }
    assertMatchesBruteForce(rows.toDF("id", "s"), k = 2)
  }

  test("editDistanceJoin covers the low-gram regime (short/repetitive strings)") {
    val rows = Seq(
      (1L, "ab"), (2L, "abc"), (3L, "b"),           // below/at gram width
      (4L, "ababababab"), (5L, "bababababa"),       // 2 distinct grams each
      (6L, "aaaaaaaaaa"), (7L, "aaaaabaaaa"),       // 1 vs 4 distinct grams
      (8L, "a completely different sentence"))
    assertMatchesBruteForce(rows.toDF("id", "s"), k = 2)
  }

  test("editDistanceJoin at k=1 is strictly tighter than k=3") {
    val rows = (0 until 25).flatMap { i =>
      val base = baseString(i + 100)
      Seq((i * 10L, base), (i * 10L + 1L, mutate(base, i + 100, 1 + i % 4)))
    }.toDF("id", "s")
    assertMatchesBruteForce(rows, k = 1)
    assertMatchesBruteForce(rows, k = 3)
  }
}
