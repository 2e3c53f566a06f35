package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity join — every pair of rows whose strings
  * are within Levenshtein distance `k`, without an all-pairs comparison.
  * The fuzzy-matching counterpart of [[Dedup]]'s Jaccard family: MinHash
  * banding finds APPROXIMATE set-overlap candidates; this finds EXACT
  * character-edit matches (titles, names, near-identical short fields).
  *
  * Algorithm (q-gram prefix filtering, the Ed-Join / ssjoin scheme from
  * the public string-similarity-join literature):
  *   1. each edit operation destroys at most `q` of a string's character
  *      q-grams, so ed(a,b) <= k implies the DISTINCT-gram sets satisfy
  *      |A ∩ B| >= max(|A|,|B|) - k*q;
  *   2. order all grams by a single global total order (corpus frequency,
  *      rarest first — computed by one aggregation) and keep each string's
  *      first min(|A|, k*q+1) grams as its PREFIX: by the prefix-filter
  *      lemma, any pair meeting the bound in (1) shares at least one
  *      prefix gram, so an equi-join on prefix grams is a COMPLETE
  *      candidate generator;
  *   3. pairs where BOTH sides have <= k*q distinct grams (ultra-short or
  *      ultra-repetitive strings, where the bound in (1) is vacuous) are
  *      generated separately by a length-filtered join of that residual
  *      bucket with itself — for natural keys of length >= q + k*q the
  *      bucket is empty, and its members are bounded-length by
  *      construction;
  *   4. candidates verify with `levenshtein(a, b, k)` — Spark's
  *      threshold form abandons the DP row once the band exceeds k.
  *
  * Scale shape: one scan builds grams, one aggregation builds the global
  * frequency order, the per-string prefix rank is a window over <= |s|
  * rows (never corpus-wide), and the candidate join keys are the RAREST
  * grams first — a gram shared by c strings contributes c² candidate
  * pairs only if it survives into prefixes, which frequent grams almost
  * never do. Nothing here is O(n²) on the corpus; the verify step touches
  * candidate pairs only.
  */
object Fuzzy {

  /** All pairs (a_id, b_id, a_len, b_len, dist) with
    * levenshtein(str_a, str_b) <= k and a_id < b_id.
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       k: Int, q: Int = 3): DataFrame = {
    require(k >= 1 && q >= 2, s"need k >= 1 and q >= 2, got k=$k q=$q")
    val prefixLen = k * q + 1

    val strs = df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("s"))
      .where(col("s").isNotNull)
      .withColumn("len", length(col("s")))

    // distinct character q-grams per string (strings shorter than q have
    // none and can only pair through the low-gram bucket)
    val grams = strs
      .select(col("id"), explode(expr(
        s"transform(sequence(1, greatest(length(s) - ${q - 1}, 0)), " +
          s"i -> substring(s, i, $q))")).as("gram"))
      .distinct()

    val gramCounts = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))

    // global rarity order (count, gram) — one small aggregation; ties
    // break on the gram text so the order is total and deterministic
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("freq"))

    val prefixes = grams.join(freq, "gram")
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("freq"), col("gram"))))
      .where(col("rk") <= prefixLen)
      .select(col("id"), col("gram"))

    val prefixPairs = prefixes.as("a")
      .join(prefixes.as("b"),
        expr("a.gram = b.gram AND a.id < b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()

    // residual bucket: both sides low-gram (bound (1) vacuous there) —
    // empty whenever strings carry > k*q distinct grams
    val lowIds = gramCounts.where(col("n_grams") <= k * q)
      .select(col("id"))
      .unionAll(strs.where(col("len") < q).select(col("id")))
      .distinct()
    val lowPairs = lowIds.as("a")
      .join(lowIds.as("b"), expr("a.id < b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))

    val candidates = prefixPairs.unionAll(lowPairs).distinct()

    candidates
      .join(strs.select(col("id").as("a_id"), col("s").as("a_s"),
        col("len").as("a_len")), "a_id")
      .join(strs.select(col("id").as("b_id"), col("s").as("b_s"),
        col("len").as("b_len")), "b_id")
      .where(abs(col("a_len") - col("b_len")) <= k)
      .withColumn("dist", expr(s"levenshtein(a_s, b_s, $k)"))
      .where(col("dist") >= 0 && col("dist") <= k)
      .select(col("a_id"), col("b_id"), col("a_len"), col("b_len"),
        col("dist"))
  }
}
