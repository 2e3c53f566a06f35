package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives — the ingest edge of a continuously
  * refreshed corpus: apply a keyed changelog to materialize the current
  * snapshot, and diff two snapshots to find what a pipeline rebuild
  * actually changed. The reference's surface stops at immutable
  * registered tables (`context.rs:57-107`); a training-data pipeline
  * re-lands sources daily, so upsert-apply and snapshot-diff are the two
  * operations that make incremental refresh auditable.
  *
  * Scale shape: `applyChangelog` is one hash aggregation (map-side
  * partial max) to find each key's latest sequence plus one equi-join
  * back — no window, so no per-key sort and no single hot reducer; both
  * exchanges hash-partition on the key. `snapshotDiff` fingerprints each
  * side map-side (md5 — the one hash the differential oracle shares) so
  * the full-outer join shuffles 2 fixed-width columns per row, never the
  * payload.
  */
object Cdc {

  /** Materialize the current snapshot from a changelog: for each key keep
    * the change with the highest `seqCol`; if that winning change is a
    * delete (`opCol == deleteOp`) the key is absent from the snapshot.
    * `seqCol` must be unique per key (a commit LSN / kafka offset is) —
    * the join-back on (key, max seq) then selects exactly one row.
    */
  def applyChangelog(changes: DataFrame, keyCol: String, seqCol: String,
                     opCol: String, deleteOp: String = "D"): DataFrame =
    latestChanges(changes, keyCol, seqCol)
      .where(col(opCol) =!= lit(deleteOp))

  /** Each key's winning change INCLUDING delete tombstones — the
    * intermediate state an INCREMENTAL merge must carry: dropping a
    * winning delete early would let an out-of-order older change
    * resurrect the key in a later batch. latest-seq-wins is associative
    * and commutative, so `latestChanges(state ∪ batch)` converges to the
    * full-changelog answer under ANY batch split — the property the
    * streaming upsert entry pins differentially.
    */
  def latestChanges(changes: DataFrame, keyCol: String,
                    seqCol: String): DataFrame = {
    val latest = changes.groupBy(col(keyCol)).agg(max(col(seqCol)).as(seqCol))
    changes.join(latest, Seq(keyCol, seqCol))
  }

  /** Row-level diff of two snapshots keyed by `keyCol`: one row per key
    * whose membership or content changed, with status
    * 'added' / 'removed' / 'changed' (identical rows are dropped).
    * Content identity is md5 over `contentCols` joined with '|'.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
                   contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    def fp(df: DataFrame, out: String) = df.select(
      col(keyCol),
      md5(concat_ws("|", contentCols.map(c => col(c).cast("string")): _*))
        .as(out))
    fp(before, "__before").join(fp(after, "__after"), Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__before").isNull, lit("added"))
          .when(col("__after").isNull, lit("removed"))
          .when(col("__before") =!= col("__after"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }

  /** Slowly-changing-dimension Type 2: turn the keyed changelog into a
    * full VERSION HISTORY — one row per surviving change carrying its
    * validity interval [`valid_from` = own seq, `valid_to` = the NEXT
    * change's seq for the key, NULL while current) and an `is_current`
    * flag. A delete tombstone emits no version but still CLOSES the
    * previous one (its seq becomes that row's valid_to) — dropping
    * deletes before the interval computation would leave the dead
    * version open forever, the classic SCD2 bug. Where [[applyChangelog]]
    * answers "what is true now", this answers "what was true when" — the
    * as-of reconstruction audits and point-in-time joins need.
    *
    * Scale shape: one window partitioned BY KEY ordered by seq — per-key
    * state is the changelog depth of that key (days of changes, not the
    * corpus), and keys spread across the hash exchange; no global sort,
    * no single hot reducer.
    */
  def scd2History(changes: DataFrame, keyCol: String, seqCol: String,
                  opCol: String, deleteOp: String = "D"): DataFrame =
    scd2State(changes, keyCol, seqCol, opCol, deleteOp)
      .where(col(opCol) =!= lit(deleteOp))

  /** The SCD2 STATE an incremental merge carries: [[scd2History]] plus
    * the delete tombstones as interval rows of their own (is_current
    * always false — a tombstone is never a visible version). Keeping
    * tombstones in the state is the same discipline [[latestChanges]]
    * pins for snapshots: drop them and a later out-of-order change can
    * no longer learn which interval a delete closed (two consecutive
    * deletes leave NO trace in the history — a change landing between
    * them would stay open forever). Filter `opCol != deleteOp` to read
    * the visible history.
    */
  def scd2State(changes: DataFrame, keyCol: String, seqCol: String,
                opCol: String, deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("valid_from", col(seqCol))
      .withColumn("is_current",
        col("valid_to").isNull && col(opCol) =!= lit(deleteOp))
  }

  /** Merge a NEW changelog batch into an existing [[scd2State]] output
    * without recomputing closed versions — the only affordable daily
    * refresh of a 100 TB dimension: only keys PRESENT in the batch have
    * their per-key interval chain rebuilt (batch-size × changelog-depth
    * work); every other key's rows pass through untouched, never leaving
    * their partitions for a window. Because the state retains every
    * change row with its original columns (the interval columns are
    * derived, so they strip and rebuild losslessly), the fold
    * `scd2Incremental(scd2State(b₁), b₂, …)` converges to
    * `scd2State(b₁ ∪ b₂ ∪ …)` under ANY batch split — including
    * out-of-order sequence interleavings (OpsSpec pins the property).
    *
    * Scale shape: batch keys broadcast into one semi- and one anti-join
    * over the state; the window runs only over touched keys' rows.
    */
  def scd2Incremental(state: DataFrame, batch: DataFrame, keyCol: String,
                      seqCol: String, opCol: String,
                      deleteOp: String = "D"): DataFrame = {
    val keys = batch.select(col(keyCol)).distinct()
    val touched = state.drop("valid_to", "valid_from", "is_current")
      .join(keys, Seq(keyCol), "left_semi")
    val untouched = state.join(keys, Seq(keyCol), "left_anti")
    untouched.unionByName(
      scd2State(touched.unionByName(batch), keyCol, seqCol, opCol, deleteOp))
  }

  /** Incremental maintenance of a grouped count/sum aggregate — the
    * materialized-view refresh that never rescans the base table. `state`
    * is yesterday's aggregate (groupCol, cntCol, sumCol); `delta` carries
    * signed contribution rows (groupCol, d_cnt, d_val): an insert is
    * (+1, +v), a delete (−1, −v_old), an update (0, v_new − v_old). The
    * merge aggregates the delta batch, unions it with the state and
    * re-aggregates — sum/count form a commutative monoid, so the result
    * equals the full recompute under ANY batch split (the differential
    * oracle recomputes from scratch; green IS that identity). Groups
    * whose count reaches zero leave the view.
    *
    * Scale shape: cost is O(|state| + |delta|) — state is
    * group-cardinality-sized and the delta is batch-sized, so refreshing
    * a 100 TB base costs the day's changes, not the corpus. Both inputs
    * partial-aggregate map-side before one hash exchange on the group.
    */
  def incrementalAgg(state: DataFrame, delta: DataFrame, groupCol: String,
                     cntCol: String = "cnt", sumCol: String = "total"): DataFrame =
    state.select(col(groupCol), col(cntCol), col(sumCol))
      .unionByName(delta.groupBy(col(groupCol)).agg(
        sum(col("d_cnt")).as(cntCol), sum(col("d_val")).as(sumCol)))
      .groupBy(col(groupCol))
      .agg(sum(col(cntCol)).as(cntCol), sum(col(sumCol)).as(sumCol))
      .where(col(cntCol) > 0)

  /** Incremental maintenance of a materialized JOIN view (delta-join
    * refresh): `view` is yesterday's `fact ⋈ dim` result; today's upsert
    * batches touched `factDeltaKeys` fact rows and `dimDeltaKeys` dim
    * rows. Only rows involving a touched key are recomputed — a view row
    * is stale iff its fact key was upserted OR its dim key changed, so
    * the refresh is: anti-join the view against both (broadcast) key
    * sets to carry untouched rows bit-identically, re-join only the
    * touched slice of the CURRENT fact table against the CURRENT dim.
    * The result equals the full `fact ⋈ dim` recompute (the
    * differential oracle) at delta-proportional cost — the only
    * affordable daily refresh of a 100 TB enriched fact view.
    *
    * Scale shape: both delta key sets are batch-sized and broadcast, so
    * the carried path is two broadcast anti-joins (no shuffle of the
    * view); the recompute path semi-joins the fact table down to
    * touched rows BEFORE the dim join. Inner-join semantics: a dim
    * delta that drops a key removes its rows from the view.
    *
    * `fact`/`dim` are the POST-merge current tables; `fkCol` names the
    * fact-side join column, `dimKey` the dim-side one (must differ —
    * the output carries both).
    */
  def incrementalJoin(view: DataFrame, fact: DataFrame, dim: DataFrame,
                      factDeltaKeys: DataFrame, dimDeltaKeys: DataFrame,
                      factKey: String, fkCol: String, dimKey: String): DataFrame = {
    require(fkCol != dimKey, "fact-side and dim-side key columns must differ")
    val fk = broadcast(factDeltaKeys.select(col(factKey)).distinct())
    val dk = broadcast(dimDeltaKeys.select(col(dimKey)).distinct())
    val carried = view
      .join(fk, Seq(factKey), "left_anti")
      .join(dk.withColumnRenamed(dimKey, fkCol), Seq(fkCol), "left_anti")
      .select(view.columns.map(col): _*) // USING-joins float the key first
    val touched = fact
      .join(fk.withColumn("__tf", lit(1)), Seq(factKey), "left")
      .join(dk.withColumnRenamed(dimKey, fkCol).withColumn("__td", lit(1)),
        Seq(fkCol), "left")
      .where(col("__tf").isNotNull || col("__td").isNotNull)
      .drop("__tf", "__td")
    val recomputed = touched.join(dim, col(fkCol) === col(dimKey))
    carried.unionByName(recomputed.select(view.columns.map(col): _*))
  }
}
