package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `documents` shape
  * (doc_id, text, ...) — the streaming side of the batch dedup family
  * (`graft.operators.Dedup`).
  */
object DocStreams {

  case class DupMapOut(doc_id: Long, canonical_id: Long, is_duplicate: Boolean)

  /** Streaming exact-dedup MAP: for every arriving document emit
    * (doc_id, canonical_id, is_duplicate), where the canonical is the
    * first-seen id for that content fingerprint (min id within the
    * first micro-batch it appears in, so a single-batch run reproduces
    * the batch `Dedup.exactGroups` canonical exactly).
    *
    * Spark's built-in streaming `dropDuplicates` can only FILTER;
    * pipelines that tombstone or re-link duplicates need the map, which
    * requires custom state: one long per distinct fingerprint — the
    * minimum possible exact-dedup state. Keyed by the fingerprint, so
    * the state store shards evenly at any scale. A production stream
    * over an unbounded corpus would bound state with a TTL
    * (`GroupStateTimeout.EventTimeTimeout` + document timestamps, the
    * `dropDuplicatesWithinWatermark` contract); the documents fixture
    * carries no event time, so state here is exact and unbounded.
    */
  def streamingDupMap(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))
      .as[(Long, String)]
    typed.groupByKey(_._2)
      .flatMapGroupsWithState[Long, DupMapOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          // ascend by id: deterministic within a micro-batch, and the
          // canonical of a fresh fingerprint is the batch-minimum id
          val ids = rows.map(_._1).toArray.sorted
          var canon = state.getOption.getOrElse(-1L)
          val out = new Array[DupMapOut](ids.length)
          var i = 0
          while (i < ids.length) {
            if (canon < 0) {
              canon = ids(i)
              state.update(canon)
              out(i) = DupMapOut(ids(i), canon, is_duplicate = false)
            } else {
              out(i) = DupMapOut(ids(i), canon, is_duplicate = true)
            }
            i += 1
          }
          out.iterator
      }.toDF()
  }
}
