package graft.ops

import graft.llm.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution): find records that refer to the
  * same real-world entity despite typos, then assign every record its
  * cluster-canonical entity id. This is the master-data half of an
  * engine migration (the reference project's consolidation of customer
  * records across source systems) and the entity-dedup pass of a
  * training-data pipeline (author/site canonicalization).
  *
  * Shape (blocking + edit-distance match + transitive closure — the
  * classic Fellegi–Sunter architecture, distributed):
  *   1. BLOCK: records shuffle ONCE on a caller-supplied blocking key
  *      (prefix, soundex, sorted-neighborhood key, …). All-pairs is
  *      corpus-squared; blocked pairs are Σ block² — the same cost
  *      cliff the MinHash band join rides, and the only full-corpus
  *      shuffle in the operator.
  *   2. MATCH: per-block equi-self-join + `levenshtein(a, b, maxDist)`.
  *      The 3-arg threshold form abandons the DP once the running row
  *      minimum exceeds the bound (O(maxDist·min(|a|,|b|)) per pair,
  *      not O(|a|·|b|)) — at scale distances are only ever resolved to
  *      "≤ d or not", never computed exactly.
  *   3. CLUSTER: matched pairs → connected components (large-star/
  *      small-star alternation, O(log n) rounds) so A~B, B~C puts A and
  *      C in one entity even when dist(A, C) > maxDist — linkage is
  *      transitive even though edit distance is not.
  *
  * 100 TB notes: the match join never materializes cross-block pairs
  * and carries only (id, name) — match cost is independent of record
  * width. A hot block (thousands of records sharing one key) is the
  * skew knob: pick keys with bounded selectivity, or salt the hot keys
  * exactly like any other hot join key. CC's per-round cost is id-keyed
  * equi-joins on the (small) matched-pair graph, not the corpus.
  */
object Linkage {

  /** Matched candidate pairs (id_a < id_b, levenshtein ≤ maxDist) under
    * the blocking key. Pairs in different blocks are never compared —
    * that recall/cost trade is the caller's via `blockKey`.
    */
  def matches(records: DataFrame, idCol: String, nameCol: String,
              blockKey: Column, maxDist: Int): DataFrame = {
    val keyed = records.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockKey.as("blk"))
    val a = keyed.toDF("id_a", "name_a", "blk")
    val b = keyed.toDF("id_b", "name_b", "blk")
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      // threshold form returns -1 when the distance exceeds maxDist
      .filter(levenshtein(col("name_a"), col("name_b"), maxDist) >= 0)
      .select(col("id_a"), col("id_b"))
  }

  /** Every record with its resolved entity id: the minimum record id of
    * its match cluster; unmatched records are their own entity.
    * Output: (record_id, entity_id).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
              blockKey: Column, maxDist: Int): DataFrame = {
    val pairs = matches(records, idCol, nameCol, blockKey, maxDist)
    val comp = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "record_id")
    records.select(col(idCol).as("record_id"))
      .join(comp, Seq("record_id"), "left")
      .select(col("record_id"),
        coalesce(col("comp"), col("record_id")).as("entity_id"))
  }
}
