package graft.model

import org.apache.spark.sql.types._

/**
 * Core data model of the CDC / incremental-ingest engine.
 *
 * The change-event shape mirrors the reference's CDC record model
 * (DataX `otsstreamreader`: primary key + op type + sequence id, see
 * reference `otsstreamreader/.../core/MultiVerModeRecordSender.java:11-28`
 * and the per-shard sequence id at
 * `SingleVerAndUpOnlyModeRecordSender.java:94-100`), re-expressed as a
 * typed Spark schema over the tokenized-sequence payload
 * `(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)`.
 *
 * Ops collapse DataX's cell-level op types (U / DO / DA / DR) to row ops:
 *   I = insert, U = update (both are keyed upserts under MERGE semantics),
 *   D = delete. `lsn` is a globally increasing sequence (strictly
 *   increasing within each shard and within each key, since keys are
 *   shard-sticky) — the analog of DataX's `%010d_%020d_%010d_%s` seq id.
 */
object ChangeLog {

  /** Log schema *after* additive evolution: `lang` added, `n_tok`
    * widened int32→int64. Pre-evolution events carry lang=null and
    * n_tok values that fit in int32. */
  val schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("n_tok", LongType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)
  ))
}

final case class ChangeEvent(
    shard: Int,
    lsn: Long,
    op: String,
    doc_id: String,
    tokens: Array[Int],
    n_tok: java.lang.Long,
    source: String,
    lang: String)

/** One row of the target lake table (post-evolution shape). `lsn` is the
  * sequence number of the change that produced the row — the per-row
  * high-watermark that makes re-applied batches idempotent. */
final case class DocRow(
    doc_id: String,
    tokens: Array[Int],
    n_tok: java.lang.Long,
    source: String,
    lang: String,
    lsn: Long)

/** Generator / replay configuration. All randomness is seeded and
  * hash-derived — identical config => byte-identical log. */
final case class GenConfig(
    nEvents: Long = 100000L,
    nDocs: Long = 20000L,
    nShards: Int = 8,
    seed: Long = 42L,
    /** percentage points: insert / update / delete mix (DataX smoke-job
      * style deterministic synthesis, reference `streamreader`). */
    pctInsert: Int = 60,
    pctUpdate: Int = 30,
    /** probability (in 1/1000) that an event hits one of the hot keys —
      * the Zipf-ish skew knob (axis B). */
    hotPerMille: Int = 0,
    nHotDocs: Int = 8,
    /** mean token-array length (payload size knob). */
    avgTokens: Int = 32,
    tokenVocab: Int = 50000,
    /** events with lsn >= this carry the evolved schema (lang set);
      * Long.MaxValue = no evolution in this log. */
    evolveAtLsn: Long = Long.MaxValue,
    /** number of log segment files (= streaming micro-batch granularity). */
    nSegments: Int = 16)
