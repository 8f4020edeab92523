package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The reference's per-record transformer surface (`dx_*`), re-expressed
 * as Column combinators so the whole chain stays inside whole-stage
 * codegen (DataX runs them reflectively per record in the reader thread,
 * `core/.../transport/transformer/TransformerRegistry.java:28-39`).
 *
 * Semantics are matched to the reference implementations, including the
 * documented null/edge behavior:
 *  - dx_substr: null passes through; start beyond the value is a dirty
 *    record in DataX (`SubstrTransformer.java:44-60`) — here it yields
 *    null and the row can be routed by [[graft.apply.DirtyRouter]];
 *  - dx_pad: null/empty pads from ""; values longer than `length` are
 *    TRUNCATED to `length` (`PadTransformer.java:46-72`);
 *  - dx_replace: splice-replace of [start, start+length) with the
 *    replacement (`ReplaceTransformer.java:21-65`);
 *  - dx_filter: records matching the predicate are DROPPED
 *    (`FilterTransformer.java:20-311`); `like` is a full-match Java
 *    regex (`matches`!) — mapped to rlike anchored both ends; null never
 *    matches order comparisons (lines 74, 134).
 *
 * A chain is a plain `Seq[DataFrame => DataFrame]` applied in order —
 * the analog of the job-config transformer list
 * (`TransformerExchanger.java:53-127`), declared in
 * [[graft.model.JobSpec]].
 */
object Transformers {

  /** dx_substr(col, start, length): 0-based start like the reference. */
  def dxSubstr(c: Column, start: Int, subLen: Int): Column =
    when(c.isNull, lit(null)).otherwise(
      when(lit(start) >= length(c), lit(null)) // DataX: dirty record
        .otherwise(substring(c, start + 1, subLen)))

  /** dx_pad(col, "l"|"r", length, padString). Longer values truncate. */
  def dxPad(c: Column, leftOrRight: String, len: Int, pad: String): Column = {
    val base = coalesce(c, lit(""))
    val padded = leftOrRight.toLowerCase match {
      case "l" => lpad(base, len, pad)
      case "r" => rpad(base, len, pad)
      case other => throw new IllegalArgumentException(s"dx_pad: '$other' is not l|r")
    }
    // lpad/rpad already truncate to len in both Spark and DataX
    padded
  }

  /** dx_replace(col, start, length, replaceString): splice. */
  def dxReplace(c: Column, start: Int, spliceLen: Int, replacement: String): Column =
    when(c.isNull, lit(null)).otherwise(
      concat(substring(c, 1, start), lit(replacement),
        substring(c, start + spliceLen + 1, Int.MaxValue - 16)))

  /** dx_filter predicate for one column: TRUE means the record is
    * DROPPED (reference semantics). Ops: like / not like / > < >= <= =
    * != . `like` is Java `String.matches` — a FULL match — so the regex
    * is anchored. Null values never match order comparisons. */
  def dxFilterPred(c: Column, op: String, value: String): Column = op match {
    case "like" => c.isNotNull && c.rlike(s"^(?:$value)$$")
    case "not like" => c.isNotNull && !c.rlike(s"^(?:$value)$$")
    case ">" => c.isNotNull && c > value
    case "<" => c.isNotNull && c < value
    case ">=" => c.isNotNull && c >= value
    case "<=" => c.isNotNull && c <= value
    case "=" => if (value == "null") c.isNull else c === value
    case "!=" => if (value == "null") c.isNotNull else c =!= value
    case other => throw new IllegalArgumentException(s"dx_filter: unknown op '$other'")
  }

  /** Apply dx_filter: drop records where the predicate holds. */
  def dxFilter(df: DataFrame, c: Column, op: String, value: String): DataFrame =
    df.filter(!coalesce(dxFilterPred(c, op, value), lit(false)))
}
