package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Portable deterministic hashing primitives.
 *
 * Everything here is built only from functions that exist with identical
 * semantics in BOTH Spark SQL and DuckDB (`md5`, `substr`, `instr`,
 * arithmetic), so any operator composed from these can be verified
 * value-for-value by the driver's DuckDB oracle — not just a row-count
 * check. All hashes are pure functions of their input strings: no seed
 * state, no wall clock, no `rand()` (the determinism rule the reference's
 * synthetic source also follows, `streamreader/.../StreamReader.java:96-167`).
 *
 * Performance note: `md5` is not whole-stage-codegen'd as tightly as
 * the native hashes, so the CDC hot path (graft.lake / graft.apply)
 * uses Spark's codegen'd murmur3 `hash()` (which doubles as the shuffle
 * partitioner — see [[graft.lake.LakeTable.bucketExpr]]); these
 * portable hashes are for the oracle-checked
 * training-data operators (dedup / LSH / fingerprinting), where the
 * dominant cost is the shingling itself, not the hash.
 */
object Portable {

  /** Decode one hex nibble at 1-based position `i` of hex string `m`:
    * ascii('0'..'9') = 48..57, ascii('a'..'f') = 97..102. */
  private def nibble(m: Column, i: Int): Column = {
    val a = ascii(substring(m, i, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  private def nibbleSql(m: String, i: Int): String =
    s"(CASE WHEN ascii(substr($m, $i, 1)) >= 97 THEN ascii(substr($m, $i, 1)) - 87" +
      s" ELSE ascii(substr($m, $i, 1)) - 48 END)"

  /** Uniform non-negative 32-bit hash of a string column: first 8 hex
    * nibbles of md5, interpreted positionally. Implemented as ONE
    * md5 + conv(hex,16,10) — binding `md5(c)` to a Scala val and
    * decoding nibble-by-nibble would embed the digest 8x in the tree,
    * and higher-order-function lambdas run interpreted (no codegen
    * subexpression elimination), so each extra reference is a full
    * re-digest. DuckDB has no conv(); its equivalent [[hash32Sql]]
    * decodes nibbles positionally — same value, oracle-verified. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** First 15 md5 nibbles as a long — 60 bits, always non-negative,
    * never overflows the signed cast. The set-identity hash of the LSH
    * index's stored gram sets ([[graft.operators.LshIndex]]); the
    * native mirror is [[NativeText.hash60]] (high 60 bits of the same
    * digest) — value-identity is spec-asserted. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL text computing the same value as [[hash32]] over `e`.
    * `e` must be free of single quotes (we only pass column refs). */
  def hash32Sql(e: String): String =
    (1 to 8).map(i => s"${nibbleSql(s"md5($e)", i)}::BIGINT * ${1L << (4 * (8 - i))}")
      .mkString("(", " + ", ")")

  /** ±1 sign derived from a salted md5: +1 when the first hex digit of
    * md5(salt || '#' || s) is < '8' (an unbiased coin). DuckDB equivalent:
    * [[signSql]]. */
  def sign(c: Column, salt: Column): Column =
    when(substring(md5(concat(salt.cast("string"), lit("#"), c)), 1, 1) < "8", lit(1)).otherwise(lit(-1))

  def signSql(e: String, salt: String): String =
    s"(CASE WHEN substr(md5(CAST($salt AS VARCHAR) || '#' || $e), 1, 1) < '8' THEN 1 ELSE -1 END)"

  /** Salted md5 hex digest — the MinHash draw. Lexicographic order over
    * equal-length hex strings equals numeric order, so `min()` over these
    * IS a minhash. */
  def saltedMd5(c: Column, salt: Int): Column = md5(concat(lit(s"$salt#"), c))

  def saltedMd5Sql(e: String, salt: Int): String = s"md5('$salt#' || $e)"

  /** Whitespace word array (trimmed). Matches DuckDB
    * `regexp_split_to_array(trim(x), '\s+')`. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  val wordsSql: String => String = e => s"regexp_split_to_array(trim($e), '\\s+')"

  /** Shingles from a pre-split words array — prefer this over
    * [[shingles]] in operators: HOF lambdas are interpreted (no codegen
    * CSE), so staging `words()` in its own projection avoids re-running
    * the regex split once per reference. */
  def shinglesFromWords(ws: Column, n: Int): Column =
    when(size(ws) <= n, array(concat_ws(" ", ws)))
      .otherwise(transform(
        sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))

  /** Word-level n-gram shingles joined with single spaces: for a doc of w
    * words, the (w-n+1) strings words[i..i+n). DuckDB equivalent:
    * [[shinglesSql]]. Empty/short docs yield a single shingle of the
    * whole text so no doc silently disappears. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromWords(words(text), n)

  def shinglesSql(e: String, n: Int): String = {
    val ws = wordsSql(e)
    s"""(CASE WHEN len($ws) <= $n THEN [array_to_string($ws, ' ')]
       | ELSE list_transform(range(1, len($ws) - ${n - 1} + 1),
       |        i -> array_to_string(list_slice($ws, i, i + ${n - 1}), ' ')) END)""".stripMargin
  }
}
