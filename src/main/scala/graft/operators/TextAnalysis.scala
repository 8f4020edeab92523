package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation: language ID,
 * quality scoring, token counting, document fingerprinting.
 *
 * All are narrow per-row projections (no shuffle at all): at 100 TB they
 * run as a single map stage fused into the Parquet scan by whole-stage
 * codegen, and the needed columns are pruned at the reader. Everything is
 * built on portable primitives so the DuckDB oracle verifies values.
 */
object TextAnalysis {

  /** English function words — ONE list shared by [[langId]]'s en
    * markers, [[qualityScores]], [[qualityFilter]] and their SQL
    * mirrors, so editing it cannot desynchronize an operator from its
    * oracle. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** The same list as a DuckDB array literal. */
  val EnStopwordsSql: String = EnStopwords.mkString("['", "','", "']")

  /** Marker stopwords per language, alphabetical by language code.
    * (zh has no whitespace-delimited markers — it simply never wins.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> EnStopwords,
    "es" -> Seq("el", "y", "que", "los", "una"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq.empty)

  private def markerHits(ws: Column, markers: Seq[String]): Column =
    if (markers.isEmpty) lit(0)
    else size(filter(ws, w => array_contains(array(markers.map(lit): _*), w)))

  /** n-gram-heuristic language ID: count marker-word hits per language,
    * predict the argmax (first language in alphabetical order on ties —
    * matched exactly by the oracle's >=-chain CASE). */
  def langId(text: Column): Column = {
    val ws = Portable.words(text)
    val scored = LangMarkers.map { case (lang, ms) => (lang, markerHits(ws, ms)) }
    // left fold in alphabetical order, strict > keeps the earliest max
    scored.tail.foldLeft(struct(scored.head._2.as("h"), lit(scored.head._1).as("l"))) {
      case (acc, (lang, hits)) =>
        when(hits > acc.getField("h"), struct(hits.as("h"), lit(lang).as("l"))).otherwise(acc)
    }.getField("l")
  }

  /** DuckDB SQL expression for [[langId]] over column `text`. */
  def langIdSql: String = {
    def hits(ms: Seq[String]): String =
      if (ms.isEmpty) "0"
      else s"len(list_filter(${Portable.wordsSql("text")}, w -> list_contains(${ms.mkString("['", "','", "']")}, w)))"
    val hs = LangMarkers.map { case (lang, ms) => lang -> hits(ms) }
    // first-alphabetical argmax: lang_i wins when its hits >= all later ones
    // and > all earlier ones — equivalently a CASE chain in order with >=
    // against all others.
    val cases = hs.zipWithIndex.map { case ((lang, h), i) =>
      val conds = hs.zipWithIndex.collect {
        case ((_, h2), j) if j < i => s"$h > $h2"   // strictly beat earlier langs
        case ((_, h2), j) if j > i => s"$h >= $h2"  // ties beat later langs
      }
      val cond = if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"(CASE ${cases.mkString(" ")} END)"
  }

  /** BPE-ish token pattern: alpha runs, digit runs, single punctuation.
    * Same regex semantics in Java regex and RE2. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token statistics: whitespace tokens, BPE-ish tokens, chars/token. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(Portable.words(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"))
      .withColumn("chars_per_bpe_token",
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 4))

  /** Polynomial rolling-hash fingerprint of the full text:
    * fold((acc * 31 + codepoint) mod 1e9+7). A content fingerprint that
    * is order-sensitive (unlike a bag-of-words hash) and portable
    * (DuckDB: list_reduce + ord). */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L)

  def fingerprintSql(e: String): String =
    s"""list_reduce(
       |  list_prepend(0::BIGINT, list_transform(range(1, length($e) + 1),
       |    i -> ord(substr($e, i, 1))::BIGINT)),
       |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  /** Production fingerprint: one codegen'd 64-bit xxhash of the whole
    * text — order-sensitive like [[fingerprint]] but evaluated inside
    * whole-stage codegen with zero per-character work. Use when only
    * order-sensitivity matters, not the specific rolling-hash value. */
  def fingerprintFast(text: Column): Column = xxhash64(text)

  /** The rolling hash as a NATIVE codegen'd Catalyst expression —
    * value-identical to [[fingerprint]] (and the DuckDB oracle) without
    * the interpreted per-character HOF. Requires the session extension
    * `graft.functions.GraftExtensions` (check
    * `spark.catalog.functionExists("graft_rolling_hash")`). */
  def fingerprintNative(text: Column): Column =
    call_function("graft_rolling_hash", text)

  /** Quality scores: length, punctuation ratio, stopword ratio, mean
    * word length — the usual cheap pre-filters for training corpora. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val ws = Portable.words(col("text"))
    val stop = array(EnStopwords.map(lit): _*)
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(ws).as("n_words"),
      size(filter(ws, w => array_contains(stop, w))).as("n_stop"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_punct"))
      .withColumn("stop_ratio", round(col("n_stop").cast("double") / col("n_words"), 6))
      .withColumn("punct_ratio", round(col("n_punct").cast("double") / col("n_chars"), 6))
      .withColumn("mean_word_len",
        round((col("n_chars") - col("n_words") + 1).cast("double") / col("n_words"), 6))
  }

  /** Greedy contiguous SEQUENCE PACKING — the training-data step that
    * bins documents into fixed-budget training sequences ("sample
    * packing"): within each `source` partition, documents are laid out
    * in doc_id order and a document joins the pack its first token
    * lands in (`pack_id = start_offset DIV seqLen` — integer division,
    * exact at any offset; a doc straddling a boundary stays in the pack
    * it starts in, the overflow-to-next policy). Output is the packing
    * manifest: (source, pack_id, n_docs, pack_tokens).
    *
    * Scale shape: ONE window (cumulative sum) PARTITIONED by source +
    * one partial-aggregated groupBy — no global window (`WindowExec: No
    * Partition Defined` never appears). At 100 TB the partition key is
    * whatever the ingest shards by (source, day, shard id); each
    * partition sorts independently, and the rollup rides the same
    * exchange. Token counts use the BPE-ish regex (portable — same
    * semantics in the DuckDB oracle). */
  def packSequences(docs: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("n_tok"))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"start_off DIV $seqLen"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))
  }

  /** DuckDB oracle for [[packSequences]] (`//` = integer division).
    * DuckDB's windowed `sum(BIGINT)` returns HUGEINT and `//` keeps it,
    * so `pack_id` must be cast back to BIGINT to hash identically to
    * Spark's LONG (the round-3 q41 hash mismatch). */
  def packSequencesSql(tbl: String, seqLen: Int): String =
    s"""SELECT source, pack_id, count(*) AS n_docs, sum(n_tok)::BIGINT AS pack_tokens
       |FROM (
       |  SELECT source, (coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $seqLen)::BIGINT
       |    AS pack_id, n_tok
       |  FROM (SELECT doc_id, source,
       |      len(regexp_extract_all(text, '$BpePattern'))::BIGINT AS n_tok FROM $tbl))
       |GROUP BY source, pack_id""".stripMargin

  /** Fixed-context-window CHUNKING — the complement of
    * [[packSequences]]: packing joins short docs into one training
    * sequence; chunking splits long docs into overlapping
    * `chunkLen`-word windows every `stride` words (stride < chunkLen =
    * sliding overlap, stride == chunkLen = disjoint). Output one row per
    * chunk: (doc_id, chunk_id, chunk, n_words); the trailing chunk may
    * be short. Every word position is covered and chunk k of a doc is a
    * pure function of (text, k) — re-running over a re-sharded corpus
    * yields identical chunks, which is what makes sample-level lineage
    * possible downstream.
    *
    * Scale shape: the chunk array is built INSIDE one projection
    * (transform over sequence, slice per k) and exploded by a generator
    * in the scan task — the words array never rides the exploded rows,
    * no shuffle anywhere; output ∝ Σ ceil(doc_len/stride). */
  def chunkSequences(docs: DataFrame, chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
      s"chunkSequences(chunkLen=$chunkLen, stride=$stride)")
    docs
      .select(col("doc_id"), Portable.words(col("text")).as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(ws) - 1) DIV $stride),
           |  k -> struct(
           |    concat_ws(' ', slice(ws, CAST(k * $stride + 1 AS INT), $chunkLen)) AS chunk,
           |    CAST(least($chunkLen, size(ws) - k * $stride) AS INT) AS n_words))""".stripMargin))
        .as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id"), col("c.chunk").as("chunk"),
        col("c.n_words").as("n_words"))
  }

  /** DuckDB oracle for [[chunkSequences]] (`//` = integer division,
    * `list_slice` bounds are inclusive). */
  def chunkSequencesSql(tbl: String, chunkLen: Int, stride: Int): String = {
    val ws = Portable.wordsSql("text")
    s"""SELECT doc_id, k::INT AS chunk_id,
       |  array_to_string(list_slice(ws, k * $stride + 1, k * $stride + $chunkLen), ' ')
       |    AS chunk,
       |  least($chunkLen, len(ws) - k * $stride)::INT AS n_words
       |FROM (SELECT doc_id, ws, unnest(range(0, (len(ws) - 1) // $stride + 1)) AS k
       |      FROM (SELECT doc_id, $ws AS ws FROM $tbl))""".stripMargin
  }

  /** Corpus VOCABULARY top-k: most frequent lower-cased BPE-ish tokens
    * with exact counts. Plan shape: explode -> hash-aggregate with
    * map-side partial counts (the per-token explosion never crosses the
    * wire un-combined) -> TakeOrderedAndProject (k-bounded per
    * partition, k-bounded merge on the driver — no global sort
    * materialization). Ties at the boundary break by token ascending,
    * so the result SET is deterministic. */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0)))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** DuckDB oracle for [[vocabTopK]]. */
  def vocabTopKSql(tbl: String, k: Int): String =
    s"""SELECT token, count(*)::BIGINT AS cnt
       |FROM (SELECT unnest(regexp_extract_all(lower(text), '$BpePattern')) AS token FROM $tbl)
       |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT $k""".stripMargin

  /** CORPUS TOKENIZATION — the upstream step that PRODUCES the engine's
    * `(doc_id, tokens)` sequences from raw text: word ids
    * `0..vocabSize-1` are the top-`vocabSize` corpus words by
    * (count desc, word asc) — exactly the [[vocabTopK]] set and tie
    * rule, so the vocab is deterministic — and out-of-vocabulary words
    * hash to `vocabSize + hash60(word) % oovBuckets` (the fixed OOV-
    * bucket scheme of hash-trick tokenizers; [[Portable.hash60]] keeps
    * the oracle bit-identical).
    *
    * Scale shape, in two phases: (1) the vocab aggregation is the ONLY
    * exchange — count partials are map-side-combined and the top-k is
    * k-bounded on every level (TakeOrderedAndProject), then collected
    * (≤ vocabSize rows, the bounded-collect discipline of
    * `kmeansCentroids`) into a PLAN-LITERAL lookup map; (2) the encode
    * is one projection fused into the scan — `transform(words, w ->
    * coalesce(map[w], oov(w)))` with the literal map, zero joins, zero
    * shuffles, so a 100 TB corpus tokenizes at scan speed and a doc's
    * ids are a pure function of (text, vocab) — re-shard-stable. A
    * subword/BPE tokenizer swaps the word split for a merge walk; the
    * vocab-literal + scan-fused-encode shape is the same. */
  def tokenize(docs: DataFrame, vocabSize: Int, oovBuckets: Int): DataFrame = {
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabSize)
      .collect().zipWithIndex.map { case (r, i) => r.getString(0) -> i }
    val m = map(vocab.flatMap { case (w, i) => Seq(lit(w), lit(i)) }.toIndexedSeq: _*)
    docs.select(col("doc_id"),
      transform(split(col("text"), " "), w =>
        coalesce(element_at(m, w),
          (lit(vocabSize) + pmod(Portable.hash60(w), lit(oovBuckets.toLong))).cast("int")))
        .as("tokens"))
  }

  /** DuckDB oracle for [[tokenize]] rendered per doc as (n_tok,
    * tokens_csv) — the vocab CTE mirrors the same count/tie rule and
    * the OOV arm mirrors hash60 (`('0x' || substr(md5(w),1,15))::BIGINT`). */
  def tokenizeSql(tbl: String, vocabSize: Int, oovBuckets: Int): String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
       |                  generate_subscripts(string_split(text, ' '), 1) AS pos
       |           FROM $tbl),
       |v AS (SELECT word, row_number() OVER (ORDER BY count(*) DESC, word ASC) - 1 AS id
       |      FROM w GROUP BY word ORDER BY count(*) DESC, word ASC LIMIT $vocabSize),
       |t AS (SELECT w.doc_id, w.pos,
       |             coalesce(v.id, $vocabSize +
       |               ('0x' || substr(md5(w.word), 1, 15))::BIGINT % $oovBuckets)::BIGINT AS tok
       |      FROM w LEFT JOIN v USING (word))
       |SELECT doc_id, count(*)::BIGINT AS n_tok,
       |       string_agg(tok, ',' ORDER BY pos) AS tokens_csv
       |FROM t GROUP BY doc_id""".stripMargin

  /** Space-canvas form of a text for the BPE merge walk: every
    * character becomes `char + ' '`, with one leading space, so every
    * symbol occurrence is exactly `' sym '`-delimited and a merge
    * `(a, b)` is ONE literal `replace(' a b ' -> ' ab ')`. The text's
    * own space characters double up into a `'   '` (3-space) run the
    * single-space merge pattern can never match across — word
    * boundaries are enforced by construction, no end-of-word marker
    * bookkeeping. Both engines scan left-to-right non-overlapping
    * (`' a a a '` -> `' aa a '` verified identical), so the walk is
    * deterministic and oracle-exact. */
  def bpeCanvas(text: Column): Column =
    concat(lit(" "), regexp_replace(text, "(.)", "$1 "))

  /** The corpus base alphabet: distinct characters, sorted, bounded by
    * `cap` (the collect is ≤ charset-size rows — the bounded-collect
    * discipline of `tokenize`'s vocab). Ids `0..A-1` in sorted order. */
  def bpeAlphabet(docs: DataFrame, cap: Int = 256): Seq[String] =
    docs.select(explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= " ").distinct()
      .orderBy(col("ch")).limit(cap)
      .collect().map(_.getString(0)).toIndexedSeq

  /** BPE TRAINING — learn `nMerges` merge rules from the corpus, the
    * standard top-pair iteration (Sennrich et al. 2016): each round
    * counts ADJACENT SYMBOL PAIRS over the current canvases (one
    * map-side-combined aggregation; pairs from a zip of the symbol
    * array with its own tail — no self-join), picks the most frequent
    * pair (count desc, pair asc — total order, so training is
    * deterministic), rewrites every canvas with that one merge, and
    * repeats. Each round's state is rebased via [[Mat.materializeIter]]
    * (k rounds would otherwise nest k replaces into one
    * ever-re-analyzed plan), and the per-round driver traffic is ONE
    * row (the winning pair). Work per round is one corpus pass —
    * training cost is nMerges passes, the textbook shape. */
  def bpeTrain(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var canv = Mat.materializeIter(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .select(bpeCanvas(col("w")).as("c")))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.size < nMerges && !done) {
      val syms = split(trim(col("c")), " ")
      val top = canv
        .select(explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1).as("a"),
          slice(syms, lit(2), size(syms) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val prev = canv
        canv = Mat.materializeIter(
          prev.select(replace(col("c"), lit(s" $a $b "), lit(s" $a$b ")).as("c")))
        canv.count() // force before releasing the previous round
        prev.unpersist(false)
      }
    }
    canv.unpersist(false)
    merges.toIndexedSeq
  }

  /** BPE ENCODE — subword tokenization under a FIXED merge list (the
    * production serving path; [[bpeTrain]] learns the list, but an
    * encoder must run under the exact vocabulary its model was trained
    * with, so merges/alphabet arrive as arguments and become PLAN
    * LITERALS — the `tokenize` discipline, which is also what makes
    * the DuckDB oracle value-exact).
    *
    * Scale shape: the whole merge walk is `nMerges` nested literal
    * `replace` calls on the doc-level canvas — codegen'd string ops
    * fused into ONE scan-task projection; the only interpreted step is
    * the final symbol→id lookup HOF (same as `tokenize`). Zero joins,
    * zero shuffles (spec-asserted); ids are a pure function of
    * (text, merges, alphabet) — re-shard-stable. Ids: alphabet chars
    * `0..A-1` (sorted), merge symbol i `A+i` (first-wins when two
    * merge paths produce the same surface string), OOV symbols hash to
    * `A+M + hash60(sym) % oovBuckets`. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      alphabet: Seq[String], oovBuckets: Int): DataFrame = {
    val merged = merges.foldLeft(bpeCanvas(col("text"))) { case (c, (a, b)) =>
      replace(c, lit(s" $a $b "), lit(s" $a$b "))
    }
    val base = alphabet.size + merges.size
    val vocab = bpeVocab(merges, alphabet)
    val m = map(vocab.flatMap { case (s, i) => Seq(lit(s), lit(i)) }.toIndexedSeq: _*)
    docs.select(col("doc_id"),
      transform(split(trim(merged), " +"), s =>
        coalesce(element_at(m, s),
          (lit(base) + pmod(Portable.hash60(s), lit(oovBuckets.toLong))).cast("int")))
        .as("tokens"))
  }

  /** Symbol→id table: sorted alphabet first, then merge symbols in
    * merge order; first occurrence wins on surface-string collisions
    * (two merge paths can produce the same string). */
  def bpeVocab(merges: Seq[(String, String)], alphabet: Seq[String]): Seq[(String, Int)] = {
    val all = alphabet.sorted.zipWithIndex ++
      merges.zipWithIndex.map { case ((a, b), i) => (a + b, alphabet.size + i) }
    val seen = scala.collection.mutable.LinkedHashMap[String, Int]()
    all.foreach { case (s, i) => if (!seen.contains(s)) seen += s -> i }
    seen.toIndexedSeq
  }

  /** DuckDB oracle for [[bpeEncode]], rendered per doc as (n_tok,
    * tokens_csv): the same literal merge chain (`replace` nesting), the
    * same `' +'` split, the vocab as a VALUES join, the OOV arm as the
    * inline md5-prefix hash60. */
  def bpeEncodeSql(tbl: String, merges: Seq[(String, String)],
      alphabet: Seq[String], oovBuckets: Int): String = {
    def esc(s: String): String = s.replace("'", "''")
    val chain = merges.foldLeft(s"' ' || regexp_replace(text, '(.)', '\\1 ', 'g')") {
      case (c, (a, b)) => s"replace($c, ' ${esc(a)} ${esc(b)} ', ' ${esc(a + b)} ')"
    }
    val base = alphabet.size + merges.size
    val values = bpeVocab(merges, alphabet)
      .map { case (s, i) => s"('${esc(s)}', $i)" }.mkString(", ")
    s"""WITH c AS (SELECT doc_id, $chain AS canv FROM $tbl),
       |s AS (SELECT doc_id,
       |             unnest(regexp_split_to_array(trim(canv), ' +')) AS sym,
       |             generate_subscripts(regexp_split_to_array(trim(canv), ' +'), 1) AS pos
       |      FROM c),
       |t AS (SELECT s.doc_id, s.pos,
       |             coalesce(v.id, $base +
       |               ('0x' || substr(md5(s.sym), 1, 15))::BIGINT % $oovBuckets)::BIGINT AS tok
       |      FROM s LEFT JOIN (VALUES $values) v(sym, id) ON s.sym = v.sym)
       |SELECT doc_id, count(*)::BIGINT AS n_tok,
       |       string_agg(tok, ',' ORDER BY pos) AS tokens_csv
       |FROM t GROUP BY doc_id""".stripMargin
  }

  /** Deterministic stratified CORPUS MIXING — the "data mixture" step
    * that reweights sources before training (upsample wiki, downsample
    * crawl): each document is kept iff `hash32('mix#'||source||':'||
    * doc_id) mod 10^6 < ppm(source)`, a per-parts-per-million rate from
    * `rates` (sources absent from the map use `defaultPpm`). Kept rows
    * carry `weight = 10^6 / ppm` for loss reweighting.
    *
    * Scale shape: hash-threshold (deterministic Bernoulli) sampling is
    * SHUFFLE-FREE — one codegen'd projection + filter fused into the
    * scan; no per-source count, no window, no sort, so it runs at scan
    * speed on 100 TB and the decision for a given doc is stable across
    * reruns, engines, and cluster sizes (reproducible subsets — the
    * property quota/reservoir sampling loses). Exact integer threshold
    * compare; the weight division is IEEE-exact in both engines. */
  def mixSample(docs: DataFrame, rates: Map[String, Int], defaultPpm: Int): DataFrame = {
    val ppm = rates.foldLeft(lit(defaultPpm)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r)).otherwise(acc)
    }
    docs
      .select(col("doc_id"), col("source"), ppm.as("ppm"),
        (Portable.hash32(concat(lit("mix#"), col("source"), lit(":"),
          col("doc_id").cast("string"))) % 1000000L).as("draw"))
      .filter(col("draw") < col("ppm"))
      .select(col("doc_id"), col("source"),
        round(lit(1000000.0) / col("ppm"), 6).as("weight"))
  }

  /** DuckDB oracle for [[mixSample]]. */
  def mixSampleSql(tbl: String, rates: Map[String, Int], defaultPpm: Int): String = {
    val ppmCase = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString("(CASE ", " ", s" ELSE $defaultPpm END)")
    val draw = Portable.hash32Sql("'mix#' || source || ':' || CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source, round(1000000.0 / ppm, 6) AS weight FROM (
       |  SELECT doc_id, source, $ppmCase AS ppm, $draw % 1000000 AS draw FROM $tbl)
       |WHERE draw < ppm""".stripMargin
  }

  /** Deterministic TRAIN/VAL/TEST split assignment — the other half of
    * the sampling story next to [[mixSample]]: every doc gets exactly
    * one split label from a hash draw over its id, so the assignment is
    * (1) disjoint and exhaustive by construction, (2) identical across
    * cluster sizes, re-shards and engines (the property a random() or
    * `randomSplit` assignment loses — those change membership on every
    * re-run, silently leaking val docs into train), and (3) stable under
    * corpus growth: adding docs never moves an existing doc's split.
    * `splits` are (label, ppm) with ppm summing to 1,000,000.
    *
    * Scale shape: ONE codegen-fused projection riding the scan — zero
    * shuffles, zero coordination (plan-asserted in the spec). */
  def splitAssign(docs: DataFrame, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) && splits.map(_._2.toLong).sum == 1000000L,
      s"splitAssign ppm must be positive and sum to 1000000: $splits")
    val cum = splits.map(_._2.toLong).scanLeft(0L)(_ + _).tail
    // linear CASE chain (each branch referenced once — no 2^N blowup)
    val label = splits.zip(cum).dropRight(1).foldRight(lit(splits.last._1)) {
      case (((name, _), c), acc) => when(col("draw") < c, lit(name)).otherwise(acc)
    }
    docs
      .select(col("doc_id"), col("source"),
        (Portable.hash32(concat(lit("split#"), col("doc_id").cast("string")))
          % 1000000L).as("draw"))
      .select(col("doc_id"), col("source"), label.as("split"))
  }

  /** DuckDB oracle for [[splitAssign]]. */
  def splitAssignSql(tbl: String, splits: Seq[(String, Int)]): String = {
    val cum = splits.map(_._2.toLong).scanLeft(0L)(_ + _).tail
    val cases = splits.zip(cum).dropRight(1)
      .map { case ((name, _), c) => s"WHEN draw < $c THEN '$name'" }
      .mkString(" ")
    val draw = Portable.hash32Sql("'split#' || CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source,
       |  CASE $cases ELSE '${splits.last._1}' END AS split
       |FROM (SELECT doc_id, source, $draw % 1000000 AS draw FROM $tbl)""".stripMargin
  }

  // ------------------------------------------------------------------ PII

  /** PII patterns — written to mean the same thing in Java regex (Spark)
    * and RE2 (DuckDB): character classes, bounded repetition and `\b`
    * word boundaries only (no backrefs, no lookaround — RE2 has
    * neither). Digit-run boundaries keep the patterns disjoint on any
    * input: an IPv4 octet is 1-3 digits (never 7+), digits inside an
    * email abut word characters (no `\b`), so the three counts never
    * double-count one substring. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{7,15}\\b"

  /** PII detection + redaction — the scrubbing pass every training
    * corpus runs before the tokenizer: count emails / IPv4 addresses /
    * long digit runs (phone-shaped), and rewrite the text with typed
    * placeholders. Redaction order is email -> IP -> phone so the
    * broader digit-run pattern only sees digits that survived the
    * structured patterns.
    *
    * Scale shape: a single narrow projection (regex count + chained
    * `regexp_replace`), fused into the scan by whole-stage codegen — no
    * shuffle, runs at scan speed on 100 TB like [[qualityScores]]. */
  def piiRedact(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhonePattern), lit(0))).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>").as("clean_text"))

  /** DuckDB oracle for [[piiRedact]] over table/CTE `tbl` (RE2 needs the
    * explicit 'g' flag to replace every match; Spark replaces all by
    * default). */
  def piiRedactSql(tbl: String): String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailPattern'))::INT AS n_emails,
       |  len(regexp_extract_all(text, '$Ipv4Pattern'))::INT AS n_ips,
       |  len(regexp_extract_all(text, '$PhonePattern'))::INT AS n_phones,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailPattern', '<EMAIL>', 'g'),
       |    '$Ipv4Pattern', '<IP>', 'g'),
       |    '$PhonePattern', '<PHONE>', 'g') AS clean_text
       |FROM $tbl""".stripMargin

  // ----------------------------------------------------------- repetition

  /** Intra-document REPETITION signals (the Gopher-style quality
    * filters): fraction of duplicated words and duplicated word bigrams
    * within each document. Boilerplate, keyword-stuffed and
    * degenerate-generation text scores high; prose scores low. Ratio =
    * 1 - distinct/total (0 when every n-gram is unique).
    *
    * Scale shape: per-row array expressions only — the words array is
    * staged ONCE per row (HOF lambdas are interpreted, no codegen CSE,
    * so re-deriving it per reference would re-run the regex split four
    * times); no shuffle anywhere. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val staged = docs.select(
      col("doc_id"),
      Portable.words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        Portable.shinglesFromWords(col("ws"), 2).as("g2"))
    staged.select(
      col("doc_id"),
      size(col("ws")).as("n_words"),
      size(array_distinct(col("ws"))).as("n_distinct_words"),
      size(col("g2")).as("n_2grams"),
      size(array_distinct(col("g2"))).as("n_distinct_2grams"))
      .withColumn("dup_word_ratio",
        round(lit(1.0) - col("n_distinct_words") / col("n_words"), 6))
      .withColumn("dup_2gram_ratio",
        round(lit(1.0) - col("n_distinct_2grams") / col("n_2grams"), 6))
  }

  /** DuckDB oracle for [[repetitionStats]]. */
  def repetitionStatsSql(tbl: String): String = {
    val ws = Portable.wordsSql("text")
    val g2 = Portable.shinglesSql("text", 2)
    s"""SELECT doc_id,
       |  len(ws)::INT AS n_words,
       |  len(list_distinct(ws))::INT AS n_distinct_words,
       |  len(g2)::INT AS n_2grams,
       |  len(list_distinct(g2))::INT AS n_distinct_2grams,
       |  round(1.0 - len(list_distinct(ws)) / len(ws), 6) AS dup_word_ratio,
       |  round(1.0 - len(list_distinct(g2)) / len(g2), 6) AS dup_2gram_ratio
       |FROM (SELECT doc_id, $ws AS ws, $g2 AS g2 FROM $tbl)""".stripMargin
  }

  /** Composite QUALITY FILTER — the C4/Gopher-style rule pass every
    * training pipeline runs as its first gate: each heuristic emits an
    * explainable per-rule boolean, `keep` is their conjunction, and
    * every signal rides one codegen-fused projection (ZERO shuffles —
    * filtering at scan speed on 100 TB, like [[qualityScores]]). Rules
    * (thresholds are the knobs; defaults tuned so both outcomes occur
    * on the synthetic corpus):
    *  - `r_len`: word count in [minWords, maxWords] (fragments and
    *    concatenation blobs out);
    *  - `r_stop`: stopword ratio >= minStopRatio (natural language has
    *    function words; code/tables/gibberish mostly don't);
    *  - `r_punct`: punctuation ratio <= maxPunctRatio (markup/ASCII-art
    *    out);
    *  - `r_dup`: duplicate-word ratio <= maxDupRatio (keyword stuffing
    *    and degenerate generations out). */
  def qualityFilter(docs: DataFrame, minWords: Int = 20, maxWords: Int = 10000,
      minStopRatio: Double = 0.02, maxPunctRatio: Double = 0.2,
      maxDupRatio: Double = 0.6): DataFrame = {
    val staged = docs.select(col("doc_id"), col("text"), Portable.words(col("text")).as("ws"))
    staged.select(
      col("doc_id"),
      size(col("ws")).as("n_words"),
      round(size(filter(col("ws"), w =>
        array_contains(array(EnStopwords.map(lit): _*), w)))
        .cast("double") / size(col("ws")), 6).as("stop_ratio"),
      // empty text would divide 0/0 (Spark NULL vs DuckDB NaN) — pin 0.0
      when(length(col("text")) === 0, lit(0.0)).otherwise(
        round(size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0)))
          .cast("double") / length(col("text")), 6)).as("punct_ratio"),
      round(lit(1.0) - size(array_distinct(col("ws"))).cast("double") / size(col("ws")), 6)
        .as("dup_word_ratio"))
      .withColumn("r_len", col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_stop", col("stop_ratio") >= minStopRatio)
      .withColumn("r_punct", col("punct_ratio") <= maxPunctRatio)
      .withColumn("r_dup", col("dup_word_ratio") <= maxDupRatio)
      .withColumn("keep", col("r_len") && col("r_stop") && col("r_punct") && col("r_dup"))
  }

  /** DuckDB oracle for [[qualityFilter]]. */
  def qualityFilterSql(tbl: String, minWords: Int = 20, maxWords: Int = 10000,
      minStopRatio: Double = 0.02, maxPunctRatio: Double = 0.2,
      maxDupRatio: Double = 0.6): String = {
    val ws = Portable.wordsSql("text")
    s"""SELECT doc_id, n_words, stop_ratio, punct_ratio, dup_word_ratio,
       |  (n_words >= $minWords AND n_words <= $maxWords) AS r_len,
       |  (stop_ratio >= $minStopRatio) AS r_stop,
       |  (punct_ratio <= $maxPunctRatio) AS r_punct,
       |  (dup_word_ratio <= $maxDupRatio) AS r_dup,
       |  ((n_words >= $minWords AND n_words <= $maxWords) AND stop_ratio >= $minStopRatio
       |   AND punct_ratio <= $maxPunctRatio AND dup_word_ratio <= $maxDupRatio) AS keep
       |FROM (
       |  SELECT doc_id, len(ws)::INT AS n_words,
       |    round(len(list_filter(ws, w -> list_contains($EnStopwordsSql, w)))::DOUBLE
       |      / len(ws), 6) AS stop_ratio,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
       |                / length(text), 6) END AS punct_ratio,
       |    round(1.0 - len(list_distinct(ws))::DOUBLE / len(ws), 6) AS dup_word_ratio
       |  FROM (SELECT doc_id, text, $ws AS ws FROM $tbl))""".stripMargin
  }

  /** Term pattern for [[tfidfTopK]]: alphanumeric runs over lower-cased
    * text (punctuation excluded — symbols carry no salience and would
    * dominate raw-ratio idf on short docs). */
  val TermPattern = "[a-z0-9]+"

  /** Per-document top-k SALIENT terms by tf-idf — the keyword-extraction
    * pass of a curation pipeline (topic tagging, per-domain term drift,
    * boilerplate spotting). `score = tf * (N / df)`: term frequency
    * scaled by inverse document frequency as the raw ratio rather than
    * its logarithm — the ratio keeps every arithmetic step a single
    * IEEE-754 exactly-rounded operation (one integer product below 2^53,
    * one double divide), so Spark and the DuckDB oracle agree BIT-exactly
    * where `ln` implementations may differ in the last ulp. Ranking is
    * (score desc, term asc) — fully deterministic.
    *
    * Plan shape at scale: explode -> two hash-aggregates with map-side
    * partial counts (tf keyed by (doc, term), df keyed by term — the df
    * input is the ALREADY-aggregated tf rows, one per distinct (doc,
    * term), never the raw token stream), an equi-join on term, the
    * corpus size N rides in as a broadcast 1-row cross join (no driver
    * collect), and the final top-k is a per-doc-keyed window whose
    * partitions are bounded by per-doc vocabulary — no global sort, no
    * single-task funnel anywhere. */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    // tf feeds BOTH the scored rows and the df aggregate below —
    // materialize it once (persist-with-lineage, [[Mat]]) so the
    // explode+aggregate over the corpus runs a single time instead of
    // once per consumer
    val tf = Mat.materialize(docs
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit(TermPattern), lit(0))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Unigram SURPRISAL quality scoring — the n-gram-LM quality filter of
    * CCNet-style pipelines (rank documents by how "surprising" their
    * words are under a corpus LM; gibberish and boilerplate sit at the
    * extremes): each term occurrence contributes
    * `bits(t) = len(bin(total_count DIV count(t)))` — the bit width of
    * the integer inverse frequency, i.e. `floor(log2(total/cnt)) + 1`.
    * Deliberately INTEGER-EXACT: a float `ln`-based perplexity differs
    * across engines in the last ulp and sums in engine-specific order,
    * while integer surprisals sum associatively — so Spark and the
    * DuckDB oracle agree bit-for-bit (same trick as q58's raw-ratio
    * idf). The ordering signal is the same as log-perplexity up to
    * per-term rounding.
    *
    * Plan shape: explode -> (doc, term) hash-aggregate with map-side
    * partials (tf, materialized once — it feeds the corpus counts AND
    * the scoring join), term-count aggregate, equi-join on term, corpus
    * total as a broadcast 1-row cross join, final per-doc aggregate.
    * No window, no sort, no driver collect. */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val tf = Mat.materialize(docs
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit(TermPattern), lit(0))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val cnt = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val tot = cnt.agg(sum(col("cnt")).as("total"))
    tf.join(cnt, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("bits", length(bin(expr("total DIV cnt"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_terms"), sum(col("tf") * col("bits")).as("bits_sum"))
      .withColumn("mean_bits", round(col("bits_sum").cast("double") / col("n_terms"), 6))
  }

  /** DuckDB oracle for [[unigramSurprisal]] (`//` = integer division;
    * `bin` is unpadded in both engines). */
  def unigramSurprisalSql(tbl: String): String =
    s"""WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$TermPattern')) AS term
       |           FROM $tbl),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM w GROUP BY doc_id, term),
       |c AS (SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY term),
       |n AS (SELECT sum(cnt)::BIGINT AS total FROM c),
       |sc AS (SELECT tf.doc_id, tf.tf, length(bin(n.total // c.cnt))::BIGINT AS bits
       |       FROM tf JOIN c USING (term) CROSS JOIN n)
       |SELECT doc_id, sum(tf)::BIGINT AS n_terms, sum(tf * bits)::BIGINT AS bits_sum,
       |  round(sum(tf * bits)::DOUBLE / sum(tf), 6) AS mean_bits
       |FROM sc GROUP BY doc_id""".stripMargin

  /** Deterministic GLOBAL SHUFFLE into ordered training shards — the
    * export step that randomizes document order before sequence packing
    * / training (SGD wants an order uncorrelated with crawl order).
    * Each doc draws a 32-bit hash; shard = range-bin of the draw
    * (`draw * nShards DIV 2^32`), position = rank within the shard by
    * (draw, doc_id). Because shards are RANGE bins of the draw, the
    * concatenation shard 0, 1, ... in position order IS one global
    * deterministic permutation — identical across engines, cluster
    * sizes and re-shards (what `orderBy(rand())` loses), and stable
    * enough to resume an interrupted export mid-shard.
    *
    * Scale shape: one exchange keyed by shard + per-shard sort (the
    * window is PARTITIONED — never a global `WindowExec: No Partition
    * Defined`); `nShards` bounds per-task rows (pick corpus/nShards ≈
    * a few hundred MB). The draw hash is portable md5 so the DuckDB
    * oracle checks the exact permutation. */
  def shuffleShards(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("draw"), col("doc_id"))
    docs
      .select(col("doc_id"),
        Portable.hash32(concat(lit("shuf#"), col("doc_id").cast("string"))).as("draw"))
      .withColumn("shard", expr(s"(draw * $nShards) DIV 4294967296").cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** DuckDB oracle for [[shuffleShards]]. */
  def shuffleShardsSql(tbl: String, nShards: Int): String = {
    val draw = Portable.hash32Sql("'shuf#' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id, $draw AS draw FROM $tbl),
       |s AS (SELECT doc_id, draw, ((draw * $nShards) // 4294967296)::INT AS shard FROM d)
       |SELECT doc_id, shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY draw, doc_id)::INT AS pos
       |FROM s""".stripMargin
  }

  /** DuckDB oracle for [[tfidfTopK]]. */
  def tfidfTopKSql(tbl: String, k: Int): String =
    s"""WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$TermPattern')) AS term
       |           FROM $tbl),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM w GROUP BY doc_id, term),
       |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*)::BIGINT AS n_docs FROM $tbl),
       |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |         (tf.tf * n.n_docs)::DOUBLE / df.df AS score
       |       FROM tf JOIN df USING (term) CROSS JOIN n),
       |rk AS (SELECT *, row_number() OVER (
       |         PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank FROM sc)
       |SELECT doc_id, rank, term, tf, df, score FROM rk WHERE rank <= $k""".stripMargin
}
