package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Beyond-reference surface (SURVEY §7.1.8): all pure narrow
  * transformations built from codegen'd `functions._` expressions — no
  * UDFs, no shuffles, no driver loops — so they scale linearly over 100 TB
  * of documents: each executor processes its Parquet splits independently.
  */
object TextAnalysis {

  /** Whitespace tokenization (the `\s+` split the oracle mirrors). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation: letter runs, single digits, single
    * punctuation marks — the GPT-2 pre-tokenizer shape without the merge
    * table, restricted to a regex subset Java and RE2 segment
    * identically (so DuckDB reproduces the counts bit-for-bit). A
    * training-data pipeline uses this as the cheap token-budget estimate
    * before the real tokenizer runs. */
  val SubwordPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit(SubwordPattern), lit(0))

  def subwordCount(text: Column): Column = size(subwordTokens(text))

  /** Stopword-profile language ID: count profile hits per language, pick
    * the max with a fixed priority order on ties (deterministic — the
    * DuckDB oracle mirrors the same CASE order). N-gram-free heuristic
    * chosen so both engines compute the identical formula. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "y", "que", "en"))

  def profileScore(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(words)))

  def langId(text: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => l -> profileScore(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
    // NOTE: foldRight gives priority to earlier profiles on ties ("en" wins)
  }

  /** Character-trigram language ID — the classic n-gram-profile shape
    * (Cavnar–Trenkle, fixed top-trigram profiles instead of trained
    * ranks so both engines compute the identical formula): lowercase,
    * collapse non-letters to single spaces, slide a 3-char window, count
    * profile hits per language, max with the fixed priority tiebreak.
    * Overlapping windows via `substr` over a position sequence — narrow,
    * no UDF, DuckDB mirrors it with list_transform(range, substr). */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "ing", "ion", "tio"),
    "de" -> Seq("der", "ein", "sch", "ich", "und"),
    "fr" -> Seq("les", "des", "que", "ait", "eur"),
    "es" -> Seq("los", "ado", "ara", "cio", "nte"))

  def charTrigrams(text: Column): Column = {
    val t = regexp_replace(lower(text), "[^a-z]+", " ")
    // guard: sequence(1, 0) auto-descends to [1, 0] — a <3-char text
    // must yield NO windows, as the oracle's range(1, 1) does
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
  }

  def langIdNgram(text: Column): Column = {
    val tris = charTrigrams(text)
    val scores = trigramProfiles.map { case (l, ps) =>
      l -> size(filter(tris, t => t.isInCollection(ps)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Winnowing fingerprint set (Schleimer et al.'s MOSS rolling-hash
    * scheme — the brief's "document fingerprinting (rolling hash)"):
    * token k-grams hashed (DuckDB-portable md5-60bit, [[Dedup.md5Hash60]]),
    * minimum per sliding window of `w` consecutive gram hashes, distinct
    * minima sorted. Guarantee: two documents sharing a run of ≥ w+k-1
    * tokens share at least one fingerprint — the candidate-generation
    * property that makes fingerprint equi-joins a near-dup blocking key
    * at corpus scale. Catalyst higher-order functions only: per-row,
    * narrow, no shuffle. Documents with fewer than k tokens fingerprint
    * to the empty set; with fewer than w grams, to the single global
    * minimum (the standard short-document degenerate case). */
  def winnowingFingerprints(text: Column, k: Int = 3, w: Int = 4): Column = {
    val toks = tokens(lower(trim(text)))
    val nt = size(toks)
    val hashes = transform(sequence(lit(1), nt - (k - 1)),
      i => Dedup.md5Hash60(concat_ws(" ", slice(toks, i, lit(k)))))
    val nh = size(hashes)
    val fulls = transform(sequence(lit(1), nh - (w - 1)),
      i => array_min(slice(hashes, i, lit(w))))
    // CaseWhen branches evaluate lazily, so the sequence bounds are only
    // computed where they are non-negative
    val sel = when(nt < k, array().cast("array<bigint>"))
      .when(nh < w, array(array_min(hashes)))
      .otherwise(fulls)
    array_sort(array_distinct(sel))
  }

  /** Word n-grams over an ALREADY-TOKENIZED array column. Call sites that
    * explode large gram sets should pre-project the token array into its
    * own column first: a lambda that captures the `split()` expression
    * re-evaluates it per element, while a captured attribute is a plain
    * array read ([[graft.pipeline.Contamination]] does this). */
  def ngramsOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Word n-grams as space-joined strings; empty array below n tokens. */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsOfTokens(tokens(trim(text)), n)

  /** Duplicate word-n-gram fraction — the MassiveText/Gopher repetition
    * filter (Rae et al. 2021 §A1.1: documents whose duplicate 2-gram /
    * 3-gram fraction exceeds a threshold are boilerplate or degenerate
    * repetition and get dropped before training). 0.0 for documents with
    * fewer than n tokens. Pure Catalyst HOFs — per-row, narrow, no
    * shuffle — and exactly reproducible in DuckDB (list comprehension +
    * list_distinct), so the driver hash-checks it end-to-end. */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val g = wordNgrams(text, n)
    when(size(g) === 0, lit(0.0))
      .otherwise((size(g) - size(array_distinct(g))).cast(DoubleType) /
        size(g).cast(DoubleType))
  }

  /** Quality score in [0,1]: blend of length saturation, stopword ratio,
    * alpha-character ratio, mean token length sanity. Deterministic
    * arithmetic only (oracle-mirrored). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val nCh = length(text).cast(DoubleType)
    val stop = profileScore(text, langProfiles.flatMap(_._2)).cast(DoubleType)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast(DoubleType)
    val lenSat = least(nTok / 100.0, lit(1.0))
    val stopRatio = least(stop / greatest(nTok, lit(1.0)) * 5.0, lit(1.0))
    val alphaRatio = alpha / greatest(nCh, lit(1.0))
    round((lenSat + stopRatio + alphaRatio) / 3.0, 6)
  }

  /** PII detection + redaction patterns, restricted to regex constructs
    * Java and RE2 match identically (so DuckDB reproduces spans
    * bit-for-bit): emails, NANP-style phone suffixes, IPv4 addresses.
    * A production pipeline swaps in stricter patterns / an NER pass; the
    * Spark shape — narrow per-row regexp, no shuffle — is the part that
    * has to scale. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Per-category PII match counts over the raw text. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailPattern)),
    "n_phones" -> regexp_count(text, lit(PhonePattern)),
    "n_ips" -> regexp_count(text, lit(Ipv4Pattern)))

  /** Redact PII with typed placeholders. Replacement order is fixed
    * (email → phone → IPv4) and mirrored by the oracle — order matters
    * once a replacement rewrites the string the next pattern scans. */
  def piiScrub(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailPattern, "[EMAIL]"), PhonePattern, "[PHONE]"), Ipv4Pattern, "[IP]")

  /** Control characters a crawl corpus should not carry into training:
    * C0 except tab/newline, DEL, and the C1 block (the classic mojibake
    * residue of a latin-1/utf-8 mix-up). Kept to a regex subset Java and
    * RE2 interpret identically so the DuckDB oracle matches bytewise. */
  val ControlCharPattern = "[\\x00-\\x08\\x0B-\\x1F\\x7F-\\x9F]"

  /** Unicode canonicalization for corpus text: NFC-normalize (via the
    * codegen [[graft.functions.NfcNormalize]] expression — combining
    * sequences collapse to precomposed forms so exact dedup, shingles,
    * and tokenization see one byte representation per canonically-equal
    * string), then strip control characters. Narrow, codegen'd, no
    * shuffle; the NFC fast path returns the input buffer untouched for
    * already-normalized (e.g. pure-ASCII) text. */
  def unicodeClean(text: Column): Column =
    // wrap the expression directly (no registry side effect — this is a
    // pure Column combinator; SQL clients get the same expression via
    // GraftExtensions / NfcNormalize.register)
    regexp_replace(graft.functions.NfcNormalize.ofColumn(text),
      ControlCharPattern, "")

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2, the heuristics
    * behind the C4 corpus), at line granularity: a line survives iff it
    * (a) ends in a terminal punctuation mark, (b) has at least
    * `minLineWords` words, and (c) does not mention "javascript";
    * kept lines of a surviving document are re-joined with newlines.
    * Pure per-row Catalyst HOFs — narrow, codegen'd, no shuffle —
    * mirrored exactly by a DuckDB list comprehension. (C4's bad-word list
    * and its three-sentence dedup are separate concerns: the latter is
    * [[PassageDedup]]; the former needs a list this repo does not ship.) */
  def c4KeptLines(text: Column, minLineWords: Int = 5): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l =>
      l.rlike("[.!?\"']$") &&
        size(split(l, "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))

  /** Document-level C4 gate over [[c4KeptLines]]: a document survives iff
    * it keeps at least `minLines` lines, does not contain "lorem ipsum"
    * (case-insensitive), and has no curly brace (code). Returns only
    * surviving documents as (id, clean_text). */
  def c4Clean(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLineWords: Int = 5,
      minLines: Int = 3): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol), c4KeptLines(t, minLineWords).as("__lines"), t)
      .filter(size(col("__lines")) >= minLines &&
        !lower(t).contains("lorem ipsum") && !t.contains("{"))
      .select(col(idCol), array_join(col("__lines"), "\n").as("clean_text"))
  }

  /** Gopher quality rules (Rae et al. 2021 §A1.1 / Table A1 — the
    * MassiveText document filter, the standard pre-training quality gate
    * beside C4): a document passes iff
    *   (a) word count in [minWords, maxWords],
    *   (b) mean word length in [3, 10] characters,
    *   (c) hash-or-ellipsis symbol-to-word ratio ≤ 0.1,
    *   (d) < 90 % of lines start with a bullet,
    *   (e) < 30 % of lines end with an ellipsis,
    *   (f) ≥ 80 % of words contain at least one alphabetic character,
    *   (g) at least 2 distinct words from the required-stopword list.
    * Returns each rule's measured value plus the `gopher_pass` verdict so
    * a pipeline can threshold differently without recomputing. Pure
    * per-row Catalyst HOFs (narrow, codegen'd, no shuffle), restricted to
    * constructs DuckDB mirrors bit-for-bit. */
  val GopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherQuality(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val toks = tokens(trim(t))
    val nW = size(toks).cast(DoubleType)
    val meanLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
      .cast(DoubleType) / greatest(nW, lit(1.0))
    val symbols = (regexp_count(t, lit("#")) +
      regexp_count(t, lit("\\.\\.\\."))).cast(DoubleType)
    val lines = transform(split(t, "\n"), l => trim(l))
    val nL = size(lines).cast(DoubleType)
    val bullet = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*"))).cast(DoubleType) /
      greatest(nL, lit(1.0))
    val ellipsis = size(filter(lines, l => l.endsWith("..."))).cast(DoubleType) /
      greatest(nL, lit(1.0))
    val alphaFrac = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast(DoubleType) /
      greatest(nW, lit(1.0))
    // one tokenization: a lambda capturing the split() expression would
    // re-run the regex per stopword (see ngramsOfTokens doc above)
    val nStop = size(array_intersect(
      array_distinct(tokens(lower(trim(t)))), typedLit(GopherStopwords)))
    docs.select(col(idCol),
      nW.cast(LongType).as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbols / greatest(nW, lit(1.0)), 6).as("symbol_ratio"),
      round(bullet, 6).as("bullet_ratio"),
      round(ellipsis, 6).as("ellipsis_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStop.as("n_stopwords"),
      (nW >= minWords && nW <= maxWords &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        symbols / greatest(nW, lit(1.0)) <= 0.1 &&
        bullet < 0.9 && ellipsis < 0.3 &&
        alphaFrac >= 0.8 && nStop >= 2).as("gopher_pass"))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text.
    * (The shingle rolling-hash near-dup fingerprint lives in Dedup.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Corpus vocabulary: top-`k` whitespace tokens by occurrence count,
    * ranked with the deterministic (count desc, token asc) tiebreak.
    * One narrow explode + one count shuffle; the rank is the two-phase
    * salt-cell shape ([[Sampling.topNPerGroup]] with one group): phase 1
    * ranks within `salts` hash cells of the aggregated vocab and keeps
    * each cell's local top k, so the final global window sorts at most
    * `salts`·k rows — never the full distinct-token table, which on a
    * web-scale corpus is heavy-tailed (typos/URLs/numbers, billions of
    * rows) and would otherwise funnel through ONE task. Provably equal
    * to the single global window: (cnt desc, token asc) is a total
    * order (tokens are unique post-aggregate), and its restriction to a
    * cell is the cell's order, so every global top-k row is in its own
    * cell's top k. */
  def vocabulary(docs: DataFrame, k: Int, textCol: String = "text",
      minTokenLength: Int = 0, salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"vocabulary k $k must be >= 1")
    require(salts >= 1, s"vocabulary salts $salts must be >= 1")
    val counts = docs.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minTokenLength)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val order = Seq(col("cnt").desc, col("token").asc)
    val cell = Window.partitionBy(
      Sampling.hashBucket(col("token"), salts, "vocab")).orderBy(order: _*)
    counts.withColumn("__lr", row_number().over(cell))
      .filter(col("__lr") <= k).drop("__lr")
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .filter(col("rank") <= k)
  }

  /** Per-document out-of-vocabulary rate: the fraction of token
    * OCCURRENCES not in `vocab` (a `(token, …)` DataFrame, typically
    * [[vocabulary]]'s output — broadcast, it is small by construction).
    * Rounded to 6 decimals for engine-portable comparison. */
  def oovRate(docs: DataFrame, vocab: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(1).as("__in"))),
        Seq("token"), "left_outer")
      .groupBy(idCol)
      .agg(round(avg(when(col("__in").isNull, 1.0).otherwise(0.0)), 6).as("oov"))

  /** Fixed-size token chunking with overlap — the context-window packing
    * step of a training-data pipeline: chunk i covers tokens
    * [i·stride, i·stride + chunkTokens), stride = chunkTokens − overlap;
    * the last chunk keeps the (possibly shorter) tail. One output row per
    * (doc, chunk) with the chunk text rejoined and its token count.
    * Narrow end-to-end: tokenize → per-row `sequence` of chunk starts →
    * `posexplode` of slices — no shuffle, no UDF, scales with input
    * splits. Chunk COUNT per doc is ⌈(n − overlap) / stride⌉ (min 1), so
    * total output volume is ~n/stride tokens per doc — bounded expansion
    * the planner can see. */
  def chunk(docs: DataFrame, chunkTokens: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap $overlap must be in [0, chunkTokens=$chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nChunks = greatest(lit(1L),
      ceil((n.cast(DoubleType) - overlap) / stride).cast(LongType))
    docs
      .select(col(idCol), toks.as("__toks"),
        sequence(lit(0L), (nChunks - 1L) * stride, lit(stride.toLong)).as("__starts"))
      .select(col(idCol), posexplode(transform(col("__starts"),
        st => slice(col("__toks"), st.cast(IntegerType) + 1, lit(chunkTokens)))))
      .select(col(idCol), col("pos").cast(IntegerType).as("chunk_ix"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).as("chunk_tokens"))
  }

  /** All-in-one annotation: adds lang_pred / quality / n_tokens / fp. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fp", fingerprint(t))
  }

  /** Per-document top-`k` keywords by smoothed TF-IDF
    * (`tf · (ln((N+1)/(df+1)) + 1)`, the sklearn smooth-idf formula).
    *
    * Scale shape: term frequencies are one (doc, term) shuffle with
    * map-side combine; document frequencies derive from THAT aggregate
    * (never a second corpus pass — `tf` is checkpointed so the scoring
    * join reuses it); the vocabulary join shuffles on term (NOT broadcast
    * — a 100 TB corpus's vocabulary is executor-sized, not driver-sized);
    * the rank is a doc-partitioned window. Ranking compares the ROUNDED
    * score (6 decimals) with a term-asc tiebreak so the winner is
    * identical across engines — raw-double ordering can flip near-equal
    * scores on the last ulp of `ln`. */
  def tfidfTopK(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text", checkpointTf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "tfidfTopK: k must be positive")
    val n = docs.count().toDouble
    val tf0 = docs
      .select(col(idCol), explode(tokens(lower(trim(col(textCol))))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val tf = if (checkpointTf) tf0.localCheckpoint() else tf0
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val score = round(col("tf") *
      (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0), 6)
    tf.join(df, Seq("term"))
      .select(col(idCol), col("term"), score.as("tfidf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rank") <= k)
  }
}
