package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Contamination, Dedup, Dsir, Sampling, TextAnalysis}

/** End-to-end training-data CURATION scenario over the real testdata
  * documents table — the composition run a 100 TB pipeline user would
  * execute, chaining the operators the driver checks in isolation:
  *
  *   raw → PII scrub + unicode clean → quality gate (Gopher metrics,
  *   rethresholded for the short synthetic docs) → language filter →
  *   exact dedup → MinHash-LSH near-dup clustering (min-id
  *   representative per cluster) → benchmark-contamination scrub →
  *   DSIR top-fraction selection → deterministic split → sequence
  *   packing.
  *
  * Asserted invariants: document sets only shrink and stay subsets
  * stage to stage; every stage that must bite at this data does
  * (non-vacuity); the scrub removes every contaminated id; packing
  * conserves every token exactly once within the seqLen budget; and
  * the whole pipeline is bit-deterministic across a rerun (no
  * random(), no order dependence).
  */
class ScenarioCurationSpec extends SparkSpec {

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet

  private def runPipeline(): (List[(String, Set[Long])], DataFrame) = {
    val raw = spark.read.parquet(s"${sf()}/documents.parquet")

    // 1. scrub + canonicalize text (narrow, per-row)
    val cleaned = raw.select(col("doc_id"), col("lang"), col("source"),
      TextAnalysis.unicodeClean(TextAnalysis.piiScrub(col("text"))).as("text"))

    // 2. quality gate: Gopher measurements, thresholds adapted to the
    // short single-line synthetic docs (the stock gate's stopword and
    // line rules are for prose)
    val quality = cleaned.join(
      TextAnalysis.gopherQuality(cleaned, minWords = 20)
        .filter(col("mean_word_len").between(3.0, 10.0) && col("alpha_frac") >= 0.8)
        .filter(col("n_words") >= 20)
        .select("doc_id"),
      Seq("doc_id"))

    // 3. language filter
    val english = quality.filter(col("lang") === "en")

    // 4. exact dedup (byte-identical content)
    val exact = english.join(
      Dedup.exactDedup(english).select("doc_id"), Seq("doc_id"))

    // 4b. character-level typo dedup (PassJoin, d = 4): byte-dups are
    // gone, but texts a few character edits apart remain — collapse each
    // edit ball to its min-id representative before the token-level pass
    // (this corpus may or may not have edit-dups inside the gated subset;
    // the stage must stay a subset either way)
    val edClusters = Dedup.nearDupClusters(exact,
      Dedup.editDistancePairs(exact, maxDist = 4))
    val typoFree = exact.join(
      edClusters.filter(col("doc_id") === col("cluster_id")).select("doc_id"),
      Seq("doc_id"))

    // 5. near-dup clustering: min-id representative per LSH cluster
    val pairs = Dedup.minHashLshPairs(typoFree, k = 3, numHashes = 32,
      bands = 8, threshold = 0.5)
    val clusters = Dedup.nearDupClusters(typoFree, pairs)
    val reps = typoFree.join(
      clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id"),
      Seq("doc_id"))

    // 6. contamination scrub: hold out every 20th doc as the "benchmark",
    // drop the benchmark rows AND every training doc sharing a 3-gram
    val bench = reps.filter(col("doc_id") % 20 === 0)
    val contaminated = Contamination.contaminatedPairs(reps, bench, n = 3)
      .select("doc_id").distinct()
    val scrubbed = reps.filter(col("doc_id") % 20 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 7. DSIR selection: keep the 80% most target-like (target = a
    // deterministic third of the surviving docs — the synthetic sources
    // are too sparse to survive the earlier gates reliably)
    val weights = Dsir.logImportanceWeights(scrubbed,
      scrubbed.filter(col("doc_id") % 3 === 0), n = 2, buckets = 1000)
    val selected = scrubbed.join(
      Dsir.selectTopFraction(weights, 0.8).select("doc_id"), Seq("doc_id"))

    // 8. deterministic split, train slice
    val train = Sampling.splitAssign(selected, "doc_id")
      .filter(col("split") === "train")

    // 9. pack into fixed-length sequences
    val packed = Sampling.packSequences(train, seqLen = 128)

    (List(
      "raw" -> ids(raw), "quality" -> ids(quality), "english" -> ids(english),
      "exact" -> ids(exact), "typoFree" -> ids(typoFree),
      "reps" -> ids(reps), "scrubbed" -> ids(scrubbed),
      "selected" -> ids(selected), "train" -> ids(train)), packed)
  }

  test("curation pipeline: monotone filters, real bites, exact packing, determinism") {
    val (stages, packed) = runPipeline()
    val byName = stages.toMap

    // monotone shrink + subset chain
    stages.sliding(2).foreach { case List((an, a), (bn, b)) =>
      assert(b.subsetOf(a), s"$bn ⊄ $an")
    }
    // the gates that must bite on this data
    assert(byName("raw").size == 500)
    assert(byName("quality").size < byName("raw").size, "quality gate was vacuous")
    assert(byName("english").size < byName("quality").size, "lang filter was vacuous")
    assert(byName("scrubbed").size < byName("reps").size, "contamination scrub was vacuous")
    assert(byName("selected").size <= math.ceil(byName("scrubbed").size * 0.8).toLong + 1,
      "DSIR kept more than the fraction")
    assert(byName("train").size < byName("selected").size, "split was vacuous")
    assert(byName("train").nonEmpty, "empty training set — pipeline over-filtered")

    // no benchmark doc survives the scrub
    assert(!byName("scrubbed").exists(_ % 20 == 0), "benchmark doc in training set")

    // packing conserves every token once, within budget
    val perSeq = packed.groupBy("seq_id").agg(sum("n_toks").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perSeq.nonEmpty)
    assert(perSeq.forall(_._2 <= 128L), "sequence over budget")
    // all sequences except the last are exactly full
    val lastSeq = perSeq.map(_._1).max
    assert(perSeq.filter(_._1 != lastSeq).forall(_._2 == 128L),
      "non-terminal sequence underfilled")
    val packedTokens = perSeq.map(_._2).sum
    val (stages2, packed2) = runPipeline()
    assert(stages2 == stages, "pipeline is not deterministic across reruns")
    val packedTokens2 = packed2.groupBy("seq_id").agg(sum("n_toks").as("tot"))
      .collect().map(_.getLong(1)).sum
    assert(packedTokens == packedTokens2, "packing is not deterministic")
  }
}
