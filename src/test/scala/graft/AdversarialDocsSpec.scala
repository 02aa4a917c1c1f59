package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup, Multimodal, TextAnalysis}
import graft.tools.MakeAdversarialDocs

/** Adversarial DOCUMENTS fixture (the documents twin of
  * AdversarialEventsSpec): empty / whitespace-only / single-word /
  * mixed-script-unicode / punctuation-only texts, a NULL text, planted
  * exact- and near-duplicate pairs, a trim-only duplicate, and a
  * pathological repetition doc — run against the text/dedup/multimodal
  * families. The fixture already earned its keep in round 8: it found
  * the null-text '' shingle mint (Spark's null-skipping `greatest` vs
  * the oracle's NULL-propagating one) in FOUR separate gram spellings,
  * a JVM-vs-SQL codepoint split in the frame sampler, CSV's empty-vs-
  * null round-trip loss, and zero-byte blobs vanishing from the
  * binaryFile listing. The full oracle parity on this fixture is
  * checked driver-style (Verify + check_oracles on the generated dir);
  * this spec pins the planted shapes and the no-throw surface in-JVM.
  */
class AdversarialDocsSpec extends SparkSpec {
  import MakeAdversarialDocs._

  private lazy val advSf: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_adv_docs_sf")
    MakeAdversarialDocs.build(spark, sf, dir.toString)
  }
  private lazy val docs = Tables.documents(spark, advSf)

  test("bm25 / bigram fluency / dsir survive null-empty-unicode texts") {
    import graft.operators.{BigramLm, ImportanceSampling, Search}
    // no-throw over the whole fixture, and the null-text doc never scores
    val bm = Search.bm25Search(docs, Seq("alpha", "omicron"), k = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(!bm.contains(NullTextDoc), "null text cannot match a term")
    assert(bm.contains(ExactDupA), "the planted alpha-rich doc must match")
    val fl = BigramLm.fluency(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!fl.contains(NullTextDoc), "null text has no bigrams")
    assert(fl.get(RepetitionDoc).exists(_ >= 2L), "spam doc has bigrams")
    val ds = ImportanceSampling.scoreAgainst(
      ImportanceSampling.bucketModel(docs, "adv"), docs)
      .collect().map(_.getLong(0)).toSet
    assert(!ds.contains(NullTextDoc), "null text has no buckets to score")
    assert(ds.contains(ExactDupA))
  }

  test("exact dedup: planted pair collapses, trim-copy stays distinct") {
    val kept = Dedup.exact(docs)
      .select("keep_doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(ExactDupA) && !kept.contains(ExactDupB),
      "byte-identical pair must keep only the smaller id")
    // the whitespace-padded copy is byte-DISTINCT (exact dedup is md5 of
    // raw bytes) — near-dup, not exact-dup, territory
    assert(kept.contains(PaddedCopy))
  }

  test("ngram jaccard: planted near-dup found, padded copy is jaccard-1, null pairs with nothing") {
    val pairs = Dedup.ngramJaccard(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    val byPair = pairs.map { case (a, b, j) => (a, b) -> j }.toMap
    val near = byPair.get((NearDupA, NearDupB))
    assert(near.exists(j => j >= 0.5 && j < 1.0),
      s"planted near-dup pair missing or mis-scored: $near")
    // trim-only difference: shingles trim first, so jaccard is exactly 1
    assert(byPair.get((ExactDupA, PaddedCopy)).contains(1.0) ||
      byPair.get((ExactDupB, PaddedCopy)).contains(1.0),
      "whitespace-padded copy must be a jaccard-1.0 near-dup of its source")
    assert(!pairs.exists(p => p._1 == NullTextDoc || p._2 == NullTextDoc),
      "null text has no shingles and must pair with nothing")
  }

  test("minhash LSH agrees with exact jaccard on the planted pairs") {
    val pairs = Dedup.minhashLsh(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((NearDupA, NearDupB)),
      "seeded LSH must recall the 0.7-jaccard planted pair")
    assert(!pairs.exists(p => p._1 == NullTextDoc || p._2 == NullTextDoc))
  }

  test("incremental dedup probe survives the adversarial corpus slice") {
    val flagged = IncrementalDedup.flagBatch(
      docs.filter(col("doc_id") % 10 =!= 7),
      docs.filter(col("doc_id") % 10 === 7))
    val verdicts = flagged.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(verdicts.values.sum == docs.filter(col("doc_id") % 10 === 7).count())
    assert(verdicts.getOrElse("exact", 0L) + verdicts.getOrElse("near", 0L) > 0,
      "the empty-doc classes alone guarantee exact matches across the slice")
  }

  test("repetition: spam doc saturates, null doc measures all-zero") {
    val rep = TextAnalysis.repetition(docs)
    val spam = rep.filter(col("doc_id") === RepetitionDoc).head()
    assert(spam.getAs[Double]("top_bigram_ratio") == 1.0,
      s"one-token spam doc must have a single saturating bigram: $spam")
    val nul = rep.filter(col("doc_id") === NullTextDoc).head()
    assert(nul.getAs[Long]("n_words") == 0L &&
      nul.getAs[Long]("n_bigrams") == 0L &&
      nul.getAs[Double]("dup_word_ratio") == 0.0,
      s"null text must measure as zero words, not null/crash: $nul")
  }

  test("winnowing emits no fingerprint for null text") {
    val fps = TextAnalysis.winnowingFingerprints(docs)
    assert(fps.filter(col("doc_id") === NullTextDoc).isEmpty)
    assert(fps.filter(col("doc_id") === RepetitionDoc).count() >= 1)
  }

  test("frame sampler windows by codepoints, not UTF-16 units") {
    // "🚀" is a surrogate pair: UTF-16 grouping would split after ONE
    // visible char here; codepoint grouping takes two per frame
    val frames = Multimodal.StubCodec.sampleFrames("a🚀bc", 2, 1)
    assert(frames.map(_._2) == Seq("a🚀", "bc"), frames.toString)
    // every frame's reported size is its codepoint count
    val mixed = Multimodal.StubCodec.sampleFrames("🚀" * 5, 2, 1)
    assert(mixed.map(f => f._2.codePointCount(0, f._2.length)).forall(_ <= 2))
    assert(mixed.map(f => f._2.codePointCount(0, f._2.length)).sum == 5)
  }

  test("multimodal decode skips the null payload and keeps everything else") {
    val feats = Multimodal.decodeFeatures(Multimodal.assetTable(docs))
    assert(feats.filter(col("asset_id") === NullTextDoc).isEmpty)
    assert(feats.count() == docs.filter(col("text").isNotNull).count())
  }

  test("CSV round trip is a bijection on empty, whitespace, unicode, and null text") {
    val back = graft.sources.CsvLines.roundTripAgg(spark, advSf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Any](4))).toMap
    val truth = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("content_sum"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Any](3))).toMap
    assert(back.view.mapValues(_._1).toMap == truth.view.mapValues(_._1).toMap,
      "row counts diverged through the CSV round trip")
    assert(back.view.mapValues(_._2).toMap == truth.view.mapValues(_._2).toMap,
      "content checksums diverged through the CSV round trip (lossy quoting/null handling)")
  }

  test("hashed-vector near-dup is sharp on separable text") {
    // the planted pairs use a vocabulary disjoint from the base corpus,
    // so bag-cosine must recover them (the homogeneous sf testdata is the
    // documented weak-separator regime; this is the sharp one). tau=0.85:
    // the one-word-edit twins score ~0.873 — the edited token is the
    // rarest in the corpus, so tf-idf doubles its weight relative to the
    // unchanged tokens (idf amplification, the designed behavior)
    val pairs = graft.operators.TextVectorize.hashVecNearDup(docs, tau = 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((ExactDupA, ExactDupB)),
      "identical docs must be cosine-1 pairs")
    assert(pairs.contains((NearDupA, NearDupB)),
      "one-word-edit twins must clear tau on disjoint vocabulary")
    assert(pairs.contains((ExactDupA, PaddedCopy)),
      "whitespace padding must not move the bag vector")
    assert(!pairs.exists(p => p._1 == NullTextDoc || p._2 == NullTextDoc))
    // separability: no planted doc pairs with the spam doc or any
    // base-corpus doc — disjoint vocabularies share no bucket mass
    // beyond hash collisions
    assert(!pairs.exists(p => p._1 == RepetitionDoc || p._2 == RepetitionDoc))
    assert(!pairs.exists(p =>
      (p._1 < 900000L) != (p._2 < 900000L)),
      "cross-vocabulary pair cleared tau — hashing lost separability")
  }

  test("text family runs green end-to-end on the adversarial fixture") {
    assert(TextAnalysis.tokenCounts(docs).count() == docs.count())
    assert(TextAnalysis.qualityScore(docs).count() == docs.count())
    assert(TextAnalysis.langId(docs).count() == docs.count())
    assert(TextAnalysis.fingerprint(docs).count() == docs.count())
    assert(TextAnalysis.dupSpanCoverage(docs).count() == docs.count())
    assert(TextAnalysis.scrubDupSpans(docs).count() == docs.count())
    assert(graft.operators.SequencePacking.packDocs(docs).count() == docs.count())
    assert(Dedup.paragraphDedup(docs).count() == docs.count())
    assert(Dedup.simhashPairs(docs).collect()
      .forall(r => r.getLong(0) != NullTextDoc && r.getLong(1) != NullTextDoc))
  }
}
