package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Pure-Scala replay of the exact operator contract: letter-run word
    * freqs, greedy (count DESC, pair ASC) argmax, double-pass
    * space-delimited replace. */
  private def localBpe(texts: Seq[String], n: Int): Seq[(String, String, Long)] = {
    val words = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    texts.foreach(t => "[a-z]+".r.findAllIn(t.toLowerCase).foreach { w =>
      words(w) = words.getOrElse(w, 0L) + 1
    })
    var sp = words.map { case (w, f) => (" " + w.mkString(" ") + " ", f) }.toSeq
    val out = Seq.newBuilder[(String, String, Long)]
    (1 to n).foreach { _ =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      sp.foreach { case (s, f) =>
        val toks = s.trim.split(" ")
        toks.indices.dropRight(1).foreach { j =>
          val p = toks(j) + " " + toks(j + 1)
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        out += ((pair, pair.replace(" ", ""), cnt))
        val pat = " " + pair + " "
        val rep = " " + pair.replace(" ", "") + " "
        sp = sp.map { case (s, f) => (s.replace(pat, rep).replace(pat, rep), f) }
      }
    }
    out.result()
  }

  test("merges match the hand-replayed greedy loop on a classic corpus") {
    val texts = Seq("low low low lower lower lowest", "new newer newest low")
    val trained = Bpe.trainMerges(docsOf(texts: _*), nMerges = 8)
    val want = localBpe(texts, 8)
    assert(trained.length == want.length)
    trained.zip(want).foreach { case (m, (pair, merged, cnt)) =>
      assert(m.pair == pair && m.merged == merged && m.cnt == cnt,
        s"rank ${m.rank}: got (${m.pair}, ${m.merged}, ${m.cnt}) want ($pair, $merged, $cnt)")
    }
    // the classic corpus learns 'lo' + 'low' early (6 occurrences)
    assert(trained.take(2).map(_.merged).contains("lo"))
  }

  test("shared-boundary runs: the double-pass contract is what ships") {
    // 'aaaa' spells ' a a a a ' — pass1 merges positions (1,2) only
    // (boundary sharing), pass2 catches (3,4): 'aa aa'. The reference
    // replay implements the same contract, so this pins the deviation
    // from canonical BPE explicitly.
    val trained = Bpe.trainMerges(docsOf("aaaa aaaa"), nMerges = 1)
    assert(trained.head.pair == "a a" && trained.head.cnt == 6) // 3 pairs x 2 words
    val pieces = Bpe.pieces(docsOf("aaaa aaaa"), trained)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pieces == Map("aa" -> 4L), s"got $pieces")
  }

  test("tokenizeBpe reassembles every word exactly, pieces match the vocab") {
    val docs = docsOf("low lower lowest", "newest low")
    val trained = Bpe.trainMerges(docs, nMerges = 6)
    val rows = Bpe.tokenizeBpe(docs, trained)
      .orderBy("doc_id", "word_pos", "piece_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // concatenating a word's pieces in order rebuilds the word exactly
    val rebuilt = rows.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).mkString).toMap
    assert(rebuilt((0L, 0L)) == "low" && rebuilt((0L, 1L)) == "lower" &&
      rebuilt((0L, 2L)) == "lowest" && rebuilt((1L, 0L)) == "newest" &&
      rebuilt((1L, 1L)) == "low")
    // every emitted piece is in the post-merge piece vocabulary
    val vocab = Bpe.pieces(docs, trained).collect().map(_.getString(0)).toSet
    assert(rows.map(_._3).toSet.subsetOf(vocab))
  }

  test("tokenizeBpe plan: spelled vocab broadcasts, corpus never shuffles") {
    val docs = graft.Tables.documents(spark, sf)
    val trained = Bpe.trainMerges(docs, nMerges = 3)
    val plan = Bpe.tokenizeBpe(docs, trained)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join found:\n$plan")
    // exactly ONE hash exchange, and it sits UNDER the vocab-side
    // BroadcastExchange (the word-count aggregate, vocab-cardinality);
    // the corpus stream side must reach the join unshuffled
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected only the vocab-build exchange:\n$plan")
    assert(plan.indexOf("Exchange hashpartitioning") >
      plan.indexOf("BroadcastExchange"),
      s"the hash exchange is not on the broadcast (vocab) side:\n$plan")
  }

  test("pieces conserve weighted character mass under merging") {
    val docs = graft.Tables.documents(spark, sf)
    val trained = queries.PipelineQueries.queries("vocab_bpe_merges")(spark, sf)
    assert(trained.count() == 20)
    val pieces = queries.PipelineQueries.queries("vocab_bpe_pieces")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // merges concatenate symbols, never create or drop characters:
    // sum(freq * len(piece)) must equal the corpus letter-run char mass
    val pieceMass = pieces.map { case (p, f) => p.length * f }.sum
    val charMass = Bpe.wordTable(docs)
      .select(org.apache.spark.sql.functions.expr("sum(freq * length(word))"))
      .head().getLong(0)
    assert(pieceMass == charMass, s"$pieceMass != $charMass")
    // and training is deterministic across runs
    val again = Bpe.trainMerges(docs, nMerges = 20)
    assert(again.map(_.pair) ==
      trained.orderBy("rank").collect().map(r =>
        r.getString(1) + " " + r.getString(2)).toSeq)
  }
}
