package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.transe._

class AppsSpec extends SparkSpec {

  /** Tiny deterministic KG TSV: two relation types over 12 entities. */
  private def writeTsv(): (String, String) = {
    val dir = Files.createTempDirectory("kg")
    val rng = new java.util.SplittableRandom(7)
    val lines = (0 until 200).map { _ =>
      val a = s"e${rng.nextInt(12)}"
      val b = s"e${rng.nextInt(12)}"
      val r = s"r${rng.nextInt(2)}"
      s"$a\t$r\t$b"
    }
    val train = dir.resolve("train.tsv")
    val test = dir.resolve("test.tsv")
    Files.writeString(train, lines.take(180).distinct.mkString("\n"))
    Files.writeString(test, lines.drop(180).distinct.mkString("\n"))
    (train.toString, test.toString)
  }

  test("Train app end-to-end: TSV -> model dir with dicts + checkpoint") {
    val (trainTsv, _) = writeTsv()
    val out = Files.createTempDirectory("model").toString
    graft.apps.Train.main(Array(
      "--train", trainTsv, "--out", out,
      "--epochs", "4", "--batches", "2", "--dim", "8",
      "--checkpoint-every", "2"))
    assert(Files.exists(java.nio.file.Paths.get(s"$out/entity/_SUCCESS".replace("/_SUCCESS", ""))))
    val ent = EmbeddingIO.load(spark, s"$out/entity")
    val dict = spark.read.parquet(s"$out/entity_dict")
    assert(ent.length == dict.count())
    assert(Files.exists(java.nio.file.Paths.get(s"$out/checkpoint")))
  }

  test("versioned checkpoints: every epoch restorable; params persisted") {
    val (trainTsv, _) = writeTsv()
    val out = Files.createTempDirectory("model").toString
    graft.apps.Train.main(Array(
      "--train", trainTsv, "--out", out,
      "--epochs", "3", "--batches", "1", "--dim", "8", "--distance", "L2",
      "--checkpoint-every", "1"))
    // each checkpointed epoch has its own restorable dir
    (1 to 3).foreach { n =>
      val ep = s"$out/checkpoint/epoch=$n"
      assert(Files.exists(java.nio.file.Paths.get(ep)), s"missing $ep")
      assert(EmbeddingIO.load(spark, s"$ep/entity").nonEmpty)
    }
    // distinct epochs hold distinct matrices (training moved between them)
    val e1 = EmbeddingIO.load(spark, s"$out/checkpoint/epoch=1/entity")
    val e3 = EmbeddingIO.load(spark, s"$out/checkpoint/epoch=3/entity")
    assert(!e1.zip(e3).forall { case (a, b) => a.sameElements(b) })
    // persisted hyperparameters round-trip (Evaluate resolves L2 from them)
    val p = EmbeddingIO.loadParams(spark, out)
    assert(p.isDefined && p.get.distance == L2Squared && p.get.dim == 8)
    // a MID-training epoch (not just the last) warm-starts a new run
    val out2 = Files.createTempDirectory("model").toString
    graft.apps.Train.main(Array(
      "--train", trainTsv, "--out", out2,
      "--epochs", "1", "--batches", "1", "--dim", "8",
      "--warm-start", out, "--warm-start-epoch", "2"))
    assert(EmbeddingIO.load(spark, s"$out2/entity").nonEmpty)
  }

  test("Evaluate app runs against a trained model") {
    val (trainTsv, testTsv) = writeTsv()
    val out = Files.createTempDirectory("model").toString
    graft.apps.Train.main(Array(
      "--train", trainTsv, "--out", out, "--epochs", "3", "--dim", "8"))
    // should not throw; prints metrics
    graft.apps.Evaluate.main(Array("--test", testTsv, "--model", out))
    // the distributed-matrix route resolves the same checkpoint
    graft.apps.Evaluate.main(Array("--test", testTsv, "--model", out,
      "--exec", "partitioned"))
  }

  test("Train --exec partitioned writes the SAME model as broadcast training") {
    val (trainTsv, testTsv) = writeTsv()
    val outB = Files.createTempDirectory("model").toString
    val outP = Files.createTempDirectory("model").toString
    val common = Array("--train", trainTsv, "--epochs", "3", "--dim", "8",
      "--batches", "2")
    graft.apps.Train.main(common ++ Array("--out", outB))
    graft.apps.Train.main(common ++ Array("--out", outP,
      "--exec", "partitioned"))
    // bit-for-bit trainer equivalence surfaces as identical checkpoints
    val eB = EmbeddingIO.load(spark, s"$outB/entity")
    val eP = EmbeddingIO.load(spark, s"$outP/entity")
    assert(eB.length == eP.length &&
      eB.zip(eP).forall { case (a, b) => a.sameElements(b) },
      "partitioned-trained entity checkpoint differs from broadcast")
    val lB = EmbeddingIO.load(spark, s"$outB/label")
    val lP = EmbeddingIO.load(spark, s"$outP/label")
    assert(lB.zip(lP).forall { case (a, b) => a.sameElements(b) })
    // the partitioned-written layout is a first-class model dir: params
    // persisted, evaluable through BOTH exec routes
    assert(EmbeddingIO.loadParams(spark, outP).isDefined)
    graft.apps.Evaluate.main(Array("--test", testTsv, "--model", outP))
    graft.apps.Evaluate.main(Array("--test", testTsv, "--model", outP,
      "--exec", "partitioned"))
    // warm start on the partitioned trainer is rejected loudly
    intercept[IllegalArgumentException] {
      graft.apps.Train.main(common ++ Array("--out", outP,
        "--exec", "partitioned", "--warm-start", outB))
    }
  }

  test("warm start resumes from a checkpoint with matching shapes") {
    import spark.implicits._
    val triples = (0 until 50).map(i => Triple(i % 10, i % 2, (i + 3) % 10)).toDS()
    val p = TransEParams(epochs = 2, batches = 1, dim = 4, seed = 1)
    val t1 = new TransETrainer(p)
    val m1 = t1.fit(triples, 10, 2)
    val t2 = new TransETrainer(p)
    val m2 = t2.fit(triples, 10, 2, Some(m1))
    // warm-started model must differ from the cold init trajectory start
    assert(!m2.entity(0).sameElements(Kernels.uniformInit(10, 4, 1)(0)))
    // and shape mismatch must fail fast
    intercept[IllegalArgumentException] {
      new TransETrainer(p).fit(triples, 11, 2, Some(m1))
    }
    // dim mismatch too: the delta pack/apply path would silently truncate
    intercept[IllegalArgumentException] {
      new TransETrainer(p.copy(dim = 8)).fit(triples, 10, 2, Some(m1))
    }
  }

  test("Train --extend grows the vocabulary and warm-continues the old rows") {
    import spark.implicits._
    val (trainTsv, _) = writeTsv()
    val out1 = Files.createTempDirectory("model_base").toString
    graft.apps.Train.main(Array(
      "--train", trainTsv, "--out", out1,
      "--epochs", "4", "--batches", "2", "--dim", "8"))
    val dict1 = spark.read.parquet(s"$out1/entity_dict")
      .as[(String, Int)].collect().toMap
    val ent1 = EmbeddingIO.load(spark, s"$out1/entity")
    // second corpus: re-anchors some old entities + introduces NEW ones
    val dir = Files.createTempDirectory("kg2")
    val newLines = (0 until 40).map(i => s"e${i % 12}\tr0\tx$i") ++
      (0 until 20).map(i => s"x$i\tr2\tx${i + 20}")
    val tsv2 = dir.resolve("more.tsv")
    Files.writeString(tsv2, newLines.mkString("\n"))
    val out2 = Files.createTempDirectory("model_ext").toString
    graft.apps.Train.main(Array(
      "--train", tsv2.toString, "--extend", out1, "--out", out2,
      "--epochs", "4", "--batches", "2", "--dim", "8"))
    val dict2 = spark.read.parquet(s"$out2/entity_dict")
      .as[(String, Int)].collect().toMap
    // id stability: every old name keeps its id; new names extend the range
    assert(dict1.forall { case (n, i) => dict2(n) == i },
      "extend rewired an existing id")
    assert(dict2.size == dict1.size + 40, s"${dict2.size} vs ${dict1.size}")
    assert((0 until 40).forall(i => dict2.contains(s"x$i")))
    val ent2 = EmbeddingIO.load(spark, s"$out2/entity")
    assert(ent2.length == dict2.size && ent2.head.length == 8)
    // label dict grew by r2
    val labs2 = spark.read.parquet(s"$out2/label_dict")
      .as[(String, Int)].collect().toMap
    assert(labs2.contains("r2") && labs2("r0") == 0 || labs2("r0") == 1)
    // Evaluate runs against the extended model with NEW-entity test rows
    val testTsv = dir.resolve("probe.tsv")
    Files.writeString(testTsv, "x0\tr2\tx20\ne0\tr0\tx0")
    graft.apps.Evaluate.main(Array(
      "--test", testTsv.toString, "--model", out2))
    // (smoke: no throw; ranks exercised the grown matrix end-to-end)
    assert(ent1.length < ent2.length)
  }

  test("TrainStream drains a watch dir, resumes after a rerun, Evaluate loads it") {
    import spark.implicits._
    import java.nio.file.attribute.FileTime
    // initial corpus + a watch dir with two arriving TSVs
    val base = Files.createTempDirectory("trainstream")
    val oldTsv = base.resolve("old.tsv")
    Files.writeString(oldTsv,
      (0 until 60).map(i => s"e$i\tnext\te${i + 1}").mkString("\n"))
    val watch = base.resolve("watch")
    Files.createDirectories(watch)
    def arrive(k: Int, lines: Seq[String]): Unit = {
      val f = watch.resolve(f"b$k%03d.tsv")
      Files.writeString(f, lines.mkString("\n"))
      Files.setLastModifiedTime(f,
        FileTime.fromMillis(1700000000000L + k * 60000L))
    }
    arrive(0, (60 until 80).map(i => s"e$i\tnext\te${i + 1}"))
    arrive(1, (80 until 100).map(i => s"e$i\tnext\te${i + 1}"))
    val out = base.resolve("model").toString
    graft.apps.TrainStream.main(Array(
      "--watch", watch.toString, "--old", oldTsv.toString, "--out", out,
      "--epochs", "4", "--batch-epochs", "2", "--dim", "8", "--batches", "2"))
    val dict1 = spark.read.parquet(s"$out/entity_dict")
      .as[(String, Int)].collect().toMap
    // old corpus covers e0..e60 (61), each batch adds 20 new entities
    assert(dict1.size == 101, s"${dict1.size}")
    // durable stages: init + 2 batches committed
    assert(Files.exists(java.nio.file.Paths.get(out, "state", "batch=-1", "_DONE")))
    assert(Files.exists(java.nio.file.Paths.get(out, "state", "batch=1", "_DONE")))
    // a third file arrives — with a malformed line (2 columns) and a
    // null-bearing short line: neither may mint a dictionary entry (the
    // batch reader's DROPMALFORMED contract, streamed); the SAME command
    // resumes from the last commit
    arrive(2, (100 until 120).map(i => s"e$i\tnext\te${i + 1}") ++
      Seq("orphan\tnext", "loner"))
    graft.apps.TrainStream.main(Array(
      "--watch", watch.toString, "--old", oldTsv.toString, "--out", out,
      "--epochs", "4", "--batch-epochs", "2", "--dim", "8", "--batches", "2"))
    val dict2 = spark.read.parquet(s"$out/entity_dict")
      .as[(String, Int)].collect().toMap
    // old ids verbatim under the resume; only the new arrivals appended
    assert(dict1.forall { case (n, i) => dict2(n) == i },
      "resume rewired an existing id")
    assert(dict2.size == dict1.size + 20, s"${dict2.size} vs ${dict1.size}")
    assert(!dict2.contains("orphan") && !dict2.contains("loner") &&
      !dict2.contains(null), "malformed TSV line minted a dictionary entry")
    assert(Files.exists(java.nio.file.Paths.get(out, "state", "batch=2", "_DONE")))
    // the written layout is Train's: Evaluate loads it unchanged
    val probe = base.resolve("probe.tsv")
    Files.writeString(probe, "e110\tnext\te111\ne5\tnext\te6")
    graft.apps.Evaluate.main(Array(
      "--test", probe.toString, "--model", out))
  }

  test("as-of join matches a hand-computed per-user trace") {
    import spark.implicits._
    val events = Seq(
      // user 1: click(10), error(15), click(20), error(25)
      (1L, 1L, "click", 10L), (2L, 1L, "error", 15L),
      (3L, 1L, "click", 20L), (4L, 1L, "error", 25L),
      // user 2: error before any click -> null match
      (5L, 2L, "error", 5L), (6L, 2L, "click", 8L), (7L, 2L, "error", 9L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = AsOfJoin.errorToLastClick(events).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq(
      (2L, 1L, 5L),   // error@15 -> click@10
      (4L, 3L, 5L),   // error@25 -> click@20
      (5L, -1L, -1L), // no prior click
      (7L, 6L, 1L)))  // error@9 -> click@8
  }

  test("forward as-of with tolerance matches the hand trace, far matches null") {
    import spark.implicits._
    val events = Seq(
      // user 1: error(15) -> next click(20); error(25) -> none after
      (1L, 1L, "click", 10L), (2L, 1L, "error", 15L),
      (3L, 1L, "click", 20L), (4L, 1L, "error", 25L),
      // user 2: error(5) -> click(8) in tolerance; error(9) -> click(5000)
      // OUT of the 3600s... in tolerance actually (4991s > 3600 -> null)
      (5L, 2L, "error", 5L), (6L, 2L, "click", 8L), (7L, 2L, "error", 9L),
      (8L, 2L, "click", 5000L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = AsOfJoin.errorToNextClick(events, tolSec = 3600L).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq(
      (2L, 3L, 5L),    // error@15 -> click@20
      (4L, -1L, -1L),  // no later click for user 1
      (5L, 6L, 3L),    // error@5 -> click@8
      (7L, -1L, -1L))) // error@9 -> click@5000 is 4991s away: > tol -> null
  }

  test("as-of join at same timestamp matches the simultaneous right row") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "click", 10L), (2L, 1L, "error", 10L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = AsOfJoin.errorToLastClick(events).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L && out.head.getLong(2) == 0L)
  }
}
