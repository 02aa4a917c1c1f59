package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.TransEQueries
import graft.transe._

/** Dev tool: sweep TransE hyperparameters on the testdata KG and print
  * MeanRank / Hits@10, to pick evalParams that robustly beat random.
  * Usage: runMain graft.tools.EvalSweep <sfDir> */
object EvalSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val raw = TransEQueries.kgTriples(spark, sfDir).as[RawTriple]
    val (encodedAll, ents, labs) = DictionaryEncoder.encodeAll(raw)
    val nEnt = ents.count().toInt
    val nLab = labs.count().toInt
    val placedById = labs.filter(org.apache.spark.sql.functions.col("name") === "placed_by")
      .select("id").as[Int].collect().head
    val orderIds = ents
      .filter(org.apache.spark.sql.functions.col("name").startsWith("o:"))
      .filter(org.apache.spark.sql.functions.expr("CAST(substring(name, 3) AS LONG) % 17 = 0"))
      .select("id").as[Int].collect().toSet
    val orderIdsBc = spark.sparkContext.broadcast(orderIds)
    val test = encodedAll
      .filter(tr => tr.l == placedById && orderIdsBc.value.contains(tr.h)).persist()
    val train = encodedAll
      .filter(tr => !(tr.l == placedById && orderIdsBc.value.contains(tr.h))).persist()

    for ((epochs, lr, dim, dist, margin) <- Seq(
      (40, 0.05f, 32, L2Squared, 1.0f),
      (40, 0.02f, 32, L2Squared, 1.0f),
      (30, 0.05f, 32, L2Squared, 1.0f))) {
      val params = TransEParams(epochs = epochs, batches = 2, margin = margin,
        lr = lr, dim = dim, distance = dist, seed = 42L)
      val trainer = new TransETrainer(params)
      val t0 = System.nanoTime()
      val model = trainer.fit(train, nEnt, nLab)
      val fitS = (System.nanoTime() - t0) / 1e9
      val row = LinkPrediction.evaluate(test, model).collect().head
      val ranks = LinkPrediction.rankTriples(test, model).collect()
      val headMean = ranks.map(_.rank_head).sum.toDouble / ranks.length
      val tailMean = ranks.map(_.rank_tail).sum.toDouble / ranks.length
      System.err.println(f"[sweep] epochs=$epochs lr=$lr dim=$dim dist=$dist m=$margin " +
        f"meanRank=${row.getAs[Double]("mean_rank")}%.0f " +
        f"(head=$headMean%.0f tail=$tailMean%.0f) " +
        f"hits10=${row.getAs[Double]("hits_at_10")}%.3f " +
        f"lossLast=${trainer.lossHistory.last}%.0f " +
        f"fit=${fitS}%.1fs (rand=${nEnt / 2})")
    }
    spark.stop()
  }
}
