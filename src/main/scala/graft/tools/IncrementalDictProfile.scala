package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.transe._

/** Measures the continual-vocabulary claim at scale: extending a standing
  * dictionary with an arriving batch vs rebuilding from scratch — the
  * reference's only option (`utils.py:6-28`). Run at sf0.1 for SCALE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.IncrementalDictProfile
  */
object IncrementalDictProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftKryo.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val raw = graft.queries.TransEQueries.kgTriples(spark, sfDir)
    val hv = conv(substring(md5(
      concat_ws("|", col("h"), col("l"), col("t"))), 1, 6), 16, 10)
      .cast("long") % 10
    val oldRaw = raw.filter(hv < 9).as[RawTriple].persist()
    val newRaw = raw.filter(hv >= 9).as[RawTriple].persist()
    println(s"old=${oldRaw.count()} new=${newRaw.count()} triples")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val (oldEnts, oldLabs) =
      time("build old dictionaries (standing state, paid once)") {
        val (e, l) = DictionaryEncoder.buildDictionaries(oldRaw)
        val (eP, lP) = (e.persist(), l.persist())
        println(s"  old vocab: ${eP.count()} entities, ${lP.count()} labels")
        (eP, lP)
      }
    // warm both paths once (parquet footers, codegen), then measure 3x
    (1 to 3).foreach { i =>
      time(s"EXTEND with the arriving batch (run $i)") {
        val (e, _) = DictionaryEncoder.extendDictionaries(oldEnts, oldLabs, newRaw)
        e.count()
      }
      time(s"FULL REBUILD over old+new (the reference's route, run $i)") {
        val (e, _) = DictionaryEncoder.buildDictionaries(
          oldRaw.unionAll(newRaw).as[RawTriple])
        e.count()
      }
    }
    spark.stop()
  }
}
