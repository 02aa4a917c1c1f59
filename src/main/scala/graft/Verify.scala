package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Optional third arg (local iteration only; the driver passes two): a
  * comma-separated query-name filter. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // registration on, registrationRequired off — see Bench's note
    val spark = GraftKryo.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // production integration route: vector functions + optimizer rules
      // installed session-wide (queries also self-register defensively)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // release query-scoped tallies (ADVICE r12 #1) — memoized
        // cross-query caches are not registered and survive
        CacheScope.releaseAll()
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // The rows-only queries are unoracle-able STRUCTURALLY (SQL cannot
    // train; float ranks don't hash cross-engine), not unchecked: each is
    // gated elsewhere. Emitted beside the oracle file so the scoreboard's
    // `no_oracle` rows carry a driver-visible pointer to their gate
    // (VERDICT r9 #6).
    val gating = Map(
      "transe_fit" -> ("ContractSpec.goldenLossCurve (fixed-seed 30-epoch " +
        "loss recording, sf0.001) + ContractSpec.goldenFb15kShapeLoss"),
      "transe_fit_partitioned" -> ("ContractSpec golden gate: bit-equal to " +
        "transe_fit's goldenLossCurve (same float ops, same order)"),
      "transe_eval" -> ("transe_eval_quantized (hash-oracled exact-int64 " +
        "twin) + TransESpec float-vs-quantized tolerance gate + " +
        "ContractSpec.goldenEval"),
      "transe_eval_filtered" -> ("transe_eval_quantized_filtered (hash-" +
        "oracled twin) + ContractSpec.goldenEvalFiltered"),
      "transe_eval_partitioned" -> ("transe_eval_quantized + ContractSpec " +
        "exact-equality gate vs transe_eval"))
    // stream_continual_train left this map in r13: its integer stage
    // surface carries a full relational oracle now; the float hinge
    // loss it projects away stays gated by StreamingSpec's
    // continual-contract twin and the trained checkpoint by the
    // hash-oracled stream_continual_eval.
    Files.writeString(Paths.get(s"$outDir/gating.json"),
      gating.map { case (k, v) => s"${q(k)}: {${q("gated_by")}: ${q(v)}}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
