package graft.transe

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types._

/** TSV triple source (reference S1/S2: `sc.textFile(path).map(split('\t'))`,
  * `utils.py:6`). Spark-native: the CSV reader with a tab separator and an
  * explicit checked schema — upgrades the reference's positional convention
  * (a malformed line crashed it with IndexError; here malformed rows are
  * dropped via DROPMALFORMED, and the schema is enforced at scan time).
  * The csv source is splittable, so a 100 TB triple file parallelizes by
  * HDFS block without driver involvement. */
object TripleReader {

  val schema: StructType = StructType(Seq(
    StructField("h", StringType, nullable = false),
    StructField("l", StringType, nullable = false),
    StructField("t", StringType, nullable = false)))

  def readTsv(spark: SparkSession, path: String): Dataset[RawTriple] = {
    import spark.implicits._
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "DROPMALFORMED")
      // pure split-on-tab parity with the reference: default CSV quote
      // ('"') and escape ('\') handling would strip quotes from values
      // like "1984" and merge tab-containing quoted fields — silent
      // dictionary corruption, not malformed-row dropping
      .option("quote", "")
      .option("escape", "")
      .schema(schema)
      .csv(path)
      .na.drop()
      .as[RawTriple]
  }
}
