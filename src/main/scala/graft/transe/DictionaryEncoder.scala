package graft.transe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Dictionary build + encode, replacing the reference's `utils.load_dataset`
  * (`utils.py:6-28`) with a Spark-first design that fixes its two structural
  * issues (SURVEY §2.3 J4, §3.3):
  *
  *  - ONE shared dictionary is built and reused across train/test (the
  *    reference builds independent dictionaries per file and bridges them
  *    with an O(n) inverse scan per lookup, `utils.py:31-32`);
  *  - the encode join broadcasts the dictionary explicitly instead of
  *    shipping a closure-captured dict with every task (`utils.py:26`).
  *
  * Id assignment must be DENSE 0..n-1 (ids index the embedding matrix,
  * `utils.py:18-19`) and deterministic. `monotonically_increasing_id` is
  * neither; a global `row_number()` window funnels everything through one
  * partition. `zipWithIndex` over a sorted RDD gives dense, deterministic
  * ids with only the sort shuffle — each partition's offset is computed
  * from partition sizes, no single-partition bottleneck (SURVEY §7.5-5).
  */
object DictionaryEncoder {

  /** Distinct names -> dense ids, sorted by name for determinism.
    * Returns DataFrame(name STRING, id INT). */
  def buildDictionary(names: DataFrame): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._
    names.select(col(names.columns.head).as("name"))
      .distinct()
      .orderBy("name")
      .as[String]
      .rdd
      .zipWithIndex()
      .map { case (n, i) => (n, i.toInt) }
      .toDF("name", "id")
  }

  /** Entity dictionary = heads UNION tails, distinct (reference
    * `utils.py:13`); label dictionary from the middle column. */
  def buildDictionaries(raw: Dataset[RawTriple]): (DataFrame, DataFrame) = {
    val heads = raw.select(col("h").as("name"))
    val tails = raw.select(col("t").as("name"))
    val entities = buildDictionary(heads.union(tails).toDF("name"))
    val labels = buildDictionary(raw.select(col("l").as("name")))
    (entities, labels)
  }

  /** Encode string triples to id triples via three broadcast hash joins
    * (SURVEY J1). Dictionaries are small relative to the fact table
    * (vocabulary vs occurrences), so Catalyst's BroadcastHashJoinExec keeps
    * the triple set shuffle-free. Triples with names missing from the
    * dictionaries are dropped (inner join) — the reference's skip-unknown
    * behavior (`test.py:45-46`). */
  def encode(raw: Dataset[RawTriple], entities: DataFrame, labels: DataFrame): Dataset[Triple] = {
    val spark = raw.sparkSession
    import spark.implicits._
    val eH = entities.select(col("name").as("h_name"), col("id").as("h_id"))
    val eT = entities.select(col("name").as("t_name"), col("id").as("t_id"))
    val lL = labels.select(col("name").as("l_name"), col("id").as("l_id"))
    raw.join(broadcast(eH), raw("h") === eH("h_name"))
      .join(broadcast(lL), raw("l") === lL("l_name"))
      .join(broadcast(eT), raw("t") === eT("t_name"))
      .select(col("h_id").as("h"), col("l_id").as("l"), col("t_id").as("t"))
      .as[Triple]
  }

  /** INCREMENTAL vocabulary growth (round 10): names already in
    * `existing` keep their ids VERBATIM (id stability is the continual-
    * training contract — row i of a trained embedding matrix must keep
    * meaning row i), and only genuinely new names get fresh dense ids
    * starting at the old count, assigned with the same deterministic
    * sorted-zipWithIndex discipline as [[buildDictionary]]. The reference
    * has no incremental path at all — new entities mean a full retrain
    * (`utils.py:6-28` rebuilds both dictionaries from scratch per file).
    * One anti-join + one sort shuffle over the NEW names only; the
    * existing dictionary is never rewritten. */
  def extendDictionary(existing: DataFrame, names: DataFrame): DataFrame = {
    val spark = existing.sparkSession
    import spark.implicits._
    val offset = existing.count()
    // no broadcast hint: the standing dictionary GROWS without bound over
    // a deployment's life — AQE auto-broadcasts while it fits and falls
    // back to a shuffled anti-join (keyed on name, new-names-sized left
    // side) once it doesn't; forcing broadcast would cap the design at
    // the driver/executor memory exactly like the reference's collected
    // dict
    val fresh = names.select(col(names.columns.head).as("name"))
      .distinct()
      .join(existing.select("name"), Seq("name"), "left_anti")
      .orderBy("name")
      .as[String]
      .rdd
      .zipWithIndex()
      .map { case (n, i) =>
        // The standing dictionary grows without bound by design — fail
        // LOUDLY at the 2^31 id ceiling instead of silently wrapping a
        // new entity to a negative id that would alias into the trained
        // matrix (ADVICE r10). Checked per-row on executors because the
        // driver only knows `offset`, not the new-name count, without an
        // extra job.
        val id = offset + i
        if (id > Int.MaxValue) throw new IllegalStateException(
          s"dictionary id overflow: entry '$n' would get id $id > " +
            "Int.MaxValue — the Int id space is exhausted; re-encode " +
            "with 64-bit ids")
        (n, id.toInt)
      }
      .toDF("name", "id")
    existing.unionAll(fresh)
  }

  /** Extend BOTH dictionaries with the vocabulary of newly-arrived raw
    * triples. Returns (entities, labels) with old ids untouched. */
  def extendDictionaries(oldEntities: DataFrame, oldLabels: DataFrame,
      raw: Dataset[RawTriple]): (DataFrame, DataFrame) = {
    val heads = raw.select(col("h").as("name"))
    val tails = raw.select(col("t").as("name"))
    val ents = extendDictionary(oldEntities, heads.union(tails).toDF("name"))
    val labs = extendDictionary(oldLabels, raw.select(col("l").as("name")))
    (ents, labs)
  }

  /** Convenience: dictionaries + encoded triples in one call. The raw
    * triple set is read by the entity dictionary (twice: heads + tails),
    * the label dictionary, and the encode join — cache it once instead of
    * recomputing its (possibly expensive) lineage four times. */
  def encodeAll(raw: Dataset[RawTriple]): (Dataset[Triple], DataFrame, DataFrame) = {
    val cached = raw.persist()
    val (ents, labs) = buildDictionaries(cached)
    // dictionaries persist too: each is consumed several times downstream
    // (two broadcast sides of the encode join, count(), dict parquet
    // writes) and the distinct+sort+zipWithIndex lineage is expensive to
    // re-run per consumer
    (encode(cached, ents.persist(), labs.persist()), ents, labs)
  }
}
