package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-aggregate shuffle keyed on the fingerprint;
  *  - the Jaccard path shuffles on *shingle* — ubiquitous shingles are the
  *    skew hazard, so [[shingleExplode]] can cap shingle document-frequency
  *    (drop shingles appearing in more than `maxDf` docs: they only create
  *    candidate pairs that exact verification would reject anyway);
  *  - MinHash+LSH replaces the all-pairs shingle join with a band-bucket
  *    join: candidates = docs sharing a band, verified by exact Jaccard.
  *    Cost drops from O(pairs-sharing-any-shingle) to O(pairs-sharing-a-
  *    band), tunable via bands×rows;
  *  - all hashes are md5-derived (portable + stable across engines and
  *    runs), not JVM hashCode.
  */
object Dedup {

  /** 60-bit stable hash: first 15 hex chars of md5. Stays in codegen. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /** (docId, shingle) pairs; optionally drop shingles with document
    * frequency above `maxDf` (skew guard for the self-join). */
  def shingleExplode(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, maxDf: Option[Int] = None): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), n)).as("shingle"))
    maxDf match {
      case None => sh
      case Some(cap) =>
        val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
        sh.join(freq.select("shingle"), Seq("shingle"), "left_semi")
    }
  }

  /** Exact dedup groups: fingerprint → (keeper = min id, group size). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("group_size"))

  /** All-pairs n-gram Jaccard ≥ threshold (exact). Shuffles on shingle,
    * then aggregates pair intersections — the textbook distributed
    * similarity join. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingleExplode(docs, idCol, textCol, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("shingle"))
    val b = sh.select(col("doc_id").as("b_id"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("a_n")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("b_n")), Seq("b_id"))
      .withColumn("uni", col("a_n") + col("b_n") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** MinHash signature: k independent 60-bit min-hashes over the shingle
    * set, as one array column. */
  def minhashSignature(text: Column, k: Int = 8, n: Int = 3): Column = {
    val sh = shingles(text, n)
    val sig = transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(sh, s => hash60(concat(i.cast("string"), lit("|"), s)))))
    when(size(sh) > 0, sig).otherwise(transform(sequence(lit(0), lit(k - 1)), _ => lit(null).cast("long")))
  }

  /** LSH candidate pairs from banded minhash signatures, exact-verified by
    * true Jaccard ≥ threshold. bands×rowsPerBand must equal the signature
    * length. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      bands: Int = 4, rowsPerBand: Int = 2, n: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = docs.select(col(idCol).as("doc_id"),
      minhashSignature(col(textCol), k, n).as("sig"))
      .filter(element_at(col("sig"), 1).isNotNull)

    // band key = md5 of the band's minhash values + band index
    val banded = sigs.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), bnd =>
        md5(concat_ws("_",
          (bnd.cast("string") +:
            (1 to rowsPerBand).map(r => element_at(col("sig"), bnd * rowsPerBand + r).cast("string"))): _*)
          .cast("binary")))))
      .select(col("doc_id"), col("col").as("band_key"))

    val l = banded.select(col("doc_id").as("a_id"), col("band_key"))
    val r = banded.select(col("doc_id").as("b_id"), col("band_key"))
    val candidates = l.join(r, Seq("band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    // exact verification of candidates only
    val verified = jaccardPairs(
      docs.join(
        candidates.select(col("a_id").as("doc_id"))
          .union(candidates.select(col("b_id"))).distinct()
          .withColumnRenamed("doc_id", idCol),
        Seq(idCol), "left_semi"),
      idCol, textCol, n, threshold)
    verified.join(candidates, Seq("a_id", "b_id"), "left_semi")
  }

  /** SimHash fingerprint (bits-wide, default 32): per token (with
    * multiplicity), hash to `bits` bits; fingerprint bit j is 1 iff the
    * sum of ±1 votes over tokens is positive. Pure expressions — the
    * per-document fold stays in codegen, no shuffle. */
  def simhash(text: Column, bits: Int = 32): Column = {
    val toks = split(trim(text), "\\s+")
    val hashes = transform(toks, t => hash60(t))
    val bitCols = (0 until bits).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(1) * 2 - 1))
      when(votes > 0, lit(1L << j)).otherwise(0L)
    }
    when(size(toks) > 0, bitCols.reduce(_ + _)).otherwise(lit(null).cast("long"))
  }
}
