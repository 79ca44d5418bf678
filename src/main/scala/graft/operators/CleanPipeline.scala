package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical LLM training-data job, composed end-to-end from the
  * engine's own operators: language gate -> quality gate -> exact
  * dedup -> near-dup removal. This is the "user switches to this
  * library" showcase: every stage is an operator that also stands
  * alone, and the composition still runs under the hard DuckDB oracle
  * because each stage is exactly SQL-expressible.
  *
  * Scale shape: the gates are narrow per-row filters fused into the
  * scan; exact dedup is one digest shuffle; near-dup is the banded
  * LSH + exact-verify pipeline (O(n) candidates). Nothing here is
  * quadratic in the corpus.
  */
object CleanPipeline {

  /** Near-dup survivor policy: for every verified pair (a < b) the
    * higher id `b` is dropped — deterministic, one anti-join, no
    * connected-components pass; the drop-b policy is the standard
    * cheap variant and keeps the oracle in plain SQL. The
    * transitive-closure-correct alternative is
    * [[Dedup.nearDupSurvivors]] (min-label propagation over the pair
    * graph, DedupSpec-tested).
    */
  def cleanCorpus(
      spark: SparkSession, sfDir: String,
      minTokens: Int = 20, jaccardThreshold: Double = 0.5): DataFrame = {
    val lang = TextAnalysis.langId(spark, sfDir)
      .select(col("doc_id"), col("lang_pred"))
    val toks = TextAnalysis.tokenStats(spark, sfDir)
      .select(col("doc_id"), col("n_ws_tokens"))
    val gated = lang.join(toks, "doc_id")
      .filter(col("lang_pred") =!= "und" && col("n_ws_tokens") >= minTokens)
    val exactKeep = Dedup.exactSurvivors(spark, sfDir)
    val nearDrop = Dedup
      .minhashLshPairsVerified(spark, sfDir, threshold = jaccardThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    gated
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("n_ws_tokens"))
  }

  /** The q76 capstone: the WHOLE training-corpus pipeline in one
    * query — [[cleanCorpus]]'s gates and dedup, then the q74
    * repetition gate, q75 PII redaction, and q68 split assignment on
    * the survivors. The output is the artifact a user would actually
    * materialize: the training-corpus MANIFEST (doc, language, token
    * count, repetition score, redacted-text fingerprint, split) — and
    * the whole composition still runs under the hard DuckDB oracle
    * because every stage is exactly SQL-expressible. Scale shape is
    * the union of the stages': narrow gates fused into scans, one
    * digest shuffle, banded LSH, zero-shuffle redaction/split, and
    * doc_id-keyed joins to assemble the manifest.
    */
  def corpusManifest(
      spark: SparkSession, sfDir: String,
      maxDupFrac: Double = 0.5): DataFrame =
    cleanCorpus(spark, sfDir)
      .join(TextAnalysis.repetitionStats(spark, sfDir)
        .select(col("doc_id"), col("dup_frac")), "doc_id")
      .filter(col("dup_frac") <= maxDupFrac)
      .join(TextAnalysis.redactPii(spark, sfDir)
        .select(col("doc_id"), col("n_emails"), col("redacted_fp")), "doc_id")
      .join(TrainingPrep.splitAssign(spark, sfDir)
        .select(col("doc_id"), col("split")), "doc_id")
}
