package graft.ops

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, NGram, RegexTokenizer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D25: a TRAINED document-quality classifier — the fastText-style
  * linear model over hashed n-gram features that large-scale corpus
  * curation uses as its learned quality filter (the published
  * CCNet/GPT-3/LLaMA recipe: label a high-quality proxy corpus
  * positive, the raw crawl negative, keep documents the model scores
  * well). Complements D4b's HEURISTIC quality score: the heuristics
  * are fixed rules; this learns a corpus-specific boundary from
  * examples and is the tool that generalizes to "looks like the
  * reference corpus".
  *
  * Spark-first shape — everything rides spark.ml, no hand-rolled
  * optimization:
  *  - features: lowercase word tokens + CHARACTER TRIGRAMS, each
  *    hashed into a fixed-width term-frequency vector (`HashingTF`,
  *    the fastText bucket trick — vocabulary never materializes,
  *    feature width is a constant knob). The char-gram channel is
  *    what generalizes across vocabulary shift: garbage shares
  *    character statistics (hex runs, repeated punctuation) even when
  *    its exact tokens never repeat, and natural text shares its
  *    language's trigram profile across topics;
  *  - model: `LogisticRegression` (L-BFGS). Training cost is one
  *    corpus scan per iteration with map-side-combined gradient
  *    partials (`treeAggregate`); driver state is the coefficient
  *    vector, O(2 × numFeatures) doubles — ~4 MB at the 2^18 default,
  *    independent of corpus size.
  *  - scoring: the fitted model broadcasts with the task closure and
  *    [[score]] is a per-row map — zero exchanges, corpus never
  *    shuffles (QualityClassifierSpec pins the no-Exchange plan).
  *
  * At 100 TB: train on a SAMPLE (the published recipes use 10⁵-10⁷
  * labeled examples — D7's deterministic samplers produce the split),
  * score the full corpus with the broadcast model. Nothing in either
  * phase holds corpus-sized state anywhere.
  */
object QualityClassifier {

  /** Feature/trainer knobs. `numFeatures` is PER CHANNEL (the word-
    * unigram and CHAR-TRIGRAM channels concatenate to 2 × numFeatures
    * total width — char trigrams, not word bigrams: they carry the
    * signal across vocabulary shift, the fix BENCH_NOTES round 7
    * credits for 0.77 → 1.0 held-out accuracy; collision behavior at
    * a given width is char-trigram-shaped, ~50k distinct grams for
    * ASCII-ish text).
    */
  final case class Config(
      numFeatures: Int = 1 << 18,
      maxIter: Int = 50,
      regParam: Double = 1e-4,
      elasticNetParam: Double = 0.0)

  private val toks = "__qc_toks"
  private val chars = "__qc_chars"
  private val bi = "__qc_bi"
  private val tf1 = "__qc_tf1"
  private val tf2 = "__qc_tf2"
  private val feats = "__qc_features"
  private val rawCol = "__qc_raw"
  private val probVec = "__qc_probvec"
  private val predCol = "__qc_pred"
  private val labelCol = "__qc_label"

  private def featureStages(textCol: String, numFeatures: Int)
      : Array[PipelineStage] = Array(
    new RegexTokenizer().setInputCol(textCol).setOutputCol(toks)
      .setPattern("\\W+").setToLowercase(true),
    // char stream (gaps=false: every char is a token) -> trigrams
    new RegexTokenizer().setInputCol(textCol).setOutputCol(chars)
      .setPattern("(?s).").setGaps(false).setToLowercase(true),
    new NGram().setN(3).setInputCol(chars).setOutputCol(bi),
    new HashingTF().setInputCol(toks).setOutputCol(tf1)
      .setNumFeatures(numFeatures),
    new HashingTF().setInputCol(bi).setOutputCol(tf2)
      .setNumFeatures(numFeatures),
    new VectorAssembler().setInputCols(Array(tf1, tf2))
      .setOutputCol(feats))

  /** Fit the quality model on a labeled frame: `labelExpr` must
    * evaluate to 1 (keep-quality) / 0 (reject) per row. Returns the
    * fitted spark.ml pipeline (tokenize → hash → logistic model).
    */
  def train(
      labeled: DataFrame,
      textCol: String,
      labelExpr: org.apache.spark.sql.Column,
      cfg: Config = Config()): PipelineModel = {
    require(!labeled.columns.exists(_.startsWith("__qc_")),
      "column prefix __qc_ is reserved by QualityClassifier")
    val lr = new LogisticRegression()
      .setFeaturesCol(feats).setLabelCol(labelCol)
      .setRawPredictionCol(rawCol).setProbabilityCol(probVec)
      .setPredictionCol(predCol)
      .setMaxIter(cfg.maxIter).setRegParam(cfg.regParam)
      .setElasticNetParam(cfg.elasticNetParam)
    new Pipeline()
      .setStages(featureStages(textCol, cfg.numFeatures) :+ lr)
      .fit(labeled.withColumn(labelCol, labelExpr.cast("double")))
  }

  /** Score: adds `outCol` = P(quality = 1) per document; the input's
    * own columns pass through unchanged. Per-row map with the model
    * broadcast in the closure — no exchange.
    */
  def score(
      df: DataFrame,
      model: PipelineModel,
      outCol: String = "quality_prob"): DataFrame = {
    require(!df.columns.exists(_.startsWith("__qc_")),
      "column prefix __qc_ is reserved by QualityClassifier")
    model.transform(df)
      .withColumn(outCol, vector_to_array(col(probVec)).getItem(1))
      .drop(toks, chars, bi, tf1, tf2, feats, rawCol, probVec, predCol)
  }

  /** Persist a trained model (spark.ml's own ML-writer format —
    * metadata JSON + coefficient parquet), so train-once /
    * score-everywhere works across sessions and clusters.
    */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PipelineModel =
    PipelineModel.load(path)

  /** The curation filter: keep documents the model scores at or above
    * `threshold` (the recipes' usual 0.5, tuned per corpus).
    */
  def keepQuality(
      df: DataFrame,
      model: PipelineModel,
      threshold: Double = 0.5,
      outCol: String = "quality_prob"): DataFrame =
    score(df, model, outCol).filter(col(outCol) >= threshold)
}
