package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark-native implementation plus (where
  * SQL-expressible) a DuckDB oracle equivalent over the same parquet tables.
  *
  * The harness contract (see /root/repo/SURVEY.md §2 "Key" column): every
  * operator the engine claims is registered here so the driver can
  * hash-compare the Spark result against DuckDB at sf0.01.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are also timed by Bench */
    bench: Boolean = false)

object Registry {
  lazy val all: Seq[Q] =
    operators.Scans.queries ++
      operators.Validation.queries ++
      operators.Kpis.queries ++
      operators.Tpch.queries ++
      operators.TpchSubqueries.queries ++
      operators.Joins.queries ++
      operators.Scd.queries ++
      operators.Cdc.queries ++
      operators.Skew.queries ++
      operators.AsOf.queries ++
      operators.Analytics.queries ++
      operators.Events.queries ++
      operators.Dedup.queries ++
      operators.Graph.queries ++
      operators.Sampling.queries ++
      operators.Similarity.queries ++
      operators.Pq.queries ++
      operators.EmbedClassify.queries ++
      operators.KMeans.queries ++
      operators.Pca.queries ++
      operators.TextAnalysis.queries ++
      operators.Retrieval.queries ++
      operators.TrainClassifier.queries ++
      operators.ModelEval.queries ++
      operators.MarkovAttribution.queries ++
      operators.FeatureEng.queries ++
      operators.Concurrency.queries ++
      operators.Seasonal.queries ++
      operators.Recommend.queries ++
      operators.Engagement.queries ++
      operators.CorpusStats.queries ++
      operators.Packing.queries ++
      operators.Sketches.queries ++
      operators.Layout.queries ++
      operators.Multimodal.queries ++
      operators.Mining.queries ++
      operators.SetSim.queries ++
      operators.Curation.queries ++
      operators.Trend.queries ++
      operators.Inference.queries ++
      operators.Profiler.queries ++
      plans.TopK.queries ++
      sources.Bucketing.queries ++
      sources.Dpp.queries ++
      sources.Evolution.queries ++
      sources.SyntheticDocs.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
