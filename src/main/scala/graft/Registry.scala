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
  /** Declaration-ordered (module entry point, queries) pairs — the module
    * string is the object whose `queries` seq contributes the entries,
    * kept explicit so RegistryDoc can attribute every query to its API
    * entry point without reflection. */
  lazy val modules: Seq[(String, Seq[Q])] = Seq(
    "graft.operators.Scans" -> operators.Scans.queries,
    "graft.operators.Validation" -> operators.Validation.queries,
    "graft.operators.Kpis" -> operators.Kpis.queries,
    "graft.operators.Tpch" -> operators.Tpch.queries,
    "graft.operators.TpchSubqueries" -> operators.TpchSubqueries.queries,
    "graft.operators.Joins" -> operators.Joins.queries,
    "graft.operators.Scd" -> operators.Scd.queries,
    "graft.operators.Cdc" -> operators.Cdc.queries,
    "graft.operators.Skew" -> operators.Skew.queries,
    "graft.operators.AsOf" -> operators.AsOf.queries,
    "graft.operators.Analytics" -> operators.Analytics.queries,
    "graft.operators.Events" -> operators.Events.queries,
    "graft.operators.Dedup" -> operators.Dedup.queries,
    "graft.operators.Graph" -> operators.Graph.queries,
    "graft.operators.Sampling" -> operators.Sampling.queries,
    "graft.operators.Similarity" -> operators.Similarity.queries,
    "graft.operators.Pq" -> operators.Pq.queries,
    "graft.operators.EmbedClassify" -> operators.EmbedClassify.queries,
    "graft.operators.KMeans" -> operators.KMeans.queries,
    "graft.operators.Pca" -> operators.Pca.queries,
    "graft.operators.TextAnalysis" -> operators.TextAnalysis.queries,
    "graft.operators.Retrieval" -> operators.Retrieval.queries,
    "graft.operators.TrainClassifier" -> operators.TrainClassifier.queries,
    "graft.operators.ModelEval" -> operators.ModelEval.queries,
    "graft.operators.MarkovAttribution" -> operators.MarkovAttribution.queries,
    "graft.operators.FeatureEng" -> operators.FeatureEng.queries,
    "graft.operators.Concurrency" -> operators.Concurrency.queries,
    "graft.operators.Seasonal" -> operators.Seasonal.queries,
    "graft.operators.Recommend" -> operators.Recommend.queries,
    "graft.operators.Engagement" -> operators.Engagement.queries,
    "graft.operators.CorpusStats" -> operators.CorpusStats.queries,
    "graft.operators.Packing" -> operators.Packing.queries,
    "graft.operators.Sketches" -> operators.Sketches.queries,
    "graft.operators.Layout" -> operators.Layout.queries,
    "graft.operators.Multimodal" -> operators.Multimodal.queries,
    "graft.operators.Mining" -> operators.Mining.queries,
    "graft.operators.SetSim" -> operators.SetSim.queries,
    "graft.operators.Curation" -> operators.Curation.queries,
    "graft.operators.Trend" -> operators.Trend.queries,
    "graft.operators.Inference" -> operators.Inference.queries,
    "graft.operators.Profiler" -> operators.Profiler.queries,
    "graft.plans.TopK" -> plans.TopK.queries,
    "graft.sources.Bucketing" -> sources.Bucketing.queries,
    "graft.sources.Dpp" -> sources.Dpp.queries,
    "graft.sources.Evolution" -> sources.Evolution.queries,
    "graft.sources.SyntheticDocs" -> sources.SyntheticDocs.queries)

  lazy val all: Seq[Q] = modules.flatMap(_._2)

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
