package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table provider — the remaining Spark extension axis after
  * custom `Expression`s and the optimizer rule (`GraftExtensions`): a
  * deterministic synthetic-documents generator with REAL source machinery —
  * explicit partition planning (`rows` split across `partitions` input
  * splits, the moral equivalent of parquet row-groups) and column pruning
  * (`SupportsPushDownRequiredColumns`: a `select(doc_id)` never
  * materializes the text column — check `.explain`'s ReadSchema).
  *
  * Usage: `spark.read.format("graft.sources.SyntheticDocs")
  *   .option("rows", 1000).option("partitions", 8).load()`.
  *
  * Every column is a closed-form function of the row id, so the DuckDB
  * oracle regenerates the identical table from `range()` — a fully
  * oracle-checked custom source. At scale this pattern is how test/bench
  * corpora are generated in place (no I/O at all, each executor
  * synthesizes only its split).
  */
class SyntheticDocs extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** ServiceLoader-registered short name: `.format("graft-docs")` and SQL
    * `CREATE TABLE ... USING `graft-docs`` both resolve here. */
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  // ------------------------------------------------- scale-bench corpus
  // A documents table statistically matched to the harness testdata
  // (measured: 31-word vocabulary fixed across SFs, 10-100 words/doc
  // uniform, 5 langs with en ~40%, 20 round-robin sources) plus a
  // controlled near-duplicate rate — the data-dependent term the LSH
  // dedup family's scaling evidence needs at sizes the harness doesn't
  // ship (>sf0.1). Every row is a pure function of doc_id, so generation
  // is embarrassingly parallel, reproducible across runs/partitionings,
  // and a near-dup can regenerate its base doc without reading it.

  private val corpusVocab: IndexedSeq[String] = IndexedSeq(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "a", "the", "line", "sort", "window", "spark",
    "group", "column", "order", "small", "join", "shuffle", "disk", "memory",
    "cache", "plan", "query", "stage", "task")
  private val corpusLangs: IndexedSeq[String] =
    IndexedSeq("en", "en", "en", "en", "de", "es", "fr", "zh") // en ~40%

  /** 1-in-DupStride docs are perturbed copies of an earlier doc. */
  val DupStride = 20
  /** Per-word replacement probability of a near-dup copy (~10% of words →
    * shingle Jaccard ~0.55-0.75, straddling the 0.5 verify threshold the
    * way organic near-dups do). */
  private val DupNoise = 10
  /** 1-in-BoilerStride docs open with the same fixed sentence — the
    * boilerplate head every real web corpus has (site chrome, licenses).
    * Its shingles hold df/n ≈ 1/BoilerStride at EVERY corpus size, which
    * is the regime DF shingle pruning (NearDup.minhashPairsPruned)
    * exists for — unlike the flat organic background, whose per-shingle
    * df FRACTION shrinks as the corpus grows. */
  val BoilerStride = 10
  private val boilerplate: IndexedSeq[String] = IndexedSeq(
    "the", "fast", "table", "scan", "plan", "cache", "merge", "sort", "batch")

  private def rngOf(id: Long, salt: Long): java.util.Random =
    new java.util.Random(id * 0x9e3779b97f4a7c15L + salt)

  private def baseWords(id: Long): IndexedSeq[String] = {
    val rnd = rngOf(id, 17)
    IndexedSeq.fill(10 + rnd.nextInt(91))(corpusVocab(rnd.nextInt(corpusVocab.length)))
  }

  private def organicWords(id: Long): IndexedSeq[String] =
    if (id % BoilerStride == 7) boilerplate ++ baseWords(id) else baseWords(id)

  /** Words of doc `id`: organic (possibly boilerplate-headed), or a noisy
    * copy of a nearby earlier doc (boilerplate copied along, as a real
    * scrape would). */
  private[graft] def corpusWords(id: Long): IndexedSeq[String] =
    if (id % DupStride == DupStride - 1 && id >= DupStride) {
      val rnd = rngOf(id, 89)
      val base = organicWords(id - 1 - rnd.nextInt(DupStride - 1))
      base.map(w =>
        if (rnd.nextInt(DupNoise) == 0) corpusVocab(rnd.nextInt(corpusVocab.length)) else w)
    } else organicWords(id)

  /** Deterministic harness-shaped corpus of `rows` documents (same column
    * set as the testdata documents.parquet tables). Used by the bench's
    * LSH scale pass and SyntheticDocsSpec; NOT a registered query input. */
  def corpus(spark: SparkSession, rows: Long, partitions: Int = 32)
      : org.apache.spark.sql.DataFrame =
    corpusOf(spark, rows, partitions, corpusWords)

  // ------------------------------------------------- web-like Zipf corpus
  // The harness-matched corpus above has a FIXED 31-word vocabulary, so
  // every unrelated doc pair shares most of its vocabulary and band
  // buckets fill with df-cohort collisions — candidate volume grows
  // ~n^1.9 there, a property of that corpus, not of the algorithm. Real
  // web corpora have an open vocabulary (Zipf): most shingles are rare,
  // so unrelated docs essentially never share a band, and candidate
  // volume tracks the planted duplicate + boilerplate density instead.
  // This variant keeps the dup/boilerplate structure IDENTICAL (same
  // strides, same noise) and swaps only the organic word source for a
  // log-uniform (≈ Zipf(1)) draw over a 10^6-word vocabulary, so the two
  // decades isolate exactly one variable: vocabulary openness.

  private val ZipfVocabLn = math.log(1e6)

  private def zipfBase(id: Long): IndexedSeq[String] = {
    val rnd = rngOf(id, 131)
    IndexedSeq.fill(10 + rnd.nextInt(91)) {
      // inverse-CDF of p(rank) ∝ 1/rank over ranks 1..10^6: log-uniform
      val rank = math.floor(math.exp(rnd.nextDouble() * ZipfVocabLn)).toLong + 1
      s"w$rank"
    }
  }

  private def organicZipf(id: Long): IndexedSeq[String] =
    if (id % BoilerStride == 7) boilerplate ++ zipfBase(id) else zipfBase(id)

  /** Zipf-vocabulary corpus words: organic, boilerplate-headed, or a noisy
    * copy of a nearby earlier doc — same structure as [[corpusWords]]. */
  private[graft] def zipfCorpusWords(id: Long): IndexedSeq[String] =
    if (id % DupStride == DupStride - 1 && id >= DupStride) {
      val rnd = rngOf(id, 97)
      val base = organicZipf(id - 1 - rnd.nextInt(DupStride - 1))
      base.map(w =>
        if (rnd.nextInt(DupNoise) == 0)
          s"w${math.floor(math.exp(rnd.nextDouble() * ZipfVocabLn)).toLong + 1}"
        else w)
    } else organicZipf(id)

  /** Deterministic web-like (open-vocabulary) corpus — the realistic
    * regime for the LSH scale evidence. */
  def zipfCorpus(spark: SparkSession, rows: Long, partitions: Int = 32)
      : org.apache.spark.sql.DataFrame =
    corpusOf(spark, rows, partitions, zipfCorpusWords)

  private def corpusOf(spark: SparkSession, rows: Long, partitions: Int,
      words: Long => IndexedSeq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, rows, 1, partitions).map { id =>
      val text = words(id).mkString(" ")
      val lang = corpusLangs(rngOf(id, 53).nextInt(corpusLangs.length))
      (id, text, lang, s"src${id % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  val langs: IndexedSeq[String] = IndexedSeq("en", "de", "fr")

  /** Closed-form row content (mirrored in the DuckDB oracle): the text is
    * `n_words` repeats of "w<id mod 7>". */
  def lang(id: Long): String = langs((id % 3).toInt)
  def nWords(id: Long): Int = (id % 5).toInt + 1
  def text(id: Long): String =
    Seq.fill(nWords(id))(s"w${id % 7}").mkString(" ")

  val QueryRows = 1000

  /** Registered query: the full synthetic table via the V2 source; the
    * oracle regenerates it closed-form from range(). `dir` is unused —
    * the source IS the data. */
  val queries: Seq[graft.Q] = Seq(graft.Q(
    "q_source_dsv2",
    (spark, _) => spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", QueryRows.toString).option("partitions", "8").load(),
    Some(
      s"""SELECT i AS doc_id,
         |  ['en', 'de', 'fr'][CAST(i % 3 AS INT) + 1] AS lang,
         |  CAST(length(rtrim(repeat('w' || CAST(i % 7 AS VARCHAR) || ' ', CAST(i % 5 AS INT) + 1))) AS BIGINT) AS n_chars,
         |  rtrim(repeat('w' || CAST(i % 7 AS VARCHAR) || ' ', CAST(i % 5 AS INT) + 1)) AS text
         |FROM range(0, $QueryRows) r(i)""".stripMargin)))
}

class SyntheticDocsTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions)
}

class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SyntheticDocs.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SyntheticScan(rows, partitions, required)
}

case class SyntheticRange(start: Long, end: Long) extends InputPartition

class SyntheticScan(rows: Long, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(s =>
      SyntheticRange(s, math.min(rows, s + per)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

class SyntheticReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SyntheticRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = {
        // project ONLY the pruned columns, in the required order — the
        // text column is never built unless asked for
        val values = required.fields.map(_.name match {
          case "doc_id" => id: java.lang.Long
          case "lang" => UTF8String.fromString(SyntheticDocs.lang(id))
          case "n_chars" => SyntheticDocs.text(id).length.toLong: java.lang.Long
          case "text" => UTF8String.fromString(SyntheticDocs.text(id))
        })
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
