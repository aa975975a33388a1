package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Text-analysis operators on hand-computable documents. */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = fixtureDir(
    "documents" -> Seq(
      (1L, "The cat sat on the mat and the dog ran to a tree", "en", "s", 49L),
      (2L, "der Hund ist nicht hier und die Katze ist weg", "de", "s", 45L),
      (3L, "  Multiple   spaces\tand\ttabs  ", "en", "s", 30L),
      (4L, "word", "und", "s", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("bm25: rare term outranks common, tf monotone, no-hit docs excluded") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "hash hash hash aaa bbb", "en", "s", 22L), // hash tf=3
      (2L, "hash aaa bbb ccc ddd", "en", "s", 20L),   // hash tf=1, same dl
      (3L, "vector hash aaa bbb ccc", "en", "s", 23L), // rare term + hash
      (4L, "aaa bbb ccc ddd eee", "en", "s", 19L))     // no query term
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis.bm25(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Long]("n_terms_hit"))).toMap
    assert(!rows.contains(4L)) // retrieval: zero-hit docs don't appear
    assert(rows(3L)._2 === 2L) // hit both 'vector' and 'hash'
    assert(rows(1L)._1 > rows(2L)._1) // same dl, higher tf => higher score
    assert(rows(3L)._1 > rows(2L)._1) // extra rare term dominates
    rows.values.foreach { case (s, _) => assert(s > 0.0) }
  }

  test("filter kappa: 2x2 table and chance-corrected agreement hand-computed") {
    // rater A = quality gate (>=10 tokens AND >=1 stopword);
    // rater B = langid prediction matches the metadata label
    val en10 = "the quick brown fox jumps over the lazy sleeping dog" // 10 tok, en
    val deLong = "alpha beta gamma delta epsilon zeta eta theta iota the" // en-pred
    val d = fixtureDir("documents" -> Seq(
      (1L, en10, "en", "s", 52L),                 // ra=T (the), rb=T
      (2L, deLong, "de", "s", 60L),               // ra=T, rb=F (pred en != de)
      (3L, "der und kurz", "de", "s", 12L),       // ra=F (3 tok), rb=T
      (4L, "zz yy", "fr", "s", 5L),               // ra=F, rb=F (pred und)
      (5L, "xx ww", "es", "s", 5L))               // ra=F, rb=F
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = TextAnalysis.filterAgreement(spark, d).collect().head
    assert(r.getAs[Long]("n11") === 1L)
    assert(r.getAs[Long]("n10") === 1L)
    assert(r.getAs[Long]("n01") === 1L)
    assert(r.getAs[Long]("n00") === 2L)
    // po = 3/5; pe = (2*2 + 3*3)/25 = 13/25; kappa = (15-13)/(25-13) = 1/6
    assert(r.getAs[Double]("p_o") === 0.6)
    assert(r.getAs[Double]("p_e") === 0.52)
    assert(r.getAs[Double]("kappa") === 0.166667)
  }

  test("filter kappa: perfect two-class agreement = 1, constant raters = NULL") {
    val en10 = "the quick brown fox jumps over the lazy sleeping dog"
    val perfect = fixtureDir("documents" -> Seq(
      (1L, en10, "en", "s", 52L),           // ra=T, rb=T
      (2L, "zz yy", "fr", "s", 5L))         // ra=F, rb=F
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val p = TextAnalysis.filterAgreement(spark, perfect).collect().head
    assert(p.getAs[Double]("kappa") === 1.0)
    val constant = fixtureDir("documents" -> Seq(
      (1L, en10, "en", "s", 52L),
      (2L, en10, "en", "s", 52L))           // both raters all-true -> pe = 1
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val c = TextAnalysis.filterAgreement(spark, constant).collect().head
    assert(c.isNullAt(c.fieldIndex("kappa")))
    assert(c.getAs[Double]("p_o") === 1.0)
  }

  test("token and char counts") {
    val rows = TextAnalysis.tokenCount(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
    assert(rows(1L) === 13)
    assert(rows(3L) === 4) // whitespace runs collapse before split
    assert(rows(4L) === 1)
  }

  test("quality: stopword ratio and pass flag") {
    val byId = TextAnalysis.quality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = byId(1L)
    assert(d1.getAs[Int]("n_tokens") === 13)
    assert(d1.getAs[Int]("n_stopwords") === 7) // the x3, on, and, to, a
    assert(d1.getAs[Boolean]("passes_quality"))
    assert(!byId(4L).getAs[Boolean]("passes_quality")) // too short
  }

  test("language id picks en and de by marker votes; single word is und") {
    val byId = TextAnalysis.langId(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("predicted_lang") === "en")
    assert(byId(2L).getAs[String]("predicted_lang") === "de")
    assert(byId(4L).getAs[String]("predicted_lang") === "und")
    assert(byId(2L).getAs[Boolean]("matches_label"))
  }

  test("pii scan counts planted emails, urls and ipv4s; clean docs flagged false") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "contact Alice.Smith+x@example.org or bob@test.co today", "en", "s", 10L),
      (2L, "see https://example.com/a?b=1 and http://x.io then 10.0.0.1 and 192.168.1.255", "en", "s", 10L),
      (3L, "perfectly clean prose with no identifiers at all", "en", "s", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = TextAnalysis.piiScan(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_urls"),
          r.getAs[Int]("n_ipv4"), r.getAs[Boolean]("has_pii")))).toMap
    assert(out(1L) == ((2, 0, 0, true)))
    assert(out(2L) == ((0, 2, 2, true)))
    assert(out(3L) == ((0, 0, 0, false)))
  }

  test("chunking: stride/overlap invariants and full coverage") {
    // 130 tokens -> ceil((130-16)/48) = 3 chunks; starts 0,48,96
    val words = (1 to 130).map(i => s"w$i").mkString(" ")
    val d = fixtureDir("documents" -> Seq(
      (1L, words, "en", "s", words.length.toLong),
      (2L, "tiny doc", "en", "s", 8L) // < overlap -> single chunk
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis.chunk(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx")) -> r).toMap
    assert(rows.keys.count(_._1 == 1L) === 3)
    assert(rows.keys.count(_._2 == 0) === 2)
    val c0 = rows((1L, 0)).getAs[String]("chunk_text").split(" ")
    val c1 = rows((1L, 1)).getAs[String]("chunk_text").split(" ")
    assert(c0.length === TextAnalysis.ChunkTokens)
    assert(c0.head === "w1" && c1.head === "w49") // stride 48
    // consecutive chunks overlap by exactly ChunkOverlap tokens
    assert(c0.takeRight(TextAnalysis.ChunkOverlap).toSeq === c1.take(TextAnalysis.ChunkOverlap).toSeq)
    // last chunk reaches the final token -> full coverage
    assert(rows((1L, 2)).getAs[String]("chunk_text").split(" ").last === "w130")
    assert(rows((2L, 0)).getAs[Int]("n_tokens") === 2)
  }

  test("tfidf: corpus-wide terms get zero idf; doc-unique terms rank first") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "apple apple banana shared", "en", "s", 10L),
      (2L, "cherry cherry cherry shared", "en", "s", 10L),
      (3L, "banana date shared", "en", "s", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis.tfidf(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) -> r).toMap
    // "shared" appears in all 3 docs -> idf = ln(3/3) = 0
    rows.collect { case ((_, "shared"), r) => r }
      .foreach(r => assert(r.getAs[Double]("tfidf") === 0.0))
    // doc 1's top term is apple: tf=2, df=1 -> 2*ln(3)
    val top1 = TextAnalysis.tfidf(spark, d).collect()
      .filter(r => r.getAs[Long]("doc_id") == 1L && r.getAs[Int]("rank") == 1).head
    assert(top1.getAs[String]("term") === "apple")
    assert(math.abs(top1.getAs[Double]("tfidf") - 2 * math.log(3.0)) < 1e-5)
    // every doc keeps at most 3 ranked terms
    assert(rows.keys.groupBy(_._1).values.forall(_.size <= 3))
  }

  test("bpe learn: classic hand-run on aaab aaab ab; graceful merge exhaustion") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "aaab aaab ab", "en", "s", 12L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis.bpeLearn(spark, d).collect()
      .map(r => r.getAs[Int]("rank") -> ((r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("f")))).toMap
    // round 1: "a a" wins with weight 4 (aaab has two overlap-free a-a pairs? no —
    // left-to-right pair COUNTING sees both "a a" positions: 2 per aaab × freq 2 = 4)
    assert(rows(1) === (("a a", "aa", 4L)))
    // round 2: aaab -> "aa a b", so "a b" (2+1) beats "aa a" (2)
    assert(rows(2) === (("a b", "ab", 3L)))
    // round 3: "aa ab" from both aaab occurrences
    assert(rows(3) === (("aa ab", "aaab", 2L)))
    // vocabulary exhausts: later rounds produce no pairs and drop out
    assert(rows.size === 3)
  }

  test("bpe encode: matches an independent replay of the learn+apply chain") {
    // rich enough corpus for all 8 merge rounds
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox and the quick red fox"),
      (3L, "lazy dogs and quick foxes jump over logs"))
    val d = fixtureDir("documents" -> texts.map { case (id, t) =>
      (id, t, "en", "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"))

    // reference replay with the engine's exact string semantics
    val allWords = texts.flatMap(_._2.split(" "))
    var vocab: Map[String, String] =
      allWords.distinct.map(w => w -> w.toSeq.mkString(" ")).toMap
    val freq = allWords.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (_ <- 1 to TextAnalysis.BpeRounds) {
      val counts = vocab.toSeq.flatMap { case (w, cur) =>
        val syms = cur.split(" ")
        syms.zip(syms.tail).map { case (a, b) => (s"$a $b", freq(w)) }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.nonEmpty) {
        val best = counts.toSeq.minBy { case (p, f) => (-f, p) }._1
        vocab = vocab.view.mapValues(_.replace(best, best.replace(" ", ""))).toMap
      }
    }
    val expected = texts.map { case (id, t) =>
      id -> t.split(" ").map(w => vocab(w).split(" ").length.toLong).sum
    }.toMap

    val out = TextAnalysis.bpeEncode(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    assert(out === expected)
    // merges compress: strictly fewer symbols than characters, at least one per word
    val nWords = TextAnalysis.bpeEncode(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_words")).toMap
    texts.foreach { case (id, t) =>
      assert(out(id) >= nWords(id))
      assert(out(id) < t.replace(" ", "").length)
    }
  }

  test("lm score: hand-computed unigram log-probs; rare-word doc scores lower") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "a a a", "en", "s", 5L),
      (2L, "a b", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    // corpus: a×4, b×1, total 5 -> p(a)=0.8, p(b)=0.2
    // qlp(a) = floor(ln(0.8)·1e6 + 0.5) = -223144, qlp(b) = -1609438
    val rows = TextAnalysis.lmScore(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_words") === 3)
    assert(rows(1L).getAs[Double]("avg_logprob") === -0.223144)
    assert(rows(2L).getAs[Double]("avg_logprob") === -0.916291)
    assert(rows(1L).getAs[Double]("avg_logprob") > rows(2L).getAs[Double]("avg_logprob"))
    assert(rows(2L).getAs[Double]("ppl") > rows(1L).getAs[Double]("ppl"))
    assert(math.abs(rows(1L).getAs[Double]("ppl") - 1.25) < 1e-3)
    assert(math.abs(rows(2L).getAs[Double]("ppl") - 2.5) < 1e-3)
  }

  test("typo pairs: distance-banded candidates, exact levenshtein gate") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "color color colour cat kitten", "en", "s", 29L),
      (2L, "mitten colour", "en", "s", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis.typoPairs(spark, d).collect()
      .map(r => (r.getAs[String]("word_a"), r.getAs[String]("word_b")) ->
        ((r.getAs[Int]("dist"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))).toMap
    // color~colour d1 (with corpus counts 2 and 2), kitten~mitten d1;
    // cat is within the length band of color but at distance 3 -> gated out
    assert(rows.keySet === Set(("color", "colour"), ("kitten", "mitten")))
    assert(rows(("color", "colour")) === ((1, 2L, 2L)))
    assert(rows(("kitten", "mitten")) === ((1, 1L, 1L)))
  }

  test("inverted index: df counts all docs, postings capped and tf-ordered") {
    val d = fixtureDir("documents" -> Seq(
      (1L, "apple apple apple", "en", "s", 17L),
      (2L, "apple apple banana", "en", "s", 18L),
      (3L, "apple banana", "en", "s", 12L),
      (4L, "apple", "en", "s", 5L),
      (5L, "apple cherry", "en", "s", 12L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis.invertedIndex(spark, d).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[String]("postings")))).toMap
    // apple in 5 docs, but postings capped at 3: tf 3 (doc1), 2 (doc2), then doc3 (tf1, id order)
    assert(rows("apple") === ((5L, "1:3,2:2,3:1")))
    assert(rows("banana") === ((2L, "2:1,3:1")))
    assert(rows("cherry") === ((1L, "5:1")))
  }

  test("fingerprints: identical normalized content -> identical fp; winnow for short docs falls back") {
    val d2 = fixtureDir("documents" -> Seq(
      (1L, "Hello  World again", "en", "s", 18L),
      (2L, "hello world again", "en", "s", 17L),
      (3L, "one two three", "en", "s", 13L) // < 4 words -> fallback fp
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = TextAnalysis.fingerprint(spark, d2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[String]("fp_content") === rows(2L).getAs[String]("fp_content"))
    assert(rows(3L).getAs[String]("fp_winnow") === rows(3L).getAs[String]("fp_content"))
  }
}
