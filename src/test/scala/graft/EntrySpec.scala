package graft

/** The driver contract: entry() answers the flagship query with rows, and
  * every registered query has either an oracle or a documented reason not
  * to. */
class EntrySpec extends SparkSuite {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle coverage is near-total") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // only sketch-estimate / input-parameterized / engine-side-codec
    // queries may skip the oracle — the full ledger mapping each entry to
    // its bounding spec AND the pinned bound lives in PLANS.md
    // ("Rows-only ledger"); keep that table in sync with this set.
    // Summary: HLL KPI (ApproxKpiSpec), GK quantiles
    // (ApproxQuantilesSpec), WAV decode (AudioSpec closed-form sine),
    // PNG aHash + GIF frames (MultimodalSpec), PQ ANN (PqSpec determinism
    // + recall), trained IVF (AnnRecallSpec recall floor vs oracle-checked
    // seed IVF). Round 10 removed THREE entries from this set:
    // q_sim_knn_lsh_adaptive (the dynamic-plane SQL construction
    // reproduces planesFor inside the oracle), q_sim_knn_ivf_trained
    // (the codebook IS the oracle-checked Lloyd trajectory — the oracle
    // derives the same centroids from the shared kmeans CTE chain), and
    // q_sim_knn_pq (long-form (m, cid, i, x) keying trains all M subspace
    // codebooks in ONE Lloyd CTE chain; the full train→encode→ADC→re-rank
    // trajectory hash-matches). What remains is genuinely engine-side:
    // sketch internals DuckDB cannot reproduce (HLL, GK) and binary
    // codecs it does not have (WAV, PNG aHash, GIF frames).
    val allowed = Set("q_kpi_order_approx", "q_stats_quantiles_approx",
      "q_mm_audio", "q_mm_image_neardup", "q_mm_video_frames")
    assert(noOracle === allowed, noOracle.toString)
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet ++ allowed)
  }
}
