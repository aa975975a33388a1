package graft

import graft.operators.NearDup
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[NearDup.DfPruneMinDocs]] to its DERIVATION (round-12 verdict task
  * #1): the gate is a candidate-volume / shuffle-width budget — switch to
  * DF-pruned signatures once the unpruned candidate stream would exceed
  * ~1 verify pair per document (i.e. stop being O(corpus)) — NOT a
  * single-host wall-time optimum (round 11's clean measure put the
  * wall-time crossover near ~900k docs on this 32-thread host; the earlier
  * 48 s / 150k "time crossover" was batch-run contamination and is
  * withdrawn).
  *
  * Anchors are the measured Zipf-corpus candidate counts from
  * BENCH_DEEP.json (round 11, runs=2, per-point calib drift 0.07):
  * unpruned 303 / 15,182 / 1,295,688 and pruned 191 / 2,206 / 60,113
  * pairs at 5k / 50k / 500k docs. If a re-measure moves these anchors or
  * someone edits the constant, this spec forces the derivation and the
  * scaladoc to move together. Pure arithmetic — no Spark session.
  */
class GateBudgetSpec extends AnyFunSuite {

  // measured candidate-pair counts (BENCH_DEEP.json, lsh family, zipf)
  private val docs = Seq(5000.0, 50000.0, 500000.0)
  private val unpruned = Seq(303.0, 15182.0, 1295688.0)
  private val pruned = Seq(191.0, 2206.0, 60113.0)

  /** 2-decade log-log slope, the same fit BENCH_DEEP's alpha_2decades uses. */
  private def alpha2(c: Seq[Double]): Double =
    math.log10(c(2) / c(0)) / math.log10(docs(2) / docs(0))

  private val aU = alpha2(unpruned)
  private val aP = alpha2(pruned)

  /** Fitted unpruned candidate pairs per document at corpus size n,
    * anchored at the 500k measurement: cpd(n) = (c/n)₅₀₀ₖ · (n/500k)^(α−1). */
  private def candsPerDoc(n: Double): Double =
    (unpruned(2) / docs(2)) * math.pow(n / docs(2), aU - 1.0)

  test("unpruned candidates grow super-linearly, pruned stay near-linear") {
    assert(aU > 1.7, s"unpruned 2-decade exponent $aU lost its n^1.8 shape")
    assert(aP < 1.3, s"pruned 2-decade exponent $aP is no longer ~O(n)")
  }

  test("DfPruneMinDocs sits at the <=1 candidate-pair-per-doc budget") {
    // the budget binds: satisfied at the gate, violated at twice the gate
    assert(candsPerDoc(NearDup.DfPruneMinDocs.toDouble) <= 1.0,
      s"gate ${NearDup.DfPruneMinDocs} already over budget " +
        f"(${candsPerDoc(NearDup.DfPruneMinDocs.toDouble)}%.3f cands/doc)")
    assert(candsPerDoc(2.0 * NearDup.DfPruneMinDocs) > 1.0,
      "gate is more than 2x below the budget crossover — constant is stale")
    // and the exact fitted crossover is within 10% of the constant
    val nStar = docs(2) * math.pow(docs(2) / unpruned(2), 1.0 / (aU - 1.0))
    val ratio = NearDup.DfPruneMinDocs / nStar
    assert(ratio > 0.9 && ratio < 1.1,
      f"fitted crossover $nStar%.0f docs vs constant ${NearDup.DfPruneMinDocs} " +
        f"(ratio $ratio%.3f) — re-derive the constant from the new anchors")
  }

  test("above the gate, pruning cuts fitted candidate volume by >10x at 5M docs") {
    // the cluster-scale argument: at 5M docs the unpruned stream is ~80M
    // pairs vs ~600k pruned — the quantity that breaks a real shuffle first
    val n = 5e6
    val cu = unpruned(2) * math.pow(n / docs(2), aU)
    val cp = pruned(2) * math.pow(n / docs(2), aP)
    assert(cu / cp > 10.0, f"pruning advantage collapsed: $cu%.0f vs $cp%.0f")
  }
}
