package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch as a typed
  * `Aggregator[IN, BUF, OUT]` — the engine's custom-aggregate surface.
  *
  * Keeps the k smallest DISTINCT hash values seen per group: single pass,
  * O(k) state, associatively mergeable — the sketch family (KMV/HLL/theta)
  * a 100 TB profiler reaches for where exact distinct would shuffle the
  * world. The k-th smallest of n uniform hashes sits at ≈ k/(n+1), so
  * distinct ≈ (k-1)/frac(kth). md5 hex sorts lexicographically ==
  * numerically, which makes the sketch DETERMINISTIC and therefore
  * oracle-checkable: DuckDB computes the same bottom-k with a plain
  * sort+slice and derives the identical estimate (see Dedup.kmvBySource).
  */
object KmvSketch {

  val K = 16

  /** Buffer/output = sorted array of the ≤K smallest distinct hex hashes. */
  val aggregator: Aggregator[String, Array[String], Array[String]] =
    new Aggregator[String, Array[String], Array[String]] {
      override def zero: Array[String] = Array.empty

      override def reduce(buf: Array[String], hash: String): Array[String] =
        if (buf.length >= K && buf(buf.length - 1) <= hash) buf // fast reject
        else insert(buf, hash)

      override def merge(a: Array[String], b: Array[String]): Array[String] =
        b.foldLeft(a)((acc, h) => reduce(acc, h))

      override def finish(buf: Array[String]): Array[String] = buf

      private def insert(buf: Array[String], hash: String): Array[String] = {
        val i = java.util.Arrays.binarySearch(
          buf.asInstanceOf[Array[AnyRef]], hash)
        if (i >= 0) buf // already present — distinct sketch
        else {
          val at = -i - 1
          if (at >= K) buf
          else {
            val out = new Array[String](math.min(buf.length + 1, K))
            System.arraycopy(buf, 0, out, 0, at)
            out(at) = hash
            if (at < out.length - 1)
              System.arraycopy(buf, at, out, at + 1, out.length - at - 1)
            out
          }
        }
      }

      override def bufferEncoder: Encoder[Array[String]] =
        ExpressionEncoder[Array[String]]()
      override def outputEncoder: Encoder[Array[String]] =
        ExpressionEncoder[Array[String]]()
    }
}
