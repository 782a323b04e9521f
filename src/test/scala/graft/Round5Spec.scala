package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: Lloyd-refined PQ codebooks, the delta-append
  * live store (see LiveStoreSpec), and the exact-substring dedup. */
class Round5Spec extends SparkSpec {

  test("the PQ Lloyd step strictly reduces quantization distortion") {
    // recall@5 over 25 truth pairs is too coarse to see codebook
    // quality (±1 pair = ±0.04); distortion — the objective Lloyd
    // descends — is the honest metric. Measured: 17% lower at sf0.01.
    val all = functions.Similarity.quantized(spark, sf)
    val (raw, refined) = functions.Similarity.pqCodebooks(all)
    val dRaw = functions.Similarity.pqDistortion(all, raw)
    val dRef = functions.Similarity.pqDistortion(all, refined)
    info(s"pq distortion: raw=$dRaw refined=$dRef (${math.round(100 * (1 - dRef / dRaw))}% lower)")
    assert(dRef < dRaw, s"refined codebook must beat raw seeds: $dRef !< $dRaw")
  }
}
