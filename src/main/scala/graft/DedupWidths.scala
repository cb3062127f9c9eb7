package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Near-dup signature widths for the curation entry points, loaded from
  * the `curation.*` conf keys (see `conf/graft.conf`) — the production
  * recall/precision dials. The library operators have taken widths as
  * parameters since the `d2v`/`d3v`/`d13v` oracle queries proved the
  * math at 128 permutations / 64 bits; this type is what wires a
  * DEPLOYED [[CurateApp]]/[[CurateStreamApp]] to those dials without a
  * recompile.
  *
  * The compiled-in defaults are the fixture widths (12 perms / 3 bands,
  * 32-bit SimHash), so an absent conf file changes nothing.
  *
  * Width-compatibility contract for [[CurateStreamApp]]: the band-index
  * state tables store signatures computed at ONE width — every batch,
  * and the bootstrap `Dedup.lshBands(corpus)` pass, must run at the
  * width of the state directory they share. Change widths by
  * re-bootstrapping the state, not by editing the conf of a live stream.
  */
final case class DedupWidths(
    method: String,
    numPerms: Int,
    numBands: Int,
    simhashBits: Int,
    simhashBucketBits: Int,
    simhashMaxHamming: Int) {

  require(method == "minhash" || method == "simhash",
    s"curation.nearDupMethod must be minhash|simhash, got '$method'")

  /** Candidate (doc1, doc2) pairs for the configured method — distinct
    * pairs in both branches (the LSH form aggregates per pair across
    * bands; the SimHash form keys each doc to exactly one bucket), so
    * callers may pass `pairsDistinct = true` downstream.
    */
  def candidatePairs(docs: DataFrame, maxBucket: Int = 10000): DataFrame =
    method match {
      case "simhash" =>
        Dedup.simhashCandidatePairs(docs, simhashBucketBits, simhashMaxHamming,
          maxBucket, simhashBits).select(col("doc1"), col("doc2"))
      case _ =>
        Dedup.lshCandidatePairs(docs, maxBucket, numPerms, numBands)
          .select(col("doc1"), col("doc2"))
    }
}

object DedupWidths {

  /** Fixture widths — identical to every pre-conf release's behavior. */
  val default: DedupWidths = DedupWidths(
    method = "minhash",
    numPerms = Dedup.NumPerms,
    numBands = Dedup.NumBands,
    simhashBits = Dedup.SimHashBits,
    simhashBucketBits = 12,
    simhashMaxHamming = 3)

  def fromConfig(c: GraftConfig): DedupWidths = DedupWidths(
    method = c.getString("curation.nearDupMethod", default.method),
    numPerms = c.getInt("curation.minhash.numPerms", default.numPerms),
    numBands = c.getInt("curation.minhash.numBands", default.numBands),
    simhashBits = c.getInt("curation.simhash.bits", default.simhashBits),
    simhashBucketBits = c.getInt("curation.simhash.bucketBits", default.simhashBucketBits),
    simhashMaxHamming = c.getInt("curation.simhash.maxHamming", default.simhashMaxHamming))
}
