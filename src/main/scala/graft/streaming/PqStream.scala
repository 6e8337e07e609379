package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Online PQ encoding — the streaming half of q96's lambda split: the
  * batch job trains the product codebook
  * (`PqQueries.trainCodebook`) and encodes the settled corpus; this
  * encodes vectors the moment they land, with the trained codebook
  * shipped to the executors as a plain closure value (M·K·subDim
  * longs, kilobytes — exactly how production PQ indexers run their
  * ingest workers).
  *
  * The assignment is a per-row Scala loop rather than the batch
  * side's `aggregate`-HOF folds — the same subspace argmin, expressed
  * as a typed map because that is the streaming-native tool for a
  * per-row pure function. Semantics are pinned EQUAL to
  * `PqQueries.encoded` (strict-< argmin, lowest code on ties, exact
  * integer distances) by PqStreamSpec's batch parity test, so the two
  * halves cannot drift.
  *
  * Scale: stateless — no shuffle, no state store; each micro-batch is
  * a map over its rows. Codebook refresh from a retrained batch
  * artifact is a stream restart (the reference-centroid rule of
  * CentroidStream applies: assignment against mutable state would
  * make codes depend on micro-batch boundaries). */
object PqStream {

  final case class VecI(vec_id: Long, v: Seq[Long])
  final case class Encoded(vec_id: Long, codes: Seq[Int], qerr: Long)

  /** Subspace-argmin encode of one vector; returns (codes, total
    * quantization error). Equivalent to one row through
    * `PqQueries.encoded` (parity-pinned). */
  private[streaming] def encodeOne(
      v: IndexedSeq[Long], cb: Array[Array[Array[Long]]],
      subDim: Int): (Seq[Int], Long) = {
    val m = cb.length
    var err = 0L
    val codes = (0 until m).map { mm =>
      var bestD = Long.MaxValue
      var bestK = -1
      var kk = 0
      while (kk < cb(mm).length) {
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = v(mm * subDim + j) - cb(mm)(kk)(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestK = kk } // strict <: lowest k wins ties
        kk += 1
      }
      err += bestD
      bestK
    }
    (codes, err)
  }

  /** Encode a vector stream against a trained codebook. */
  def encode(
      spark: SparkSession, vecs: Dataset[VecI],
      codebook: Array[Array[Array[Long]]], subDim: Int): Dataset[Encoded] = {
    import spark.implicits._
    vecs.map { x =>
      val (codes, err) = encodeOne(x.v.toIndexedSeq, codebook, subDim)
      Encoded(x.vec_id, codes, err)
    }
  }
}
