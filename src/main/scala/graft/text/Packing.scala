package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Sequence packing: assign documents to fixed-token-budget bins — the
  * "concatenate shuffled docs, chop into training sequences" step every
  * LLM pretraining pipeline runs between curation and tokenized output.
  *
  * Semantics: documents are sharded into 256 hash buckets (first md5
  * byte of the salted id), ordered within each bucket by (hash, id) —
  * a deterministic global shuffle — then concatenated; a document's
  * bin is the bin containing its FIRST token (concat-then-chunk: a doc
  * straddling a budget boundary belongs to the bin it starts in, where
  * the chunker would split it). All arithmetic is integer, so bucket,
  * offset and bin are bit-identical across engines.
  *
  * Scale shape (100 TB): one shuffle on the bucket key; the running
  * token total is a cumulative-sum window per bucket (streaming frame,
  * no per-group buffering). 256 buckets of a uniform hash each carry
  * ~1/256 of the corpus — each bin is a bucket-local training shard, so
  * downstream tokenization reads bins with zero further shuffling. For
  * more parallelism widen the bucket prefix (2 hex chars → 3 gives
  * 4096 shards); the assignment stays deterministic per prefix width.
  */
object Packing {

  /** (…, bucket, offset, bin_id): `offset` is the token position where
    * the doc starts inside its bucket's concatenation, `bin_id` =
    * ⌊offset / budget⌋. `nTokensCol` must be an integer token count
    * (e.g. the filtered whitespace count from TextAnalysis). */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
      budget: Int, salt: String = "pack"): DataFrame = {
    require(budget > 0, "budget must be positive")
    Sampling.requireFresh(df, "__h", "bucket", "offset", "bin_id")
    val h = Sampling.idHash(col(idCol), salt)
    val w = Window.partitionBy("bucket").orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", h)
      .withColumn("bucket", substring(col("__h"), 1, 2))
      .withColumn("offset",
        (sum(col(nTokensCol).cast("long")).over(w) - col(nTokensCol))
          .cast("long"))
      // integral `div`, not floor(a/b): double division of big longs can
      // round across a bin boundary; div is exact for any budget
      .withColumn("bin_id", expr(s"offset div ${budget}L"))
      .drop("__h")
  }
}
