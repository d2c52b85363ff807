package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Chunking, Packing}

/** Properties of the overlapping chunker: hand-computed windows,
  * full token coverage, offset conservation (chunk_text is literally
  * the substring of the canonical join at [char_start, char_start +
  * char_len)), exact reconstruction at stride == window, and
  * composition with sequence packing. */
class ChunkingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val docs = Seq(
    (1L, "a bb ccc dddd eeeee ffffff g hh iii jjjj"), // 10 tokens
    (2L, "one two three"),                             // < window
    (3L, "   "),                                       // 0 tokens
    (4L, (1 to 23).map(i => s"t$i").mkString(" "))     // 23 tokens
  ).toDF("doc_id", "text")

  test("hand-computed windows at window=4, stride=3") {
    val out = Chunking.chunkOverlap(docs.filter($"doc_id" === 1), "doc_id",
        "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // n=10: starts 0,3,6 (6+4 ≥ 10 → stop); last chunk = tokens 6..9
    assert(out.map(r => (r.getAs[Int]("tok_start"),
      r.getAs[Int]("tok_end"))).toSeq === Seq((0, 4), (3, 7), (6, 10)))
    assert(out.head.getAs[String]("chunk_text") === "a bb ccc dddd")
    assert(out.last.getAs[String]("chunk_text") === "g hh iii jjjj")
    // char_start of chunk 1 (token 3): len("a bb ccc") + 1 = 9
    assert(out(1).getAs[Int]("char_start") === 9)
  }

  test("zero-token docs emit nothing; short docs emit one full chunk") {
    val out = Chunking.chunkOverlap(docs, "doc_id", "text", 4, 3)
    assert(out.filter($"doc_id" === 3).count() === 0)
    val short = out.filter($"doc_id" === 2).collect()
    assert(short.length === 1 &&
      short.head.getAs[String]("chunk_text") === "one two three")
  }

  test("offset conservation: chunk_text == substring of canonical join") {
    val joined = docs.select($"doc_id", array_join(filter(
        graft.text.TextAnalysis.tokens($"text"),
        w => length(w) > 0), " ").as("full"))
    val bad = Chunking.chunkOverlap(docs, "doc_id", "text", 4, 3)
      .join(joined, "doc_id")
      .filter(expr("substring(full, char_start + 1, char_len)") =!=
        $"chunk_text")
    assert(bad.count() === 0)
  }

  test("every token covered; consecutive overlap = window − stride") {
    val out = Chunking.chunkOverlap(docs, "doc_id", "text", 4, 3)
      .groupBy("doc_id")
      .agg(min("tok_start").as("first"), max("tok_end").as("last"),
        max("chunk_idx").as("maxk"))
      .join(docs.select($"doc_id",
        size(filter(graft.text.TextAnalysis.tokens($"text"),
          w => length(w) > 0)).as("n")), "doc_id")
    assert(out.filter($"first" =!= 0 || $"last" =!= $"n").count() === 0)
    // doc 4 (n=23): starts 0,3,…,21 → 8 chunks; 21+4 ≥ 23 stops there
    assert(out.filter($"doc_id" === 4).head().getAs[Int]("maxk") === 7)
  }

  test("stride == window reconstructs the document exactly") {
    val rebuilt = Chunking.chunkOverlap(docs, "doc_id", "text", 4, 4)
      .groupBy("doc_id")
      .agg(array_join(transform(
          array_sort(collect_list(struct($"chunk_idx", $"chunk_text"))),
          x => x.getField("chunk_text")), " ").as("rebuilt"),
        sum("n_chunk_tokens").as("tok_sum"))
    val full = docs.select($"doc_id",
      array_join(filter(graft.text.TextAnalysis.tokens($"text"),
        w => length(w) > 0), " ").as("full"),
      size(filter(graft.text.TextAnalysis.tokens($"text"),
        w => length(w) > 0)).as("n"))
    val joined = rebuilt.join(full, "doc_id")
    // non-overlapping windows partition the token stream: counts AND
    // concatenated text both conserve
    assert(joined.filter($"tok_sum" =!= $"n").count() === 0)
    assert(joined.filter($"rebuilt" =!= $"full").count() === 0)
  }

  test("composes with packSequences on (doc, chunk) keys") {
    val chunks = Chunking.chunkOverlap(docs, "doc_id", "text", 4, 3)
      .withColumn("chunk_id",
        concat($"doc_id", lit("_"), $"chunk_idx"))
    val packed = Packing.packSequences(chunks, "chunk_id",
      "n_chunk_tokens", budget = 8)
    // every chunk lands in exactly one bin and offsets are consistent:
    // offset div budget == bin_id for every row
    assert(packed.filter(expr("offset div 8") =!= $"bin_id").count() === 0)
    assert(packed.count() === chunks.count())
  }

  test("registry entry: ordered, nonempty, k-windowed at 64/48") {
    val out = SparkEntry.queries("text_chunk_overlap")(spark, sf0001)
    val rows = out.limit(50).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("n_chunk_tokens") <= 64))
  }

  test("chunk-level BM25: hits carry consistent provenance offsets") {
    val out = SparkEntry.queries("text_bm25_chunks")(spark, sf0001)
      .collect()
    assert(out.nonEmpty && out.length <= 20)
    // every hit's chunk_id decomposes into its provenance columns
    assert(out.forall { r =>
      r.getAs[String]("doc_id") ===
        s"${r.getAs[Long]("src_doc_id")}_${r.getAs[Int]("chunk_idx")}"
    })
    assert(out.forall(_.getAs[Int]("char_start") >= 0))
  }
}
