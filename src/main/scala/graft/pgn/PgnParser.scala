package graft.pgn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PGN stream parsing: SURVEY.md §2.2 F1 (stateful block-boundary
  * detection) + F2 (header parsing) re-expressed relationally.
  *
  * Reference behavior (knightshift/utils/pgn_parser.py:12-43 and
  * get_games_from_tv.py:182-199): lines accumulate into a game block; a
  * non-blank, non-`[` line is move text and TERMINATES the block (the
  * stream emits `[Tag...]*` then one move line per game —
  * docs/assumptions.md:11-12). Header keys are lowercased, values
  * unquoted; move lines join with a single space.
  *
  * Two implementations with identical semantics:
  *   - [[parseLines]]: declarative — a sessionization window assigns
  *     game ids (running count of prior move-lines), then two grouped
  *     aggregations build the header map and ordered moves string.
  *     Scale: the window is per input file (`partitionBy(src_file)`), so
  *     1000 executors each sessionize their own files — no global sort.
  *   - [[splitBlocks]]: imperative per-document splitter (pure Scala,
  *     no Spark), reused by the streaming micro-batch wrapper where each
  *     HTTP response body is one document.
  */
object PgnParser {

  private val headerRe = "^\\[(\\w+)\\s+\"(.*)\"\\]$"

  /** Batch parse: input must have columns (src_file: String, line_no:
    * Long, line: String), ordered by line_no within each src_file.
    * Output: (src_file, game_idx, headers: Map[String,String],
    * moves: String) — one row per game block.
    */
  def parseLines(lines: DataFrame): DataFrame = {
    // duplicate tags in one block: LAST wins, like splitBlocks' map
    // update (and Python dict assignment in the reference). The entries
    // are sorted by line_no below, so last-wins is well-defined.
    lines.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    val trimmed = lines
      .withColumn("line", trim(col("line")))
      .filter(length(col("line")) > 0)                 // S2: blank-skip
      .withColumn("is_header", col("line").startsWith("["))

    // F1: a move line ends the current game → a line belongs to game
    // #(count of move lines strictly before it) within its file.
    val w = Window.partitionBy("src_file").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, -1)
    val numbered = trimmed.withColumn("game_idx",
      coalesce(sum(when(!col("is_header"), 1L).otherwise(0L)).over(w), lit(0L)))

    // F2: ONE grouped aggregation builds both the header map and the
    // ordered moves string (collect_list skips the NULLs the CASE
    // branches produce, so header and move lines separate without a
    // second shuffle + join). Move order is restored via array_sort on
    // (line_no, text) pairs — collect_list alone is
    // partition-order-dependent.
    // malformed '['-prefixed lines (no `[Tag "value"]` shape) still act
    // as header-ish for boundary purposes but contribute no entry —
    // matching splitBlocks, whose regex match simply fails.
    numbered
      .select(col("src_file"), col("game_idx"), col("line_no"),
        col("line"), col("is_header"),
        when(col("is_header") && col("line").rlike(headerRe),
          struct(col("line_no"),
            lower(regexp_extract(col("line"), headerRe, 1)).as("k"),
            regexp_extract(col("line"), headerRe, 2).as("v"))).as("hkv"),
        when(!col("is_header"),
          struct(col("line_no"), col("line"))).as("mv"))
      .groupBy("src_file", "game_idx")
      .agg(
        map_from_entries(expr(
          "transform(array_sort(collect_list(hkv)), x -> struct(x.k, x.v))"))
          .as("headers"),
        concat_ws(" ",
          expr("transform(array_sort(collect_list(mv)), x -> x.line)"))
          .as("moves"))
  }

  /** Convenience: read a PGN text file (or directory of files) and parse.
    * `monotonically_increasing_id` is non-decreasing within a partition
    * and each text-file split is one partition in line order, so it is a
    * valid per-file line ordering.
    */
  def readAndParse(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.textFile(path).toDF("line")
      .withColumn("src_file", input_file_name())
      .withColumn("line_no", monotonically_increasing_id())
    parseLines(lines)
  }

  /** Imperative per-document splitter — the streaming seam. One PGN
    * document (many games) → parsed games. Pure function: safe inside
    * `flatMap`/`mapPartitions`, no driver involvement.
    */
  def splitBlocks(doc: String): Seq[ParsedGame] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ParsedGame]
    var headers = Map.empty[String, String]
    var moves = List.empty[String]
    val re = headerRe.r
    def flush(): Unit = {
      if (headers.nonEmpty || moves.nonEmpty) {
        out += ParsedGame(headers, moves.reverse.mkString(" "))
        headers = Map.empty; moves = Nil
      }
    }
    doc.split("\n", -1).iterator.map(_.trim).filter(_.nonEmpty).foreach {
      case line if line.startsWith("[") =>
        re.findFirstMatchIn(line).foreach { m =>
          headers += (m.group(1).toLowerCase -> m.group(2))
        }
      case line =>
        // move text terminates the block (docs/assumptions.md:11-12)
        moves ::= line
        flush()
    }
    flush()
    out.toSeq
  }
}

/** One parsed PGN block: lowercased header tags + joined move text. */
case class ParsedGame(headers: Map[String, String], moves: String)
