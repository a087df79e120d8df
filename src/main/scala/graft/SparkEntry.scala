package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.spark._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query reads only the driver-provided parquet tables under the
  * given sf dir; the interleaved-documents table is synthesized
  * deterministically from `documents.parquet` (InterleavedGen), so DuckDB
  * oracles can recompute expected results with plain SQL.
  */
object SparkEntry {

  /** Flagship: full extraction over the interleaved table at sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = InterleavedGen.table(spark, "/root/testdata/sf0.001")
    ExtractPipeline.extract(docs).toDF()
  }

  private def extracted(s: SparkSession, dir: String) =
    ExtractPipeline.extract(InterleavedGen.table(s, dir)).toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x1: end-to-end extraction roundtrip — the concatenation of extracted
    // text spans must equal the original document text (boilerplate
    // stripped, fragment boundaries invisible, media splits lossless).
    "x1_extract_text" -> ((s, dir) => {
      extracted(s, dir).select(
        col("doc_id"),
        array_join(transform(filter(col("spans"),
          sp => sp.getField("kind") === "text"), sp => sp.getField("text")), "")
          .as("main_text"))
    }),
    // x2: media passthrough — count and order of surviving media spans,
    // plus extracted text volume.
    "x2_extract_media" -> ((s, dir) => {
      extracted(s, dir).select(
        col("doc_id"),
        size(filter(col("spans"), sp => sp.getField("kind") === "media")).as("n_media"),
        array_join(transform(filter(col("spans"),
          sp => sp.getField("kind") === "media"), sp => sp.getField("media_ref")), ",")
          .as("media_refs"),
        length(array_join(transform(filter(col("spans"),
          sp => sp.getField("kind") === "text"), sp => sp.getField("text")), ""))
          .as("n_text_chars"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x1_extract_text" ->
      "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS main_text FROM documents",
    "x2_extract_media" ->
      ("SELECT CAST(doc_id AS VARCHAR) AS doc_id, " +
        "CAST(doc_id % 5 AS INT) AS n_media, " +
        "CASE WHEN doc_id % 5 = 0 THEN '' ELSE " +
        "  list_aggregate(list_transform(range(0, CAST(doc_id % 5 AS BIGINT)), " +
        "    j -> 'media://' || CAST(doc_id AS VARCHAR) || '/' || CAST(j AS VARCHAR)), 'string_agg', ',') " +
        "END AS media_refs, " +
        "CAST(length(text) AS INT) AS n_text_chars FROM documents")
  )
}
