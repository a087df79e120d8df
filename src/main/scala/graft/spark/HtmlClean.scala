package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.rewrite.{ElementHandlers, Rewriter}
import graft.extract.ExtractPolicy

/** Rewrite-mode pipeline: boilerplate subtrees removed, the REMAINING
  * HTML re-serialized — the reference's primary `HtmlRewriter` use-case
  * (sanitization/cleaning at the edge) as a Spark job. Unmodified bytes
  * pass through zero-copy; only removal boundaries re-cut the output.
  */
object HtmlClean {

  final case class CleanedDoc(doc_id: String, html: String)

  /** Clean (doc_id, html) rows with the policy's strip set. */
  def clean(df: DataFrame, policy: ExtractPolicy = ExtractPolicy.Default): Dataset[CleanedDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    val strip = policy.stripSelectors
    df.select(col("doc_id").cast("string"), col("html"))
      .as[(String, String)]
      .mapPartitions { it =>
        val rw = new Rewriter(
          strip.map(sel => sel -> ElementHandlers(element = el => el.remove())),
          strict = false)
        it.map { case (id, html) => CleanedDoc(id, rw.rewrite(html)) }
      }
  }

  /** The generated interleaved corpus as whole-HTML rows (text fragments
    * concatenated; media placeholders are not part of the byte stream).
    */
  def generatedHtml(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .as[InterleavedGen.DocRow]
      .map { d =>
        val spans = InterleavedGen.spansFor(d)
        (d.doc_id.toString, spans.filter(_.kind == "text").map(_.text).mkString)
      }
      .toDF("doc_id", "html")
  }
}
