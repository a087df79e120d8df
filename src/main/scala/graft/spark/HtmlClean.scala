package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.rewrite.{DocHandlers, ElementHandlers, Rewriter}
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

  /** Deterministic PDF corpus: each document's text embedded as one
    * uncompressed Tj text operator — exercises the non-HTML payload branch
    * end-to-end (sniff -> route -> stream scan -> operator decode).
    */
  def pdfAssets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val content = s"BT /F1 12 Tf ($text) Tj ET"
        val pdf = s"%PDF-1.4\n1 0 obj\n<< /Length ${content.length} >>\nstream\n" +
          content + "\nendstream\nendobj\n%%EOF"
        (id, pdf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      }
      .toDF("doc_id", "payload")
  }

  /** Route payload bytes through DocRouter, return extracted text. */
  def routedText(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val router = new graft.extract.DocRouter()
        it.map { case (id, bytes) =>
          val r = router.extract(bytes)
          (id, r.spans.filter(_.kind == "text").map(_.text).mkString)
        }
      }
      .toDF("doc_id", "extracted_text")
  }

  /** Link extraction: every `a[href]` in document order — the selector
    * engine with attribute predicates as a pipeline operator.
    */
  def links(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("string"), col("html"))
      .as[(String, String)]
      .mapPartitions { it =>
        val hrefs = new scala.collection.mutable.ArrayBuffer[String]()
        // match-only: no output serialization — the engine only runs the
        // selector VM and materializes matched elements
        val rw = new Rewriter(Seq("a[href]" -> ElementHandlers(
          element = el => hrefs += el.attr("href"))), strict = false,
          produceOutput = false)
        it.flatMap { case (id, html) =>
          hrefs.clear()
          rw.rewriteToBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          hrefs.toArray.zipWithIndex.map { case (h, i) => (id, i, h) }
        }
      }
      .toDF("doc_id", "link_idx", "href")
  }

  /** x11: source-location ranges — for each document, the byte range of
    * the single `<a>` START TAG as reported by
    * `Element.sourceStart`/`sourceEnd` (reference `Element::source_location`
    * parity), plus the raw slice those offsets select from the input.
    * The oracle recomputes both offsets by pure string arithmetic over
    * the deterministic generator template (ASCII, so char == byte), so an
    * off-by-one anywhere in the lexer's raw-range bookkeeping mismatches.
    */
  def sourceRanges(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("string"), col("html"))
      .as[(String, String)]
      .mapPartitions { it =>
        val ranges = new scala.collection.mutable.ArrayBuffer[(Int, Int)](2)
        val rw = new Rewriter(Seq("a" -> ElementHandlers(
          element = el => ranges += ((el.sourceStart, el.sourceEnd)))),
          strict = false, produceOutput = false)
        it.map { case (id, html) =>
          ranges.clear()
          val bytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          rw.rewriteToBytes(bytes)
          val (s, e) = ranges.head
          (id, s, e, new String(bytes, s, e - s, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      .toDF("doc_id", "a_start", "a_end", "a_raw")
  }

  /** x13: EndTag + Doctype source-location ranges (round 5): the doctype
    * token's byte range and the `</nav>` end tag's byte range per
    * document, both recomputable by the oracle via template arithmetic —
    * pins `EndTagTok.sourceStart/End` and `DoctypeTok.sourceStart/End`
    * (reference `end_tag.rs:183`, `doctype.rs:112`).
    */
  def endTagRanges(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("string"), col("html"))
      .as[(String, String)]
      .mapPartitions { it =>
        var dtS = 0; var dtE = 0; var navS = 0; var navE = 0
        val rw = new Rewriter(
          Seq("nav" -> ElementHandlers(element = el =>
            el.onEndTag(et => { navS = et.sourceStart; navE = et.sourceEnd }))),
          Seq(DocHandlers(doctype = dt => { dtS = dt.sourceStart; dtE = dt.sourceEnd })),
          strict = false, produceOutput = false)
        it.map { case (id, html) =>
          dtS = -1; dtE = -1; navS = -1; navE = -1
          val bytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          rw.rewriteToBytes(bytes)
          // a doc without </nav> (or a doctype) leaves the sentinel at -1;
          // emit nulls rather than letting new String(bytes, -1, ...)
          // throw for the whole partition on non-corpus input
          val navRaw =
            if (navS >= 0) new String(bytes, navS, navE - navS,
              java.nio.charset.StandardCharsets.UTF_8)
            else null
          (id,
            if (dtS >= 0) Some(dtS) else None, if (dtE >= 0) Some(dtE) else None,
            if (navS >= 0) Some(navS) else None, if (navE >= 0) Some(navE) else None,
            navRaw)
        }
      }
      .toDF("doc_id", "dt_start", "dt_end", "nav_start", "nav_end", "nav_raw")
  }

  /** x12: DOM-heuristic extraction ([[graft.extract.HeuristicMain]]) —
    * must recover the same main text as the selector-based x1 WITHOUT
    * naming a single boilerplate selector: nav/link-farm blocks are
    * link-dense and score out, content paragraphs score in.
    */
  def heuristicExtract(df: DataFrame, minTextLen: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("string"), col("html"))
      .as[(String, String)]
      .mapPartitions { it =>
        val hx = new graft.extract.HeuristicMain(minTextLen = minTextLen)
        it.map { case (id, html) => (id, hx.extractString(html).mkString) }
      }
      .toDF("doc_id", "main_text")
  }

  /** x14: the JusText CONTEXT rule (`keepShortNearGood`) under the
    * oracle — a short low-link-density block ADJACENT to an
    * independently good block is kept, while an isolated short block and
    * link-dense blocks still drop. The planted template surrounds the
    * document text with one block of each kind, so the expected output
    * is exactly `text || 's' || (doc_id % 7)`:
    *
    *   li  "nav-id x"  link-dense            -> dropped (density)
    *   p   doc text    long, no links        -> good
    *   p   "sN"        short, adjacent good  -> KEPT by the context rule
    *   h2  "x"         all link text         -> dropped (density)
    *   p   "eM"        short, neighbors bad  -> dropped (no good neighbor)
    */
  def contextHeuristicExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val hx = new graft.extract.HeuristicMain(minTextLen = 10,
          keepShortNearGood = true)
        it.map { case (id, text) =>
          val html =
            s"""<html><body><ul><li><a href="/s/$id">nav-$id</a> x</li></ul>""" +
              s"""<p>$text</p><p>s${id.toLong % 7}</p>""" +
              s"""<h2><a href="/t/$id">x</a></h2><p>e${id.toLong % 9}</p></body></html>"""
          (id, hx.extractString(html).mkString)
        }
      }
      .toDF("doc_id", "main_text")
  }

  /** Token counts per document — the tokenizer itself at the correctness
    * gate (the generator's fixed template implies fixed tag counts,
    * including `<div>`-in-script-string cases that exercise ScriptData).
    */
  def tokenCounts(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("string"), col("html"))
      .as[(String, String)]
      .mapPartitions { it =>
        import graft.core._
        val lexer = new Lexer(strict = false)
        val counter = new LexemeSink {
          var st, et, cm, dt = 0
          def reset(): Unit = { st = 0; et = 0; cm = 0; dt = 0 }
          def onText(s: Int, e: Int, t: Int): Unit = ()
          def onStartTag(a: Int, b: Int, h: Long, n: Int, sc: Boolean,
                         at: AttrList, rs: Int, re: Int): Unit = st += 1
          def onEndTag(a: Int, b: Int, h: Long, rs: Int, re: Int): Unit = et += 1
          def onComment(a: Int, b: Int, rs: Int, re: Int): Unit = cm += 1
          def onDoctype(a: Int, b: Int, c: Boolean, d0: Int, e: Int, f: Boolean,
                        g: Int, h: Int, i: Boolean, j: Boolean, k: Int, l: Int): Unit = dt += 1
          def onRawWithoutToken(rs: Int, re: Int): Unit = ()
          def onEof(p: Int): Unit = ()
        }
        it.map { case (id, html) =>
          counter.reset()
          lexer.parse(html.getBytes(java.nio.charset.StandardCharsets.UTF_8), counter)
          (id, counter.st, counter.et, counter.cm, counter.dt)
        }
      }
      .toDF("doc_id", "n_start_tags", "n_end_tags", "n_comments", "n_doctypes")
  }

  /** Non-UTF-8 ingestion (reference D13/D14): build a deterministic
    * document in `charset` — declared only via `<meta http-equiv>` — encode
    * to raw bytes, and extract through [[graft.extract.Extractor.extractEncoded]]:
    * the first parse (assuming UTF-8) detects the meta declaration and the
    * row is re-decoded + re-parsed in the declared charset. `suffix` must
    * contain characters outside ASCII (and inside `charset`) so a decode
    * error is actually observable.
    */
  def encodedRoundtrip(spark: SparkSession, sfDir: String,
                       charset: String, suffix: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val cs = java.nio.charset.Charset.forName(charset)
        val ex = new graft.extract.Extractor(ExtractPolicy.Default)
        it.map { case (id, text) =>
          val payload = text + suffix
          val html =
            s"""<!doctype html><html><head><meta http-equiv="Content-Type" content="text/html; charset=$charset">""" +
              s"""<title>doc $id</title></head><body><nav>nav-$id</nav>""" +
              s"""<article><p>$payload</p></article><footer>f-$id</footer></body></html>"""
          val res = ex.extractEncoded(html.getBytes(cs))
          (id, res.spans.filter(_.kind == "text").map(_.text).mkString)
        }
      }
      .toDF("doc_id", "main_text")
  }

  /** Rewrite-mode transcoding roundtrip (reference D13 output side): the
    * document arrives as raw bytes in `charset`, boilerplate subtrees are
    * stripped, and the cleaned HTML is emitted re-encoded in the SAME
    * charset. The returned column decodes the output with that charset —
    * if the engine emitted UTF-8 bytes instead, the non-ASCII `suffix`
    * would mojibake and the oracle hash would fail.
    */
  def cleanEncodedRoundtrip(spark: SparkSession, sfDir: String,
                            charset: String, suffix: String,
                            policy: ExtractPolicy = ExtractPolicy.Default): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val cs = java.nio.charset.Charset.forName(charset)
        val rw = new Rewriter(
          policy.stripSelectors.map(sel => sel -> ElementHandlers(element = el => el.remove())),
          strict = false)
        it.map { case (id, text) =>
          val html =
            s"""<!doctype html><html><head><title>d$id</title></head><body><nav>nav-$id</nav>""" +
              s"""<article><p>$text$suffix</p></article><script>var x=1;</script></body></html>"""
          val out = rw.rewriteEncodedBytes(html.getBytes(cs), cs)
          (id, new String(out, cs))
        }
      }
      .toDF("doc_id", "cleaned")
  }

  /** Bail-out corpus (reference D16 graceful bail-out + D17 memory
    * limiter under the driver oracle): deterministic planting rules over
    * the documents table —
    *  - doc_id % 7 == 0: a `<select><style>` parsing ambiguity AFTER the
    *    article (the reference ambiguity_guard's security bail-out); the
    *    article's text span is already committed, so the row keeps its
    *    partial output plus the error code
    *  - else doc_id % 5 == 0: the document is inflated past `budget`
    *    bytes (memory limiter; no spans, deterministic error string)
    *  - otherwise: normal extraction, empty error
    * Output (doc_id, error, n_spans, main_text); tasks never fail — bad
    * documents become error rows, the property that keeps a 100 TB run
    * alive when a crawl shard contains hostile HTML.
    */
  def bailoutExtract(spark: SparkSession, sfDir: String, budget: Int = 8192): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val ex = new graft.extract.Extractor(
          ExtractPolicy.Default.copy(strict = true, maxDocBytes = budget))
        val pad = "x" * (budget + 16)
        it.map { case (id, text) =>
          val idNum = id.toLong
          val body =
            if (idNum % 7 == 0) s"<article><p>$text</p></article><select><style>bail</style></select>"
            else if (idNum % 5 == 0) s"<article><p>$pad</p></article>"
            else s"<article><p>$text</p></article>"
          val html = s"<html><body>$body</body></html>"
          val r = ex.extractHtml(html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            Vector.empty, Vector.empty)
          (id, if (r.error == null) "" else r.error, r.spans.length,
            r.spans.filter(_.kind == "text").map(_.text).mkString)
        }
      }
      .toDF("doc_id", "error", "n_spans", "main_text")
  }

  /** Streaming-mutation rewrite under the driver oracle: `nav` replaced
    * whole (literal Element.replace), `article` content replaced by a
    * STREAMED chunk sequence (html + escaped-text + html) derived from
    * the element's own attribute — the reference `streaming!` surface
    * end-to-end through Spark.
    */
  def streamedClean(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.rewrite.{ContentType, StreamingHandler, StreamingSink}
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val rw = new Rewriter(Seq(
          "nav" -> ElementHandlers(element = el => el.replace("<hr>")),
          "article" -> ElementHandlers(element = el => {
            val id = el.attr("data-doc")
            el.streamingSetInnerContent(new StreamingHandler {
              def writeAll(sink: StreamingSink): Unit = {
                sink.writeStr("<mark>", ContentType.Html)
                sink.writeStr(id + " <ok>", ContentType.Text) // escaped
                sink.writeStr("</mark>", ContentType.Html)
              }
            })
          })), strict = false)
        it.map { case (id, text) =>
          val html = s"""<html><body><nav>n-$id</nav><article data-doc="$id"><p>$text</p></article></body></html>"""
          (id, rw.rewrite(html))
        }
      }
      .toDF("doc_id", "rewritten")
  }

  /** x15: rewrite-mode graceful bail-out (reference v3.0.0 BailOut unit,
    * Settings::append_bail_out_handler — settings.rs:40-41,160 and
    * rewritable_units/bail_out.rs). Three branches per row:
    *  - doc_id % 5 == 0: body padded past the rewrite budget — memory
    *    bail-out BEFORE parsing: output = handler marker + whole doc raw
    *  - doc_id % 7 == 0 (and not % 5): a planted handler failure at
    *    `<article data-fail>` — mid-document bail-out: the transformed
    *    prefix (nav already replaced) is kept, the marker lands, then the
    *    unemitted suffix flushes raw
    *  - otherwise: normal rewrite (nav replaced by <hr>), empty error
    * Rows never fail; the error code rides a column — the same
    * keep-the-response-whole contract the reference's graceful flags buy.
    */
  def bailoutRewrite(spark: SparkSession, sfDir: String, budget: Int = 8192): DataFrame = {
    import spark.implicits._
    import graft.rewrite.ContentType
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val rw = new Rewriter(
          Seq(
            "nav" -> ElementHandlers(element = el => el.replace("<hr>")),
            "article" -> ElementHandlers(element = el =>
              if (el.attr("data-fail") != null)
                throw new RuntimeException("planted handler failure"))),
          strict = false,
          maxDocBytes = budget,
          gracefulBailOutOnMemoryLimit = true,
          gracefulBailOutOnContentHandlerError = true,
          bailOutHandlers = Seq((err, bo) =>
            bo.append(s"<!--bail:${err.errorCode}-->", ContentType.Html)))
        val pad = "x" * (budget + 16)
        it.map { case (id, text) =>
          val idNum = id.toLong
          val body = if (idNum % 5 == 0) pad else text
          val failAttr = if (idNum % 5 != 0 && idNum % 7 == 0) " data-fail=\"1\"" else ""
          val html = s"""<html><body><nav>n-$id</nav><article$failAttr><p>$body</p></article></body></html>"""
          val outBytes = rw.rewriteToBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val err = rw.lastBailOut
          (id, new String(outBytes, java.nio.charset.StandardCharsets.UTF_8),
            if (err == null) "" else err.errorCode)
        }
      }
      .toDF("doc_id", "rewritten", "bail_error")
  }

  /** x16: absolute-URL rebasing of `a[href]` / `img[src]` against a base
    * page URL — the canonical production use of the reference engine
    * (Cloudflare Workers' HTMLRewriter attribute rewriting). RFC-3986
    * lite resolution: scheme-qualified and fragment-only references pass
    * through untouched (their raw tag bytes are NOT re-serialized —
    * setAttribute is only called when the value changes),
    * protocol-relative `//host/…` takes the base scheme, root-relative
    * `/…` takes the base origin, everything else is joined to the base
    * directory. Per-row map-only; the engine instance is reused across
    * the partition (S3 arena contract).
    */
  def rebaseLinks(spark: SparkSession, sfDir: String,
                  base: String = "https://example.org/dir/page.html"): DataFrame = {
    import spark.implicits._
    val schemeEnd = base.indexOf("://")
    require(schemeEnd > 0, s"base must be absolute: $base")
    val scheme = base.substring(0, schemeEnd)
    val origin = base.substring(0, base.indexOf('/', schemeEnd + 3) match {
      case -1 => base.length
      case i  => i
    })
    val dirUrl = base.substring(0, base.lastIndexOf('/') + 1)
    def resolve(u: String): String =
      if (u.isEmpty || u.startsWith("#") || u.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) u
      else if (u.startsWith("//")) scheme + ":" + u
      else if (u.startsWith("/")) origin + u
      else dirUrl + u
    def rebaser(attr: String): ElementHandlers = ElementHandlers(element = el => {
      val v = el.attr(attr)
      if (v != null) {
        val r = resolve(v)
        if (r != v) el.setAttribute(attr, r)
      }
    })
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"))
      .as[String]
      .mapPartitions { it =>
        val rw = new Rewriter(Seq(
          "a[href]" -> rebaser("href"),
          "img[src]" -> rebaser("src")), strict = false)
        it.map { id =>
          val html = s"""<html><body><a href="/p/$id">r</a>""" +
            s"""<a href="img/$id?q=1">s</a>""" +
            s"""<a href="https://other.example/abs/$id">t</a>""" +
            s"""<a href="#sec-$id">u</a>""" +
            s"""<a href="//cdn.example/lib.js">v</a>""" +
            s"""<img src="img/$id.png"></body></html>"""
          (id, rw.rewrite(html))
        }
      }
      .toDF("doc_id", "rewritten")
  }

  /** x17: head-metadata extraction (canonical URL, OpenGraph properties,
    * robots directives) — the crawl-pipeline companion to x4's link
    * extraction, and the query that puts the `^=` prefix attribute
    * operator under the oracle gate (`meta[property^="og:"]` must fire
    * for og:* and stay silent for every other meta). Match-only
    * (produceOutput=false => scan-mode eligible); per-row fields are
    * reset before each document, so a missing tag yields null.
    */
  def headMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"))
      .as[String]
      .mapPartitions { it =>
        var canonical: String = null
        var ogTitle: String = null
        var ogType: String = null
        var robots: String = null
        val rw = new Rewriter(Seq(
          "link[rel=\"canonical\"]" -> ElementHandlers(
            element = el => canonical = el.attr("href")),
          "meta[property^=\"og:\"]" -> ElementHandlers(element = el => {
            el.attr("property") match {
              case "og:title" => ogTitle = el.attr("content")
              case "og:type"  => ogType = el.attr("content")
              case _          => ()
            }
          }),
          "meta[name=\"robots\"]" -> ElementHandlers(
            element = el => robots = el.attr("content"))),
          strict = false, produceOutput = false)
        it.map { id =>
          canonical = null; ogTitle = null; ogType = null; robots = null
          val idNum = id.toLong
          val robotsContent =
            if (idNum % 9 == 0) "noindex,nofollow" else "index,follow"
          val html =
            s"""<html><head><link rel="canonical" href="https://example.org/c/$id">""" +
              s"""<meta property="og:title" content="Doc $id">""" +
              s"""<meta property="og:type" content="article">""" +
              s"""<meta property="vid:tag" content="not og">""" +
              s"""<meta name="robots" content="$robotsContent">""" +
              s"""</head><body><p>page $id</p></body></html>"""
          rw.rewriteToBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // null-guard (ADVICE r6): a document with no robots meta must
          // yield a non-indexable=false row, not an NPE failing the task
          (id, canonical, ogTitle, ogType, robots,
            robots != null && !robots.contains("noindex"))
        }
      }
      .toDF("doc_id", "canonical", "og_title", "og_type", "robots", "indexable")
  }

  /** x18: structured TABLE extraction — the HTML-tables-to-rows step of
    * a training-data pipeline (tables feed tabular-QA / markdown
    * conversion). Row frames via `table tr` element handlers whose
    * `onEndTag` closes the row; cell text is captured by `table th` /
    * `table td` handlers scoped between the cell's start and end tag
    * (the streaming engine builds no tree, so the template closes every
    * cell explicitly — the reference's contract is identical). Emits one
    * output row per `<tr>` with the cells pipe-joined; surrounding
    * boilerplate paragraphs and a decoy `<ul>` nav must contribute
    * nothing. Map-only; the oracle recomputes every cell from the
    * template arithmetic.
    */
  def tableExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"))
      .as[String]
      .mapPartitions { it =>
        val rows = new scala.collection.mutable.ArrayBuffer[String]()
        var cells: scala.collection.mutable.ArrayBuffer[String] = null
        var cell: java.lang.StringBuilder = null
        // implicit-close discipline (real-world tables omit </td>/</tr>
        // constantly): a new cell/row START flushes the previous open
        // one, and ancestor end tags pop nested frames innermost-first,
        // so each flush fires exactly once whichever close form arrives
        def flushCell(): Unit =
          if (cells != null && cell != null) { cells += cell.toString; cell = null }
        def flushRow(): Unit = {
          flushCell()
          if (cells != null) { rows += cells.mkString("|"); cells = null }
        }
        // chunk-identity dedup (the x12 pattern): with omitted cell end
        // tags the frames NEST, so the same TextChunk is delivered once
        // per active matched frame — append it only once
        var lastChunk: AnyRef = null
        val cellHandlers = ElementHandlers(
          element = el => {
            flushCell()
            if (cells == null) cells = new scala.collection.mutable.ArrayBuffer[String]()
            cell = new java.lang.StringBuilder
            el.onEndTag(_ => flushCell())
          },
          text = tc => if (cell != null && (tc ne lastChunk)) {
            lastChunk = tc
            cell.append(tc.text)
          })
        val rw = new Rewriter(Seq(
          "table tr" -> ElementHandlers(element = el => {
            flushRow()
            cells = new scala.collection.mutable.ArrayBuffer[String]()
            el.onEndTag(_ => flushRow())
          }),
          "table th" -> cellHandlers,
          "table td" -> cellHandlers),
          strict = false, produceOutput = false)
        it.flatMap { id =>
          rows.clear(); cells = null; cell = null
          val idNum = id.toLong
          // odd doc_ids use the sloppy real-world form (no cell/row end
          // tags at all); even ids close everything explicitly — both
          // must yield identical rows under the same oracle
          val html = if (idNum % 2 == 1)
            s"""<html><body><p>intro $id</p><ul><li>nav one</li><li>nav two</li></ul>""" +
              s"""<table class="data"><tr><th>key<th>value""" +
              s"""<tr><td>name<td>doc $id""" +
              s"""<tr><td>score<td>${idNum * 7 % 100}</table>""" +
              s"""<p>footer $id</p></body></html>"""
          else
            s"""<html><body><p>intro $id</p><ul><li>nav one</li><li>nav two</li></ul>""" +
              s"""<table class="data"><tr><th>key</th><th>value</th></tr>""" +
              s"""<tr><td>name</td><td>doc $id</td></tr>""" +
              s"""<tr><td>score</td><td>${idNum * 7 % 100}</td></tr></table>""" +
              s"""<p>footer $id</p></body></html>"""
          rw.rewriteToBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          flushRow() // doc-end flush: a table that never closes at all
          rows.toArray.zipWithIndex.map { case (r, i) => (id, i, r) }
        }
      }
      .toDF("doc_id", "row_idx", "cells")
  }

  /** x19: HTML -> Markdown conversion — the html2md step of a text
    * pipeline (markdown is the LLM-training serialization of structured
    * pages). The streaming engine makes this a single in-order pass:
    * ONE `body` text handler appends every text chunk exactly once in
    * document order, and element handlers inject the markdown markers
    * around it (`# ` heading prefixes, `**`/`*` emphasis, `- ` list
    * items, `[text](href)` links — the href captured at the START tag
    * and closed over by `onEndTag`). No tree is built and none is
    * needed: marker injection interleaves with text in byte order.
    * The oracle recomputes the full markdown string from the template.
    */
  def markdownConvert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"))
      .as[String]
      .mapPartitions { it =>
        val out = new java.lang.StringBuilder
        def mark(start: String, end: String) = ElementHandlers(element = el => {
          out.append(start)
          el.onEndTag(_ => out.append(end))
        })
        val rw = new Rewriter(Seq(
          "body" -> ElementHandlers(text = tc => out.append(tc.text)),
          "h1" -> mark("# ", "\n\n"),
          "h2" -> mark("## ", "\n\n"),
          "p" -> mark("", "\n\n"),
          "ul" -> mark("", "\n"),
          "li" -> mark("- ", "\n"),
          "strong" -> mark("**", "**"),
          "em" -> mark("*", "*"),
          "a" -> ElementHandlers(element = el => {
            val href = el.attr("href")
            out.append("[")
            el.onEndTag(_ => out.append("](").append(href).append(")"))
          })),
          strict = false, produceOutput = false)
        it.map { id =>
          out.setLength(0)
          val idNum = id.toLong
          val html =
            s"""<html><body><h1>Title $id</h1>""" +
              s"""<p>intro with <strong>bold $id</strong> and <em>italic</em> words.</p>""" +
              s"""<h2>Items</h2><ul><li>alpha $id</li><li>beta ${idNum % 10}</li></ul>""" +
              s"""<p>see <a href="https://ex.org/d/$id">doc $id</a> end.</p></body></html>"""
          rw.rewriteToBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, out.toString)
        }
      }
      .toDF("doc_id", "markdown")
  }

  /** x20: JSON-LD structured-data extraction — the schema.org metadata
    * harvest every crawl pipeline runs. The attribute-valued selector
    * `script[type="application/ld+json"]` captures ONLY the typed
    * script's ScriptData text (the engine's text-mode states deliver
    * script bodies raw, so embedded quotes/braces survive verbatim);
    * a decoy untyped `<script>` on the same page must contribute
    * nothing. Emits the raw JSON string per document; the oracle
    * rebuilds it from the template. Match-only, no output produced.
    */
  def jsonLdExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"), col("lang"))
      .as[(String, String)]
      .mapPartitions { it =>
        val sb = new java.lang.StringBuilder
        val rw = new Rewriter(Seq(
          "script[type=\"application/ld+json\"]" -> ElementHandlers(
            text = tc => sb.append(tc.text))),
          strict = false, produceOutput = false)
        it.map { case (id, lang) =>
          sb.setLength(0)
          val html =
            s"""<html><head><script type="application/ld+json">""" +
              s"""{"@type":"Article","id":$id,"lang":"$lang","name":"doc $id"}""" +
              s"""</script><script>var decoy = $id; if (decoy < 0) {}</script>""" +
              s"""</head><body><p>page $id</p></body></html>"""
          rw.rewriteToBytes(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, sb.toString)
        }
      }
      .toDF("doc_id", "ldjson")
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
