package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text analysis + multimodal plumbing (SURVEY §7.6):
  * language ID, quality scoring, token counting, fingerprinting, tf-idf,
  * distinct-count rollups, and binary-column feature plumbing. All text
  * math is integer counts + deterministic scalar division so the DuckDB
  * oracles match exactly (ln() rounded where unavoidable).
  */
object TextQueries {

  type QFn = (SparkSession, String) => DataFrame

  // -- x11: token counting ------------------------------------------------

  /** Whitespace tokens + a BPE-ish proxy (4 chars ≈ 1 token) — both are
    * pure column math pushed into codegen. */
  val x11TokenCount: QFn = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
        ceil(length(col("text")) / 4.0).cast("long").as("n_bpe_est"),
        length(col("text")).cast("long").as("n_chars_actual"))
      .orderBy(col("doc_id"))
  }
  val x11Sql =
    """SELECT doc_id,
      |  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est,
      |  CAST(length(text) AS BIGINT) AS n_chars_actual
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- x12: document fingerprint -----------------------------------------

  /** Canonical-form fingerprint: md5 of lowercased alphanumerics —
    * catches whitespace/punctuation-only variants that exact dedup (x1)
    * misses. */
  val x12DocFingerprint: QFn = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }
  val x12Sql =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- x9: language ID ----------------------------------------------------

  /** Stopword profiles per language (tiny n-gram-free heuristic — the
    * word-level analog of n-gram language ID). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "que"),
    "es" -> Seq("el", "los", "de", "y", "que", "en", "un", "una"),
  )

  private def langScore(words: Seq[String]): Column = {
    val set = words.map(w => s"'$w'").mkString("(", ", ", ")")
    expr(s"size(filter(toks, t -> t IN $set))")
  }

  /** x9 — language ID: argmax of stopword-profile hit counts, with a
    * fixed tiebreak order; 'und' (undetermined) when nothing matches. */
  val x9Langid: QFn = (s, d) => {
    val withScores = langProfiles.foldLeft(
      Tables.documents(s, d).withColumn("toks", split(col("text"), " "))) {
      case (df, (lang, words)) => df.withColumn(s"score_$lang", langScore(words))
    }
    // argmax with list-order tiebreak via chained CASE (en > de > fr > es)
    val langs = langProfiles.map(_._1)
    def isMax(lang: String): Column = langs.filter(_ != lang)
      .map { other =>
        val strict = langs.indexOf(other) < langs.indexOf(lang)
        if (strict) col(s"score_$lang") > col(s"score_$other")
        else col(s"score_$lang") >= col(s"score_$other")
      }.reduce(_ && _)
    val detect = langs.foldRight(lit("und")) { (lang, els) =>
      when(col(s"score_$lang") > 0 && isMax(lang), lit(lang)).otherwise(els)
    }
    withScores
      .select(col("doc_id") +:
        langs.map(l => col(s"score_$l").cast("long").as(s"score_$l")) :+
        detect.as("detected_lang"): _*)
      .orderBy(col("doc_id"))
  }
  val x9Sql = {
    val scoreExprs = langProfiles.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString("(", ", ", ")")
      s"CAST(length(list_filter(string_split(text, ' '), t -> t IN $set)) AS BIGINT) AS score_$lang"
    }.mkString(",\n  ")
    val langs = langProfiles.map(_._1)
    def isMax(lang: String): String = langs.filter(_ != lang).map { other =>
      if (langs.indexOf(other) < langs.indexOf(lang)) s"score_$lang > score_$other"
      else s"score_$lang >= score_$other"
    }.mkString(" AND ")
    val detect = langs.foldRight("'und'") { (lang, els) =>
      s"CASE WHEN score_$lang > 0 AND ${isMax(lang)} THEN '$lang' ELSE $els END"
    }
    s"""SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
       |  $detect AS detected_lang
       |FROM (SELECT doc_id, text,
       |  $scoreExprs
       |FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // -- x10: quality scoring -----------------------------------------------

  /** x10 — document quality heuristics: token stats + stopword ratio +
    * a deterministic combined score (all integer counts / exact
    * division, cf. quality filters in public web-corpus pipelines). */
  val x10QualityScore: QFn = (s, d) => {
    val stop = langProfiles.flatMap(_._2).distinct
    val set = stop.map(w => s"'$w'").mkString("(", ", ", ")")
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(toks, t -> t IN $set))").cast("long"))
      .withColumn("n_alpha",
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long"))
      .withColumn("mean_token_len",
        (col("n_alpha") / col("n_tokens").cast("double")))
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens").cast("double"))
      .withColumn("quality_score",
        col("stop_ratio") * 0.5 + least(col("mean_token_len") / 10.0, lit(1.0)) * 0.5)
      .select(col("doc_id"), col("n_tokens"), col("n_stop"), col("n_alpha"),
        col("mean_token_len"), col("stop_ratio"), col("quality_score"))
      .orderBy(col("doc_id"))
  }
  val x10Sql = {
    val stop = langProfiles.flatMap(_._2).distinct
    val set = stop.map(w => s"'$w'").mkString("(", ", ", ")")
    s"""SELECT doc_id, n_tokens, n_stop, n_alpha,
       |  n_alpha / CAST(n_tokens AS DOUBLE) AS mean_token_len,
       |  n_stop / CAST(n_tokens AS DOUBLE) AS stop_ratio,
       |  (n_stop / CAST(n_tokens AS DOUBLE)) * 0.5 +
       |    least((n_alpha / CAST(n_tokens AS DOUBLE)) / 10.0, 1.0) * 0.5 AS quality_score
       |FROM (SELECT doc_id,
       |  CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(length(list_filter(string_split(text, ' '), t -> t IN $set)) AS BIGINT) AS n_stop,
       |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha
       |FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // -- x4: tf-idf ---------------------------------------------------------

  /** x4 — tf-idf top-5 terms per document (bounded to doc_id < 100).
    * Ranking happens on ln() rounded to 6 decimals so both engines rank
    * identical values; term asc breaks ties deterministically. */
  val x4TextTfidf: QFn = (s, d) => {
    val docs = Tables.documents(s, d).where(col("doc_id") < 100)
    val nDocs = docs.count() // small, driver-side; oracle inlines the same
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }
  val x4Sql =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
      |n AS (SELECT COUNT(*) AS n_docs FROM docs),
      |tf AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs),
      |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
      |dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      |  FROM tfc JOIN dfc USING (term) CROSS JOIN n)
      |SELECT doc_id, rank, term, tf, df, tfidf FROM (
      |  SELECT doc_id, term, tf, df, tfidf,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tfidf DESC, term) AS rank
      |  FROM scored) WHERE rank <= 5
      |ORDER BY doc_id, rank""".stripMargin

  // -- x5: distinct rollup ------------------------------------------------

  /** x5 — distinct-count rollup per source (exact here so the oracle can
    * hash-match; the approx_count_distinct/HLL variant is asserted within
    * 5% error in ExtSpec since HLL implementations differ per engine). */
  val x5ApproxDistinct: QFn = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"))
      .agg(countDistinct(col("term")).as("n_distinct_terms"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("source"))
  }
  val x5Sql =
    """SELECT source, COUNT(DISTINCT term) AS n_distinct_terms,
      |  COUNT(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
      |      FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  // -- x13: multimodal plumbing ------------------------------------------

  /** x13 — multimodal column plumbing: payload as opaque binary + typed
    * metadata struct, batched featurization over partitions.
    *
    * The real decode (image/audio codecs) is STUBBED — this container has
    * no media libraries — with a deterministic byte-histogram "feature
    * extractor" standing in. The Spark-side shape is real: binary column,
    * metadata struct, partition-batched map, fixed-length feature vector
    * (the Scala analog of a pandas-batched UDF pipeline).
    *
    * Output is long format — one row per (doc, feature kind, index) with a
    * scalar `value` — so the result is pure scalars: `hist` = 16-bin byte
    * histogram ("feature-extract"), `coarse` = 4-bin rebin ("resize"),
    * `frame` = mean byte value per fixed 64-byte frame ("frame-sample").
    * Frame means are exact in IEEE doubles on both engines (integer-valued
    * partial sums < 2^53, then one division). */
  /** Every 5th doc carries a REAL 8×8 grayscale PNG payload (encoded via
    * the JDK's `javax.imageio` from a deterministic pixel formula over
    * the doc's bytes); the rest carry the raw utf8 bytes. */
  private val PngEvery = 5
  private val PngDim = 8
  // in-memory image streams: the default disk-backed ImageIO cache
  // would create+delete a temp file per document in the hot kernel
  private val imageIoNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)
  private[queries] def pngPixelsOf(textBytes: Array[Byte]): Array[Int] =
    Array.tabulate(PngDim * PngDim)(i => textBytes(i % textBytes.length) & 0xff)
  private[queries] def encodePng(pixels: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      PngDim, PngDim, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < pixels.length) {
      raster.setSample(i % PngDim, i / PngDim, 0, pixels(i)); i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private[queries] def decodePng(bytes: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val raster = img.getRaster
    Array.tabulate(img.getWidth * img.getHeight)(i =>
      raster.getSample(i % img.getWidth, i / img.getWidth, 0))
  }

  val x13MultimodalFeatures: QFn = (s, d) => {
    import s.implicits._
    // fixture prep: synthesize the binary payload column — a real PNG
    // for every 5th doc (pixel i = text byte i mod n), raw utf8 bytes
    // otherwise — with the typed media metadata a multimodal table
    // carries alongside its blobs
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, text, source) =>
          val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          // empty docs fall back to utf8 (no pixels to derive — and the
          // oracle's i % length(text) has the same degenerate case)
          val (payload, codec) =
            if (id % PngEvery == 0 && tb.nonEmpty)
              (encodePng(pngPixelsOf(tb)), "png")
            else (tb, "utf8")
          (id, payload, codec, payload.length.toLong, source)
        }
      }
      .toDF("doc_id", "payload", "codec", "payload_len", "origin")
      .select(col("doc_id"), col("payload"),
        struct(col("payload_len").as("n_bytes"), col("codec"),
          col("origin")).as("media_meta"))
    val featurized = withPayload
      .select(col("doc_id"), col("payload"), col("media_meta.codec"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, codec) =>
          // decode: PNG payloads go through the real javax.imageio
          // reader to pixel samples; other codecs fall back to the raw
          // byte stream (the container has no JPEG/audio codecs — PNG is
          // the one the JDK decodes natively)
          val stream: Array[Int] = codec match {
            case "png" => decodePng(bytes)
            case _ => bytes.map(_ & 0xff)
          }
          val n = stream.length.toLong
          // "feature-extract": 16-bin value histogram over decoded stream
          val hist = new Array[Long](16)
          stream.foreach(v => hist(v >> 4) += 1)
          // "resize": rebin 16 -> 4 coarse bins
          val coarse = Array.tabulate(4)(i =>
            hist(4 * i) + hist(4 * i + 1) + hist(4 * i + 2) + hist(4 * i + 3))
          // "frame-sample": fixed-stride 64-value frames, mean per frame
          val frameMeans = stream.grouped(64).map { f =>
            f.map(_.toDouble).sum / f.length
          }.toArray
          hist.iterator.zipWithIndex.map { case (v, i) =>
            (id, codec, n, "hist", i.toLong, v.toDouble) } ++
            coarse.iterator.zipWithIndex.map { case (v, i) =>
              (id, codec, n, "coarse", i.toLong, v.toDouble) } ++
            frameMeans.iterator.zipWithIndex.map { case (m, i) =>
              (id, codec, n, "frame", i.toLong, m) }
        }
      }
      .toDF("doc_id", "codec", "n_bytes", "kind", "idx", "value")
    featurized.orderBy(col("doc_id"), col("kind"), col("idx"))
  }

  /** DuckDB oracle for x13: text is ASCII in this corpus, so per-character
    * `ord(substr(...))` equals the UTF-8 byte Spark sees. For PNG docs the
    * oracle re-derives the pixel stream from the generating formula
    * (byte i mod n) — Spark's path goes text → PNG encode → imageio
    * decode → pixels, so an encode/decode defect breaks the hash match. */
  val x13Sql =
    s"""WITH base AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % $PngEvery = 0 AND length(text) > 0
      |         THEN 'png' ELSE 'utf8' END AS codec,
      |    CAST(CASE WHEN doc_id % $PngEvery = 0 AND length(text) > 0
      |         THEN ${PngDim * PngDim}
      |         ELSE length(text) END AS BIGINT) AS n_bytes
      |  FROM documents
      |), bv AS (
      |  SELECT doc_id, i,
      |    CASE WHEN codec = 'png'
      |      THEN ord(substr(text, CAST(i % length(text) + 1 AS INTEGER), 1))
      |      ELSE ord(substr(text, CAST(i + 1 AS INTEGER), 1)) END AS b
      |  FROM (SELECT doc_id, text, codec,
      |          unnest(generate_series(0, n_bytes - 1)) AS i
      |        FROM base)
      |), hist AS (
      |  SELECT doc_id, b // 16 AS idx, COUNT(*) AS cnt FROM bv GROUP BY 1, 2
      |), hist_full AS (
      |  SELECT d.doc_id, d.codec, d.n_bytes, bins.idx, COALESCE(h.cnt, 0) AS cnt
      |  FROM base d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS idx) bins
      |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.idx = bins.idx
      |), coarse AS (
      |  SELECT doc_id, codec, n_bytes, idx // 4 AS idx, SUM(cnt) AS cnt
      |  FROM hist_full GROUP BY 1, 2, 3, 4
      |), frames AS (
      |  SELECT doc_id, i // 64 AS idx,
      |         CAST(SUM(b) AS DOUBLE) / COUNT(*) AS v
      |  FROM bv GROUP BY 1, 2
      |)
      |SELECT doc_id, codec, n_bytes, 'hist' AS kind,
      |       CAST(idx AS BIGINT) AS idx, CAST(cnt AS DOUBLE) AS value
      |FROM hist_full
      |UNION ALL
      |SELECT doc_id, codec, n_bytes, 'coarse', CAST(idx AS BIGINT),
      |       CAST(cnt AS DOUBLE)
      |FROM coarse
      |UNION ALL
      |SELECT f.doc_id, d.codec, d.n_bytes, 'frame', CAST(f.idx AS BIGINT), f.v
      |FROM frames f JOIN base d USING (doc_id)
      |ORDER BY doc_id, kind, idx""".stripMargin

  // -- x17: stratified sampling ------------------------------------------

  /** x17 — deterministic stratified sample: k docs per source stratum,
    * ranked by an md5-derived pseudo-random key (seeded, reproducible —
    * the property corpus-curation sampling needs for auditability).
    * One window per stratum; at scale this is a single shuffle by
    * (source) with per-partition top-k — no global sort. */
  val SamplePerStratum = 20
  val x17StratifiedSample: QFn = (s, d) => {
    val key = expr(PortableHash.hex60("concat('x17:', CAST(doc_id AS STRING))"))
    val w = Window.partitionBy(col("source")).orderBy(key.asc, col("doc_id"))
    Tables.documents(s, d)
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= SamplePerStratum)
      .select(col("source"), col("sample_rank").cast("long").as("sample_rank"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("sample_rank"))
  }
  val x17Sql =
    s"""SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id, n_chars
       |FROM (
       |  SELECT source, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ${PortableHash.duckHex60("'x17:' || CAST(doc_id AS VARCHAR)")},
       |               doc_id) AS sample_rank
       |  FROM documents)
       |WHERE sample_rank <= $SamplePerStratum
       |ORDER BY source, sample_rank""".stripMargin

  // -- x18: exact quantile thresholds ------------------------------------

  /** x18 — per-source document-length quantiles (the thresholds quality
    * filters cut on). Exact discrete quantiles via rank arithmetic
    * (value at row ceil(q·n)) so both engines pick identical elements —
    * no interpolation, no sketch nondeterminism. The approx path at
    * scale is percentile_approx/t-digest; this is its auditable exact
    * counterpart. */
  val QuantilePoints = Seq(0.25, 0.5, 0.75, 0.95)
  val x18LengthQuantiles: QFn = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val ranked = Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
    val qs = QuantilePoints.toDF("q")
    ranked.join(broadcast(qs),
        col("rn") === greatest(lit(1), ceil(col("q") * col("n"))))
      .select(col("source"), col("q"), col("n_chars").as("threshold"),
        col("n").cast("long").as("n_docs"))
      .orderBy(col("source"), col("q"))
  }
  val x18Sql = {
    val qVals = QuantilePoints.map(q => s"($q)")
      .mkString("(VALUES ", ", ", ")")
    s"""SELECT source, q, n_chars AS threshold, CAST(n AS BIGINT) AS n_docs
       |FROM (
       |  SELECT source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM documents) r
       |JOIN (SELECT CAST(q AS DOUBLE) AS q FROM $qVals AS v(q)) qs
       |  ON r.rn = greatest(1, CAST(ceil(qs.q * r.n) AS BIGINT))
       |ORDER BY source, q""".stripMargin
  }

  // -- x21: repetition scoring (Gopher-style quality rule) ---------------

  /** x21 — repeated-n-gram quality rule (the Gopher/RefinedWeb "fraction
    * of text in the most common n-gram" filter): per doc, the MULTISET
    * bigram counts (duplicates kept, unlike the dedup shingle sets),
    * reduced to max-count / total. Two shuffles — (doc, gram) count with
    * map-side combine, then per-doc max/sum — both on keys that scale
    * with the corpus, never all-pairs. Exact-integer fraction inputs;
    * the division is one IEEE op, identical in both engines. */
  val RepetitionFlag = 0.05
  val x21Repetition: QFn = (s, d) => {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(expr("sequence(0, size(w) - 2)")).as("i"),
        col("w"))
      .select(col("doc_id"),
        expr(PortableHash.hex60("concat(w[i], '_', w[i+1])")).as("gram"))
    grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("max_rep"), sum(col("cnt")).as("n_bigrams"))
      .withColumn("rep_fraction",
        col("max_rep").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("repetitive", col("rep_fraction") > RepetitionFlag)
      .select(col("doc_id"), col("n_bigrams"), col("max_rep"),
        col("rep_fraction"), col("repetitive"))
      .orderBy(col("doc_id"))
  }
  val x21Sql =
    s"""WITH grams AS (
       |  SELECT doc_id,
       |    ${PortableHash.duckHex60("string_split(text, ' ')[i] || '_' || string_split(text, ' ')[i+1]")} AS gram
       |  FROM (SELECT doc_id, text,
       |          unnest(range(1, length(string_split(text, ' ')))) AS i
       |        FROM documents WHERE length(string_split(text, ' ')) >= 2)),
       |counts AS (
       |  SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       |  CAST(MAX(cnt) AS BIGINT) AS max_rep,
       |  CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS rep_fraction,
       |  CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) > $RepetitionFlag AS repetitive
       |FROM counts GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // -- x25: sequence packing (concat-then-chunk) -------------------------

  /** x25 — GPT-style sequence packing: per source, the document stream
    * is concatenated in doc_id order and split into fixed
    * `PackWindow`-token windows; emit each doc's start window and offset
    * (docs straddle boundaries, exactly like production packing). Pure
    * running-sum window math — one shuffle by source, no data movement
    * of the text itself; at 100 TB the cumulative sums come from the
    * same per-partition prefix-sum shape. */
  val PackWindow = 2048
  val x25PackSequences: QFn = (s, d) => {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .withColumn("cum_start", col("cum_end") - col("n_tokens"))
      // integer DIV, not double /: token prefix sums at corpus scale
      // overflow double's 2^53 integer range
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr(s"cum_start DIV $PackWindow").as("window_id"),
        pmod(col("cum_start"), lit(PackWindow.toLong)).as("offset"),
        expr(s"(cum_end - 1) DIV $PackWindow").as("end_window_id"))
      .orderBy(col("source"), col("doc_id"))
  }
  val x25Sql =
    s"""SELECT source, doc_id, n_tokens,
       |  cum_start // $PackWindow AS window_id,
       |  cum_start % $PackWindow AS "offset",
       |  (cum_start + n_tokens - 1) // $PackWindow AS end_window_id
       |FROM (
       |  SELECT source, doc_id,
       |    CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    SUM(CAST(length(string_split(text, ' ')) AS BIGINT))
       |      OVER (PARTITION BY source ORDER BY doc_id
       |            ROWS UNBOUNDED PRECEDING)
       |      - CAST(length(string_split(text, ' ')) AS BIGINT) AS cum_start
       |  FROM documents)
       |ORDER BY source, doc_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "x25_pack_sequences" -> x25PackSequences,
    "x21_repetition" -> x21Repetition,
    "x11_token_count" -> x11TokenCount,
    "x17_stratified_sample" -> x17StratifiedSample,
    "x18_length_quantiles" -> x18LengthQuantiles,
    "x12_doc_fingerprint" -> x12DocFingerprint,
    "x9_langid" -> x9Langid,
    "x10_quality_score" -> x10QualityScore,
    "x4_text_tfidf" -> x4TextTfidf,
    "x5_approx_distinct" -> x5ApproxDistinct,
    "x13_multimodal_features" -> x13MultimodalFeatures,
  )

  val oracleSql: Map[String, String] = Map(
    "x25_pack_sequences" -> x25Sql,
    "x21_repetition" -> x21Sql,
    "x11_token_count" -> x11Sql,
    "x17_stratified_sample" -> x17Sql,
    "x18_length_quantiles" -> x18Sql,
    "x12_doc_fingerprint" -> x12Sql,
    "x9_langid" -> x9Sql,
    "x10_quality_score" -> x10Sql,
    "x4_text_tfidf" -> x4Sql,
    "x5_approx_distinct" -> x5Sql,
    "x13_multimodal_features" -> x13Sql,
  )
}
