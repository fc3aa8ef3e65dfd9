package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a large-scale training-data pipeline: token counting,
  * quality scoring, language identification, fingerprinting. All pure
  * Catalyst column programs (codegen'd, no UDFs); every operator has a
  * DuckDB-expressible definition so the driver's oracle can replay it. */
object TextOps {

  /** Whitespace token count (0 for blank text). Empty fragments are
    * filtered AFTER the split: Spark's trim() strips only spaces, so
    * leading/trailing tabs/newlines leave empty split fragments that a
    * bare size() would count as tokens. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= "")).cast("long")

  /** (n_chars, punct_ratio, upper_ratio, digit_ratio) quality columns. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("long")
    def ratio(pattern: String): Column =
      round((nChars - length(regexp_replace(text, pattern, "")).cast("long")) /
        greatest(nChars, lit(1L)), 6)
    Seq(
      "n_chars" -> nChars,
      "punct_ratio" -> ratio("[.,;:!?'\"()-]"),
      "upper_ratio" -> ratio("[A-Z]"),
      "digit_ratio" -> ratio("[0-9]"))
  }

  /** Marker-word counts for one language: occurrences of ` word ` in the
    * padded text via literal replace (regex-free: byte-identical between
    * engines). The padding doubles every space first — adjacent
    * occurrences ("the the the") would otherwise share boundary spaces
    * and a non-overlapping replace would undercount them. */
  private def markerHits(padded: Column, words: Seq[String]): Column =
    words.map { w =>
      val m = s" $w "
      ((length(padded) - length(expr(s"replace(${paddedName}, ' $w ', '')"))) / m.length).cast("long")
    }.reduce(_ + _)

  private val paddedName = "__padded"

  /** n-gram-heuristic language id: en/de/fr stopword hit counts + argmax.
    * Adds (en_hits, de_hits, fr_hits, lang_guess). */
  def withLangGuess(df: DataFrame, textCol: String = "text"): DataFrame = {
    val padded = df.withColumn(paddedName,
      concat(lit(" "), replace(lower(col(textCol)), lit(" "), lit("  ")), lit(" ")))
    padded
      .withColumn("en_hits", markerHits(col(paddedName), Seq("the", "and", "of")))
      .withColumn("de_hits", markerHits(col(paddedName), Seq("der", "und", "die")))
      .withColumn("fr_hits", markerHits(col(paddedName), Seq("le", "la", "et")))
      .withColumn("lang_guess",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("fr_hits"), "de")
          .otherwise("fr"))
      .drop(paddedName)
  }

  /** Whitespace-normalised md5 document fingerprint. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** Portable 32-bit hash: first 8 hex digits of md5, as a Long — the
    * shared hash between Spark and the DuckDB oracle
    * (('0x' || substr(md5(x),1,8))::BIGINT on the DuckDB side). */
  def md5u32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Composed curation pipeline — the shape a training-data run actually
    * executes at 100 TB: quality gate (min length, max digit ratio) →
    * language filter → exact near-duplicate collapse on the whitespace-
    * normalised fingerprint (keep the smallest doc id per group) → token
    * count for every survivor. ONE scan + ONE hash aggregate: the
    * survivor's columns fold into the fingerprint groupBy as min(struct)
    * (doc ids are unique, so lexicographic struct-min IS arg-min by id),
    * no join-back; filters run before the shuffle, partial aggregation
    * map-side, shuffle keyed on the fingerprint (uniform — md5).
    * Returns (idCol, fp, n_dups, n_chars, n_tokens) per kept document. */
  def curate(docs: DataFrame, minChars: Long, maxDigitRatio: Double,
             langs: Seq[String], idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val quality = qualityColumns(col(textCol)).toMap
    val enriched = withLangGuess(docs, textCol)
      .withColumn("n_chars", quality("n_chars"))
      .withColumn("digit_ratio", quality("digit_ratio"))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))
    enriched
      .filter(col("n_chars") >= minChars && col("digit_ratio") <= maxDigitRatio &&
        col("lang_guess").isin(langs: _*))
      .groupBy(col("fp"))
      .agg(min(struct(col(idCol), col("n_chars"), col("n_tokens"))).as("keep"),
        count(lit(1)).as("n_dups"))
      .select(col(s"keep.$idCol").as(idCol), col("fp"), col("n_dups"),
        col("keep.n_chars").as("n_chars"), col("keep.n_tokens").as("n_tokens"))
  }

  /** Distinct character n-gram shingles: (id, shingle). Texts shorter than
    * n yield one (possibly short) shingle — the greatest(..., 1) lower
    * bound keeps Spark's `sequence` ascending AND matches DuckDB's
    * generate_series in the oracle. */
  def charShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
        explode(expr(
          s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> substring($textCol, i, $n))"))
          .as("shingle"))
      .distinct()
}
