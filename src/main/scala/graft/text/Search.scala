package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text search over a document table — the Spark-native equivalent of
  * the reference's tantivy-backed index (raphtory/src/search/mod.rs:623-731):
  * instead of a sidecar search engine, the index IS a table.
  *
  *  - `postings` — the tokenized inverted index as (term, doc_id, tf):
  *    one groupBy, hash-partitioned by term, so lookups of a query term
  *    are partition-pruned joins. Persist/bucket it by `term` for a
  *    standing index at scale.
  *  - `search` — disjunctive TF-IDF ranking: score(d) = Σ_{t ∈ query}
  *    tf(t,d) · ln((N+1)/(df_t+1)), top-k with deterministic doc-id
  *    tie-break. A broadcast of the (tiny) query-term IDF table keeps the
  *    scoring a single semi-join + aggregation over the postings.
  *
  * Tokenization is the same whitespace/lowercase rule the rest of the
  * text pipeline uses (TextOps), so every number is DuckDB-reproducible —
  * see the t_search oracle. */
object Search {

  /** Inverted index: (term, doc_id, tf). */
  def postings(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term: (term, df). */
  def docFrequencies(index: DataFrame): DataFrame =
    index.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Disjunctive TF-IDF top-k: (doc_id, score, n_terms_hit), score rounded
    * to 6 for cross-engine comparability. */
  def search(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val n = docs.count()
    val index = postings(docs, idCol, textCol)
    val terms = spark.createDataFrame(queryTerms.distinct.map(Tuple1(_))).toDF("term")
    val idf = docFrequencies(index.join(broadcast(terms), Seq("term"), "left_semi"))
      .withColumn("idf", log((lit(n) + 1.0) / (col("df") + 1.0)))
    index.join(broadcast(idf.select(col("term"), col("idf"))), Seq("term"))
      .groupBy(col(idCol))
      .agg(round(sum(col("tf") * col("idf")), 6).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
  }
}
