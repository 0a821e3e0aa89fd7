package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators (north star §2.3) over `documents`:
  * language ID, quality scoring, token counting and document
  * fingerprinting — all pure column expressions with DuckDB oracles.
  *
  * Scale design: each query is explode -> partial-agg -> join shapes on
  * high-cardinality keys (token / shingle / fingerprint). The lang-ID
  * model table (|langs| x |vocab|) is broadcast-sized by construction,
  * so scoring a 100 TB corpus is a broadcast join + one groupBy.
  */
object TextAnalysis {

  /** Combining-mark sample for t17, written as escapes so no editor or
    * tool can silently normalize the source file: "e"+COMBINING ACUTE
    * and "a"+COMBINING RING compose under NFC; "k"+COMBINING SHORT
    * STROKE OVERLAY has no precomposed form and stays decomposed.
    */
  private val TR_ITERS = 4
  private val DecomposedSuffix = " e\u0301 a\u030A k\u0337"


  /** Fixed query-term set for the retrieval queries (t09, s07). */
  private[operators] val bm25Terms = Seq("join", "scan", "merge")

  /** BM25 per-doc scores for `terms` (k1=1.2, b=0.75): inverted-index
    * postings restricted to the query terms, df + corpus stats ride
    * broadcast joins, per-doc total is the token-sorted sequential fold.
    * Shared by t09 (ranked list) and s07 (fusion arm).
    */
  private[operators] def bm25PerDoc(s: org.apache.spark.sql.SparkSession,
      d: String, terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val t = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = t.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sumdl"))
    val inv = t.select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
    val dfreq = inv.groupBy("token").agg(count(lit(1)).as("df"))
    inv.join(broadcast(dfreq), "token").crossJoin(broadcast(stats))
      .withColumn("sc", expr(
        """ln((CAST(nd AS DOUBLE) - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
           * (tf * CAST(2.2 AS DOUBLE))
           / (tf + CAST(1.2 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
              + CAST(0.75 AS DOUBLE) * dl / (CAST(sumdl AS DOUBLE) / nd)))"""))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        expr("""aggregate(transform(sort_array(collect_list(struct(token, sc))), x -> x.sc),
                CAST(0 AS DOUBLE), (acc, x) -> acc + x)""").as("raw"))
      .select(col("doc_id"), col("n_terms"), round(col("raw"), 6).as("bm25"))
  }

  /** DuckDB CTE chain mirroring [[bm25PerDoc]], ending in
    * `per_doc(doc_id, n_terms, bm25)`.
    */
  private[operators] def bm25OracleCtes(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
          FROM documents),
        stats AS (SELECT count(*) AS nd, sum(dl) AS sumdl FROM t),
        inv AS (
          SELECT doc_id, dl, token, count(*) AS tf FROM (
            SELECT doc_id, dl, unnest(toks) AS token FROM t)
          WHERE token IN ($inList)
          GROUP BY doc_id, dl, token),
        dfreq AS (SELECT token, count(*) AS df FROM inv GROUP BY token),
        scored AS (
          SELECT doc_id, token,
                 ln((CAST(nd AS DOUBLE) - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
                 * (tf * CAST(2.2 AS DOUBLE))
                 / (tf + CAST(1.2 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                    + CAST(0.75 AS DOUBLE) * dl / (CAST(sumdl AS DOUBLE) / nd))) AS sc
          FROM inv JOIN dfreq USING (token) CROSS JOIN stats),
        per_doc AS (
          SELECT doc_id, count(*) AS n_terms,
                 round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(sc ORDER BY token)),
                       (acc, x) -> acc + x), 6) AS bm25
          FROM scored GROUP BY doc_id)"""
  }

  def defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Language ID: corpus-trained token naive Bayes. Token affinities
    // aff(t, l) = ln((tf(t,l) + 1) / (tokens(l) + |V|)) are quantized to
    // DECIMAL(18,6) so per-doc score sums are exact (order-independent
    // across engines AND executor counts); argmax with lang tie-break.
    //
    // Scale shape: the model is built from OBSERVED (lang, token) counts
    // only — never a materialized |langs| x |vocab| cross join (a
    // scale-killer at real vocabularies). Every token a language never
    // saw contributes the same smoothing affinity miss(l) =
    // ln(1 / (tokens(l) + |V|)), so the unseen mass is added
    // analytically per (doc, lang): score = sum_present(aff) +
    // (n_tok - n_present) * miss. Only the |L|-row miss table is
    // broadcast; doc-token counts join the observed model on token (an
    // equi-join AQE can broadcast when the model is small). Because each
    // token still contributes exactly its quantized decimal affinity,
    // scores — and the argmax — are bit-identical to the dense model.
    QueryDef("t01_lang_id",
      (s, d) => langIdPredict(s, d).orderBy("doc_id"),
      Some(s"""
        WITH $langIdOracleCtes
        SELECT doc_id, true_lang, pred_lang, correct
        FROM pred
        ORDER BY doc_id""")),

    

    // -------------------------------------------------------------------
    // Quality scoring: lexical diversity, stopword ratio, length
    // saturation -> composite score. Single narrow projection; every
    // ratio is ints-then-one-division, so cross-engine exact.
    QueryDef("t02_quality_score",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          expr("round(CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks), 6)").as("type_token_ratio"),
          expr("round(CAST(size(filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / size(toks), 6)").as("stopword_ratio"),
          expr("round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(toks), 6)").as("avg_token_len"))
        // the weighted combination runs in EXACT decimals: the rounded
        // ratio terms times 0.4/0.3 land on exact 7th-decimal halves,
        // where double arithmetic sits a hair below the half and the two
        // engines' round() split (found by the sf0.1 sweep: 0.740938 vs
        // 0.740939). Decimal sums make the half exact and HALF_UP agree;
        // the length term avoids division entirely (n/50 == least(50,n)
        // * 0.02, exact at scale 2).
        .withColumn("quality", expr(
          """CAST(round(CAST(0.4 AS DECIMAL(2,1)) * CAST(type_token_ratio AS DECIMAL(8,6))
             + CAST(0.3 AS DECIMAL(2,1)) * (CAST(1 AS DECIMAL(2,0)) - CAST(stopword_ratio AS DECIMAL(8,6)))
             + CAST(0.3 AS DECIMAL(2,1)) * (CAST(least(50, n_tokens) AS DECIMAL(4,0)) * CAST(0.02 AS DECIMAL(3,2))), 6) AS DOUBLE)"""))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS type_token_ratio,
               round(CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks), 6) AS avg_token_len,
               CAST(round(CAST(0.4 AS DECIMAL(2,1)) * CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS DECIMAL(8,6))
                   + CAST(0.3 AS DECIMAL(2,1)) * (CAST(1 AS DECIMAL(2,0)) - CAST(round(CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / len(toks), 6) AS DECIMAL(8,6)))
                   + CAST(0.3 AS DECIMAL(2,1)) * (CAST(least(50, len(toks)) AS DECIMAL(4,0)) * CAST(0.02 AS DECIMAL(3,2))), 6) AS DOUBLE) AS quality
        FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Token counting: whitespace split vs a BPE-ish regex lexer
    // ([a-z]+ | digit runs | single punct). regexp_extract_all is
    // codegen'd in Spark; the patterns avoid engine-specific syntax.
    QueryDef("t03_token_stats",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_re_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct_tokens"),
          length(replace(col("text"), lit(" "), lit(""))).cast("long").as("n_chars_nospace"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_re_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace
        FROM documents
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Document fingerprinting: order-sensitive polynomial rolling hash
    // over the token sequence (mod 1e9+7; token hashes are 60-bit so the
    // fold never overflows int64). n_same counts colliding documents —
    // the dedup-by-fingerprint signal.
    QueryDef("t04_fingerprint",
      (s, d) => {
        val fp = Tables.documents(s, d)
          .select(col("doc_id"),
            expr(s"aggregate(transform(split(text, ' '), t -> ${Ns.hash60("t")}), CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)").as("fingerprint"))
        fp.withColumn("n_same", count(lit(1)).over(Window.partitionBy("fingerprint")))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH fp AS (
          SELECT doc_id,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ' '), t -> ${Ns.oHash60("t")})),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
          FROM documents)
        SELECT doc_id, fingerprint,
               count(*) OVER (PARTITION BY fingerprint) AS n_same
        FROM fp
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // TF-IDF: top term per document. tf = in-doc count; idf =
    // ln(N / df) quantized to DECIMAL(18,6); score = tf * idf (exact
    // decimal product => ranking is engine- and partitioning-exact).
    // At scale: df/idf is a broadcast-sized vocabulary table.
    QueryDef("t05_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df_ = tok.select(col("doc_id"), col("token")).distinct()
          .groupBy(col("token").as("t2")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val idf = df_.crossJoin(broadcast(nDocs))
          .select(col("t2"),
            expr("CAST(round(ln(CAST(n_docs AS DOUBLE) / df), 6) AS DECIMAL(18,6))").as("idf"))
        val scored = tf.join(broadcast(idf), col("token") === col("t2"))
          .select(col("doc_id"), col("token"),
            (col("tf").cast("decimal(18,6)") * col("idf")).as("score"))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("doc_id"), col("token").as("top_term"),
            col("score").cast("double").as("tfidf"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token AS t2, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        idf AS (
          SELECT t2, CAST(round(ln(CAST(n_docs AS DOUBLE) / df), 6) AS DECIMAL(18,6)) AS idf
          FROM df CROSS JOIN nd),
        scored AS (
          SELECT doc_id, token, CAST(tf AS DECIMAL(18,6)) * idf AS score
          FROM tf JOIN idf ON token = t2),
        best AS (
          SELECT doc_id, token, score,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
          FROM scored)
        SELECT doc_id, token AS top_term, CAST(score AS DOUBLE) AS tfidf
        FROM best WHERE rn = 1
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Text normalization: the canonical pre-dedup cleaning pass —
    // lowercase, strip non-alphanumerics, collapse whitespace, trim —
    // with a content hash of the normalized form (the key exact dedup
    // would group on downstream). Narrow projection, no shuffle.
    QueryDef("t06_normalize",
      (s, d) => Tables.documents(s, d)
        .withColumn("norm",
          trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
        .select(col("doc_id"),
          length(col("norm")).cast("long").as("norm_len"),
          sha2(col("norm"), 256).as("norm_hash"),
          size(split(col("norm"), " ")).cast("long").as("norm_tokens"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(length(norm) AS BIGINT) AS norm_len,
               sha256(norm) AS norm_hash,
               CAST(len(string_split(norm, ' ')) AS BIGINT) AS norm_tokens
        FROM (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM documents)
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // PII redaction: regex-scrub emails and phone numbers, reporting
    // match counts and a hash of the redacted text. The synthetic corpus
    // contains no PII (no digits at all), so the query PLANTS
    // deterministic doc_id-derived PII first — exercising exactly the
    // operator a real pipeline runs, with an oracle on the full redacted
    // output. Narrow projection, no shuffle; regexes are RE2/Java-common
    // syntax so both engines match identically.
    QueryDef("t07_pii_redact",
      (s, d) => {
        val email = "[a-z0-9]+@[a-z]+\\.[a-z]+"
        val phone = "\\+1-555-[0-9]{4}"
        Tables.documents(s, d)
          .withColumn("aug", concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com or call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .select(col("doc_id"),
            regexp_count(col("aug"), lit(email)).cast("long").as("n_emails"),
            regexp_count(col("aug"), lit(phone)).cast("long").as("n_phones"),
            sha2(regexp_replace(regexp_replace(col("aug"), email, "<EMAIL>"),
              phone, "<PHONE>"), 256).as("redacted_hash"))
          .orderBy("doc_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                 '@example.com or call +1-555-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
               sha256(regexp_replace(regexp_replace(aug, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                 '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_hash
        FROM a
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Repetition quality signals (the Gopher-rules family): per-doc
    // fraction of duplicated word 2-grams / 3-grams and the share of the
    // single most frequent token. Everything is per-row array arithmetic
    // — NO shuffle, no explode, no join: at 100 TB this is a pure
    // map-side projection that codegen fuses with the scan. Each
    // fraction is one double division of exact integer counts, so the
    // values are identical on any partitioning and in DuckDB.
    QueryDef("t08_repetition",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n", size(col("toks")))
        .withColumn("bg", expr(
          "transform(sequence(0, n - 2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
        .withColumn("tg", expr(
          "transform(sequence(0, n - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .select(col("doc_id"),
          col("n").cast("long").as("n_tokens"),
          round(expr("CAST(size(bg) - size(array_distinct(bg)) AS DOUBLE) / size(bg)"), 6)
            .as("dup_bigram_frac"),
          round(expr("CAST(size(tg) - size(array_distinct(tg)) AS DOUBLE) / size(tg)"), 6)
            .as("dup_trigram_frac"),
          round(expr(
            """CAST(array_max(transform(array_distinct(toks),
              t -> size(filter(toks, x -> x = t)))) AS DOUBLE) / n"""), 6)
            .as("top_token_frac"))
        .orderBy("doc_id"),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents),
        g AS (
          SELECT doc_id, toks, n,
                 list_transform(generate_series(1, n - 1),
                   i -> concat_ws(' ', toks[i], toks[i+1])) AS bg,
                 list_transform(generate_series(1, n - 2),
                   i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS tg
          FROM t)
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               round(CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg), 6) AS dup_bigram_frac,
               round(CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg), 6) AS dup_trigram_frac,
               round(CAST(list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / n, 6) AS top_token_frac
        FROM g
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // BM25 retrieval (k1=1.2, b=0.75): the inverted-index scoring shape.
    // The index is explode->filter-to-query-terms->groupBy (partial-agg
    // term frequencies; at 100 TB only postings for the query terms
    // shuffle, never the corpus). df and the corpus stats are broadcast
    // single/tiny rows. Per-doc score = sequential fold over the
    // per-term scores sorted by term, so the float sum order is fixed
    // across engines and partitionings; every other term is one
    // arithmetic expression over exact integer tf/df/dl counts.
    QueryDef("t09_bm25",
      (s, d) => {
        val perDoc = bm25PerDoc(s, d, bm25Terms)
        // top-k via TakeOrderedAndProject (distributed partial top-k per
        // partition, merged on the driver); the rank window then runs on
        // 20 rows only.
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))
        perDoc.orderBy(col("bm25").desc, col("doc_id")).limit(20)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(col("rank"), col("doc_id"), col("n_terms"), col("bm25"))
          .orderBy("rank")
      },
      Some(s"""
        WITH ${bm25OracleCtes(bm25Terms)}
        SELECT CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank,
               doc_id, n_terms, bm25
        FROM per_doc
        ORDER BY bm25 DESC, doc_id
        LIMIT 20""")),

    // -------------------------------------------------------------------
    // PMI collocation mining: which adjacent word pairs co-occur more
    // than chance — the phrase-detection primitive of corpus analysis
    // (word2vec-style phrase merging). All inputs to the PMI are exact
    // integer counts (bigram count, unigram counts, corpus totals), so
    // the score is ONE double expression written identically in both
    // engines; counts partial-aggregate before the shuffle, and the
    // unigram side is broadcast-joined onto the bigram counts.
    QueryDef("t10_collocations",
      (s, d) => {
        val t = Tables.documents(s, d).withColumn("toks", split(col("text"), " "))
        val uni = t.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cu"))
        val tu = uni.agg(sum(col("cu")).as("tu"))
        val bg = t.select(explode(expr(
            "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
          .select(col("b.w1"), col("b.w2"))
        val tb = bg.agg(count(lit(1)).as("tb"))
        val pairs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
          .filter(col("n_xy") >= 5)
          .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("cx"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("cy"))), "w2")
          .crossJoin(broadcast(tu)).crossJoin(broadcast(tb))
          .select(col("w1"), col("w2"), col("n_xy"),
            round(expr("ln(CAST(n_xy AS DOUBLE) * tu * tu / tb / cx / cy)"), 6).as("pmi"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
        pairs.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(col("rank"), col("w1"), col("w2"), col("n_xy"), col("pmi"))
          .orderBy("rank")
      },
      Some("""
        WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        uni AS (SELECT w, count(*) AS cu FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
        tot AS (SELECT CAST(sum(cu) AS BIGINT) AS tu FROM uni),
        bg AS (
          SELECT b.w1, b.w2 FROM (
            SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
            FROM t)),
        btot AS (SELECT count(*) AS tb FROM bg),
        pairs AS (
          SELECT w1, w2, count(*) AS n_xy FROM bg GROUP BY w1, w2 HAVING count(*) >= 5),
        pmi AS (
          SELECT w1, w2, n_xy,
                 round(ln(CAST(n_xy AS DOUBLE) * tu * tu / tb / x.cu / y.cu), 6) AS pmi
          FROM pairs
          JOIN uni x ON pairs.w1 = x.w
          JOIN uni y ON pairs.w2 = y.w
          CROSS JOIN tot CROSS JOIN btot)
        SELECT CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank,
               w1, w2, n_xy, pmi
        FROM pmi
        ORDER BY pmi DESC, w1, w2
        LIMIT 20""")),

    // -------------------------------------------------------------------
    // RAG chunking: fixed-size character windows (200 chars, 50
    // overlap, stride 150) per document — the retrieval-prep shape.
    // Chunk boundaries are pure integer arithmetic on n_chars (floor
    // division spelled div/// on both sides), the explode is the only
    // row-multiplying step, and each chunk leaves as an md5 content
    // address. Narrow + one explode: at 100 TB this is a map-only
    // stage feeding the embedding pipeline.
    QueryDef("t11_chunking",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, CAST((n_chars - 1) div 150 AS INT))")).as("k"))
        .select(col("doc_id"), col("k").cast("int").as("chunk_idx"),
          expr("length(substring(text, k * 150 + 1, 200))").cast("long").as("chunk_len"),
          md5(expr("substring(text, k * 150 + 1, 200)")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""
        SELECT doc_id, CAST(k AS INT) AS chunk_idx,
               CAST(length(substr(text, k * 150 + 1, 200)) AS BIGINT) AS chunk_len,
               md5(substr(text, k * 150 + 1, 200)) AS chunk_hash
        FROM (SELECT doc_id, text, unnest(generate_series(0, (n_chars - 1) // 150)) AS k
              FROM documents)
        ORDER BY doc_id, chunk_idx""")),

    // -------------------------------------------------------------------
    // Unigram-LM pseudo-perplexity (the CCNet-style LM quality filter,
    // with the corpus itself as the model): lp(token) = ln(count/total)
    // over exact integer counts; the per-doc log-likelihood is a
    // sequential fold over the contributions in TOKEN ORDER (the d06/
    // g01 recipe), so the float sum is identical on any partitioning
    // and in DuckDB. The model side (31-word vocab here; bounded by
    // |V| generally) broadcasts.
    QueryDef("t12_lm_perplexity",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("token"))
        val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
        val total = counts.agg(sum(col("c")).as("t"))
        val scored = toks.join(broadcast(counts), "token")
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("pos"),
            expr("ln(CAST(c AS DOUBLE) / t)").as("lp"))
        scored.groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            expr("""aggregate(transform(sort_array(collect_list(struct(pos, lp))), x -> x.lp),
                    CAST(0 AS DOUBLE), (acc, x) -> acc + x)""").as("ll"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("ll"), 6).as("log_likelihood"),
            round(expr("exp(-(ll) / n_tokens)"), 6).as("pseudo_ppl"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, s.pos AS pos, s.token AS token FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks)),
                     i -> struct_pack(pos := i - 1, token := toks[i]))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))),
        counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        total AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
        scored AS (
          SELECT doc_id, pos, ln(CAST(c AS DOUBLE) / t) AS lp
          FROM toks JOIN counts USING (token) CROSS JOIN total),
        per_doc AS (
          SELECT doc_id, count(*) AS n_tokens,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lp ORDER BY pos)),
                             (acc, x) -> acc + x) AS ll
          FROM scored GROUP BY doc_id)
        SELECT doc_id, n_tokens,
               round(ll, 6) AS log_likelihood,
               round(exp(-(ll) / n_tokens), 6) AS pseudo_ppl
        FROM per_doc
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Heavy hitters with a count-min sketch witness. The CMS (depth 4 x
    // width 64) is built DISTRIBUTIVELY: token counts partial-aggregate,
    // then fold into the 4x64 bucket table — at 100 TB the sketch is the
    // only global state (1 KB of counters), the pattern streaming
    // frequency estimation uses. Buckets are md5-derived so the sketch
    // is bit-identical in both engines, making the estimate itself
    // oracle-checkable (not just bounds): the output pins exact counts,
    // CMS estimates, and the never-underestimates invariant per row.
    QueryDef("t13_heavy_hitters",
      (s, d) => {
        val D = 4; val W = 64
        // ONE definition of the bucket hash for both the build and the
        // probe side — the estimate is only correct if they agree exactly
        val bucketExpr = expr(s"""transform(sequence(0, ${D - 1}),
          r -> struct(r AS r,
            ${Ns.hash32("concat(CAST(r AS STRING), ':', token)")} % $W AS b))""")
        val counts = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
        val buckets = counts.select(col("token"), col("n"),
          explode(bucketExpr).as("x"))
          .select(col("token"), col("n"), col("x.r"), col("x.b"))
        val cms = buckets.groupBy("r", "b").agg(sum(col("n")).as("cnt"))
        val top = counts
          .orderBy(col("n").desc, col("token")).limit(20)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("n").desc, col("token"))).cast("int"))
        top.select(col("rank"), col("token"), col("n"), explode(bucketExpr).as("x"))
          .select(col("rank"), col("token"), col("n"), col("x.r"), col("x.b"))
          .join(broadcast(cms), Seq("r", "b"))
          .groupBy("rank", "token", "n").agg(min(col("cnt")).as("cms_est"))
          .withColumn("never_under", col("cms_est") >= col("n"))
          .orderBy("rank")
      },
      Some(s"""
        WITH counts AS (
          SELECT token, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          GROUP BY token),
        buckets AS (
          SELECT token, n, r,
                 ${Ns.oHash32("CAST(r AS VARCHAR) || ':' || token")} % 64 AS b
          FROM counts CROSS JOIN generate_series(0, 3) t(r)),
        cms AS (SELECT r, b, CAST(sum(n) AS BIGINT) AS cnt FROM buckets GROUP BY r, b),
        top AS (
          SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank,
                 token, n
          FROM counts ORDER BY n DESC, token LIMIT 20)
        SELECT rank, top.token, top.n, min(cnt) AS cms_est,
               min(cnt) >= top.n AS never_under
        FROM top
        JOIN buckets USING (token)
        JOIN cms ON buckets.r = cms.r AND buckets.b = cms.b
        GROUP BY rank, top.token, top.n
        ORDER BY rank""")),

    // -------------------------------------------------------------------
    // Data selection via hashed n-gram importance (the DSIR shape — Xie
    // et al., "Data Selection for Language Models via Importance
    // Resampling", NeurIPS 2023): score every document by how much its
    // hashed-bigram profile looks like a curated target corpus (source
    // 'src0' as the target proxy) versus the whole crawl, select the
    // top-K. DSIR's per-feature log-ratio log(p_t/p_b) is replaced by
    // the cross-multiplied integer surrogate ct*B - cb*T (same sign,
    // monotone in the ratio for a fixed feature) so scores are exact
    // BIGINTs: no logs, no floats — identical on any engine, any
    // partitioning. Scale: the feature space is fixed at 4096 hash
    // buckets, so bucket weights are one broadcast-sized aggregate of
    // the bigram stream; per-doc scoring is one partial-aggregable
    // groupBy + a broadcast join; top-K is a TakeOrdered, never a
    // global sort. At 100-TB weights the BIGINT products would move to
    // DECIMAL(38,0) — noted, not needed at fixture magnitudes.
    QueryDef("t14_importance_score",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 2) // sequence(0, size-2) would DESCEND on shorter docs
        val feat = t.select(col("doc_id"), col("source"), explode(expr(
            "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))")).as("big"))
          .select(col("doc_id"), col("source"),
            pmod(expr(Ns.hash32("concat('ds:', big)")), lit(4096L)).as("b"))
        // stats is read twice (tot + weights) and feat three times in the
        // textual plan, but every duplicate ends in the same aggregate
        // Exchange and ReuseExchange collapses them at runtime (measured:
        // a localCheckpoint here is ~1.5x slower — it forces an eager
        // materialization the reuse already avoids). Net corpus passes:
        // two — fit weights, then score — the DSIR shape.
        val stats = feat.groupBy("b").agg(
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"),
          count(lit(1)).as("cb"))
        val tot = stats.agg(sum(col("ct")).as("tt"), sum(col("cb")).as("tb"))
        val weights = stats.crossJoin(broadcast(tot))
          .select(col("b"), (col("ct") * col("tb") - col("cb") * col("tt")).as("w"))
        val scores = feat.groupBy("doc_id", "source", "b")
          .agg(count(lit(1)).as("n"))
          .join(broadcast(weights), "b")
          .groupBy("doc_id", "source")
          .agg(sum(col("n") * col("w")).as("score"))
        val rw = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))
        scores.orderBy(col("score").desc, col("doc_id")).limit(100)
          .withColumn("rank", row_number().over(rw).cast("int"))
          .select(col("rank"), col("doc_id"), col("source"), col("score"))
          .orderBy("rank")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents WHERE len(string_split(text, ' ')) >= 2),
        feat AS (
          SELECT doc_id, source,
                 ${Ns.oHash32("'ds:' || big")} % 4096 AS b
          FROM (SELECT doc_id, source,
                       unnest(list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1])) AS big
                FROM t)),
        stats AS (
          SELECT b, CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                 count(*) AS cb
          FROM feat GROUP BY b),
        tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cb) AS BIGINT) AS tb
                FROM stats),
        w AS (SELECT b, ct * tb - cb * tt AS w FROM stats CROSS JOIN tot),
        df AS (SELECT doc_id, source, b, count(*) AS n FROM feat GROUP BY 1, 2, 3),
        sc AS (SELECT doc_id, source, CAST(sum(n * w.w) AS BIGINT) AS score
               FROM df JOIN w USING (b) GROUP BY 1, 2)
        SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
               doc_id, source, score
        FROM sc
        ORDER BY score DESC, doc_id
        LIMIT 100""")),

    // -------------------------------------------------------------------
    // Corpus bigram positions via the custom GENERATOR
    // [[graft.functions.WordNGrams]] (`word_ngrams(text, 2)`): top
    // bigrams with corpus frequency, earliest in-document position and
    // document spread. Unlike the `split` + `explode` spelling (t10/t14),
    // the generator STREAMS grams into the partial aggregate — no
    // per-document gram array is ever materialized, which is the memory
    // bound that matters on 100k-word documents at 100 TB. Plan evidence
    // (GenerateExec feeding a two-phase hash aggregate) in GeneratorSpec
    // + docs/PLANS.md; the (cnt DESC, ngram) order is total, so LIMIT 20
    // is deterministic.
    QueryDef("t15_ngram_generate",
      (s, d) => {
        Ns.registerFast(s)
        Tables.documents(s, d)
          .select(col("doc_id"), expr("word_ngrams(text, 2)"))
          .groupBy("ngram")
          .agg(count(lit(1)).as("cnt"),
            min(col("pos")).as("first_pos"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("cnt").desc, col("ngram"))
          .limit(20)
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        grams AS (
          SELECT doc_id, CAST(u.i - 1 AS INT) AS pos,
                 toks[u.i] || ' ' || toks[u.i + 1] AS ngram
          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i))
        SELECT ngram, CAST(count(*) AS BIGINT) AS cnt,
               min(pos) AS first_pos,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM grams GROUP BY ngram
        ORDER BY cnt DESC, ngram LIMIT 20""")),

    // -------------------------------------------------------------------
    // Lexical diversity per document: type-token ratio, hapax count and
    // Simpson diversity (1 - sum p_i^2) — the vocabulary-richness
    // signals a corpus quality filter scores alongside t02. Every
    // statistic is chosen to be LOG-FREE: token counts and their squared
    // sum are exact integers, so ttr and simpson are each ONE IEEE
    // division of exact values — bit-identical across engines and
    // partitionings with no rounding crutch (the entropy spelling of
    // the same signal would hang determinism on libm log2). Two-phase
    // hash aggregation both levels; nothing wider than (doc_id, word)
    // ever shuffles.
    QueryDef("t16_lexical_diversity",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
          .filter(col("word") =!= "")
          .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
        counts.groupBy("doc_id")
          .agg(sum(col("cnt")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
            sum(col("cnt") * col("cnt")).as("sumsq"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
            (col("n_types").cast("double") / col("n_tokens").cast("double")).as("ttr"),
            ((col("n_tokens") * col("n_tokens") - col("sumsq")).cast("double") /
              (col("n_tokens") * col("n_tokens")).cast("double")).as("simpson"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        counts AS (
          SELECT doc_id, word, count(*) AS cnt
          FROM toks WHERE word <> '' GROUP BY 1, 2),
        per_doc AS (
          SELECT doc_id, sum(cnt) AS n_tokens, count(*) AS n_types,
                 sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax,
                 sum(cnt * cnt) AS sumsq
          FROM counts GROUP BY 1)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_types AS BIGINT) AS n_types,
               CAST(n_hapax AS BIGINT) AS n_hapax,
               CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
               CAST(n_tokens * n_tokens - sumsq AS DOUBLE) /
                 CAST(n_tokens * n_tokens AS DOUBLE) AS simpson
        FROM per_doc
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Unicode NFC normalization via the custom codegen expression
    // [[graft.functions.NormalizeText]] (`graft_normalize(s, 'NFC')`).
    // The fixture is ASCII, so each doc is suffixed with a fixed
    // combining-mark string — "e"+U+0301 and "a"+U+030A compose under
    // NFC to é/å (code-point count drops), "k"+U+0337 has no precomposed
    // form and survives decomposed — exercising both normalization
    // outcomes. The suffix is the same raw UTF-8 literal in the Spark
    // plan and the DuckDB SQL; JDK Normalizer and DuckDB's utf8proc both
    // implement UAX #15, so the normalized strings (and code-point
    // lengths) match exactly. Narrow per-row projection — no shuffle.
    QueryDef("t17_unicode_normalize",
      (s, d) => {
        Ns.registerFast(s)
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(substring(col("text"), 1, 24), lit(DecomposedSuffix))
              .as("raw"))
          .select(col("doc_id"),
            expr("graft_normalize(raw, 'NFC')").as("nfc"),
            length(col("raw")).cast("long").as("n_before"),
            length(expr("graft_normalize(raw, 'NFC')")).cast("long").as("n_after"),
            (col("raw") =!= expr("graft_normalize(raw, 'NFC')")).as("changed"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH raw AS (
          SELECT doc_id, substring(text, 1, 24) || '$DecomposedSuffix' AS raw
          FROM documents)
        SELECT doc_id, nfc_normalize(raw) AS nfc,
               CAST(length(raw) AS BIGINT) AS n_before,
               CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_after,
               raw <> nfc_normalize(raw) AS changed
        FROM raw
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Domain-mix drift monitoring: per-source unigram distribution
    // entropy H(s) = -sum p ln p and KL(source || corpus) =
    // sum p ln(p/q) — the standard data-mixture health signals (is a
    // source's token distribution collapsing? how far does each source
    // sit from the blend it feeds?). Float discipline follows the
    // t05/t12 recipe: p and q are single exact divisions of exact
    // counts, each per-token term is one ln + one multiply (ln is
    // engine-bit-identical on these inputs, proven by t05/t09/t12),
    // QUANTIZED to DECIMAL(18,9) — so the per-source sums are exact
    // decimal adds, partition-invariant and engine-identical by
    // construction, no float ever meets a parallel reduction. Scale:
    // two vocab-sized aggregates + one vocab-sized equi-join; totals
    // broadcast as one-row cross joins.
    QueryDef("t20_domain_divergence",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
        val st = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
        val sTot = st.groupBy("source").agg(sum("c").as("t"),
          count(lit(1)).as("vocab"))
        val corpus = st.groupBy("token").agg(sum("c").as("cc"))
        val cTot = corpus.agg(sum("cc").as("tc"))
        st.join(sTot, "source").join(corpus, "token").crossJoin(cTot)
          .select(col("source"), col("t"), col("vocab"),
            expr("""CAST(round(-((CAST(c AS DOUBLE) / t) * ln(CAST(c AS DOUBLE) / t)), 9)
                    AS DECIMAL(18,9))""").as("eterm"),
            expr("""CAST(round((CAST(c AS DOUBLE) / t)
                    * ln((CAST(c AS DOUBLE) / t) / (CAST(cc AS DOUBLE) / tc)), 9)
                    AS DECIMAL(18,9))""").as("klterm"))
          .groupBy("source")
          .agg(max("t").as("n_tokens"), max("vocab").as("vocab"),
            round(sum("eterm").cast("double"), 6).as("entropy"),
            round(sum("klterm").cast("double"), 6).as("kl_vs_corpus"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            col("entropy"), col("kl_vs_corpus"))
          .orderBy("source")
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
        stot AS (SELECT source, sum(c) AS t, count(*) AS vocab FROM st GROUP BY 1),
        corpus AS (SELECT token, sum(c) AS cc FROM st GROUP BY 1),
        ctot AS (SELECT sum(cc) AS tc FROM corpus),
        terms AS (
          SELECT st.source, stot.t, stot.vocab,
                 CAST(round(-((CAST(c AS DOUBLE) / t) * ln(CAST(c AS DOUBLE) / t)), 9)
                      AS DECIMAL(18,9)) AS eterm,
                 CAST(round((CAST(c AS DOUBLE) / t)
                      * ln((CAST(c AS DOUBLE) / t) / (CAST(cc AS DOUBLE) / tc)), 9)
                      AS DECIMAL(18,9)) AS klterm
          FROM st JOIN stot USING (source) JOIN corpus USING (token) CROSS JOIN ctot)
        SELECT source, CAST(max(t) AS BIGINT) AS n_tokens,
               CAST(max(vocab) AS BIGINT) AS vocab,
               round(CAST(sum(eterm) AS DOUBLE), 6) AS entropy,
               round(CAST(sum(klterm) AS DOUBLE), 6) AS kl_vs_corpus
        FROM terms
        GROUP BY source
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Flesch reading-ease readability (the classic 206.835 - 1.015*W/S -
    // 84.6*Y/W): per-doc word / sentence / syllable counts from pure
    // regex token classes ([a-z]+ words, [.!?]+ sentence breaks,
    // [aeiouy]+ vowel GROUPS as the syllable heuristic, >= 1 per word —
    // the standard dictionary-free approximation). Both ratios leave the
    // query as exact integer MICRO-units (q62 round-half-up, positive by
    // construction); the headline score recombines them in doubles with
    // the identical expression tree both engines (same IEEE ops on the
    // same integers -> bit-identical before the final round). Quality
    // filters (t02/p07) use crude length ratios; this is the
    // linguist-facing score a curation UI reports. Scale: one narrow
    // map + regexes per row, no shuffle except the final sort.
    QueryDef("t21_readability",
      (s, d) => {
        Tables.documents(s, d)
          .withColumn("words", expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .withColumn("n_w", size(col("words")).cast("long"))
          .filter(col("n_w") >= 1)
          .withColumn("n_s", greatest(
            expr("CAST(size(regexp_extract_all(text, '[.!?]+', 0)) AS BIGINT)"), lit(1L)))
          .withColumn("n_y", expr(
            """aggregate(words, CAST(0 AS BIGINT), (acc, w) -> acc +
               greatest(CAST(size(regexp_extract_all(w, '[aeiouy]+', 0)) AS BIGINT),
                        CAST(1 AS BIGINT)))"""))
          .withColumn("wps6", expr("CAST((2 * 1000000 * n_w + n_s) div (2 * n_s) AS BIGINT)"))
          .withColumn("spw6", expr("CAST((2 * 1000000 * n_y + n_w) div (2 * n_w) AS BIGINT)"))
          .withColumn("flesch", round(
            lit(206.835)
              - (lit(1.015) * col("wps6").cast("double")) / lit(1000000.0)
              - (lit(84.6) * col("spw6").cast("double")) / lit(1000000.0), 4))
          .select(col("doc_id"), col("n_w"), col("n_s"), col("n_y"),
            col("wps6"), col("spw6"), col("flesch"))
          .orderBy("doc_id")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, text,
                 regexp_extract_all(lower(text), '[a-z]+') AS words
          FROM documents),
        cnt AS (
          SELECT doc_id,
                 CAST(len(words) AS BIGINT) AS n_w,
                 greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                          CAST(1 AS BIGINT)) AS n_s,
                 CAST(list_sum(list_transform(words, w ->
                   greatest(CAST(len(regexp_extract_all(w, '[aeiouy]+')) AS BIGINT),
                            CAST(1 AS BIGINT)))) AS BIGINT) AS n_y
          FROM base WHERE len(words) >= 1),
        micro AS (
          SELECT doc_id, n_w, n_s, n_y,
                 CAST((2 * 1000000 * n_w + n_s) // (2 * n_s) AS BIGINT) AS wps6,
                 CAST((2 * 1000000 * n_y + n_w) // (2 * n_w) AS BIGINT) AS spw6
          FROM cnt)
        SELECT doc_id, n_w, n_s, n_y, wps6, spw6,
               round(206.835
                     - (1.015 * CAST(wps6 AS DOUBLE)) / 1000000.0
                     - (84.6 * CAST(spw6 AS DOUBLE)) / 1000000.0, 4) AS flesch
        FROM micro
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Zipf-law fit per source: OLS slope of ln(freq) on ln(rank) over
    // the token frequency spectrum — the corpus-health diagnostic that
    // flags template/boilerplate-heavy sources (slope far from the ~-1
    // natural-language line). Numerics: ln's are quantized to micro-nat
    // BIGINTs (the t01 recipe), ALL regression sums run in exact integer
    // arithmetic (DECIMAL(38) / HUGEINT), and each of slope/r2 is a
    // single double combination of those exact sums — bit-identical
    // across engines and partitionings. Scale: one groupBy over the
    // exploded token stream, one |sources|-partition window for ranks,
    // then a 5-sum partial aggregation; nothing is ever collected.
    QueryDef("t22_zipf_slope",
      (s, d) => {
        // per-source frequency ranks over a vocabulary-sized table: a
        // grouped Prefix.orderStats two-pass rank (a plain partitionBy
        // window would sort each source's whole vocabulary in ONE task)
        val xy = Prefix.orderStats(
            Tables.documents(s, d)
              .select(col("source"), explode(split(col("text"), " ")).as("token"))
              .groupBy("source", "token").agg(count(lit(1)).as("c")),
            Seq(col("c").desc, col("token")), group = Seq("source"),
            rn = Some("rn"))
          .select(col("source"),
            expr("CAST(round(ln(CAST(rn AS DOUBLE)) * 1e6, 0) AS BIGINT)").as("x"),
            expr("CAST(round(ln(CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT)").as("y"))
        xy.groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast("decimal(38,0)")).as("sx"),
            sum(col("y").cast("decimal(38,0)")).as("sy"),
            sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
            sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
            sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
          .select(col("source"), col("n").as("n_distinct_tokens"),
            round(expr("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"), 6)
              .as("zipf_slope"),
            round(expr(
              """(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
                 / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"""), 6)
              .as("r2"))
          .orderBy("source")
      },
      Some("""
        WITH freq AS (
          SELECT source, token, count(*) AS c FROM (
            SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
          GROUP BY source, token),
        xy AS (
          SELECT source,
                 CAST(round(ln(CAST(rn AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
                 CAST(round(ln(CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
          FROM (
            SELECT source, c,
                   row_number() OVER (PARTITION BY source ORDER BY c DESC, token) AS rn
            FROM freq)),
        sums AS (
          SELECT source, count(*) AS n,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
          FROM xy GROUP BY source)
        SELECT source, CAST(n AS BIGINT) AS n_distinct_tokens,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
               round((CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
                     / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
        FROM sums
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Interpolated Kneser-Ney BIGRAM scoring (the t12 unigram model's
    // real-LM sibling — Chen & Goodman's recipe with absolute discount
    // d = 3/4): p(w|v) = (c(vw) - d)/c(v) + d * N1+(v·)/c(v) * pcont(w),
    // pcont(w) = N1+(·w)/N1+(··) — the continuation probability that
    // makes KN the standard n-gram smoother. d = 3/4 keeps every factor
    // an exact small-integer ratio: the per-bigram probability is ONE
    // double expression over exact counts with identical operation
    // order in both engines, quantized to micro-nats (t01 recipe), so
    // per-doc log-likelihoods sum in exact BIGINT arithmetic. Scale:
    // the model is one groupBy over OBSERVED corpus bigrams (never
    // |V|^2 — the t01 lesson); scoring joins doc bigrams to the model
    // on (v, w), an equi-join AQE broadcasts while the model is small.
    // Docs with < 2 tokens have no bigrams and drop out — both engines.
    QueryDef("t23_kneser_ney",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("token"))
        val big = toks.alias("a")
          .join(toks.alias("b"),
            col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
          .select(col("a.doc_id").as("doc_id"),
            col("a.token").as("v"), col("b.token").as("w"))
          .localCheckpoint() // model + scoring both read the bigram stream
        val cvw = big.groupBy(col("v").as("mv"), col("w").as("mw"))
          .agg(count(lit(1)).as("cvw"))
          .localCheckpoint() // three model derivations below read this
        val cv = cvw.groupBy(col("mv").as("gv"))
          .agg(sum(col("cvw")).as("cv"), count(lit(1)).as("n1f"))
        val n1b = cvw.groupBy(col("mw").as("gw")).agg(count(lit(1)).as("n1b"))
        val nbb = cvw.agg(count(lit(1)).as("nbb"))
        val model = cvw
          .join(broadcast(cv), col("mv") === col("gv"))
          .join(broadcast(n1b), col("mw") === col("gw"))
          .crossJoin(broadcast(nbb))
          .select(col("mv"), col("mw"),
            expr("""CAST(round(ln(
                 CAST(4 * cvw - 3 AS DOUBLE) / (4 * cv)
                 + (CAST(3 AS DOUBLE) * n1f * n1b) / (CAST(4 AS DOUBLE) * cv * nbb)
               ) * 1e6, 0) AS BIGINT)""").as("lp6"))
        big.join(broadcast(model), col("v") === col("mv") && col("w") === col("mw"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("lp6")).as("ll_micro"))
          .select(col("doc_id"), col("n_bigrams"), col("ll_micro"),
            round(expr("exp(-(CAST(ll_micro AS DOUBLE) / 1000000.0) / n_bigrams)"), 6)
              .as("kn_ppl"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, s.pos AS pos, s.token AS token FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks)),
                     i -> struct_pack(pos := i - 1, token := toks[i]))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))),
        big AS (
          SELECT a.doc_id, a.token AS v, b.token AS w
          FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        cvw AS (SELECT v AS mv, w AS mw, count(*) AS cvw FROM big GROUP BY 1, 2),
        cv AS (SELECT mv AS gv, CAST(sum(cvw) AS BIGINT) AS cv, count(*) AS n1f
               FROM cvw GROUP BY 1),
        n1b AS (SELECT mw AS gw, count(*) AS n1b FROM cvw GROUP BY 1),
        nbb AS (SELECT count(*) AS nbb FROM cvw),
        model AS (
          SELECT mv, mw,
                 CAST(round(ln(
                   CAST(4 * cvw - 3 AS DOUBLE) / (4 * cv)
                   + (CAST(3 AS DOUBLE) * n1f * n1b) / (CAST(4 AS DOUBLE) * cv * nbb)
                 ) * 1e6, 0) AS BIGINT) AS lp6
          FROM cvw JOIN cv ON mv = gv JOIN n1b ON mw = gw CROSS JOIN nbb)
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(lp6) AS BIGINT) AS ll_micro,
               round(exp(-(CAST(sum(lp6) AS DOUBLE) / 1000000.0) / count(*)), 6) AS kn_ppl
        FROM big JOIN model ON v = mv AND w = mw
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Two-sample Kolmogorov-Smirnov distance between every pair of
    // sources' document-length distributions — the distribution-drift
    // test t20's KL cannot provide (KL needs shared support and a model;
    // KS is nonparametric on the raw ECDFs). The core is EXACT INTEGER:
    // D * n1 * n2 = max |cum1*n2 - cum2*n1| over the merged value grid,
    // so the statistic is hash-pinned with no float comparison; only
    // the final D and the 5%-level critical value are one double
    // combination each. Scale: per-source length histograms first (the
    // data-sized pass, one partial agg), then everything is
    // |sources|^2 x |distinct lengths| — analysis-sized, broadcast
    // pairs, one window per pair for the cumulative sums.
    QueryDef("t24_ks_distance",
      (s, d) => {
        val cnts = Tables.documents(s, d)
          .select(col("source"), expr("CAST(size(split(text, ' ')) AS BIGINT)").as("len"))
          .groupBy("source", "len").agg(count(lit(1)).as("cnt"))
        val tot = cnts.groupBy(col("source").as("ts")).agg(sum(col("cnt")).as("n"))
        val srcs = cnts.select("source").distinct()
        val pairs = srcs.select(col("source").as("sa"))
          .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
        val e1 = broadcast(pairs).join(cnts, col("source") === col("sa"))
          .select(col("sa"), col("sb"), col("len"), col("cnt").as("c1"), lit(0L).as("c2"))
        val e2 = broadcast(pairs).join(cnts, col("source") === col("sb"))
          .select(col("sa"), col("sb"), col("len"), lit(0L).as("c1"), col("cnt").as("c2"))
        val w = Window.partitionBy("sa", "sb").orderBy("len")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e1.unionAll(e2)
          .groupBy("sa", "sb", "len")
          .agg(sum(col("c1")).as("c1"), sum(col("c2")).as("c2"))
          .withColumn("cum1", sum(col("c1")).over(w))
          .withColumn("cum2", sum(col("c2")).over(w))
          .join(broadcast(tot.select(col("ts").as("t1"), col("n").as("n1"))), col("sa") === col("t1"))
          .join(broadcast(tot.select(col("ts").as("t2"), col("n").as("n2"))), col("sb") === col("t2"))
          .groupBy("sa", "sb", "n1", "n2")
          .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("d_num"))
          .select(col("sa").as("source_a"), col("sb").as("source_b"),
            col("n1"), col("n2"), col("d_num"),
            round(expr("CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)"), 6).as("ks_d"),
            expr("""CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
                    > 1.358 * sqrt((CAST(n1 AS DOUBLE) + n2) / (CAST(n1 AS DOUBLE) * n2))""")
              .as("significant_05"))
          .orderBy("source_a", "source_b")
      },
      Some("""
        WITH cnts AS (
          SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
                 count(*) AS cnt
          FROM documents GROUP BY source, len),
        tot AS (SELECT source AS ts, CAST(sum(cnt) AS BIGINT) AS n FROM cnts GROUP BY source),
        srcs AS (SELECT DISTINCT source FROM cnts),
        pairs AS (
          SELECT a.source AS sa, b.source AS sb
          FROM srcs a JOIN srcs b ON a.source < b.source),
        ev AS (
          SELECT sa, sb, len, CAST(cnt AS BIGINT) AS c1, CAST(0 AS BIGINT) AS c2
          FROM pairs JOIN cnts ON source = sa
          UNION ALL
          SELECT sa, sb, len, CAST(0 AS BIGINT), CAST(cnt AS BIGINT)
          FROM pairs JOIN cnts ON source = sb),
        merged AS (
          SELECT sa, sb, len, sum(c1) AS c1, sum(c2) AS c2
          FROM ev GROUP BY sa, sb, len),
        cums AS (
          SELECT sa, sb, len,
                 CAST(sum(c1) OVER w AS BIGINT) AS cum1,
                 CAST(sum(c2) OVER w AS BIGINT) AS cum2
          FROM merged
          WINDOW w AS (PARTITION BY sa, sb ORDER BY len ROWS UNBOUNDED PRECEDING)),
        d AS (
          SELECT sa, sb, n1.n AS n1, n2.n AS n2,
                 CAST(max(abs(cum1 * n2.n - cum2 * n1.n)) AS BIGINT) AS d_num
          FROM cums
          JOIN tot n1 ON sa = n1.ts
          JOIN tot n2 ON sb = n2.ts
          GROUP BY sa, sb, n1.n, n2.n)
        SELECT sa AS source_a, sb AS source_b, n1, n2, d_num,
               round(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS ks_d,
               CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
                 > 1.358 * sqrt((CAST(n1 AS DOUBLE) + n2) / (CAST(n1 AS DOUBLE) * n2))
                 AS significant_05
        FROM d
        ORDER BY source_a, source_b"""))
  ) ++ Seq(

    // -------------------------------------------------------------------
    // RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    // the maximal stopword-free token runs; each word scores
    // deg(w)/freq(w) where freq counts occurrences corpus-wide and deg
    // sums the lengths of the phrases it appears in; a phrase scores the
    // sum of its member word scores; top-3 phrases per document. The
    // word ratio is kept exact cross-engine as the micro-unit integer
    // quotient (1e6*deg) div freq — the g09/t01 recipe — so phrase
    // scores are exact BIGINTs and ranking needs no float tie care.
    // Scale: phrase segmentation is one per-doc window (stopword prefix
    // count), word stats partial-aggregate corpus-wide and broadcast
    // back (vocabulary-sized), ranking is a per-doc top-k window.
    QueryDef("t25_rake_keywords",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("token"))
          .withColumn("stop", col("token").isin("the", "a"))
        val members = toks
          .withColumn("pid", sum(when(col("stop"), 1).otherwise(0))
            .over(Window.partitionBy("doc_id").orderBy("pos")))
          .filter(!col("stop"))
        val sized = members.withColumn("psize",
          count(lit(1)).over(Window.partitionBy("doc_id", "pid")))
        val stats = sized.groupBy("token")
          .agg(count(lit(1)).as("freq"), sum(col("psize")).as("deg"))
          .select(col("token"), expr("1000000 * deg div freq").as("score6"))
        val scored = sized.join(broadcast(stats), "token")
          .groupBy("doc_id", "pid")
          .agg(concat_ws(" ",
              expr("transform(sort_array(collect_list(struct(pos, token))), x -> x.token)"))
              .as("phrase"),
            count(lit(1)).as("n_words"),
            sum(col("score6")).as("score6"))
        val wR = Window.partitionBy("doc_id").orderBy(col("score6").desc, col("phrase"))
        scored.withColumn("rank", row_number().over(wR)).filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank").cast("int").as("rank"),
            col("phrase"), col("n_words"), col("score6"))
          .orderBy("doc_id", "rank")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, s.pos AS pos, s.token AS token FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(tk)),
                     i -> struct_pack(pos := i - 1, token := tk[i]))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))),
        ph AS (
          SELECT doc_id, pos, token,
                 token IN ('the', 'a') AS stop,
                 sum(CASE WHEN token IN ('the', 'a') THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS pid
          FROM toks),
        sized AS (
          SELECT doc_id, pos, token, pid,
                 count(*) OVER (PARTITION BY doc_id, pid) AS psize
          FROM ph WHERE NOT stop),
        stats AS (
          SELECT token, 1000000 * CAST(sum(psize) AS BIGINT) // count(*) AS score6
          FROM sized GROUP BY token),
        scored AS (
          SELECT m.doc_id, m.pid,
                 string_agg(m.token, ' ' ORDER BY m.pos) AS phrase,
                 count(*) AS n_words,
                 CAST(sum(s.score6) AS BIGINT) AS score6
          FROM sized m JOIN stats s USING (token)
          GROUP BY m.doc_id, m.pid),
        ranked AS (
          SELECT doc_id, phrase, n_words, score6,
                 CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY score6 DESC, phrase) AS INT) AS rank
          FROM scored)
        SELECT doc_id, rank, phrase, n_words, score6
        FROM ranked WHERE rank <= 3
        ORDER BY doc_id, rank""")),

    // -------------------------------------------------------------------
    // Vocabulary coverage curve: what fraction of all corpus tokens the
    // top-K most frequent types cover, for K in {1,2,4,8,16,32} — the
    // diminishing-returns curve every tokenizer-budget decision reads
    // (t18's BPE picks merges off the same curve's tail). Frequencies,
    // ranks (count desc, token asc — total order), cumulative sums and
    // the ppm ratio are all exact integers. Scale: the vocabulary table
    // after the first groupBy is tiny; the curve join is broadcast.
    QueryDef("t26_vocab_coverage",
      (s, d) => {
        val freq = Tables.documents(s, d)
          .select(posexplode(split(col("text"), " ")))
          .groupBy(col("col").as("token")).agg(count(lit(1)).as("f"))
        // only ranks <= 32 are consumed: distributed top-k first
        // (TakeOrderedAndProject), then the rank window runs on the
        // 32-row shortlist — bounded, never the vocabulary
        val ranked = freq.orderBy(col("f").desc, col("token")).limit(32)
          .withColumn("r",
            row_number().over(Window.orderBy(col("f").desc, col("token"))))
        val tot = freq.agg(sum(col("f")).as("total"))
        val ks = s.sql("SELECT explode(array(1, 2, 4, 8, 16, 32)) AS k")
        broadcast(ks).join(ranked, col("r") <= col("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_types"), sum(col("f")).as("cum_tokens"))
          .crossJoin(tot)
          .select(col("k"), col("n_types"), col("cum_tokens"),
            expr("1000000 * cum_tokens div total").as("coverage_ppm"))
          .orderBy("k")
      },
      Some("""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        freq AS (SELECT token, count(*) AS f FROM toks GROUP BY token),
        ranked AS (
          SELECT token, f, row_number() OVER (ORDER BY f DESC, token) AS r
          FROM freq),
        tot AS (SELECT CAST(sum(f) AS BIGINT) AS total FROM freq),
        ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k)
        SELECT k, count(*) AS n_types,
               CAST(sum(f) AS BIGINT) AS cum_tokens,
               1000000 * CAST(sum(f) AS BIGINT) // max(total) AS coverage_ppm
        FROM ks JOIN ranked ON r <= k CROSS JOIN tot
        GROUP BY k
        ORDER BY k""")),

    // -------------------------------------------------------------------
    // Language-ID confusion matrix + per-language recall/precision: the
    // evaluation rollup of t01's classifier (shared model via
    // langIdPredict — the prediction plan is literally the same
    // subtree). Counts are exact; recall/precision are ppm integer
    // quotients of them, so the whole eval is hash-pinned. The
    // confusion matrix is |langs|^2-bounded output from one groupBy.
    QueryDef("t27_langid_confusion",
      (s, d) => {
        val pred = langIdPredict(s, d)
        val cm = pred.groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
        val rows = cm.groupBy(col("true_lang").as("tl")).agg(sum(col("n_docs")).as("row_n"))
        val cols = cm.groupBy(col("pred_lang").as("pl")).agg(sum(col("n_docs")).as("col_n"))
        cm.join(broadcast(rows), col("true_lang") === col("tl"))
          .join(broadcast(cols), col("pred_lang") === col("pl"))
          .select(col("true_lang"), col("pred_lang"), col("n_docs"),
            expr("1000000 * n_docs div row_n").as("recall_ppm"),
            expr("1000000 * n_docs div col_n").as("precision_ppm"))
          .orderBy("true_lang", "pred_lang")
      },
      Some(s"""
        WITH $langIdOracleCtes,
        cm AS (
          SELECT true_lang, pred_lang, count(*) AS n_docs
          FROM pred GROUP BY true_lang, pred_lang),
        rws AS (SELECT true_lang AS tl, CAST(sum(n_docs) AS BIGINT) AS row_n FROM cm GROUP BY 1),
        cls AS (SELECT pred_lang AS pl, CAST(sum(n_docs) AS BIGINT) AS col_n FROM cm GROUP BY 1)
        SELECT true_lang, pred_lang, n_docs,
               1000000 * n_docs // row_n AS recall_ppm,
               1000000 * n_docs // col_n AS precision_ppm
        FROM cm JOIN rws ON true_lang = tl JOIN cls ON pred_lang = pl
        ORDER BY true_lang, pred_lang""")),

    // -------------------------------------------------------------------
    // N-gram novelty curve: per document (in doc_id ingestion order),
    // what fraction of its distinct 3-gram shingles has never appeared
    // in any earlier document — the diminishing-novelty signal a
    // crawl/curation loop watches to decide when more data from a
    // source stops adding information (the corpus-level view of d10's
    // chunk sharing). First-seer is min(doc_id) per shingle (one
    // groupBy on the shingle — the d04 shuffle key); ratios exact ppm.
    QueryDef("t28_ngram_novelty",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(expr(
              "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("sh"))
        val first = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
        sh.join(first, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .withColumn("novelty_ppm", expr("1000000 * n_novel div n_shingles"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t0 AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh
          FROM t0 WHERE len(toks) >= 3),
        first AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh)
        SELECT s.doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               1000000 * CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
                 // count(*) AS novelty_ppm
        FROM sh s JOIN first f USING (sh)
        GROUP BY s.doc_id
        ORDER BY s.doc_id""")),

    // -------------------------------------------------------------------
    // Bursty n-grams: which 3-gram shingles RISE most from the early
    // corpus half to the late half (doc_id order = ingestion order) —
    // the trending-topics detector over the same shingle stream t28
    // measures novelty on. Per-doc-distinct counts, exact per-half
    // document-frequency ppm, and the top-10 risers by exact delta
    // (shingle tie-break). The halves join is two partial aggs; the
    // top-k is a bounded sort on the shingle-level table.
    QueryDef("t29_burst_ngrams",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val sh = docs
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(expr(
              "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("sh"))
          .crossJoin(broadcast(n))
          .withColumn("late", (col("doc_id") * 2 >= col("n_docs")).cast("int"))
        val counts = sh.groupBy("sh")
          .agg(sum(lit(1) - col("late")).as("early_docs"),
            sum(col("late")).as("late_docs"))
        val halves = sh.select(col("late"), col("doc_id")).distinct()
          .groupBy("late").agg(count(lit(1)).as("nh"))
        val eN = halves.filter(col("late") === 0).select(col("nh").as("n_early"))
        val lN = halves.filter(col("late") === 1).select(col("nh").as("n_late"))
        val scoredT = counts.crossJoin(eN).crossJoin(lN)
          .withColumn("early_ppm", expr("1000000 * early_docs div n_early"))
          .withColumn("late_ppm", expr("1000000 * late_docs div n_late"))
          .withColumn("delta_ppm", col("late_ppm") - col("early_ppm"))
        // top-10 of a shingle-type-sized table: distributed top-k first,
        // then the rank window runs on the 10-row shortlist (bounded)
        val wR = Window.orderBy(col("delta_ppm").desc, col("sh"))
        scoredT.orderBy(col("delta_ppm").desc, col("sh")).limit(10)
          .withColumn("rank", row_number().over(wR))
          .select(col("rank").cast("int").as("rank"), col("sh").as("ngram"),
            col("early_docs"), col("late_docs"), col("early_ppm"),
            col("late_ppm"), col("delta_ppm"))
          .orderBy("rank")
      },
      Some("""
        WITH nd AS (SELECT count(*) AS n_docs FROM documents),
        t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh,
                 CAST(doc_id * 2 >= (SELECT n_docs FROM nd) AS INT) AS late
          FROM t0 WHERE len(toks) >= 3),
        counts AS (
          SELECT sh, CAST(sum(1 - late) AS BIGINT) AS early_docs,
                 CAST(sum(late) AS BIGINT) AS late_docs
          FROM sh GROUP BY sh),
        halves AS (
          SELECT late, count(*) AS nh FROM (SELECT DISTINCT late, doc_id FROM sh)
          GROUP BY late),
        en AS (SELECT nh AS n_early FROM halves WHERE late = 0),
        ln AS (SELECT nh AS n_late FROM halves WHERE late = 1),
        scored AS (
          SELECT sh, early_docs, late_docs,
                 1000000 * early_docs // n_early AS early_ppm,
                 1000000 * late_docs // n_late AS late_ppm,
                 1000000 * late_docs // n_late - 1000000 * early_docs // n_early AS delta_ppm
          FROM counts CROSS JOIN en CROSS JOIN ln),
        ranked AS (
          SELECT *, CAST(row_number() OVER (ORDER BY delta_ppm DESC, sh) AS INT) AS rank
          FROM scored)
        SELECT rank, sh AS ngram, early_docs, late_docs, early_ppm, late_ppm, delta_ppm
        FROM ranked WHERE rank <= 10
        ORDER BY rank""")),

    // -------------------------------------------------------------------
    // Burrows' Delta stylometry between language sub-corpora: for the
    // 20 most frequent corpus tokens (count desc, token tie-break),
    // z-score each language's exact relative frequency (ppm integers)
    // against the across-language mean/sd, and report delta(a,b) =
    // mean |z_a - z_b| per language pair — the classic authorship /
    // register distance (Burrows 2002). Everything is exact integers
    // until the z layer (one identical double expression per engine);
    // delta is floor-quantized micro. Zero-variance tokens are dropped
    // by the exact integer test n*sumsq > sum^2. Scale: the marker
    // table is 20 x |langs| — broadcast-sized by construction.
    QueryDef("t30_burrows_delta",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ", -1)).as("tok"))
          .filter(col("tok") =!= "")
        val top = toks.groupBy("tok").agg(count(lit(1)).as("ct"))
          .orderBy(col("ct").desc, col("tok")).limit(20)
          .select(col("tok").as("mt"))
        val ltot = toks.groupBy(col("lang").as("lt")).agg(count(lit(1)).as("nl"))
        val freq = toks.join(broadcast(top), col("tok") === col("mt"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
          .join(ltot, col("lang") === col("lt"))
          .select(col("lang"), col("tok"), expr("1000000 * c div nl").as("ppm"))
        // every (lang, marker) cell must exist: a lang that never uses a
        // marker has ppm 0, not a missing row
        val langs = ltot.select(col("lt").as("lang"))
        val cells = langs.crossJoin(broadcast(top.select(col("mt").as("tok"))))
          .join(freq, Seq("lang", "tok"), "left")
          .select(col("lang"), col("tok"), coalesce(col("ppm"), lit(0L)).as("ppm"))
        val stats = cells.groupBy(col("tok").as("st"))
          .agg(count(lit(1)).as("nlang"), sum(col("ppm")).as("sp"),
            sum(expr("CAST(ppm AS DECIMAL(38,0)) * ppm")).as("spp"))
          .filter(expr("nlang * spp > CAST(sp AS DECIMAL(38,0)) * sp"))
        val z = cells.join(broadcast(stats), col("tok") === col("st"))
          .select(col("lang"), col("tok"),
            expr("""(CAST(ppm AS DOUBLE) - CAST(sp AS DOUBLE) / nlang)
                    / (sqrt(CAST(nlang * spp - CAST(sp AS DECIMAL(38,0)) * sp AS DOUBLE)) / nlang)""")
              .as("z"))
        val a = z.select(col("lang").as("lang_a"), col("tok"), col("z").as("za"))
        val b = z.select(col("lang").as("lang_b"), col("tok").as("tb"), col("z").as("zb"))
        a.join(b, col("tok") === col("tb") && col("lang_a") < col("lang_b"))
          .groupBy("lang_a", "lang_b")
          .agg(count(lit(1)).as("n_markers"),
            expr("""CAST(floor(1000000 * aggregate(
                      transform(sort_array(collect_list(struct(tok, za, zb))), x -> abs(x.za - x.zb)),
                      CAST(0 AS DOUBLE), (acc, x) -> acc + x) / count(1)) AS BIGINT)""")
              .as("delta_micro"))
          .orderBy("lang_a", "lang_b")
      },
      Some("""
        WITH toks AS (
          SELECT lang, u.tok
          FROM documents, unnest(string_split(text, ' ')) AS u(tok)
          WHERE u.tok <> ''),
        top AS (
          SELECT tok AS mt FROM (
            SELECT tok, count(*) AS ct FROM toks GROUP BY tok
            ORDER BY ct DESC, tok LIMIT 20)),
        ltot AS (SELECT lang AS lt, count(*) AS nl FROM toks GROUP BY lang),
        freq AS (
          SELECT lang, tok, 1000000 * count(*) // max(nl) AS ppm
          FROM toks JOIN top ON tok = mt JOIN ltot ON lang = lt
          GROUP BY lang, tok),
        cells AS (
          SELECT l.lt AS lang, t.mt AS tok, coalesce(f.ppm, 0) AS ppm
          FROM ltot l CROSS JOIN top t
          LEFT JOIN freq f ON f.lang = l.lt AND f.tok = t.mt),
        stats AS (
          SELECT tok AS st, count(*) AS nlang, CAST(sum(ppm) AS BIGINT) AS sp,
                 sum(CAST(ppm AS HUGEINT) * ppm) AS spp
          FROM cells GROUP BY tok
          HAVING count(*) * sum(CAST(ppm AS HUGEINT) * ppm)
                 > CAST(sum(ppm) AS HUGEINT) * sum(ppm)),
        z AS (
          SELECT lang, tok,
                 (CAST(ppm AS DOUBLE) - CAST(sp AS DOUBLE) / nlang)
                 / (sqrt(CAST(nlang * spp - CAST(sp AS HUGEINT) * sp AS DOUBLE)) / nlang) AS z
          FROM cells JOIN stats ON tok = st),
        pairs AS (
          SELECT a.lang AS lang_a, b.lang AS lang_b, a.tok, a.z AS za, b.z AS zb
          FROM z a JOIN z b ON a.tok = b.tok AND a.lang < b.lang)
        SELECT lang_a, lang_b, count(*) AS n_markers,
               CAST(floor(1000000 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(abs(za - zb) ORDER BY tok)),
                 (acc, x) -> acc + x) / count(*)) AS BIGINT) AS delta_micro
        FROM pairs
        GROUP BY lang_a, lang_b
        ORDER BY lang_a, lang_b""")),

    // -------------------------------------------------------------------
    // Heaps'-law fit of vocabulary growth: walk the corpus in doc_id
    // order, track cumulative token count N(d) and cumulative distinct
    // vocabulary V(d) (a token's first appearance is min(doc_id) — one
    // groupBy, no per-prefix re-distinct), and least-squares fit
    // ln V = ln k + beta ln N over the per-doc curve points. The ln
    // values are floor-quantized to EXACT milli-nat integers per row
    // (same double -> same int both engines), so the regression sums are
    // order-free exact integer aggregates; the slope/intercept layer is
    // one division of DECIMAL(38,0)/HUGEINT-widened exact products.
    // beta ~ 0.5-0.9 for natural text (Heaps 1978). Scale: token flow is
    // one groupBy(token) + one groupBy(doc); the curve window runs over
    // per-doc rows only.
    QueryDef("t31_heaps_law",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
          .filter(col("tok") =!= "")
        val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
        val firsts = toks.groupBy("tok").agg(min(col("doc_id")).as("fd"))
          .groupBy(col("fd").as("fdoc")).agg(count(lit(1)).as("new_types"))
        // the vocabulary-growth walk is doc-grain (unbounded), so both
        // running sums go through Prefix.orderStats — exact longs, a
        // range-partitioned two-pass scan instead of one global task
        val curve = Prefix.orderStats(
            perDoc
              .join(firsts, col("doc_id") === col("fdoc"), "left")
              .select(col("doc_id"), col("n_toks"),
                coalesce(col("new_types"), lit(0L)).as("nt")),
            Seq(col("doc_id")),
            cumSums = Seq(("n_toks", "cum_n"), ("nt", "cum_v")))
          .filter(col("cum_n") > 0 && col("cum_v") > 0)
          .select(
            expr("CAST(floor(1000 * ln(CAST(cum_n AS DOUBLE))) AS BIGINT)").as("x3"),
            expr("CAST(floor(1000 * ln(CAST(cum_v AS DOUBLE))) AS BIGINT)").as("y3"),
            col("cum_n"), col("cum_v"))
        curve.agg(count(lit(1)).as("n_points"),
            max(col("cum_n")).as("total_tokens"), max(col("cum_v")).as("vocab"),
            sum(col("x3")).as("sx"), sum(col("y3")).as("sy"),
            sum(expr("CAST(x3 AS DECIMAL(38,0)) * y3")).as("sxy"),
            sum(expr("CAST(x3 AS DECIMAL(38,0)) * x3")).as("sxx"))
          .select(col("n_points"), col("total_tokens"), col("vocab"),
            expr("""CAST(floor(1000000 *
                      (CAST(n_points * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                       / CAST(n_points * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)))
                    AS BIGINT)""").as("beta_micro"),
            expr("""CAST(floor(1000 *
                      ((CAST(sy AS DOUBLE)
                        - (CAST(n_points * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                           / CAST(n_points * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
                          * CAST(sx AS DOUBLE)) / CAST(n_points AS DOUBLE)))
                    AS BIGINT)""").as("lnk_milli"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, u.tok
          FROM documents, unnest(string_split(text, ' ')) AS u(tok)
          WHERE u.tok <> ''),
        per_doc AS (SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id),
        firsts AS (
          SELECT fd AS fdoc, count(*) AS new_types FROM (
            SELECT tok, min(doc_id) AS fd FROM toks GROUP BY tok)
          GROUP BY fd),
        curve AS (
          SELECT CAST(floor(1000 * ln(CAST(cum_n AS DOUBLE))) AS BIGINT) AS x3,
                 CAST(floor(1000 * ln(CAST(cum_v AS DOUBLE))) AS BIGINT) AS y3,
                 cum_n, cum_v
          FROM (
            SELECT p.doc_id,
                   CAST(sum(p.n_toks) OVER w AS BIGINT) AS cum_n,
                   CAST(sum(coalesce(f.new_types, 0)) OVER w AS BIGINT) AS cum_v
            FROM per_doc p LEFT JOIN firsts f ON p.doc_id = f.fdoc
            WINDOW w AS (ORDER BY p.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          WHERE cum_n > 0 AND cum_v > 0),
        sums AS (
          SELECT count(*) AS n_points,
                 CAST(max(cum_n) AS BIGINT) AS total_tokens,
                 CAST(max(cum_v) AS BIGINT) AS vocab,
                 CAST(sum(x3) AS BIGINT) AS sx, CAST(sum(y3) AS BIGINT) AS sy,
                 sum(CAST(x3 AS HUGEINT) * y3) AS sxy,
                 sum(CAST(x3 AS HUGEINT) * x3) AS sxx
          FROM curve)
        SELECT n_points, total_tokens, vocab,
               CAST(floor(1000000 *
                 (CAST(n_points * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(n_points * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)))
               AS BIGINT) AS beta_micro,
               CAST(floor(1000 *
                 ((CAST(sy AS DOUBLE)
                   - (CAST(n_points * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                      / CAST(n_points * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                     * CAST(sx AS DOUBLE)) / CAST(n_points AS DOUBLE)))
               AS BIGINT) AS lnk_milli
        FROM sums""")),

    // -------------------------------------------------------------------
    // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    // the word co-occurrence graph (distinct adjacent-token pairs across
    // the corpus), g01's determinism recipe — per-sweep contribution
    // sums folded in sorted-neighbor order, rank = 0.15 + 0.85*csum,
    // TR_ITERS unrolled sweeps — then the top-20 tokens by rounded rank
    // (token tie-break). The graph is vocabulary-sized (not corpus-
    // sized), so the iteration cost is independent of corpus scale; the
    // one corpus-sized pass is the adjacency explode + distinct.
    QueryDef("t33_textrank_keywords",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), col("toks"),
            explode(expr("sequence(0, size(toks) - 2)")).as("i"))
          .select(expr("toks[i]").as("w1"), expr("toks[i+1]").as("w2"))
          .filter(col("w1") =!= "" && col("w2") =!= "" && col("w1") =!= col("w2"))
        val und = toks.select(least(col("w1"), col("w2")).as("a"),
          greatest(col("w1"), col("w2")).as("b")).distinct().localCheckpoint()
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val nodes = edges.select(col("src").as("token")).distinct()
        var ranks = nodes.select(col("token"), lit(1.0).as("rank"))
        for (_ <- 1 to TR_ITERS) {
          val contribs = edges.join(deg, "src")
            .join(ranks.select(col("token").as("src"), col("rank")), "src")
            .select(col("dst"), col("src"), (col("rank") / col("deg")).as("c"))
          val sums = contribs.groupBy("dst")
            .agg(expr("""aggregate(transform(sort_array(collect_list(struct(src, c))), x -> x.c),
                         CAST(0 AS DOUBLE), (acc, x) -> acc + x)""").as("csum"))
          ranks = nodes.join(sums, col("token") === col("dst"), "left")
            .select(col("token"),
              (lit(0.15) + lit(0.85) * coalesce(col("csum"), lit(0.0))).as("rank"))
        }
        // top-20 of a vocabulary-sized rank table: distributed top-k
        // first, then the rank window runs on the 20-row shortlist
        // bounded: rank re-derived over the 20-row TakeOrdered shortlist
        val wR = Window.orderBy(col("textrank").desc, col("token"))
        ranks.join(deg, col("token") === col("src"))
          .select(col("token"), round(col("rank"), 6).as("textrank"), col("deg"))
          .orderBy(col("textrank").desc, col("token")).limit(20)
          .withColumn("kw_rank", row_number().over(wR))
          .select(col("kw_rank").cast("int").as("kw_rank"), col("token"),
            col("textrank"), col("deg").as("degree"))
          .orderBy("kw_rank")
      },
      Some {
        val sb = new StringBuilder
        sb ++= """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 2),
        adj AS (
          SELECT toks[i] AS w1, toks[i+1] AS w2
          FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
        und AS (
          SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
          FROM adj WHERE w1 <> '' AND w2 <> '' AND w1 <> w2),
        edges AS (
          SELECT a AS src, b AS dst FROM und
          UNION ALL
          SELECT b AS src, a AS dst FROM und),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS token FROM edges),
        r0 AS (SELECT token, CAST(1 AS DOUBLE) AS rank FROM nodes)"""
        for (t <- 1 to TR_ITERS) {
          sb ++= s""",
        s$t AS (
          SELECT e.dst,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE), list(r.rank / g.deg ORDER BY e.src)),
                             (acc, x) -> acc + x) AS csum
          FROM edges e JOIN deg g ON e.src = g.src JOIN r${t - 1} r ON e.src = r.token
          GROUP BY e.dst),
        r$t AS (
          SELECT n.token,
                 CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce(s.csum, CAST(0 AS DOUBLE)) AS rank
          FROM nodes n LEFT JOIN s$t s ON n.token = s.dst)"""
        }
        sb ++= s"""
        SELECT CAST(row_number() OVER (ORDER BY round(r.rank, 6) DESC, r.token) AS INT) AS kw_rank,
               r.token, round(r.rank, 6) AS textrank, g.deg AS degree
        FROM r$TR_ITERS r JOIN deg g ON r.token = g.src
        ORDER BY round(r.rank, 6) DESC, r.token
        LIMIT 20"""
        sb.toString
      }),

    // -------------------------------------------------------------------
    // Jensen-Shannon divergence of each source's unigram distribution vs
    // the corpus mixture — the SYMMETRIC, BOUNDED ([0, ln 2]) companion
    // to t20's KL (which is asymmetric and blows up on unseen tokens;
    // JS never does, so it's the drift score a mixture-design dashboard
    // can threshold). M = (P_src + P_corpus)/2; per PRESENT token both
    // halves 0.5·p·ln(p/m) are computed in one identical expression
    // tree and quantized to DECIMAL(18,9) (the t20 recipe) so the sum
    // is order-independent; tokens the source never saw contribute a
    // CLOSED-FORM corpus-side mass 0.5·ln2·(tc − cc_present)/tc — the
    // t01 analytic-smoothing move, so the |S|×|V| absent matrix is
    // never materialized. Scale: one groupBy((source,token)) + two
    // dimension-sized broadcasts; vs-corpus (not pairwise) keeps the
    // output linear in |S|.
    QueryDef("t35_js_divergence",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
        val st = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
        val sTot = st.groupBy("source").agg(sum("c").as("t"), count(lit(1)).as("vocab"))
        val corpus = st.groupBy("token").agg(sum("c").as("cc"))
        val cTot = corpus.agg(sum("cc").as("tc"))
        st.join(sTot, "source").join(corpus, "token").crossJoin(broadcast(cTot))
          .select(col("source"), col("t"), col("vocab"), col("cc"), col("tc"),
            expr("""CAST(round(
                CAST(0.5 AS DOUBLE) * (CAST(c AS DOUBLE) / t)
                  * ln((CAST(c AS DOUBLE) / t)
                       / ((CAST(c AS DOUBLE) / t + CAST(cc AS DOUBLE) / tc) / CAST(2 AS DOUBLE)))
              + CAST(0.5 AS DOUBLE) * (CAST(cc AS DOUBLE) / tc)
                  * ln((CAST(cc AS DOUBLE) / tc)
                       / ((CAST(c AS DOUBLE) / t + CAST(cc AS DOUBLE) / tc) / CAST(2 AS DOUBLE))), 9)
              AS DECIMAL(18,9))""").as("jterm"))
          .groupBy("source")
          .agg(max("t").as("n_tokens"), max("vocab").as("vocab"),
            sum("jterm").as("jsum"), sum("cc").as("ccp"), max("tc").as("tc"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            expr("""round(CAST(jsum AS DOUBLE)
                    + CAST(0.5 AS DOUBLE) * ln(CAST(2 AS DOUBLE))
                      * (CAST(tc - ccp AS DOUBLE) / tc), 6)""").as("js_vs_corpus"))
          .withColumn("js_distance", expr("round(sqrt(js_vs_corpus), 6)"))
          .orderBy("source")
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
        stot AS (SELECT source, sum(c) AS t, count(*) AS vocab FROM st GROUP BY 1),
        corpus AS (SELECT token, sum(c) AS cc FROM st GROUP BY 1),
        ctot AS (SELECT sum(cc) AS tc FROM corpus),
        terms AS (
          SELECT st.source, stot.t, stot.vocab, corpus.cc, ctot.tc,
                 CAST(round(
                     CAST(0.5 AS DOUBLE) * (CAST(c AS DOUBLE) / t)
                       * ln((CAST(c AS DOUBLE) / t)
                            / ((CAST(c AS DOUBLE) / t + CAST(cc AS DOUBLE) / tc) / CAST(2 AS DOUBLE)))
                   + CAST(0.5 AS DOUBLE) * (CAST(cc AS DOUBLE) / tc)
                       * ln((CAST(cc AS DOUBLE) / tc)
                            / ((CAST(c AS DOUBLE) / t + CAST(cc AS DOUBLE) / tc) / CAST(2 AS DOUBLE))), 9)
                   AS DECIMAL(18,9)) AS jterm
          FROM st JOIN stot USING (source) JOIN corpus USING (token) CROSS JOIN ctot)
        SELECT source, CAST(max(t) AS BIGINT) AS n_tokens,
               CAST(max(vocab) AS BIGINT) AS vocab,
               round(CAST(sum(jterm) AS DOUBLE)
                     + CAST(0.5 AS DOUBLE) * ln(CAST(2 AS DOUBLE))
                       * (CAST(max(tc) - sum(cc) AS DOUBLE) / max(tc)), 6) AS js_vs_corpus,
               round(sqrt(round(CAST(sum(jterm) AS DOUBLE)
                     + CAST(0.5 AS DOUBLE) * ln(CAST(2 AS DOUBLE))
                       * (CAST(max(tc) - sum(cc) AS DOUBLE) / max(tc)), 6)), 6) AS js_distance
        FROM terms
        GROUP BY source
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Good-Turing frequency-of-frequencies table (Good 1953; the
    // smoothing that backs Katz LMs and species-richness estimates),
    // over word TRIGRAMS (the fixture's 31-word vocabulary makes
    // unigram counts all huge; trigram types are hapax-rich — the
    // regime GT exists for): for each trigram count r, N_r = how many
    // distinct trigrams occur exactly r times, and the GT-adjusted
    // count r* = (r+1)·N_{r+1}/N_r, quantized to exact micro-units by
    // integer floor division (both engines floor positive quotients
    // identically — the t01/q102 recipe). `p_class_micro` is the total
    // probability mass GT assigns the class (N_r·r*/T, micro-floored),
    // whose r=0 analogue N_1/T is the unseen-mass estimate. Output
    // bounded to r <= 20 (the classes where GT is actually used; higher
    // r falls back to raw counts). Trigrams stream through the custom
    // [[graft.functions.WordNGrams]] generator — no per-document gram
    // array (the t15 memory argument). Scale: two cascaded aggs (gram
    // counts, then counts-of-counts — the second input is
    // gram-type-sized) and a 20-row self-join.
    QueryDef("t36_good_turing",
      (s, d) => {
        Ns.registerFast(s)
        val words = Tables.documents(s, d)
          .select(expr("word_ngrams(text, 3)"))
        val wc = words.groupBy("ngram").agg(count(lit(1)).as("r"))
        val cc = wc.groupBy("r").agg(count(lit(1)).as("n_r"))
        val tot = cc.agg(sum(expr("r * n_r")).as("t_tokens"))
        val nxt = cc.select(col("r").as("r1"), col("n_r").as("n_r1"))
        cc.filter(col("r") <= 20)
          .join(nxt, col("r1") === col("r") + 1, "left")
          .crossJoin(broadcast(tot))
          .select(col("r"), col("n_r"),
            coalesce(col("n_r1"), lit(0L)).as("n_next"), col("t_tokens"))
          .select(col("r"), col("n_r"), col("n_next"), col("t_tokens"),
            expr("(r + 1) * n_next * 1000000 div n_r").as("r_star_micro"))
          .withColumn("p_class_micro",
            expr("n_r * ((r + 1) * n_next * 1000000 div n_r) div t_tokens"))
          .orderBy("r")
      },
      Some("""
        WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        words AS (
          SELECT toks[u.i] || ' ' || toks[u.i + 1] || ' ' || toks[u.i + 2] AS w
          FROM t, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)),
        wc AS (SELECT w, count(*) AS r FROM words GROUP BY w),
        cc AS (SELECT r, count(*) AS n_r FROM wc GROUP BY r),
        tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS t_tokens FROM cc)
        SELECT cc.r, cc.n_r,
               CAST(coalesce(nxt.n_r, 0) AS BIGINT) AS n_next,
               t_tokens,
               CAST((cc.r + 1) * coalesce(nxt.n_r, 0) * 1000000 // cc.n_r AS BIGINT)
                 AS r_star_micro,
               CAST(cc.n_r * ((cc.r + 1) * coalesce(nxt.n_r, 0) * 1000000 // cc.n_r)
                    // t_tokens AS BIGINT) AS p_class_micro
        FROM cc LEFT JOIN cc nxt ON nxt.r = cc.r + 1
        CROSS JOIN tot
        WHERE cc.r <= 20
        ORDER BY cc.r""")),

    // -------------------------------------------------------------------
    // Entropy RATE of the corpus bigram Markov chain — the compression
    // bound per token given one token of context, next to t12's
    // per-doc perplexity and q114's event-type transition matrix:
    //   H(W|V) = −Σ_vw (c_vw/N)·ln(c_vw/c_v),  H(W) = −Σ_w (c_w/N)·ln(c_w/N)
    // and the information one token of context buys = H(W) − H(W|V).
    // Per-term values are quantized to DECIMAL(18,9) (the c07 recipe:
    // identical doubles rounded at 9 digits, then exact decimal sums),
    // so both engines sum identically. Scale: the model is one groupBy
    // over OBSERVED bigrams (never |V|² — the t01 lesson).
    QueryDef("t37_entropy_rate",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("token"))
        val big = toks.alias("a")
          .join(toks.alias("b"),
            col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
          .select(col("a.token").as("v"), col("b.token").as("w"))
          .groupBy("v", "w").agg(count(lit(1)).as("cvw"))
        val left = big.groupBy("v").agg(sum(col("cvw")).as("cv"))
        val tot = big.agg(sum(col("cvw")).as("nb"), countDistinct(col("v")).as("n_states"))
        val hCond = big.join(left, "v").crossJoin(broadcast(tot))
          .select(expr("""CAST(round(-(CAST(cvw AS DOUBLE) / nb)
              * ln(CAST(cvw AS DOUBLE) / cv), 9) AS DECIMAL(18,9))""").as("t"))
          .agg(sum("t").as("h_cond"))
        val uni = toks.groupBy("token").agg(count(lit(1)).as("cw"))
        val utot = uni.agg(sum(col("cw")).as("nt"))
        val hUni = uni.crossJoin(broadcast(utot))
          .select(expr("""CAST(round(-(CAST(cw AS DOUBLE) / nt)
              * ln(CAST(cw AS DOUBLE) / nt), 9) AS DECIMAL(18,9))""").as("t"))
          .agg(sum("t").as("h_uni"))
        tot.crossJoin(hCond).crossJoin(hUni)
          .select(col("nb").as("n_bigrams"), col("n_states"),
            expr("round(CAST(h_cond AS DOUBLE), 6)").as("entropy_rate"),
            expr("round(CAST(h_uni AS DOUBLE), 6)").as("unigram_entropy"),
            expr("round(CAST(h_uni AS DOUBLE) - CAST(h_cond AS DOUBLE), 6)")
              .as("context_info_gain"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, u.i AS pos, toks[u.i] AS token FROM (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            unnest(generate_series(1, len(toks))) AS u(i)),
        big AS (
          SELECT a.token AS v, b.token AS w, count(*) AS cvw
          FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          GROUP BY 1, 2),
        lft AS (SELECT v, CAST(sum(cvw) AS BIGINT) AS cv FROM big GROUP BY v),
        tot AS (SELECT CAST(sum(cvw) AS BIGINT) AS nb,
                       count(DISTINCT v) AS n_states FROM big),
        hc AS (
          SELECT sum(CAST(round(-(CAST(cvw AS DOUBLE) / nb)
                 * ln(CAST(cvw AS DOUBLE) / cv), 9) AS DECIMAL(18,9))) AS h_cond
          FROM big JOIN lft USING (v) CROSS JOIN tot),
        uni AS (SELECT token, count(*) AS cw FROM toks GROUP BY token),
        ut AS (SELECT CAST(sum(cw) AS BIGINT) AS nt FROM uni),
        hu AS (
          SELECT sum(CAST(round(-(CAST(cw AS DOUBLE) / nt)
                 * ln(CAST(cw AS DOUBLE) / nt), 9) AS DECIMAL(18,9))) AS h_uni
          FROM uni CROSS JOIN ut)
        SELECT nb AS n_bigrams, n_states,
               round(CAST(h_cond AS DOUBLE), 6) AS entropy_rate,
               round(CAST(h_uni AS DOUBLE), 6) AS unigram_entropy,
               round(CAST(h_uni AS DOUBLE) - CAST(h_cond AS DOUBLE), 6) AS context_info_gain
        FROM tot CROSS JOIN hc CROSS JOIN hu""")),

    // -------------------------------------------------------------------
    // Greedy bigram generation: from EVERY vocabulary token as a seed,
    // follow argmax p(w|v) for 10 steps — the decode-side twin of the
    // t23/t37 model cards (what a 1-gram-context "LLM" would emit, and
    // a quick probe of the chain's attractor structure: most seeds fall
    // into the same high-frequency cycle). The successor table is
    // argmax by count with LEXICOGRAPHIC tie-break (min(struct(-c, w))
    // — partial-aggregable, deterministic in both engines); generation
    // is 10 chained broadcast joins against the |V|-row successor
    // table (the chain is data-INdependent in length, so the plan is a
    // fixed 10-join tree — no driver iteration state). Dead-end seeds
    // (no outgoing bigram) stop early and report their actual length.
    QueryDef("t38_greedy_generate",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("token"))
        val nxt = toks.alias("a")
          .join(toks.alias("b"),
            col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
          .select(col("a.token").as("v"), col("b.token").as("w"))
          .groupBy("v", "w").agg(count(lit(1)).as("c"))
          .groupBy("v")
          .agg(min(struct((-col("c")).as("nc"), col("w"))).as("m"))
          .select(col("v"), col("m.w").as("nxt"))
        var st = toks.select(col("token")).distinct()
          .select(col("token").as("seed"), col("token").as("cur"),
            col("token").as("gen"), lit(1L).as("n_tokens"))
        for (_ <- 1 to 10) {
          st = st.join(broadcast(nxt), col("cur") === col("v"), "left")
            .select(col("seed"),
              col("nxt").as("cur"),
              when(col("nxt").isNotNull, concat(col("gen"), lit(" "), col("nxt")))
                .otherwise(col("gen")).as("gen"),
              when(col("nxt").isNotNull, col("n_tokens") + 1)
                .otherwise(col("n_tokens")).as("n_tokens"))
        }
        st.select(col("seed"), col("n_tokens"), col("gen").as("generated"))
          .orderBy("seed")
      },
      Some("""
        WITH RECURSIVE toks AS (
          SELECT doc_id, u.i AS pos, toks[u.i] AS token FROM (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            unnest(generate_series(1, len(toks))) AS u(i)),
        big AS (
          SELECT a.token AS v, b.token AS w, count(*) AS c
          FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          GROUP BY 1, 2),
        nxt AS (
          SELECT v, w AS nxt FROM (
            SELECT v, w, row_number() OVER (PARTITION BY v ORDER BY c DESC, w) AS rn
            FROM big) WHERE rn = 1),
        seeds AS (SELECT DISTINCT token AS seed FROM toks),
        walk AS (
          SELECT seed, seed AS cur, seed AS gen, CAST(1 AS BIGINT) AS n_tokens,
                 0 AS step
          FROM seeds
          UNION ALL
          SELECT w.seed, n.nxt,
                 CASE WHEN n.nxt IS NOT NULL THEN w.gen || ' ' || n.nxt ELSE w.gen END,
                 CASE WHEN n.nxt IS NOT NULL THEN w.n_tokens + 1 ELSE w.n_tokens END,
                 w.step + 1
          FROM walk w LEFT JOIN nxt n ON w.cur = n.v
          WHERE w.step < 10 AND w.cur IS NOT NULL)
        SELECT seed, n_tokens, gen AS generated FROM (
          SELECT *, row_number() OVER (PARTITION BY seed ORDER BY step DESC) AS rn
          FROM walk) WHERE rn = 1
        ORDER BY seed""")),

    // Perplexity-based quality filtering (the CCNet / Gopher curation
    // step): score every document by its mean per-token surprisal under
    // the corpus's own unigram LM, then bucket the corpus into quintiles
    // — the pipeline keeps the low-perplexity buckets and drops or
    // down-weights the tail. Determinism: surprisal ln(N/c_t) is
    // quantized to micro-nats ONCE per distinct token (the t22/g17
    // recipe), per-doc sums are exact BIGINT, the mean is round-half-up
    // exact integer division ((2a+n) div 2n), and the quintile ntile
    // runs over the total order (score, doc_id). Scale: one token
    // explode + groupBy (partial agg), the LM join keys on token, the
    // one-row corpus total broadcasts; the ntile's global sort is on
    // doc-granularity rows (at 100 TB: swap ntile for fixed score
    // thresholds learned on a sample — noted, not needed at fixture SF).
    QueryDef("t39_perplexity_filter",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val lm = tok.groupBy("token").agg(count(lit(1)).as("c"))
        val n = lm.agg(sum(col("c")).as("n_total"))
        val sur = lm.crossJoin(n).select(col("token"),
          expr("CAST(round(ln(CAST(n_total AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT)")
            .as("s_micro"))
        val perdoc = tok.join(sur, "token").groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"), sum(col("s_micro")).as("s_sum"))
          .select(col("doc_id"),
            expr("(2 * s_sum + n_toks) div (2 * n_toks)").as("mean_surprisal_micro"))
        val bucketed = perdoc.withColumn("bucket",
          ntile(5).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("mean_surprisal_micro"), col("doc_id"))))
        bucketed.groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            min(col("mean_surprisal_micro")).as("min_score"),
            max(col("mean_surprisal_micro")).as("max_score"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        lm AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        n AS (SELECT sum(c) AS n_total FROM lm),
        sur AS (
          SELECT token,
                 CAST(round(ln(CAST(n_total AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT) AS s_micro
          FROM lm CROSS JOIN n),
        perdoc AS (
          SELECT doc_id,
                 CAST((2 * sum(s_micro) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS mean_surprisal_micro
          FROM tok JOIN sur USING (token) GROUP BY doc_id),
        bucketed AS (
          SELECT doc_id, mean_surprisal_micro,
                 ntile(5) OVER (ORDER BY mean_surprisal_micro, doc_id) AS bucket
          FROM perdoc)
        SELECT bucket, count(*) AS n_docs,
               min(mean_surprisal_micro) AS min_score,
               max(mean_surprisal_micro) AS max_score
        FROM bucketed GROUP BY bucket ORDER BY bucket""")),

    // Dunning log-likelihood keyness (G2) per source: which tokens are
    // statistically OVER/UNDER-represented in each source vs the rest of
    // the corpus — the corpus-linguistics test behind boilerplate and
    // domain-signature detection (more robust than PMI at low counts,
    // unlike the chi-square it is safe when expected counts are small).
    // G2 = 2*(a·ln(a/Ea) + b·ln(b/Eb)) with a/b the in/out counts and
    // Ea/Eb the source-size-proportional expectations; zero cells
    // contribute zero. Every factor of every ln argument is a BIGINT
    // cast to double (exact below 2^53), the whole score is ONE
    // expression with identical text in both engines, micro-quantized
    // once, and ranked with a token tie-break. Scale: one token explode
    // + two partial-agg groupBys; the per-source top-5 is a bounded
    // window over (sources x vocab) rows.
    QueryDef("t40_llr_keyness",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
        val st = tok.groupBy("source", "token").agg(count(lit(1)).as("a"))
        val tt = tok.groupBy("token").agg(count(lit(1)).as("ab"))
        val ss = tok.groupBy(col("source").as("src")).agg(count(lit(1)).as("ra"))
        val n = tok.agg(count(lit(1)).as("nn"))
        val g2 =
          """CAST(round(2000000 * (
            |  CASE WHEN a = 0 THEN CAST(0 AS DOUBLE)
            |       ELSE CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE) * CAST(nn AS DOUBLE)
            |              / (CAST(ra AS DOUBLE) * CAST(ab AS DOUBLE))) END
            |  +
            |  CASE WHEN ab - a = 0 THEN CAST(0 AS DOUBLE)
            |       ELSE CAST(ab - a AS DOUBLE) * ln(CAST(ab - a AS DOUBLE) * CAST(nn AS DOUBLE)
            |              / (CAST(nn - ra AS DOUBLE) * CAST(ab AS DOUBLE))) END
            |  ), 0) AS BIGINT)""".stripMargin
        val scored = st
          .join(tt, "token")
          .join(ss, col("source") === col("src"))
          .crossJoin(n)
          .select(col("source"), col("token"), col("a").as("cnt_in"),
            (col("ab") - col("a")).as("cnt_out"),
            expr(g2).as("g2_micro"),
            expr("a * (nn - ra) > (ab - a) * ra").as("overrepresented"))
        scored.withColumn("key_rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")
            .orderBy(col("g2_micro").desc, col("token"))))
          .filter(col("key_rank") <= 5)
          .orderBy("source", "key_rank")
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        st AS (SELECT source, token, count(*) AS a FROM tok GROUP BY source, token),
        tt AS (SELECT token, count(*) AS ab FROM tok GROUP BY token),
        ss AS (SELECT source AS src, count(*) AS ra FROM tok GROUP BY source),
        n AS (SELECT count(*) AS nn FROM tok),
        scored AS (
          SELECT source, token, a AS cnt_in, ab - a AS cnt_out,
                 CAST(round(2000000 * (
                   CASE WHEN a = 0 THEN CAST(0 AS DOUBLE)
                        ELSE CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE) * CAST(nn AS DOUBLE)
                               / (CAST(ra AS DOUBLE) * CAST(ab AS DOUBLE))) END
                   +
                   CASE WHEN ab - a = 0 THEN CAST(0 AS DOUBLE)
                        ELSE CAST(ab - a AS DOUBLE) * ln(CAST(ab - a AS DOUBLE) * CAST(nn AS DOUBLE)
                               / (CAST(nn - ra AS DOUBLE) * CAST(ab AS DOUBLE))) END
                   ), 0) AS BIGINT) AS g2_micro,
                 a * (nn - ra) > (ab - a) * ra AS overrepresented
          FROM st JOIN tt USING (token) JOIN ss ON source = src CROSS JOIN n)
        SELECT source, token, cnt_in, cnt_out, g2_micro, overrepresented,
               key_rank
        FROM (
          SELECT *, row_number() OVER (PARTITION BY source
                      ORDER BY g2_micro DESC, token) AS key_rank
          FROM scored)
        WHERE key_rank <= 5
        ORDER BY source, key_rank"""))
  )

  /** Shared lang-id model + per-doc prediction (the t01 pipeline minus
    * the final sort): observed-pair affinities in micro-nats, analytic
    * smoothing mass, argmax per doc. t27's confusion matrix reuses it.
    */
  private def langIdPredict(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("token"))
        // model build: ONE aggregation of the exploded stream (observed
        // (lang, token) counts — never a materialized |langs| x |vocab|
        // table), materialized once via localCheckpoint. Every model
        // derivation below (per-lang totals, vocab size, affinities,
        // smoothing mass) references this table, and Spark expands each
        // DataFrame reference into its own subtree (exchange reuse does
        // not collapse them here) — without the checkpoint the corpus
        // explode ran SIX times per query. The checkpointed table is
        // model-sized (observed pairs), not corpus-sized, so the
        // materialization is as bounded as k-means' centroid state.
        val ltc = tok.groupBy(col("lang").as("l"), col("token").as("t"))
          .agg(count(lit(1)).as("c_tl"))
          .localCheckpoint()
        val lc = ltc.groupBy(col("l").as("l2")).agg(sum(col("c_tl")).as("c_l"))
        val vsize = ltc.agg(countDistinct(col("t")).as("v_sz"))
        // affinities quantized to MICRO-NATS AS BIGINT — the same 6-decimal
        // quantization as CAST(round(ln(...), 6) AS DECIMAL(18,6)) (scores
        // differ by the constant 1e6 factor, so the argmax is identical),
        // but per-token sums run in codegen'd long arithmetic instead of
        // the BigDecimal path (precision 28 sums leave Decimal's
        // long-backed fast path). No overflow: |aff_u| < 4e7 and a doc has
        // < 2^44 / 4e7 tokens by a wide margin.
        val langmiss = lc.crossJoin(broadcast(vsize))
          .select(col("l2").as("cand"),
            expr("CAST(round(ln(1.0 / (c_l + v_sz)) * 1e6, 0) AS BIGINT)").as("miss"))
        val aff = ltc.join(broadcast(lc), col("l") === col("l2"))
          .crossJoin(broadcast(vsize))
          .select(col("l"), col("t"),
            expr("CAST(round(ln((c_tl + 1.0) / (c_l + v_sz)) * 1e6, 0) AS BIGINT)").as("aff"))
        // per-doc token count comes NARROWLY from the text column (no
        // doc-grain shuffle); the only doc-grain aggregation is the
        // present-token score sum, whose join AQE broadcasts while the
        // model is small and shuffles on token once it is not
        val docstats = docs.select(col("doc_id").as("sdoc"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        // broadcast pinned: the checkpointed model is a stats-less
        // LogicalRDD the planner would otherwise size-estimate as huge
        // and sort-merge the whole corpus against. A lang-id affinity
        // model is broadcast-sized by nature (observed pairs, quantized);
        // at an extreme vocabulary drop the hint and shuffle on token.
        val pres = tok.join(broadcast(aff), col("token") === col("t"))
          .groupBy(col("doc_id").as("pdoc"), col("l").as("pcand"))
          .agg(sum(col("aff")).as("psum"), count(lit(1)).as("npres"))
        val scored = docstats.crossJoin(broadcast(langmiss))
          .join(pres, col("sdoc") === col("pdoc") && col("cand") === col("pcand"), "left")
          .select(col("sdoc").as("doc_id"), col("cand"),
            expr("coalesce(psum, 0L) + (n_tok - coalesce(npres, 0L)) * miss").as("score"))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select(col("doc_id"), col("lang").as("true_lang"),
            col("cand").as("pred_lang"), (col("cand") === col("lang")).as("correct"))

  }

  /** DuckDB CTE chain for [[langIdPredict]], ending in
    * `pred(doc_id, true_lang, pred_lang, correct)`.
    */
  private val langIdOracleCtes: String = """tok AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
        ltc AS (SELECT lang AS l, token AS t, count(*) AS c_tl FROM tok GROUP BY 1, 2),
        lc AS (SELECT lang AS l2, count(*) AS c_l FROM tok GROUP BY 1),
        vsize AS (SELECT count(DISTINCT token) AS v_sz FROM tok),
        langmiss AS (
          SELECT l2 AS cand,
                 CAST(round(ln(1.0 / (c_l + v_sz)) * 1e6, 0) AS BIGINT) AS miss
          FROM lc CROSS JOIN vsize),
        aff AS (
          SELECT l, t,
                 CAST(round(ln((c_tl + 1.0) / (c_l + v_sz)) * 1e6, 0) AS BIGINT) AS aff
          FROM ltc JOIN lc ON l = l2 CROSS JOIN vsize),
        docstats AS (
          SELECT doc_id AS sdoc, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents),
        pres AS (
          SELECT doc_id AS pdoc, l AS pcand,
                 sum(aff) AS psum, count(*) AS npres
          FROM tok JOIN aff ON token = t
          GROUP BY 1, 2),
        scored AS (
          SELECT sdoc AS doc_id, cand,
                 coalesce(psum, 0)
                 + (n_tok - coalesce(npres, 0)) * miss AS score
          FROM docstats CROSS JOIN langmiss
          LEFT JOIN pres ON sdoc = pdoc AND cand = pcand),
        best AS (
          SELECT doc_id, cand,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
          FROM scored),
        pred AS (
          SELECT d.doc_id, d.lang AS true_lang, b.cand AS pred_lang,
                 b.cand = d.lang AS correct
          FROM best b JOIN documents d ON b.doc_id = d.doc_id
          WHERE b.rn = 1)"""
}
