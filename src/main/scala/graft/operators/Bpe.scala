package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — THE tokenizer-construction step of an LLM data pipeline,
  * run here as two oracle-checked queries over `documents`:
  *
  *  - `t18_bpe_train`: learn the first [[Rounds]] merges. Each round
  *    counts corpus-weighted adjacent-symbol pairs and merges the
  *    globally most frequent one (ties broken lexically).
  *  - `t19_bpe_encode`: apply the learned merge chain to every document
  *    and report per-doc token counts + the compression ratio vs the
  *    character baseline.
  *
  * Cross-engine determinism hinges on the symbol representation: a
  * word is the delimited string `"(t)(h)(e)(_)"` (with `(_)` the
  * end-of-word marker), so one literal, non-overlapping, left-to-right
  * `replace(seq, "(l)(r)", "(lr)")` — identical semantics in Spark and
  * DuckDB — IS the canonical greedy BPE merge, with the parens ruling
  * out cross-symbol boundary matches (`(lo)(w)` cannot match inside
  * `(flo)(w)`). The DuckDB oracle unrolls the training loop as a CTE
  * chain built by the same Scala code path ([[trainSqlCtes]]), the same
  * way `LaplaceOracle` unrolls the SOR sweep.
  *
  * Scale design (100 TB): training never iterates over the corpus —
  * round 0 reduces it to the DISTINCT-WORD frequency table (vocab-sized,
  * the standard BPE trick) and every round's pair count + merge runs
  * over that table only; the per-round driver collect is ONE row (the
  * k-means centroid contract). Encoding is a broadcast join of the
  * vocab-sized `word -> n_tokens` map against the corpus — one narrow
  * pass, no shuffle of document text.
  */
object Bpe {

  /** Number of merges learned — enough to exercise multi-char symbol
    * merges (round 6 merges the round-1 output "er" with "_").
    */
  val Rounds = 8

  /** Symbol-extraction regex: one capture per "(sym)". */
  private val SymRe = "\\(([^)]+)\\)"

  /** Distinct corpus words with counts and the delimited symbol seq. */
  private def words(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ", -1)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("seq",
        concat(lit("("),
          array_join(regexp_extract_all(col("word"), lit("."), lit(0)), ")("),
          lit(")(_)")))

  /** Corpus-weighted adjacent-symbol pairs of the current vocab state. */
  private def pairs(w: DataFrame): DataFrame =
    w.withColumn("syms", regexp_extract_all(col("seq"), lit(SymRe), lit(1)))
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS lhs, element_at(syms, i + 1) AS rhs))")).as("p"))
      .select(col("cnt"), col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))

  final case class Merge(round: Int, lhs: String, rhs: String, pairCount: Long)

  /** Learn `rounds` merges; returns them, the final vocab state
    * (word, cnt, seq), and the lineage caches still pinned when the loop
    * exits (for the caller to unpersist once it has materialized what it
    * needs). Symbols are lowercase letters and `_` only, so embedding
    * them in the replace literal is injection-safe.
    */
  private[operators] def train(s: SparkSession, d: String, rounds: Int)
      : (Seq[Merge], DataFrame, Seq[DataFrame]) = {
    // Iterative-lineage management: without periodic materialization,
    // round k's pair scan re-runs all k-1 prior replaces over the base
    // (O(rounds^2) replace evaluations total — the classic iterative-
    // algorithm lineage blowup). Caching EVERY round pays a vocab-table
    // cache write per round, which bench showed costs more than the
    // <cacheEvery re-evaluations it saves; so the state is cached every
    // `cacheEvery` rounds — lineage depth stays bounded (<cacheEvery
    // narrow replaces above the last materialized state, O(rounds) total
    // work) at a quarter of the cache-write traffic. No extra
    // materializing action is spent: a cache round's own top-pair collect
    // fills the fresh cache, and only then is the PREVIOUS materialized
    // state (now shielded by a newer one) unpersisted — unpersisting
    // earlier would recompute the whole chain from the base.
    val cacheEvery = 4
    var w = words(s, d).cache()
    var lastCached = w
    var pendingCache: Option[org.apache.spark.sql.DataFrame] = None
    val merges = Seq.newBuilder[Merge]
    for (k <- 1 to rounds) {
      val top = pairs(w)
        .groupBy("lhs", "rhs").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1).collect()(0)
      if (pendingCache.exists(_ eq w)) {
        lastCached.unpersist()
        lastCached = w
        pendingCache = None
      }
      val (l, r) = (top.getString(0), top.getString(1))
      // enforced, not assumed: a quote/paren/backslash in a symbol would
      // corrupt the interpolated replace literal below
      require((l + r).forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'),
        s"BPE symbol outside [a-z0-9_]: '$l' + '$r' — unsafe to interpolate into replace()")
      merges += Merge(k, l, r, top.getLong(2))
      val next = w.withColumn("seq", expr(s"replace(seq, '($l)($r)', '($l$r)')"))
      w = if (k % cacheEvery == 0) { val c = next.cache(); pendingCache = Some(c); c }
        else next
    }
    (merges.result(), w, (Seq(lastCached) ++ pendingCache).distinct)
  }

  /** [[train]] through the session memo: a tokenizer is trained ONCE and
    * applied everywhere — t18/t19/t34 all need the same merge chain, and
    * a bench session executes each of them 4x, so the 8-round driver
    * loop ran 12x per session and left each run's two lineage caches
    * pinned for the life of the JVM (the r7 block-accumulation class).
    * The final vocab state and the 8-row merge table are memoized
    * ([[Dedup.shared]] localCheckpoints eagerly), after which a fresh
    * training's own caches are unpersisted — the memo checkpoint is the
    * only surviving state.
    */
  private def trainShared(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    var fresh: Option[(Seq[Merge], DataFrame, Seq[DataFrame])] = None
    def trained = fresh.getOrElse {
      val t = train(s, d, Rounds); fresh = Some(t); t
    }
    val mergesDf = Dedup.shared(s, d, "bpeMerges") {
      val sp = s
      import sp.implicits._
      trained._1.map(m => (m.round, m.lhs, m.rhs, m.pairCount))
        .toDF("round", "lhs", "rhs", "pair_count")
    }
    val vocab = Dedup.shared(s, d, "bpeVocab")(trained._2)
    fresh.foreach(_._3.foreach(_.unpersist()))
    // frames, not a collected Seq: t18 (the only merges consumer)
    // derives its output directly, so t19/t34 never pay a merges job
    (mergesDf, vocab)
  }

  // ------------------------------------------------------------------
  // DuckDB oracle: the training loop unrolled as a CTE chain.

  private val OSymRe = "\\(([^)]+)\\)"

  private def wordsSql: String =
    """SELECT word, count(*) AS cnt,
      '(' || array_to_string(regexp_extract_all(word, '.'), ')(') || ')(_)' AS seq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word"""

  /** CTE chain w0, (p1, t1, w1), ... (pK, tK, wK): pair counts, the
    * round's winning merge, the merged vocab state.
    */
  private def trainSqlCtes(rounds: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"w0 AS ($wordsSql)"
    for (k <- 1 to rounds) {
      ctes += s"""p$k AS (
        SELECT syms[u.i] AS lhs, syms[u.i + 1] AS rhs, sum(cnt) AS c
        FROM (SELECT cnt, regexp_extract_all(seq, '$OSymRe', 1) AS syms FROM w${k - 1}) x,
             UNNEST(generate_series(1, len(syms) - 1)) AS u(i)
        GROUP BY 1, 2)"""
      ctes += s"t$k AS (SELECT lhs, rhs, c FROM p$k ORDER BY c DESC, lhs, rhs LIMIT 1)"
      ctes += s"""w$k AS (
        SELECT word, cnt,
               replace(seq, '(' || lhs || ')(' || rhs || ')', '(' || lhs || rhs || ')') AS seq
        FROM w${k - 1} CROSS JOIN t$k)"""
    }
    "WITH " + ctes.result().mkString(",\n")
  }

  private def trainSql(rounds: Int): String =
    trainSqlCtes(rounds) + "\n" +
      (1 to rounds).map(k =>
        s"SELECT CAST($k AS INT) AS round, lhs, rhs, lhs || rhs AS merged, " +
          s"CAST(c AS BIGINT) AS pair_count FROM t$k")
        .mkString("\nUNION ALL\n") +
      "\nORDER BY round"

  private def encodeSql(rounds: Int): String =
    trainSqlCtes(rounds) + s""",
      enc AS (
        SELECT word, CAST(len(regexp_extract_all(seq, '$OSymRe', 1)) AS BIGINT) AS n_toks
        FROM w$rounds),
      dw AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      agg AS (
        SELECT doc_id, count(*) AS n_words, sum(len(word) + 1) AS n_base_syms,
               sum(n_toks) AS n_tokens
        FROM dw JOIN enc USING (word) WHERE word <> '' GROUP BY doc_id)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_base_syms AS BIGINT) AS n_base_syms,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(n_base_syms AS DOUBLE) AS compression
    FROM agg ORDER BY doc_id"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("t18_bpe_train",
      (s, d) => {
        trainShared(s, d)._1
          .select(col("round"), col("lhs"), col("rhs"),
            concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
          .orderBy("round")
      },
      Some(trainSql(Rounds))),

    QueryDef("t19_bpe_encode",
      (s, d) => {
        val (_, vocab) = trainShared(s, d)
        // vocab-sized map word -> token count after the merge chain
        val enc = vocab.withColumn("n_toks",
          size(regexp_extract_all(col("seq"), lit(SymRe), lit(1))).cast("long"))
          .select(col("word"), col("n_toks"))
        Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
          .filter(col("word") =!= "")
          .join(broadcast(enc), "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum(length(col("word")) + 1).cast("long").as("n_base_syms"),
            sum(col("n_toks")).as("n_tokens"))
          .select(col("doc_id"), col("n_words"), col("n_base_syms"), col("n_tokens"),
            (col("n_tokens").cast("double") / col("n_base_syms").cast("double"))
              .as("compression"))
          .orderBy("doc_id")
      },
      Some(encodeSql(Rounds))),

    // -------------------------------------------------------------------
    // Tokenizer fertility card per language (the cross-lingual-equity
    // metric tokenizer teams publish): words per language encoded with
    // the t18-trained BPE merges, fertility = tokens per word and
    // bytes-per-token as EXACT ppm/micro integer divisions of the
    // aggregated counts. A lang whose fertility runs high pays more
    // sequence length for the same text — the signal that drives vocab
    // rebalancing. Reuses the broadcast vocab->token-count map (t19's
    // shape); one groupBy(lang).
    QueryDef("t34_tokenizer_fertility",
      (s, d) => {
        val (_, vocab) = trainShared(s, d)
        val enc = vocab.withColumn("n_toks",
          size(regexp_extract_all(col("seq"), lit(SymRe), lit(1))).cast("long"))
          .select(col("word"), col("n_toks"))
        Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ", -1)).as("word"))
          .filter(col("word") =!= "")
          .join(broadcast(enc), "word")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"),
            sum(length(col("word"))).cast("long").as("n_bytes"),
            sum(col("n_toks")).as("n_tokens"))
          .select(col("lang"), col("n_words"), col("n_bytes"), col("n_tokens"),
            expr("1000000 * n_tokens div n_words").as("fertility_ppm"),
            expr("1000000 * n_bytes div n_tokens").as("bytes_per_token_micro"))
          .orderBy("lang")
      },
      Some(trainSqlCtes(Rounds) + s""",
      enc AS (
        SELECT word, CAST(len(regexp_extract_all(seq, '$OSymRe', 1)) AS BIGINT) AS n_toks
        FROM w$Rounds),
      lw AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
      agg AS (
        SELECT lang, count(*) AS n_words, sum(len(word)) AS n_bytes,
               sum(n_toks) AS n_tokens
        FROM lw JOIN enc USING (word) WHERE word <> '' GROUP BY lang)
    SELECT lang, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           1000000 * CAST(n_tokens AS BIGINT) // n_words AS fertility_ppm,
           1000000 * CAST(n_bytes AS BIGINT) // CAST(n_tokens AS BIGINT) AS bytes_per_token_micro
    FROM agg ORDER BY lang"""))
  )
}
