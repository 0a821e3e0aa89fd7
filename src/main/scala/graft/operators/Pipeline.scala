package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond dedup/similarity (north star
  * §2.3): the corpus-assembly steps between "deduplicated documents" and
  * "token stream on the trainer" — sequence packing, eval-set
  * decontamination, deterministic train/val/test splitting, and domain
  * (source) mixture rebalancing. All four are oracle-checked in DuckDB;
  * every float that reaches the output is a single division of exact
  * integer aggregates (partitioning-invariant, see [[Ns]]).
  *
  * Scale design (100 TB):
  *  - packing is a per-shard window cumsum (shuffle on the shard key,
  *    linear in rows, no global coordination);
  *  - decontamination is a shingle equi-join (the d04 shape): the corpus
  *    shuffles on the shingle string, never materializing pairs beyond
  *    bucket fan-out;
  *  - splitting/mixing are hash-mod projections + one partial agg.
  */
object Pipeline {

  /** Tokens = whitespace split, the t03 convention. */
  private val NTOK = "CAST(size(split(text, ' ')) AS BIGINT)"
  private val ONTOK = "CAST(len(string_split(text, ' ')) AS BIGINT)"

  private val PACK_BUDGET = 512

  def defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Sequence packing (concat-then-chunk): documents are concatenated in
    // doc_id order within each lang shard and cut into fixed
    // PACK_BUDGET-token training sequences; each doc reports the pack its
    // first token lands in and the offset inside it. The cumsum is
    // integer-exact, so pack assignment is identical on any cluster —
    // and it runs as a GROUPED Prefix.orderStats two-pass prefix scan
    // (each lang shard is corpus-sized: a plain partitionBy window
    // would pack every shard in ONE task); at 100 TB the shard key
    // becomes a hash bucket instead of lang, same plan.
    QueryDef("p01_sequence_packing",
      (s, d) => {
        Prefix.orderStats(
            Tables.documents(s, d)
              .select(col("doc_id"), col("lang"), expr(NTOK).as("n_tokens")),
            Seq(col("doc_id")), group = Seq("lang"),
            cumSumsExclusive = Seq(("n_tokens", "cum")))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            expr(s"cum div $PACK_BUDGET").as("pack_id"),
            expr(s"cum % $PACK_BUDGET").as("pack_offset"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, lang, $ONTOK AS n_tokens FROM documents),
        c AS (
          SELECT doc_id, lang, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
          FROM t)
        SELECT doc_id, lang, n_tokens,
               cum // $PACK_BUDGET AS pack_id,
               cum % $PACK_BUDGET AS pack_offset
        FROM c
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Eval-set decontamination: a deterministic ~5% hash-sample of the
    // corpus plays the eval set; any training doc sharing >= 1 distinct
    // 3-token shingle with any eval doc is flagged with its overlap
    // counts. The join shuffles on the shingle string (high cardinality,
    // naturally balanced) — the d04 blocking shape, so cost is bounded by
    // shingle-bucket fan-out, not |train| x |eval|.
    QueryDef("p02_decontamination",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(expr(
              "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("sh"))
          .withColumn("is_eval",
            expr(s"${Ns.hash60("concat('eval:', CAST(doc_id AS STRING))")} % 20 = 0"))
        val ev = sh.filter(col("is_eval"))
          .select(col("sh").as("sh_e"), col("doc_id").as("eval_id"))
        val tr = sh.filter(!col("is_eval")).select(col("doc_id"), col("sh"))
        tr.join(ev, col("sh") === col("sh_e"))
          .groupBy("doc_id")
          .agg(countDistinct(col("sh")).as("n_shared_shingles"),
            countDistinct(col("eval_id")).as("n_eval_docs"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh,
                 ${Ns.oHash60("'eval:' || CAST(doc_id AS VARCHAR)")} % 20 = 0 AS is_eval
          FROM t WHERE len(toks) >= 3)
        SELECT tr.doc_id,
               count(DISTINCT tr.sh) AS n_shared_shingles,
               count(DISTINCT ev.eval_id) AS n_eval_docs
        FROM (SELECT doc_id, sh FROM sh WHERE NOT is_eval) tr
        JOIN (SELECT sh, doc_id AS eval_id FROM sh WHERE is_eval) ev
          ON tr.sh = ev.sh
        GROUP BY tr.doc_id
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Deterministic stratified train/val/test split: md5 hash-mod 10 on
    // doc_id (8/1/1), reported per (lang, split) with exact within-lang
    // fractions. Reproducible across runs, engines and cluster sizes —
    // the property ablations need; a narrow projection + one partial agg.
    QueryDef("p03_stratified_split",
      (s, d) => {
        val wl = Window.partitionBy("lang")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), expr(NTOK).as("n_tokens"))
          .withColumn("h",
            expr(s"${Ns.hash60("concat('split:', CAST(doc_id AS STRING))")} % 10"))
          .withColumn("split",
            when(col("h") < 8, "train").when(col("h") === 8, "val").otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
          .withColumn("frac_docs",
            round(col("n_docs").cast("double") / sum(col("n_docs")).over(wl), 6))
          .orderBy("lang", "split")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, lang, $ONTOK AS n_tokens,
                 ${Ns.oHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 10 AS h
          FROM documents),
        s AS (
          SELECT lang,
                 CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split,
                 n_tokens
          FROM t),
        g AS (
          SELECT lang, split, count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM s GROUP BY lang, split)
        SELECT lang, split, n_docs, n_tokens,
               round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang), 6) AS frac_docs
        FROM g
        ORDER BY lang, split""")),

    // -------------------------------------------------------------------
    // Domain (source) mixture rebalancing: per-source token shares vs a
    // uniform target (1/20 per source), and the downsampling rate that
    // hits the target. Shares are one double division of exact integer
    // sums; one partial agg + a broadcast-sized window over 20 rows.
    QueryDef("p04_domain_mix",
      (s, d) => {
        val wAll = Window.partitionBy()
        Tables.documents(s, d)
          .select(col("source"), expr(NTOK).as("n_tokens"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
          .withColumn("total", sum(col("n_tokens")).over(wAll))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            round(col("n_tokens").cast("double") / col("total"), 6).as("token_share"),
            expr("CAST(0.05 AS DOUBLE)").as("target_share"),
            round(least(lit(1.0),
              expr("CAST(0.05 AS DOUBLE)") * col("total") / col("n_tokens")), 6)
              .as("sampling_rate"))
          .orderBy("source")
      },
      Some(s"""
        WITH g AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum($ONTOK) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        t AS (SELECT source, n_docs, n_tokens,
                     CAST(sum(n_tokens) OVER () AS BIGINT) AS total FROM g)
        SELECT source, n_docs, n_tokens,
               round(CAST(n_tokens AS DOUBLE) / total, 6) AS token_share,
               CAST(0.05 AS DOUBLE) AS target_share,
               round(least(CAST(1.0 AS DOUBLE),
                 CAST(0.05 AS DOUBLE) * total / n_tokens), 6) AS sampling_rate
        FROM t
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Deterministic global shuffle + shard assignment: the trainer-facing
    // corpus ordering. Hashing the doc id gives a reproducible
    // pseudo-random permutation (same on every run, every cluster size);
    // shard = hash mod NSHARDS is the output-file assignment and pos the
    // within-shard read order. At 100 TB this is one repartition on the
    // shard key + one per-shard sort (no global sort, no driver state) —
    // exactly the write pattern of `repartition($"shard").sortWithin
    // Partitions($"h")`.
    QueryDef("p05_shuffle_shard",
      (s, d) => {
        val w = Window.partitionBy("shard").orderBy("h", "doc_id")
        Tables.documents(s, d)
          .select(col("doc_id"), expr(Ns.hash60("CAST(doc_id AS STRING)")).as("h"))
          .withColumn("shard", pmod(col("h"), lit(8L)).cast("int"))
          .withColumn("pos", row_number().over(w).cast("int"))
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id, shard, pos FROM (
          SELECT doc_id, CAST(h % 8 AS INT) AS shard,
                 CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INT) AS pos
          FROM (SELECT doc_id, ${Ns.oHash60("CAST(doc_id AS VARCHAR)")} AS h FROM documents))
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Incremental dedup: admit a new crawl batch (doc_id >= 400) against
    // yesterday's corpus (doc_id < 400) — the daily-increment shape of a
    // production dedup service. Cross-corpus check is a LEFT SEMI-shaped
    // join on 32-byte sha256 hashes only (at 100 TB the historical side
    // is a hash index, never the texts); within-batch dedup is a window
    // min per hash. Every new doc leaves with a status and its
    // canonical duplicate source.
    QueryDef("p06_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        val existing = docs.filter(col("doc_id") < 400)
          .groupBy("h").agg(min(col("doc_id")).as("existing_id"))
        val batch = docs.filter(col("doc_id") >= 400)
        val w = Window.partitionBy("h")
        batch
          .join(existing, Seq("h"), "left")
          .withColumn("batch_min", min(col("doc_id")).over(w))
          .select(col("doc_id"), col("h").as("text_hash"),
            when(col("existing_id").isNotNull, lit("dup_of_existing"))
              .when(col("doc_id") =!= col("batch_min"), lit("dup_in_batch"))
              .otherwise(lit("accepted")).as("status"),
            coalesce(col("existing_id"),
              when(col("doc_id") =!= col("batch_min"), col("batch_min"))).as("dup_of"))
          .orderBy("doc_id")
      },
      Some("""
        WITH h AS (SELECT doc_id, sha256(text) AS h FROM documents),
        existing AS (
          SELECT h, min(doc_id) AS existing_id FROM h WHERE doc_id < 400 GROUP BY h),
        batch AS (
          SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS batch_min
          FROM h WHERE doc_id >= 400)
        SELECT b.doc_id, b.h AS text_hash,
               CASE WHEN e.existing_id IS NOT NULL THEN 'dup_of_existing'
                    WHEN b.doc_id <> b.batch_min THEN 'dup_in_batch'
                    ELSE 'accepted' END AS status,
               coalesce(e.existing_id,
                 CASE WHEN b.doc_id <> b.batch_min THEN b.batch_min END) AS dup_of
        FROM batch b LEFT JOIN existing e ON b.h = e.h
        ORDER BY b.doc_id""")),

    // -------------------------------------------------------------------
    // Composite quality filter (the Gopher-rules family as a keep/drop
    // decision with machine-readable reasons): token-count range,
    // duplicate-bigram fraction, top-token dominance, mean word length.
    // Pure narrow per-row arithmetic over exact integer counts — zero
    // shuffle before the presentation sort; the reasons string is
    // concat_ws, which skips NULL arms identically in both engines.
    QueryDef("p07_quality_filter",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n", size(col("toks")))
        .withColumn("bg", expr(
          "transform(sequence(0, n - 2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
        .withColumn("dup_bg", expr(
          "CAST(size(bg) - size(array_distinct(bg)) AS DOUBLE) / size(bg)"))
        .withColumn("top_frac", expr(
          """CAST(array_max(transform(array_distinct(toks),
             t -> size(filter(toks, x -> x = t)))) AS DOUBLE) / n"""))
        .withColumn("mwl", expr(
          "CAST(n_chars - (n - 1) AS DOUBLE) / n"))
        .select(col("doc_id"),
          concat_ws(",",
            when(col("n") < 5, lit("too_short")),
            when(col("n") > 1000, lit("too_long")),
            when(col("dup_bg") > 0.4, lit("repetitive")),
            when(col("top_frac") > 0.2, lit("dominated")),
            when(col("mwl") < 3.0 || col("mwl") > 12.0, lit("odd_word_len")))
            .as("reasons"))
        .withColumn("keep", col("reasons") === "")
        .select(col("doc_id"), col("keep"), col("reasons"))
        .orderBy("doc_id"),
      Some("""
        WITH t AS (
          SELECT doc_id, n_chars, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents),
        m AS (
          SELECT doc_id, n,
                 CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) AS dup_bg,
                 CAST(list_max(list_transform(list_distinct(toks),
                   x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / n AS top_frac,
                 CAST(n_chars - (n - 1) AS DOUBLE) / n AS mwl
          FROM (SELECT doc_id, n_chars, toks, n,
                       list_transform(generate_series(1, n - 1),
                         i -> concat_ws(' ', toks[i], toks[i+1])) AS bg
                FROM t)),
        r AS (
          SELECT doc_id,
                 concat_ws(',',
                   CASE WHEN n < 5 THEN 'too_short' END,
                   CASE WHEN n > 1000 THEN 'too_long' END,
                   CASE WHEN dup_bg > 0.4 THEN 'repetitive' END,
                   CASE WHEN top_frac > 0.2 THEN 'dominated' END,
                   CASE WHEN mwl < 3.0 OR mwl > 12.0 THEN 'odd_word_len' END) AS reasons
          FROM m)
        SELECT doc_id, reasons = '' AS keep, reasons
        FROM r
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Curriculum / quality-weighted sampling: documents are kept with a
    // probability proportional to a quality tier (longer docs here as
    // the stand-in signal), decided by comparing the 60-bit doc hash
    // against the tier's rate — the deterministic coin-flip of q23
    // weighted per tier. Reproducible on any cluster AND incremental:
    // re-running on a grown corpus keeps exactly the same decisions for
    // old docs. Pure narrow projection + one partial-agg report.
    QueryDef("p08_curriculum_sample",
      (s, d) => {
        val rate = "CASE WHEN n_chars >= 300 THEN 90 WHEN n_chars >= 150 THEN 50 ELSE 20 END"
        Tables.documents(s, d)
          .withColumn("tier", expr(
            "CASE WHEN n_chars >= 300 THEN 'hi' WHEN n_chars >= 150 THEN 'mid' ELSE 'lo' END"))
          .withColumn("kept", expr(
            s"${Ns.hash60("CAST(doc_id AS STRING)")} % 100 < $rate"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .select(col("tier"), col("n_docs"), col("n_kept"),
            round(col("n_kept").cast("double") / col("n_docs"), 6).as("kept_frac"))
          .orderBy("tier")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN n_chars >= 300 THEN 'hi' WHEN n_chars >= 150 THEN 'mid' ELSE 'lo' END AS tier,
                 ${Ns.oHash60("CAST(doc_id AS VARCHAR)")} % 100 <
                   CASE WHEN n_chars >= 300 THEN 90 WHEN n_chars >= 150 THEN 50 ELSE 20 END AS kept
          FROM documents)
        SELECT tier, count(*) AS n_docs,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               round(CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS kept_frac
        FROM t
        GROUP BY tier
        ORDER BY tier""")),

    // -------------------------------------------------------------------
    // Vocabulary pruning / OOV-rate audit: the tokenizer-coverage pass a
    // training pipeline runs before committing to a vocab. The corpus
    // vocabulary is every token with relative frequency >= 0.1% (the
    // integer-exact comparison 1000·count >= total avoids a float
    // threshold and makes the cut scale-invariant — a fixed absolute
    // count would silently change meaning between sf0.01 and 100 TB);
    // each document then reports its occurrence-weighted OOV rate and a
    // keep/flag decision at 10%. Plan shape: one explode + token-count
    // groupBy (map-side combine), the vocab joined back BROADCAST (its
    // size is bounded by 1000 by construction — at most 1/0.001 tokens
    // can clear a 0.1% bar), one per-doc agg. No shuffle carries texts.
    QueryDef("p09_vocab_prune",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val counts = tok.groupBy("token").agg(count(lit(1)).as("n"))
        // corpus total as a broadcast scalar, NOT a global window (which
        // would shuffle every token count into one partition)
        val total = counts.agg(sum(col("n")).as("total"))
        val vocab = counts.crossJoin(broadcast(total))
          .filter(col("n") * 1000 >= col("total")).select("token")
        val perDoc = tok.join(broadcast(vocab.withColumn("in_vocab", lit(true))),
            Seq("token"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        perDoc
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
          .withColumn("keep", col("n_oov") * 10 < col("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        vocab AS (
          SELECT token FROM counts
          WHERE n * 1000 >= (SELECT sum(n) FROM counts)),
        per_doc AS (
          SELECT doc_id, count(*) AS n_tokens,
                 CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
          FROM tok LEFT JOIN vocab v USING (token)
          GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_oov,
               round(CAST(n_oov AS DOUBLE) / n_tokens, 6) AS oov_rate,
               n_oov * 10 < n_tokens AS keep
        FROM per_doc
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // End-to-end corpus curation (the composition showcase): normalize
    // (t06's cleaning) -> exact dedup on the normalized hash (d01's
    // min-id survivor) -> deterministic train/val/test split (p03's
    // hash-mod) -> per-(split, lang) doc/token accounting, with the
    // dedup loss reported per group. One linear DataFrame chain, three
    // narrow stages + one hash-window + one final agg — the same
    // operators a real 100 TB curation run strings together, proven
    // end-to-end by one oracle instead of three.
    QueryDef("p10_corpus_pipeline",
      (s, d) => {
        val normed = Tables.documents(s, d)
          .withColumn("norm",
            trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
          .select(col("doc_id"), col("lang"),
            sha2(col("norm"), 256).as("norm_hash"),
            size(split(col("norm"), " ")).cast("long").as("n_tokens"))
        val survivors = normed
          .withColumn("canonical_id",
            min(col("doc_id")).over(Window.partitionBy("norm_hash")))
          .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
        survivors
          .withColumn("h",
            expr(s"${Ns.hash60("concat('split:', CAST(doc_id AS STRING))")} % 10"))
          .withColumn("split",
            when(col("h") < 8, "train").when(col("h") === 8, "val").otherwise("test"))
          .groupBy("split", "lang")
          .agg(sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_docs"),
            sum(when(col("is_canonical"), col("n_tokens")).otherwise(0L)).as("n_tokens"),
            sum(when(col("is_canonical"), 0L).otherwise(1L)).as("n_dups_dropped"))
          .orderBy("split", "lang")
      },
      Some(s"""
        WITH normed AS (
          SELECT doc_id, lang,
                 sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash,
                 CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        surv AS (
          SELECT doc_id, lang, n_tokens,
                 doc_id = min(doc_id) OVER (PARTITION BY norm_hash) AS is_canonical
          FROM normed),
        tagged AS (
          SELECT lang, n_tokens, is_canonical,
                 CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT *, ${Ns.oHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 10 AS h
                FROM surv))
        SELECT split, lang,
               CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN is_canonical THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN is_canonical THEN 0 ELSE 1 END) AS BIGINT) AS n_dups_dropped
        FROM tagged
        GROUP BY split, lang
        ORDER BY split, lang""")),

    // -------------------------------------------------------------------
    // Mixture upsampling MATERIALIZED: p04 computes per-source sampling
    // rates; this query applies a rate > 1 by emitting integer copies of
    // each document — the epoch-expansion step that turns a mixture spec
    // into an actual training corpus. copies = floor(rate) for every doc
    // plus one extra for a deterministic hash-chosen fraction
    // (frac(rate) of each source), so realized source shares converge to
    // the target without any RNG state. The fractional draw compares
    // md5-derived integers against round(frac*1000) — integer compares,
    // identical on every engine and every cluster size. Scale: the rate
    // table is |sources| rows (broadcast); the expansion is one narrow
    // explode(sequence(...)) with NO shuffle — output lands directly in
    // the writer, and downstream shuffling is p05's job.
    QueryDef("p11_mixture_upsample",
      (s, d) => {
        val wAll = Window.partitionBy()
        val rates = Tables.documents(s, d)
          .select(col("source"), expr(NTOK).as("n_tokens"))
          .groupBy("source")
          .agg(sum(col("n_tokens")).as("n_tokens"))
          .withColumn("total", sum(col("n_tokens")).over(wAll))
          .select(col("source"),
            (expr("CAST(0.08 AS DOUBLE)") * col("total") / col("n_tokens")).as("rate"))
        Tables.documents(s, d)
          .join(broadcast(rates), "source")
          .select(col("doc_id"), col("source"),
            (floor(col("rate")).cast("long") +
              when(pmod(expr(Ns.hash60("'mix:' || CAST(doc_id AS STRING)")), lit(1000L)) <
                round((col("rate") - floor(col("rate"))) * 1000).cast("long"), 1L)
                .otherwise(0L)).as("copies"))
          // sequence(1, 0) would DESCEND in Spark — guard the zero-copy case
          // with an empty array. The generator must be top-level in its
          // select (wrapping it in cast() trips the nested-generator check).
          .select(col("doc_id"), col("source"),
            explode(when(col("copies") >= 1, sequence(lit(1L), col("copies")))
              .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))).as("copy0"))
          .select(col("doc_id"), col("source"), col("copy0").cast("int").as("copy"))
          .orderBy("doc_id", "copy")
      },
      Some(s"""
        WITH g AS (
          SELECT source, CAST(sum($ONTOK) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        t AS (SELECT source, n_tokens,
                     CAST(sum(n_tokens) OVER () AS BIGINT) AS total FROM g),
        r AS (SELECT source,
                     CAST(0.08 AS DOUBLE) * total / n_tokens AS rate FROM t),
        c AS (
          SELECT doc_id, d.source,
                 CAST(floor(rate) AS BIGINT) +
                 CASE WHEN ${Ns.oHash60("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000 <
                           CAST(round((rate - floor(rate)) * 1000) AS BIGINT)
                      THEN 1 ELSE 0 END AS copies
          FROM documents d JOIN r ON d.source = r.source)
        SELECT doc_id, source, CAST(u.c AS INT) AS copy
        FROM c, unnest(generate_series(1, copies)) AS u(c)
        ORDER BY doc_id, copy""")),

    // -------------------------------------------------------------------
    // Incremental NEAR-dup admission: new arrivals (odd doc_ids) checked
    // against a historical MinHash-LSH band index (even doc_ids) — the
    // fuzzy sibling of p06's exact-hash increment, and the production
    // shape for "don't re-ingest what the corpus already has, including
    // near-duplicates". An arrival is rejected iff ANY of its 4 band
    // keys collides with the index ([[Dedup.minhashBands]], same
    // banding as d02). Scale: the index is (band, sig) pairs — 4 small
    // keys per historical doc, equi-joined (never the documents); the
    // per-arrival collision count is a partial-aggregable groupBy.
    // Docs with <3 tokens have no shingles and are out of scope on both
    // sides, per the d02 contract.
    QueryDef("p12_incremental_neardup",
      (s, d) => {
        val bands = Dedup.minhashBands(s, d).select("doc_id", "band", "sig")
        val hist = bands.filter(col("doc_id") % 2 === 0)
          .select("band", "sig").distinct()
        val arr = bands.filter(col("doc_id") % 2 === 1)
        arr.join(hist.withColumn("hit", lit(1)), Seq("band", "sig"), "left")
          .groupBy("doc_id")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_colliding_bands"))
          .select(col("doc_id"), col("n_colliding_bands"),
            (col("n_colliding_bands") === 0).as("admitted"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ${Dedup.minhashPairsOracleCtes},
        hist AS (
          SELECT DISTINCT band, sig FROM bands WHERE doc_id % 2 = 0),
        arr AS (SELECT doc_id, band, sig FROM bands WHERE doc_id % 2 = 1)
        SELECT a.doc_id,
               CAST(count(h.band) AS BIGINT) AS n_colliding_bands,
               count(h.band) = 0 AS admitted
        FROM arr a LEFT JOIN hist h ON a.band = h.band AND a.sig = h.sig
        GROUP BY a.doc_id
        ORDER BY a.doc_id""")),

    // -------------------------------------------------------------------
    // First-fit-decreasing bin packing into fixed context windows — the
    // OTHER packing discipline next to p01's concat-then-chunk: p01
    // splits documents across window boundaries; FFD keeps each
    // document whole and minimizes wasted tail tokens (the trade every
    // LLM pretraining pipeline picks between). Packing is inherently
    // sequential GLOBAL, so it runs per SHARD (deterministic doc_id
    // sharding — the p05 contract): within a shard, items sorted by
    // (tokens desc, doc_id) fold through an array-of-bin-loads
    // accumulator; first bin with room wins, else a new bin opens.
    // Shards pack in parallel; per-shard state is the shard's bin-load
    // array. The DuckDB oracle replays the fold as a recursive CTE
    // carrying the loads LIST. Output: one row per doc with its bin
    // and the bin's running load — plus per-shard waste accounting.
    QueryDef("p14_bin_packing",
      (s, d) => {
        val CAP = 512L
        // first bin index (1-based) with room, else NULL — spelled once,
        // inlined everywhere (SQL has no LET); indexed transform instead
        // of sequence(1, size) because sequence(1, 0) is DESCENDING in
        // Spark, which indexes into the empty first-step accumulator
        val fit = s"try_element_at(filter(transform(acc.loads, (x, i) -> " +
          s"IF(x + it.tokens <= ${512}L, i + 1, -1)), p -> p > 0), 1)"
        val wS = Window.partitionBy("shard").orderBy(col("tokens").desc, col("doc_id"))
        val items = Tables.documents(s, d)
          .select(col("doc_id"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tokens"))
          .filter(col("tokens") <= CAP)
          .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
          .withColumn("k", row_number().over(wS))
        items.groupBy("shard")
          .agg(expr("sort_array(collect_list(struct(k, doc_id, tokens)))").as("its"))
          .withColumn("packed", expr(
            s"""aggregate(its,
                named_struct('loads', CAST(array() AS ARRAY<BIGINT>),
                             'rows', CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT, bin: INT, load_after: BIGINT>>)),
                (acc, it) -> named_struct(
                  'loads',
                  CASE WHEN $fit IS NULL THEN concat(acc.loads, array(it.tokens))
                       ELSE transform(acc.loads, (x, i) -> IF(i + 1 = $fit, x + it.tokens, x)) END,
                  'rows',
                  concat(acc.rows, array(named_struct(
                    'doc_id', it.doc_id,
                    'bin', CAST(coalesce($fit, size(acc.loads) + 1) AS INT),
                    'load_after',
                    CASE WHEN $fit IS NULL THEN it.tokens
                         ELSE element_at(acc.loads, $fit) + it.tokens END)))))"""))
          .select(col("shard"), explode(col("packed.rows")).as("r"))
          .select(col("shard"), col("r.doc_id").as("doc_id"),
            col("r.bin").as("bin"), col("r.load_after").as("load_after"))
          .join(items.select(col("doc_id").as("jd"), col("tokens")), col("doc_id") === col("jd"))
          .select(col("shard"), col("doc_id"), col("tokens"), col("bin"), col("load_after"))
          .orderBy("shard", "doc_id")
      },
      Some("""
        WITH RECURSIVE items AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
                 CAST(doc_id % 8 AS INT) AS shard
          FROM documents WHERE len(string_split(text, ' ')) <= 512),
        seq AS (
          SELECT shard, doc_id, tokens,
                 CAST(row_number() OVER (PARTITION BY shard
                                         ORDER BY tokens DESC, doc_id) AS INT) AS k
          FROM items),
        nsh AS (SELECT shard, count(*) AS n FROM seq GROUP BY shard),
        walk(shard, k, loads, doc_id, tokens, bin, load_after) AS (
          SELECT shard, 0, CAST([] AS BIGINT[]), CAST(NULL AS BIGINT),
                 CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS BIGINT)
          FROM nsh
          UNION ALL
          SELECT w.shard, e.k,
                 CASE WHEN fit.idx IS NOT NULL
                      THEN list_transform(range(1, len(w.loads) + 1), i ->
                             CASE WHEN i = fit.idx THEN w.loads[i] + e.tokens
                                  ELSE w.loads[i] END)
                      ELSE list_append(w.loads, e.tokens) END,
                 e.doc_id, e.tokens,
                 CAST(coalesce(fit.idx, len(w.loads) + 1) AS INT),
                 coalesce(w.loads[fit.idx], CAST(0 AS BIGINT)) + e.tokens
          FROM walk w
          JOIN seq e ON e.shard = w.shard AND e.k = w.k + 1
          CROSS JOIN LATERAL (SELECT list_filter(range(1, len(w.loads) + 1),
                                j -> w.loads[j] + e.tokens <= 512)[1] AS idx) fit)
        SELECT shard, doc_id, tokens, bin, load_after
        FROM walk WHERE k > 0
        ORDER BY shard, doc_id"""))
  ) ++ Seq(

    // -------------------------------------------------------------------
    // Token-budget curation: per source, admit documents in priority
    // order (lexical diversity desc — the micro-unit distinct/total
    // ratio, exact integers — then doc_id) until the per-source token
    // budget is exhausted; whole-document granularity, so a document
    // that would overflow the budget is skipped and admission continues
    // with the next one that still fits (greedy knapsack-by-priority,
    // the standard corpus-curation shape: fixed token budget per
    // domain, best documents first). The admission walk is a
    // sequential fold over the priority-ordered per-source list (the
    // st17 prefix-fold recipe — state is the running admitted-token
    // count; a skipped doc leaves it unchanged), spelled identically
    // in DuckDB. Output: per-source admitted/skipped counts, tokens
    // used, budget utilization ppm — exact integers end to end.
    QueryDef("p15_token_budget",
      (s, d) => {
        val BUDGET = 500L
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tokens"),
            expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)").as("dist"))
          .withColumn("prio6", expr("1000000 * dist div tokens"))
        val w = Window.partitionBy("source").orderBy(col("prio6").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val walked = docs
          .withColumn("prev", collect_list(col("tokens")).over(w))
          .withColumn("used_before", expr(
            s"""aggregate(prev, CAST(0 AS BIGINT),
                (acc, x) -> CASE WHEN acc + x <= ${BUDGET}L THEN acc + x ELSE acc END)"""))
          .withColumn("admitted", expr(s"used_before + tokens <= ${BUDGET}L"))
        walked.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
            sum(when(col("admitted"), col("tokens")).otherwise(0L)).as("tokens_used"))
          .withColumn("n_skipped", col("n_docs") - col("n_admitted"))
          .withColumn("util_ppm", expr(s"1000000 * tokens_used div ${BUDGET}L"))
          .select(col("source"), col("n_docs"), col("n_admitted"), col("n_skipped"),
            col("tokens_used"), col("util_ppm"))
          .orderBy("source")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS dist
          FROM documents),
        prio AS (
          SELECT doc_id, source, tokens, 1000000 * dist // tokens AS prio6 FROM docs),
        pre AS (
          SELECT source, doc_id, tokens,
                 list(tokens) OVER (PARTITION BY source ORDER BY prio6 DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
          FROM prio),
        walked AS (
          SELECT source, doc_id, tokens,
                 list_reduce(list_prepend(CAST(0 AS BIGINT), coalesce(prev, [])),
                   (acc, x) -> CASE WHEN acc + x <= 500 THEN acc + x ELSE acc END) AS used_before
          FROM pre),
        adm AS (
          SELECT source, doc_id, tokens,
                 used_before + tokens <= 500 AS admitted
          FROM walked),
        agg AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
                 CAST(sum(CASE WHEN admitted THEN tokens ELSE 0 END) AS BIGINT) AS tokens_used
          FROM adm GROUP BY source)
        SELECT source, n_docs, n_admitted,
               n_docs - n_admitted AS n_skipped,
               tokens_used, 1000000 * tokens_used // 500 AS util_ppm
        FROM agg
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Dedup-aware mixture accounting: p04's per-source token shares
    // recomputed counting only canonical documents, with the
    // duplicated-token rate each source would shed — the composition
    // that tells a curation run how much of each domain's apparent
    // weight is copies. The canonical key is the 64-char LEADING-
    // CONTENT fingerprint (the d10/CDC first chunk, d01's shape over
    // it): full-text exact dups exist only at sf0.1 in the fixtures,
    // while shared leading content fires at every scale — and leading-
    // content canonicalization is the cheap first pass real pipelines
    // run before shingle-level dedup anyway. Same shuffle as d01.
    QueryDef("p16_dedup_aware_mixture",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), expr(NTOK).as("n_tokens"),
            sha2(substring(col("text"), 1, 64), 256).as("h"))
        val canon = docs
          .withColumn("keep", col("doc_id") ===
            min(col("doc_id")).over(Window.partitionBy("h")))
        canon.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_canonical"),
            sum(col("n_tokens")).as("tokens_total"),
            sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tokens_canonical"))
          .withColumn("dup_token_ppm",
            expr("1000000 * (tokens_total - tokens_canonical) div tokens_total"))
          .orderBy("source")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, source, $ONTOK AS n_tokens, sha256(substr(text, 1, 64)) AS h
          FROM documents),
        canon AS (
          SELECT *, doc_id = min(doc_id) OVER (PARTITION BY h) AS keep
          FROM docs)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
               CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
               CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_canonical,
               1000000 * (CAST(sum(n_tokens) AS BIGINT)
                 - CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT))
                 // CAST(sum(n_tokens) AS BIGINT) AS dup_token_ppm
        FROM canon
        GROUP BY source
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Length-bucketed batching efficiency: split the corpus into 4
    // equi-depth token-length buckets (deterministic ntile over
    // (n_tokens, doc_id)) and report each bucket's padding waste if
    // batches pad to the bucket max — vs the single global bucket,
    // where every doc pads to the corpus max. This is THE reason
    // training pipelines length-bucket before batching; the output
    // quantifies the win (waste_ppm per bucket vs the global row
    // bucket=-1). All exact integers: counts, token sums, one ppm
    // division. Scale: the exact ntile runs as Prefix.orderStats —
    // a range-partitioned two-pass rank, every task sorting n/P docs —
    // not a single-task global window; same results, no straggler.
    QueryDef("p17_length_buckets",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), expr(NTOK).as("n_tokens"))
        val bucketed = Prefix.orderStats(docs,
            Seq(col("n_tokens"), col("doc_id")), ntiles = Seq((4, "nt4")))
          .withColumn("bucket", col("nt4") - 1)
        val per = bucketed.groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_tokens"),
            sum(col("n_tokens")).as("sum_tokens"))
        val global = docs
          .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_tokens"),
            sum(col("n_tokens")).as("sum_tokens"))
          .select(lit(-1).as("bucket"), col("n_docs"), col("max_tokens"), col("sum_tokens"))
        per.unionByName(global)
          .select(col("bucket"), col("n_docs"), col("max_tokens"), col("sum_tokens"),
            expr("n_docs * max_tokens - sum_tokens").as("pad_waste_tokens"),
            expr("1000000 * (n_docs * max_tokens - sum_tokens) div (n_docs * max_tokens)")
              .as("waste_ppm"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH docs AS (SELECT doc_id, $ONTOK AS n_tokens FROM documents),
        bucketed AS (
          SELECT n_tokens,
                 ntile(4) OVER (ORDER BY n_tokens, doc_id) - 1 AS bucket
          FROM docs),
        per AS (
          SELECT bucket, count(*) AS n_docs,
                 CAST(max(n_tokens) AS BIGINT) AS max_tokens,
                 CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
          FROM bucketed GROUP BY bucket),
        uni AS (
          SELECT * FROM per
          UNION ALL
          SELECT -1 AS bucket, count(*) AS n_docs,
                 CAST(max(n_tokens) AS BIGINT) AS max_tokens,
                 CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
          FROM docs)
        SELECT bucket, n_docs, max_tokens, sum_tokens,
               n_docs * max_tokens - sum_tokens AS pad_waste_tokens,
               1000000 * (n_docs * max_tokens - sum_tokens)
                 // (n_docs * max_tokens) AS waste_ppm
        FROM uni
        ORDER BY bucket""")),

    // -------------------------------------------------------------------
    // Per-source dataset card — the datasheet a curation pipeline stamps
    // on every corpus slice before release: volume (docs/chars/tokens),
    // language mix (count + deterministic top language), exact-dup
    // exposure (docs whose full-text hash repeats ANYWHERE in the
    // corpus, d01's sha2 key), and the exact lower-median doc length.
    // Everything is exact integers: the mode and median use
    // deterministic row_number picks (count desc / lang asc; lower
    // median at floor((n+1)/2)), dup exposure is a 32-byte-hash
    // equi-join, ppm is integer division. Scale: two groupBys + one
    // hash join; no per-doc state survives the aggregates.
    QueryDef("p18_dataset_card",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
            expr(NTOK).as("n_tokens"), sha2(col("text"), 256).as("h"))
        val base = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
            sum(col("n_tokens")).as("total_tokens"),
            countDistinct(col("lang")).as("n_langs"))
        val topLang = docs.groupBy("source", "lang").agg(count(lit(1)).as("lc"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy(col("lc").desc, col("lang"))))
          .filter(col("rn") === 1)
          .select(col("source").as("s1"), col("lang").as("top_lang"))
        val dupHashes = docs.groupBy("h").agg(count(lit(1)).as("hc"))
          .filter(col("hc") > 1).select(col("h").as("dh"))
        val dups = docs.join(dupHashes, col("h") === col("dh"))
          .groupBy(col("source").as("s2")).agg(count(lit(1)).as("dup_docs"))
        // grouped Prefix rank (each source is corpus-sized — never one
        // task per source); per-source counts ride along as groupCount —
        // one less scan of docs (each scan recomputes sha2 over text)
        val med = Prefix.orderStats(docs,
            Seq(col("n_chars"), col("doc_id")), group = Seq("source"),
            rn = Some("rn"), groupCount = Some("nn"))
          .filter(expr("rn = (nn + 1) div 2"))
          .select(col("source").as("s3"), col("n_chars").as("median_chars"))
        base
          .join(topLang, col("source") === col("s1"))
          .join(dups, col("source") === col("s2"), "left")
          .join(med, col("source") === col("s3"))
          .select(col("source"), col("n_docs"), col("total_chars"),
            col("total_tokens"), col("n_langs"), col("top_lang"),
            coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
            expr("1000000 * coalesce(dup_docs, 0) div n_docs").as("dup_ppm"),
            col("median_chars"))
          .orderBy("source")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, source, lang, n_chars, $ONTOK AS n_tokens,
                 sha256(text) AS h
          FROM documents),
        base AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 count(DISTINCT lang) AS n_langs
          FROM docs GROUP BY source),
        top_lang AS (
          SELECT source AS s1, lang AS top_lang FROM (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY count(*) DESC, lang) AS rn
            FROM docs GROUP BY source, lang)
          WHERE rn = 1),
        dup_hashes AS (
          SELECT h AS dh FROM docs GROUP BY h HAVING count(*) > 1),
        dups AS (
          SELECT source AS s2, count(*) AS dup_docs
          FROM docs JOIN dup_hashes ON h = dh
          GROUP BY source),
        med AS (
          SELECT source AS s3, n_chars AS median_chars FROM (
            SELECT source, n_chars, doc_id,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id) AS rn,
                   count(*) OVER (PARTITION BY source) AS nn
            FROM docs)
          WHERE rn = (nn + 1) // 2)
        SELECT b.source, n_docs, total_chars, total_tokens, n_langs, top_lang,
               coalesce(dup_docs, 0) AS dup_docs,
               1000000 * coalesce(dup_docs, 0) // n_docs AS dup_ppm,
               median_chars
        FROM base b
        JOIN top_lang ON b.source = s1
        LEFT JOIN dups ON b.source = s2
        JOIN med ON b.source = s3
        ORDER BY b.source""")),

    // -------------------------------------------------------------------
    // C4-style boilerplate scrub: any 8-token span occurring in >= 3
    // DISTINCT documents is boilerplate (nav bars, license headers,
    // templated sentences); a doc's contaminated token positions are the
    // UNION of its flagged spans (overlaps counted once via a distinct
    // position set), and the card reports the exact scrubbed token
    // count. All integers. Scale: the gram table shuffles on the gram
    // string (d04/p02's blocking shape — high cardinality, never
    // all-pairs); position coverage explodes at most 8x the flagged
    // spans, then collapses in one distinct + count.
    QueryDef("p19_boilerplate_scrub",
      (s, d) => {
        val t = Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 8)
        val grams = t
          .select(col("doc_id"), col("toks"),
            explode(expr("sequence(0, size(toks) - 8)")).as("i"))
          .select(col("doc_id"), col("i"),
            expr("concat_ws(' ', slice(toks, i + 1, 8))").as("g"))
        val boiler = grams.groupBy("g")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 3).select(col("g").as("bg"))
        val covered = grams.join(boiler, col("g") === col("bg"))
          .select(col("doc_id"), explode(expr("sequence(i, i + 7)")).as("pos"))
          .distinct()
          .groupBy("doc_id").agg(count(lit(1)).as("boiler_tokens"))
        t.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
          .join(covered, Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"), col("boiler_tokens"),
            expr("1000000 * boiler_tokens div n_tokens").as("boiler_ppm"),
            (col("n_tokens") - col("boiler_tokens")).as("clean_tokens"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 8),
        grams AS (
          SELECT doc_id, u.i - 1 AS i,
                 array_to_string(toks[u.i:u.i+7], ' ') AS g
          FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)),
        boiler AS (
          SELECT g AS bg FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 3),
        covered AS (
          SELECT doc_id, count(*) AS boiler_tokens FROM (
            SELECT DISTINCT doc_id, i + p.k AS pos
            FROM grams JOIN boiler ON g = bg,
                 unnest(generate_series(0, 7)) AS p(k))
          GROUP BY doc_id),
        lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
        SELECT l.doc_id, n_tokens, boiler_tokens,
               1000000 * boiler_tokens // n_tokens AS boiler_ppm,
               n_tokens - boiler_tokens AS clean_tokens
        FROM lens l JOIN covered c ON l.doc_id = c.doc_id
        ORDER BY l.doc_id""")),

    // -------------------------------------------------------------------
    // Temperature-scaled mixture sampling (the mT5/XLM-R recipe, tau=2):
    // sampling probability p_s ∝ share_s^(1/2), which upweights small
    // sources relative to p04's raw proportional mix. The per-source
    // token sums and share_ppm are exact integers; sqrt(share) and the
    // normalizing sum are the one double layer, folded over the sorted
    // 20-source list so both engines add in the same order. epochs_micro
    // reports how many passes over source s a p_s-weighted draw of
    // budget B = total/5 tokens implies — the oversampling-risk number
    // mixture designers actually read. Scale: one partial agg to 20
    // rows, then single-row arithmetic.
    QueryDef("p20_temperature_mixture",
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(col("source"), expr(NTOK).as("n_tokens"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"))
        val z = g.agg(sum(col("toks")).as("total"),
          expr("""aggregate(
                    transform(sort_array(collect_list(struct(source, toks))),
                      x -> sqrt(CAST(x.toks AS DOUBLE))),
                    CAST(0 AS DOUBLE), (acc, x) -> acc + x)""").as("zsum"))
        g.crossJoin(broadcast(z))
          .select(col("source"), col("n_docs"), col("toks").as("n_tokens"),
            expr("1000000 * toks div total").as("share_ppm"),
            expr("CAST(floor(1000000 * sqrt(CAST(toks AS DOUBLE)) / zsum) AS BIGINT)")
              .as("p_ppm"),
            expr("""CAST(floor(1000000 *
                      ((CAST(total AS DOUBLE) / CAST(5 AS DOUBLE))
                       * (sqrt(CAST(toks AS DOUBLE)) / zsum) / CAST(toks AS DOUBLE)))
                    AS BIGINT)""").as("epochs_micro"))
          .orderBy("source")
      },
      Some(s"""
        WITH g AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum($ONTOK) AS BIGINT) AS toks
          FROM documents GROUP BY source),
        z AS (
          SELECT CAST(sum(toks) AS BIGINT) AS total,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(sqrt(CAST(toks AS DOUBLE)) ORDER BY source)),
                   (acc, x) -> acc + x) AS zsum
          FROM g)
        SELECT source, n_docs, toks AS n_tokens,
               1000000 * toks // total AS share_ppm,
               CAST(floor(1000000 * sqrt(CAST(toks AS DOUBLE)) / zsum) AS BIGINT) AS p_ppm,
               CAST(floor(1000000 *
                 ((CAST(total AS DOUBLE) / CAST(5 AS DOUBLE))
                  * (sqrt(CAST(toks AS DOUBLE)) / zsum) / CAST(toks AS DOUBLE)))
               AS BIGINT) AS epochs_micro
        FROM g CROSS JOIN z
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Lexicon policy filter (the blocklist/safety pass every curation
    // stack runs next to p07's statistical rules): per-category term
    // counts from a broadcast lexicon join, exact density ppm, and a
    // three-way action — drop above 100k ppm defect density, flag above
    // 50k, keep otherwise (thresholds sit at the corpus p99/p80, so all
    // three actions fire at every fixture scale). The category rollup
    // ships with per-action doc counts. Scale: explode-join on the
    // token (the broadcast side is the lexicon), one partial agg per
    // doc, one per-action rollup.
    QueryDef("p21_lexicon_filter",
      (s, d) => {
        val lex = Seq(("slow", "defect"), ("error", "defect"), ("dup", "defect"),
          ("spark", "infra"), ("table", "infra"), ("join", "infra"))
        val lexDf = s.createDataFrame(lex).toDF("term", "cat")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), expr(NTOK).as("n_tokens"),
            explode(split(col("text"), " ")).as("tok"))
        val hits = toks.join(broadcast(lexDf), col("tok") === col("term"))
          .groupBy("doc_id")
          .agg(sum(when(col("cat") === "defect", 1L).otherwise(0L)).as("defect_hits"),
            sum(when(col("cat") === "infra", 1L).otherwise(0L)).as("infra_hits"))
        Tables.documents(s, d)
          .select(col("doc_id"), expr(NTOK).as("n_tokens"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("defect_hits"), lit(0L)).as("defect_hits"),
            coalesce(col("infra_hits"), lit(0L)).as("infra_hits"))
          .withColumn("defect_ppm", expr("1000000 * defect_hits div n_tokens"))
          .withColumn("infra_ppm", expr("1000000 * infra_hits div n_tokens"))
          .withColumn("action", expr(
            """CASE WHEN defect_ppm > 100000 THEN 'drop'
                    WHEN defect_ppm > 50000 THEN 'flag'
                    ELSE 'keep' END"""))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH lex(term, cat) AS (
          VALUES ('slow', 'defect'), ('error', 'defect'), ('dup', 'defect'),
                 ('spark', 'infra'), ('table', 'infra'), ('join', 'infra')),
        t AS (SELECT doc_id, $ONTOK AS n_tokens, string_split(text, ' ') AS toks
              FROM documents),
        tok AS (SELECT doc_id, u.tok FROM t, unnest(toks) AS u(tok)),
        hits AS (
          SELECT doc_id,
                 sum(CASE WHEN cat = 'defect' THEN 1 ELSE 0 END) AS defect_hits,
                 sum(CASE WHEN cat = 'infra' THEN 1 ELSE 0 END) AS infra_hits
          FROM tok JOIN lex ON tok = term
          GROUP BY doc_id),
        scored AS (
          SELECT t.doc_id, n_tokens,
                 CAST(coalesce(defect_hits, 0) AS BIGINT) AS defect_hits,
                 CAST(coalesce(infra_hits, 0) AS BIGINT) AS infra_hits,
                 1000000 * CAST(coalesce(defect_hits, 0) AS BIGINT) // n_tokens AS defect_ppm,
                 1000000 * CAST(coalesce(infra_hits, 0) AS BIGINT) // n_tokens AS infra_ppm
          FROM t LEFT JOIN hits ON t.doc_id = hits.doc_id)
        SELECT doc_id, n_tokens, defect_hits, infra_hits, defect_ppm, infra_ppm,
               CASE WHEN defect_ppm > 100000 THEN 'drop'
                    WHEN defect_ppm > 50000 THEN 'flag'
                    ELSE 'keep' END AS action
        FROM scored
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Quality-aware survivor selection over near-dup clusters: d06's
    // converged connected components (MinHash pairs at est_jaccard >=
    // 0.5, iterative label-min to a fixed point) with the canonical doc
    // chosen by CONTENT QUALITY — longest doc wins, doc_id breaks ties
    // (argmax as partial-aggregable min(struct)) — instead of d01's
    // blind min-id. Reports per multi-doc cluster the survivor and the
    // exact token count the dedup drop reclaims. The oracle replays the
    // closure with a recursive CTE, so convergence is pinned, not
    // assumed. Scale: frontier-sized label joins (d06's analysis), then
    // one per-cluster aggregate.
    QueryDef("p22_best_survivor",
      (s, d) => {
        // the converged d06 component labels, through the session memo —
        // this used to inline its own copy of the label-prop loop
        val labels = Dedup.dupClusterLabelsShared(s, d)
        val docs = Tables.documents(s, d)
          .select(col("doc_id").as("did"), col("n_chars"), expr(NTOK).as("n_tokens"))
        labels.join(docs, col("doc_id") === col("did"))
          .groupBy("cluster")
          .agg(count(lit(1)).as("cluster_size"),
            min(struct((-col("n_chars")).as("nc"), col("doc_id").as("di"))).as("m"),
            sum(col("n_tokens")).as("total_tokens"),
            max(col("n_tokens")).as("max_tokens"))
          .filter(col("cluster_size") > 1)
          .join(docs.select(col("did"), col("n_tokens").as("survivor_tokens")),
            col("m.di") === col("did"))
          .select(col("cluster"), col("cluster_size"),
            col("m.di").as("survivor_doc"), (-col("m.nc")).as("survivor_chars"),
            col("survivor_tokens"),
            (col("total_tokens") - col("survivor_tokens")).as("reclaimed_tokens"))
          .orderBy("cluster")
      },
      Some(s"""
        WITH RECURSIVE ${Dedup.minhashPairsOracleCtes},
        sel AS (SELECT doc_a, doc_b FROM mpairs WHERE est_jaccard >= 0.5),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM sel
          UNION ALL
          SELECT doc_b, doc_a FROM sel),
        reach(src, dst) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src),
        docs AS (SELECT doc_id AS did, n_chars, $ONTOK AS n_tokens FROM documents),
        g AS (
          SELECT cluster, count(*) AS cluster_size,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          FROM comp JOIN docs ON doc_id = did
          GROUP BY cluster
          HAVING count(*) > 1),
        surv AS (
          SELECT cluster, did AS survivor_doc, n_chars AS survivor_chars,
                 n_tokens AS survivor_tokens
          FROM (
            SELECT c.cluster, d.did, d.n_chars, d.n_tokens,
                   row_number() OVER (PARTITION BY c.cluster
                                      ORDER BY d.n_chars DESC, d.did) AS rn
            FROM comp c JOIN docs d ON c.doc_id = d.did)
          WHERE rn = 1)
        SELECT g.cluster, cluster_size, survivor_doc, survivor_chars,
               survivor_tokens, total_tokens - survivor_tokens AS reclaimed_tokens
        FROM g JOIN surv ON g.cluster = surv.cluster
        ORDER BY g.cluster""")),

    // -------------------------------------------------------------------
    // Largest-remainder (Hamilton) apportionment of a fixed training
    // token budget across sources: each source gets
    // floor(B·toks_s / T) tokens, and the leftover B − Σfloor goes one
    // token-quantum at a time to the largest fractional remainders
    // (B·toks_s mod T, source tie-break) — the EXACT integer allocator
    // that p20's temperature weights feed in a real mixture build
    // (naive per-source rounding either over- or under-spends the
    // budget; Hamilton is the standard fix, same math as parliamentary
    // seat allocation). All integer arithmetic — no floats anywhere.
    // Scale: one groupBy(source) + a |S|-row window.
    QueryDef("p23_budget_apportion",
      (s, d) => {
        val B = 1000000L
        val g = Tables.documents(s, d)
          .select(col("source"), expr(NTOK).as("n_tokens"))
          .groupBy("source").agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("toks"))
        val tot = g.agg(sum(col("toks")).as("total"), count(lit(1)).as("n_sources"))
        val based = g.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("toks"),
            expr(s"$B * toks div total").as("base_alloc"),
            expr(s"$B * toks % total").as("remainder"),
            col("total"), col("n_sources"))
        // bounded: one row per SOURCE (a handful of corpus sources), never doc-sized
        val wR = Window.orderBy(col("remainder").desc, col("source"))
        based
          .withColumn("rem_rank", row_number().over(wR).cast("long"))
          .withColumn("n_extra", expr(s"CAST($B AS BIGINT) - sum(base_alloc) OVER ()"))
          .select(col("source"), col("n_docs"), col("toks").as("n_tokens"),
            col("base_alloc"),
            (col("rem_rank") <= col("n_extra")).as("gets_extra"),
            expr("base_alloc + CASE WHEN rem_rank <= n_extra THEN 1 ELSE 0 END")
              .as("alloc"))
          .orderBy("source")
      },
      Some(s"""
        WITH g AS (
          SELECT source, count(*) AS n_docs, CAST(sum($ONTOK) AS BIGINT) AS toks
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(toks) AS BIGINT) AS total, count(*) AS n_sources FROM g),
        based AS (
          SELECT source, n_docs, toks,
                 CAST(1000000 * toks // total AS BIGINT) AS base_alloc,
                 CAST(1000000 * toks % total AS BIGINT) AS remainder
          FROM g CROSS JOIN tot),
        ranked AS (
          SELECT source, n_docs, toks, base_alloc,
                 CAST(row_number() OVER (ORDER BY remainder DESC, source) AS BIGINT) AS rem_rank,
                 CAST(1000000 - sum(base_alloc) OVER () AS BIGINT) AS n_extra
          FROM based)
        SELECT source, n_docs, toks AS n_tokens, base_alloc,
               rem_rank <= n_extra AS gets_extra,
               CAST(base_alloc + CASE WHEN rem_rank <= n_extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM ranked
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Top-p (nucleus) coverage per source: the smallest prefix of docs —
    // largest-first by token count, doc_id tie-break — whose tokens
    // reach 90% of the source's total, the "how concentrated is this
    // source" card that decides whether trimming the tail loses
    // anything. A doc is kept while the PREVIOUS prefix is still below
    // the threshold (so the crossing doc is included, the nucleus
    // convention). Exactness: the 90% test is the integer
    // cross-multiplication 10·cum_before < 9·total — no rational
    // threshold is ever materialized. Scale: one doc-grain agg + one
    // per-source window cumsum.
    QueryDef("p24_top_p_coverage",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), expr(NTOK).as("n_tokens"))
        // grouped Prefix exclusive cumsum: each source is corpus-sized,
        // so the nucleus walk never single-tasks a source; per-source
        // doc counts and token totals ride along as groupCount/groupSums
        Prefix.orderStats(docs,
            Seq(col("n_tokens").desc, col("doc_id")), group = Seq("source"),
            cumSumsExclusive = Seq(("n_tokens", "cum_before")),
            groupCount = Some("n_docs"), groupSums = Seq(("n_tokens", "total_tokens")))
          .filter(expr("10 * cum_before < 9 * total_tokens"))
          .groupBy("source")
          .agg(max(col("n_docs")).as("n_docs"), max(col("total_tokens")).as("total_tokens"),
            count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
          .select(col("source"), col("n_docs"), col("total_tokens"),
            col("n_kept"), col("tokens_kept"),
            expr("n_kept * 1000000 div n_docs").as("doc_share_micro"),
            expr("tokens_kept * 1000000 div total_tokens").as("token_share_micro"))
          .orderBy("source")
      },
      Some(s"""
        WITH docs AS (
          SELECT source, doc_id, $ONTOK AS n_tokens FROM documents),
        tot AS (
          SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          FROM docs GROUP BY source),
        c AS (
          SELECT source, doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
                      ORDER BY n_tokens DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS cum_before
          FROM docs),
        kept AS (
          SELECT c.source, t.n_docs, t.total_tokens,
                 count(*) AS n_kept, CAST(sum(c.n_tokens) AS BIGINT) AS tokens_kept
          FROM c JOIN tot t ON c.source = t.source
          WHERE 10 * c.cum_before < 9 * t.total_tokens
          GROUP BY c.source, t.n_docs, t.total_tokens)
        SELECT source, n_docs, total_tokens, n_kept, tokens_kept,
               CAST(n_kept * 1000000 // n_docs AS BIGINT) AS doc_share_micro,
               CAST(tokens_kept * 1000000 // total_tokens AS BIGINT) AS token_share_micro
        FROM kept
        ORDER BY source""")),

    // -------------------------------------------------------------------
    // Context-length packing-efficiency curve: next-fit packing (docs
    // kept whole, arrival order, one open bin) replayed at four context
    // capacities (512/1024/2048/4096) — the measurement behind "which
    // sequence length wastes the least compute", p14's FFD sibling
    // reduced to the curve a pretraining team actually plots. Per
    // (capacity, shard): the same deterministic `aggregate` fold as
    // p14 but with O(1) state (open-bin load, closed-bin count,
    // accumulated waste); efficiency = packed tokens vs bins×capacity
    // in exact micro floor-division. Docs longer than the capacity are
    // counted (and reported) as skipped, not silently dropped. Scale:
    // shards fold in parallel; the explode is 4 capacities × 8 shards.
    QueryDef("p25_pack_efficiency",
      (s, d) => {
        val items = Tables.documents(s, d)
          .select(col("doc_id"), expr(NTOK).as("tokens"))
          .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
        val caps = s.range(0, 4).toDF("ci")
          .select(expr("CAST(512 * shiftleft(1, ci) AS BIGINT)").as("cap"))
        val folded = items
          .crossJoin(broadcast(caps))
          .groupBy("cap", "shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("tokens") > col("cap"), 1L).otherwise(0L)).as("n_skipped"),
            expr("sort_array(collect_list(IF(tokens <= cap, struct(doc_id, tokens), null)))")
              .as("its"),
            max(col("cap")).as("c2"))
          .withColumn("st", expr(
            """aggregate(its,
               named_struct('load', CAST(0 AS BIGINT), 'bins', CAST(0 AS BIGINT),
                            'packed', CAST(0 AS BIGINT)),
               (acc, it) -> IF(it IS NULL, acc,
                 IF(acc.bins = 0,
                    named_struct('load', it.tokens, 'bins', CAST(1 AS BIGINT),
                                 'packed', acc.packed + it.tokens),
                    IF(acc.load + it.tokens <= c2,
                       named_struct('load', acc.load + it.tokens, 'bins', acc.bins,
                                    'packed', acc.packed + it.tokens),
                       named_struct('load', it.tokens, 'bins', acc.bins + 1,
                                    'packed', acc.packed + it.tokens)))))"""))
          .select(col("cap"), col("shard"), col("n_docs"), col("n_skipped"),
            col("st.bins").as("n_bins"), col("st.packed").as("tokens_packed"),
            expr("CASE WHEN st.bins > 0 THEN st.packed * 1000000 div (st.bins * cap) END")
              .as("efficiency_micro"))
        folded.orderBy("cap", "shard")
      },
      Some(s"""
        WITH RECURSIVE caps AS (
          SELECT CAST(512 * (1 << ci) AS BIGINT) AS cap
          FROM (SELECT unnest(generate_series(0, 3)) AS ci)),
        items AS (
          SELECT doc_id, $ONTOK AS tokens, CAST(doc_id % 8 AS INT) AS shard
          FROM documents),
        fit AS (
          SELECT c.cap, i.shard, i.doc_id, i.tokens,
                 CAST(row_number() OVER (PARTITION BY c.cap, i.shard
                      ORDER BY i.doc_id) AS INT) AS k
          FROM items i CROSS JOIN caps c
          WHERE i.tokens <= c.cap),
        walk AS (
          SELECT cap, shard, doc_id, tokens, k,
                 tokens AS load, CAST(1 AS BIGINT) AS bins, tokens AS packed
          FROM fit WHERE k = 1
          UNION ALL
          SELECT f.cap, f.shard, f.doc_id, f.tokens, f.k,
                 CASE WHEN w.load + f.tokens <= f.cap THEN w.load + f.tokens
                      ELSE f.tokens END,
                 CASE WHEN w.load + f.tokens <= f.cap THEN w.bins ELSE w.bins + 1 END,
                 w.packed + f.tokens
          FROM walk w JOIN fit f
            ON f.cap = w.cap AND f.shard = w.shard AND f.k = w.k + 1),
        fin AS (
          SELECT cap, shard, bins AS n_bins, packed AS tokens_packed FROM (
            SELECT *, row_number() OVER (PARTITION BY cap, shard ORDER BY k DESC) AS rn
            FROM walk) WHERE rn = 1),
        base AS (
          SELECT c.cap, i.shard, count(*) AS n_docs,
                 CAST(sum(CASE WHEN i.tokens > c.cap THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped
          FROM items i CROSS JOIN caps c
          GROUP BY c.cap, i.shard)
        SELECT b.cap, b.shard, b.n_docs, b.n_skipped,
               CAST(coalesce(f.n_bins, 0) AS BIGINT) AS n_bins,
               CAST(coalesce(f.tokens_packed, 0) AS BIGINT) AS tokens_packed,
               CASE WHEN f.n_bins > 0
                    THEN CAST(f.tokens_packed * 1000000 // (f.n_bins * b.cap) AS BIGINT) END
                 AS efficiency_micro
        FROM base b LEFT JOIN fin f ON b.cap = f.cap AND b.shard = f.shard
        ORDER BY b.cap, b.shard""")),

    // -------------------------------------------------------------------
    // EXACT budget-constrained curation: per source, the 0/1-knapsack
    // optimum (maximize total distinct-token value under a 100-quantum
    // token budget, weights = ceil(tokens/100)) next to the
    // biggest-value-first greedy the p15 family uses — the card that
    // quantifies what greedy leaves on the table. The DP table is a
    // 101-slot BIGINT array folded through `aggregate` (the p14
    // array-state pattern; `transform` reads the PREVIOUS row's array,
    // which is exactly the 0/1 no-reuse semantics), the greedy is a
    // 2-field fold, and the DuckDB oracle replays both as recursive
    // CTEs carrying a BIGINT[] / scalar state. All integers. Scale:
    // sources fold in parallel; per-source state is 101 longs.
    QueryDef("q157_knapsack_curation",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            expr(NTOK).as("toks"),
            expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)").as("v"))
          .withColumn("w", expr("(toks + 99) div 100"))
          .filter(col("w") <= 100)
        val folded = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            expr("sort_array(collect_list(struct(doc_id, w, v)))").as("its"),
            // ascending sort of (-v, doc_id) = value DESC with doc_id ASC
            // tie-break (a descending struct sort would flip the tie-break)
            expr("sort_array(collect_list(struct(-v AS negv, doc_id, w)))").as("greedy_its"))
          .withColumn("dp", expr(
            """aggregate(its,
               transform(sequence(0, 100), c -> CAST(0 AS BIGINT)),
               (dp, it) -> transform(dp, (x, i) ->
                 IF(i >= it.w, greatest(x, element_at(dp, CAST(i - it.w + 1 AS INT)) + it.v), x)))"""))
          .withColumn("g", expr(
            """aggregate(greedy_its,
               named_struct('rem', CAST(100 AS BIGINT), 'gval', CAST(0 AS BIGINT)),
               (acc, it) -> IF(it.w <= acc.rem,
                 named_struct('rem', acc.rem - it.w, 'gval', acc.gval - it.negv), acc))"""))
          .select(col("source"), col("n_docs"),
            expr("element_at(dp, 101)").as("dp_value"),
            col("g.gval").as("greedy_value"))
          .select(col("source"), col("n_docs"), lit(100L).as("budget"),
            col("dp_value"), col("greedy_value"),
            (col("dp_value") - col("greedy_value")).as("gap"),
            expr("CASE WHEN dp_value > 0 THEN (dp_value - greedy_value) * 1000000 div dp_value END")
              .as("gap_micro"))
        folded.orderBy("source")
      },
      Some(s"""
        WITH RECURSIVE docs AS (
          SELECT source, doc_id, $ONTOK AS toks,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS v,
                 ($ONTOK + 99) // 100 AS w
          FROM documents),
        items AS (
          SELECT source, doc_id, w, v,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS k
          FROM docs WHERE w <= 100),
        nk AS (SELECT source, max(k) AS mk, count(*) AS n_docs FROM items GROUP BY source),
        dp AS (
          SELECT source, 0 AS k,
                 list_transform(generate_series(0, 100), c -> CAST(0 AS BIGINT)) AS t
          FROM nk
          UNION ALL
          SELECT d.source, i.k,
                 list_transform(d.t, (x, ci) ->
                   CASE WHEN ci - 1 >= i.w
                        THEN greatest(x, d.t[CAST(ci - i.w AS INT)] + i.v)
                        ELSE x END)
          FROM dp d JOIN items i ON i.source = d.source AND i.k = d.k + 1),
        dpfin AS (
          SELECT d.source, d.t[101] AS dp_value
          FROM dp d JOIN nk ON d.source = nk.source AND d.k = nk.mk),
        gitems AS (
          SELECT source, doc_id, w, v,
                 CAST(row_number() OVER (PARTITION BY source
                      ORDER BY v DESC, doc_id, w) AS INT) AS k
          FROM docs WHERE w <= 100),
        walkg AS (
          SELECT source, k, 100 - w AS rem, v AS gval
          FROM gitems WHERE k = 1
          UNION ALL
          SELECT g.source, i.k,
                 CASE WHEN i.w <= g.rem THEN g.rem - i.w ELSE g.rem END,
                 CASE WHEN i.w <= g.rem THEN g.gval + i.v ELSE g.gval END
          FROM walkg g JOIN gitems i ON i.source = g.source AND i.k = g.k + 1),
        gfin AS (
          SELECT w.source, w.gval AS greedy_value
          FROM walkg w JOIN nk ON w.source = nk.source AND w.k = nk.mk)
        SELECT n.source, CAST(n.n_docs AS BIGINT) AS n_docs,
               CAST(100 AS BIGINT) AS budget,
               CAST(d.dp_value AS BIGINT) AS dp_value,
               CAST(g.greedy_value AS BIGINT) AS greedy_value,
               CAST(d.dp_value - g.greedy_value AS BIGINT) AS gap,
               CASE WHEN d.dp_value > 0
                    THEN CAST((d.dp_value - g.greedy_value) * 1000000 // d.dp_value AS BIGINT) END
                 AS gap_micro
        FROM nk n JOIN dpfin d ON n.source = d.source
        JOIN gfin g ON n.source = g.source
        ORDER BY n.source""")),

    // Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006 —
    // the one-pass distributed algorithm every quality-weighted corpus
    // subsample uses): each doc draws u = hash52/2^52 (deterministic
    // uniform, exactly representable) and is ranked by the exponential
    // key ln(u)/w with w = n_chars; the top-100 keys ARE a weighted
    // sample without replacement. The key is floor-quantized to
    // nano-units (floor, not round — ln is irrational, the q112 recipe)
    // with doc_id tie-break, so the ranking is engine-independent.
    // Scale: a pure projection + one TakeOrdered top-k — no shuffle
    // wider than k rows; on a cluster this is exactly how you draw a
    // 1M-doc mixture from 100 TB in one pass.
    QueryDef("p26_weighted_sample",
      (s, d) => {
        val k = 100
        // greatest(h, 1): hash52 CAN be exactly 0 (p = 2^-52 per doc, a
        // certainty over a 100 TB corpus), and ln(0) = -Infinity diverges
        // between engines once it meets the floor quantization — clamp to
        // the smallest positive lattice point instead (u = 2^-52).
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            expr(s"greatest(${Ns.hash52("CAST(doc_id AS STRING)")}, CAST(1 AS BIGINT)) / CAST(4503599627370496 AS DOUBLE)").as("u"))
          .select(col("doc_id"), col("n_chars"),
            expr("CAST(floor(1000000000 * ln(u) / CAST(n_chars AS DOUBLE)) AS BIGINT)").as("key_nano"))
          .orderBy(col("key_nano").desc, col("doc_id"))
          .limit(k)
          .withColumn("draw_rank", row_number().over(
            // bounded: post-limit rank over the k=100-row TakeOrdered shortlist
            Window.orderBy(col("key_nano").desc, col("doc_id"))))
          .orderBy("draw_rank")
      },
      Some(s"""
        WITH keys AS (
          SELECT doc_id, n_chars,
                 CAST(floor(1000000000 * ln(greatest(${Ns.oHash52("CAST(doc_id AS VARCHAR)")}, 1)
                        / CAST(4503599627370496 AS DOUBLE))
                      / CAST(n_chars AS DOUBLE)) AS BIGINT) AS key_nano
          FROM documents)
        SELECT doc_id, n_chars, key_nano,
               row_number() OVER (ORDER BY key_nano DESC, doc_id) AS draw_rank
        FROM keys
        ORDER BY key_nano DESC, doc_id
        LIMIT 100"""))
  )
}
