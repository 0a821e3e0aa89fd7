package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north star §2.3): image/audio/video
  * payloads as opaque `BinaryType` columns with typed metadata, plus a
  * batched decode/feature-extract pipeline.
  *
  * The container has no image/audio codecs, so the "decode" step is
  * real BYTE-LEVEL feature extraction — histogram moments (mean /
  * variance via exact integer sums), distinct-byte count, and a
  * fixed-width leading-bytes feature vector. Swapping in a codec means
  * replacing only the per-batch function body; the batching, schema and
  * partition-parallel shape stay identical. The moments are
  * oracle-checked in DuckDB over the same byte arithmetic (m02).
  *
  * Scale design: payloads never leave their partition — metadata
  * extraction and byte features are narrow per-row transforms
  * (mapPartitions, batched like an Arrow/Pandas UDF would be), so a
  * 100 TB media table processes embarrassingly parallel with no
  * shuffle; only the small feature/metadata projection flows onward.
  */
object Multimodal {

  /** An opaque media payload + typed metadata. In production `payload`
    * holds the encoded image/audio/video bytes; here it is the utf-8
    * document text standing in as a deterministic byte stream.
    */
  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, format: String)

  /** Byte-level features: histogram moments from EXACT integer sums
    * (one double division at the end — bit-identical across engines and
    * partitionings), distinct-byte count, leading-byte vector.
    */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, byte_sum: Long, byte_sumsq: Long,
      n_distinct: Int, first_byte: Int, mean_byte: Double, var_byte: Double,
      feature: Array[Float])

  /** Batched byte-level decode: the batch boundary is where a real
    * image/audio codec would be invoked per buffer.
    */
  def decodeBytes(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = r.payload
      val n = bytes.length
      var sum = 0L
      var sumsq = 0L
      val seen = new Array[Boolean](256)
      var distinct = 0
      var i = 0
      while (i < n) {
        val b = bytes(i) & 0xff
        sum += b
        sumsq += b.toLong * b
        if (!seen(b)) { seen(b) = true; distinct += 1 }
        i += 1
      }
      // exact integer numerators; ONE floating division each -> the
      // values are independent of batch/partition boundaries
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      val variance =
        if (n == 0) 0.0
        else (n.toLong * sumsq - sum * sum).toDouble / (n.toLong * n)
      val feature = Array.tabulate(8)(i =>
        if (n > i) (bytes(i) & 0xff).toFloat / 255f else 0f)
      MediaFeatures(r.doc_id, n, sum, sumsq, distinct,
        if (n > 0) bytes(0) & 0xff else 0, mean, variance, feature)
    }

  /** The batched partition-parallel pipeline: mirrors mapInPandas batch
    * semantics (fixed max batch size per decoder call) on the typed
    * Dataset API.
    */
  def extractFeatures(spark: SparkSession, media: org.apache.spark.sql.Dataset[MediaRecord],
      batchSize: Int = 64): org.apache.spark.sql.Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(b => decodeBytes(b)))
  }

  /** documents -> MediaRecord dataset (payload = utf-8 text bytes). */
  def mediaFromDocuments(spark: SparkSession, d: String): org.apache.spark.sql.Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        (lit(64) + col("doc_id") % 960).cast("int").as("width"),
        (lit(64) + (col("doc_id") * 7) % 960).cast("int").as("height"),
        element_at(array(lit("rgb8"), lit("rgba8"), lit("gray8")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"))
      .as[MediaRecord]
  }

  def defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Metadata + frame-sampling arithmetic on the binary column: byte
    // length, content hash, decode-free resize/fps-sample planning.
    // Fully SQL-expressible -> DuckDB oracle.
    QueryDef("m01_media_meta",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"),
          (lit(64) + col("doc_id") % 960).cast("int").as("width"),
          (lit(64) + (col("doc_id") * 7) % 960).cast("int").as("height"),
          (lit(24) + col("doc_id") % 240).cast("int").as("n_frames"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"),
          col("width"), col("height"),
          col("n_frames"),
          size(expr("sequence(0, n_frames - 1, 12)")).cast("int").as("n_sampled_frames"),
          lit(224).as("out_w"),
          round(col("height") * lit(224.0) / col("width")).cast("int").as("out_h"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               sha256(text) AS payload_sha,
               CAST(64 + doc_id % 960 AS INT) AS width,
               CAST(64 + (doc_id * 7) % 960 AS INT) AS height,
               CAST(24 + doc_id % 240 AS INT) AS n_frames,
               CAST((24 + doc_id % 240 - 1) // 12 + 1 AS INT) AS n_sampled_frames,
               224 AS out_w,
               CAST(round((64 + (doc_id * 7) % 960) * 224.0 / (64 + doc_id % 960)) AS INT) AS out_h
        FROM documents
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Batched decode/feature pipeline (typed Dataset + mapPartitions):
    // byte-level feature extraction with exact integer sums, so DuckDB
    // reproduces mean/variance bit-for-bit over the same bytes (the
    // document text is pure ASCII, so ord(char) == byte).
    QueryDef("m02_media_features",
      (s, d) => extractFeatures(s, mediaFromDocuments(s, d))
        .select(col("doc_id"), col("n_bytes"), col("byte_sum"),
          col("byte_sumsq"), col("n_distinct"), col("first_byte"),
          col("mean_byte"), col("var_byte"))
        .orderBy("doc_id"),
      Some("""
        WITH b AS (
          SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
                 CAST(list_sum(list_transform(range(1, length(text) + 1),
                      i -> ord(text[i]))) AS BIGINT) AS s,
                 CAST(list_sum(list_transform(range(1, length(text) + 1),
                      i -> ord(text[i]) * ord(text[i]))) AS BIGINT) AS ss,
                 len(list_distinct(list_transform(range(1, length(text) + 1),
                      i -> ord(text[i])))) AS nd,
                 ord(text[1]) AS b0
          FROM documents)
        SELECT doc_id, CAST(n AS INT) AS n_bytes, s AS byte_sum,
               ss AS byte_sumsq, CAST(nd AS INT) AS n_distinct,
               CAST(b0 AS INT) AS first_byte,
               CAST(s AS DOUBLE) / n AS mean_byte,
               CAST(n * ss - s * s AS DOUBLE) / (n * n) AS var_byte
        FROM b
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Multimodal join: text-side predicates x vector-side predicates in
    // one query (documents |><| embeddings on doc_id = vec_id). The
    // norm is a sequential fold -> exact; at scale this is a co-located
    // join when both tables are bucketed by id.
    QueryDef("m03_multimodal_join",
      (s, d) => {
        Ns.registerFast(s)
        val doc = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            expr(Ns.toDouble("embedding")).as("v"))
          .withColumn("nrm", round(sqrt(expr(Ns.dot("v", "v"))), 6))
        doc.join(emb, col("doc_id") === col("vec_id"))
          .filter(size(split(col("text"), " ")) >= 20 && col("nrm") >= 1.0)
          .groupBy("lang", "label")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy("lang", "label")
      },
      Some(s"""
        WITH emb AS (
          SELECT vec_id, label,
                 round(sqrt(${Ns.oDot(Ns.oToDouble("embedding"), Ns.oToDouble("embedding"))}), 6) AS nrm
          FROM embeddings)
        SELECT lang, label, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents JOIN emb ON doc_id = vec_id
        WHERE len(string_split(text, ' ')) >= 20 AND nrm >= 1.0
        GROUP BY lang, label
        ORDER BY lang, label""")),

    // -------------------------------------------------------------------
    // Media near-duplicate detection without codecs: 16-bin
    // byte-histogram per payload (exact integer counts over the byte
    // stream — the codec-free analogue of a perceptual hash), candidate
    // pairs blocked by payload length band (|len/32| same or adjacent —
    // near-dups of re-encoded media differ slightly in size, never
    // wildly), histogram cosine via the sequential fold, top-20 most
    // similar pairs. Scale: the histogram is a narrow per-row map; the
    // pairing is an equi-join on the band key, never all-pairs.
    QueryDef("m04_media_neardup",
      (s, d) => {
        Ns.registerFast(s)
        // 16-bin histogram in ONE codegen pass per row (char_hist16,
        // [[graft.functions.CharHist16]]): no explode, no shuffle. The
        // explode → count-per-(doc,bin) → dense-reassembly spelling this
        // replaces materialized one row PER CHARACTER (~1.5M at sf0.1)
        // and paid two hash-aggregation shuffles to rebuild a value
        // that is a narrow per-row projection. Integer counts convert
        // exactly to double, so downstream cosines are bit-identical.
        // localCheckpoint stops the self-join from recomputing the
        // histograms on both sides.
        val h = Tables.documents(s, d)
          // char_hist16 maps empty docs to all-zero bins (nrm = 0 ->
          // 0/0 NaN cosines) where the old explode dropped them — keep
          // the drop explicit, per the expression's contract note
          .filter(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars"),
            expr("transform(char_hist16(text), x -> CAST(x AS DOUBLE))").as("hist"))
          .withColumn("nrm", sqrt(expr(Ns.dot("hist", "hist"))))
          .withColumn("band", expr("n_chars div 32"))
          .localCheckpoint() // reused by both sides of the pair join
        // probe all three of {band-1, band, band+1}: the join also keeps
        // only doc_a < doc_b, and the lower-id doc may sit in the HIGHER
        // band, so a one-sided {band, band+1} probe silently drops those
        // adjacent pairs. Each ordered pair matches at exactly ONE probe
        // band (pb = band_b) and the filter keeps one orientation, so
        // every unordered pair survives exactly once — no dedup step,
        // and the whole pairing runs shuffle-free into the top-20.
        val probes = h.select(col("doc_id"), col("hist"), col("nrm"),
          explode(expr("array(band - 1, band, band + 1)")).as("pb"))
        val a = probes.select(col("doc_id").as("doc_a"), col("hist").as("ha"),
          col("nrm").as("na"), col("pb"))
        val b = h.select(col("doc_id").as("doc_b"), col("hist").as("hb"),
          col("nrm").as("nb"), col("band").as("pb"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
        a.join(b, Seq("pb")).filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            round(expr(Ns.dot("ha", "hb")) / (col("na") * col("nb")), 6).as("cosine"))
          .orderBy(col("cosine").desc, col("doc_a"), col("doc_b")).limit(20)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(col("rank"), col("doc_a"), col("doc_b"), col("cosine"))
          .orderBy("rank")
      },
      Some(s"""
        WITH codes AS (
          SELECT doc_id, n_chars,
                 list_transform(generate_series(1, length(text)),
                   i -> ascii(substr(text, i, 1))) AS codes
          FROM documents WHERE n_chars > 0),
        h AS (
          SELECT doc_id, n_chars // 32 AS band,
                 list_transform(generate_series(0, 15),
                   b -> CAST(len(list_filter(codes, c -> c // 16 = b)) AS DOUBLE)) AS hist
          FROM codes),
        n AS (SELECT doc_id, band, hist, sqrt(${Ns.oDot("hist", "hist")}) AS nrm FROM h),
        probes AS (
          SELECT doc_id, hist, nrm, unnest([band - 1, band, band + 1]) AS pb FROM n),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 round(${Ns.oDot("a.hist", "b.hist")} / (a.nrm * b.nrm), 6) AS cosine
          FROM probes a JOIN n b ON a.pb = b.band AND a.doc_id < b.doc_id)
        SELECT CAST(row_number() OVER (ORDER BY cosine DESC, doc_a, doc_b) AS INT) AS rank,
               doc_a, doc_b, cosine
        FROM pairs
        ORDER BY cosine DESC, doc_a, doc_b
        LIMIT 20""")),

    // -------------------------------------------------------------------
    // Frame sampling over the opaque binary column: the payload as a
    // sequence of fixed-width 32-byte "frames", every 4th frame sliced
    // out with its offset, actual width (tail frames are short) and
    // content hash — the video keyframe-sampling plumbing (sample →
    // slice → fingerprint) with the codec swapped for byte slicing.
    // The frame index list is GENERATED per row (sequence + explode)
    // and each slice is a narrow substring: payloads never shuffle, and
    // the output is the sampled-frame projection only — at 100 TB the
    // scan stays embarrassingly parallel exactly like m02. The oracle
    // slices the same text the payload was cast from (single-byte
    // chars on this fixture, the m04 precedent), so offsets, widths and
    // md5 fingerprints match byte-for-byte.
    QueryDef("m05_frame_sample",
      (s, d) => {
        val media = mediaFromDocuments(s, d).toDF()
          .withColumn("n_bytes", length(col("payload")))
          .filter(col("n_bytes") > 0)
        media
          .select(col("doc_id"), col("payload"),
            explode(expr("sequence(0, (n_bytes - 1) div 32, 4)")).as("fi"))
          .select(col("doc_id"), col("payload"), col("fi").cast("int").as("frame_idx"))
          .select(col("doc_id"), col("frame_idx"),
            (col("frame_idx") * 32 + 1).cast("long").as("frame_off"),
            length(expr("substring(payload, frame_idx * 32 + 1, 32)")).as("frame_w"),
            md5(expr("substring(payload, frame_idx * 32 + 1, 32)")).as("frame_md5"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""
        WITH media AS (
          SELECT doc_id, text, length(text) AS n_bytes
          FROM documents WHERE length(text) > 0),
        frames AS (
          SELECT doc_id, text, CAST(u.i AS INT) AS frame_idx
          FROM media, unnest(generate_series(0, (n_bytes - 1) // 32, 4)) AS u(i))
        SELECT doc_id, frame_idx,
               CAST(frame_idx * 32 + 1 AS BIGINT) AS frame_off,
               CAST(length(substring(text, frame_idx * 32 + 1, 32)) AS INT) AS frame_w,
               md5(substring(text, frame_idx * 32 + 1, 32)) AS frame_md5
        FROM frames
        ORDER BY doc_id, frame_idx""")),

    // -------------------------------------------------------------------
    // Perceptual-hash near-dup (pHash architecture, WHT core): treat the
    // leading 64 payload bytes as the decoded 8x8 thumbnail, take the
    // 64-point Walsh-Hadamard transform W[k] = SUM_i x[i]*(-1)^popcount(i&k)
    // (the pHash recipe swaps in a DCT here; WHT is the same
    // frequency-signature idea in PURE INTEGER arithmetic, so the
    // signature is exact and cross-engine — a DCT's cos() is not), keep
    // the sign bit of the 63 non-DC coefficients as a BIGINT fingerprint,
    // and pair docs at hamming <= 7 via the d03b pigeonhole byte-band
    // equi-join (8 bands x 8 bits: distance <= 7 forces >= 1 equal band,
    // so banding is lossless and the plan is never all-pairs). The oracle
    // joins all pairs (fixture-sized) — identical output pins the
    // losslessness. At 100 TB: signatures are one narrow per-row pass;
    // only (band, byte) keys shuffle.
    QueryDef("m06_whash_neardup",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("n_chars") > 0)
        // The WHT is a genuine per-row imperative kernel — the "decode /
        // feature-extract" step this family models (same shape as m02's
        // batched byte decode) — so it runs as a typed map with the
        // O(n log n) butterfly, not as nested SQL HOFs. (A declarative
        // spelling was tried twice: fused, it hit Catalyst's
        // project-collapse lineage expansion — px rebuilt 63*64 times per
        // row, a runaway task, the s10 covMatrix trap; staged through
        // localCheckpoints it ran ~20M interpreted lambda evals, 6.7 s at
        // sf0.1 for microseconds of actual integer work.) All arithmetic
        // is integer-exact, so the fingerprints still hash-match the
        // oracle's HOF spelling bit for bit.
        val sess = s
        import sess.implicits._
        val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            // leading 64 bytes as the fake 8x8 decode (ascii fixture:
            // charAt == code point == DuckDB's ascii())
            val x = new Array[Long](64)
            var i = 0
            while (i < 64) { x(i) = if (i < text.length) text.charAt(i).toLong else 0L; i += 1 }
            // in-place fast WHT butterfly: after the log2(64) stages,
            // x(k) = SUM_i px(i) * (-1)^popcount(i & k) — exactly the
            // Sylvester-ordering transform the oracle spells out
            var h = 1
            while (h < 64) {
              var st = 0
              while (st < 64) {
                var j = st
                while (j < st + h) {
                  val a = x(j); val b = x(j + h)
                  x(j) = a + b; x(j + h) = a - b
                  j += 1
                }
                st += 2 * h
              }
              h *= 2
            }
            var sig = 0L
            var k = 1
            while (k < 64) { if (x(k) > 0) sig |= 1L << (k - 1); k += 1 }
            (id, sig)
          }.toDF("doc_id", "whash")
          .localCheckpoint() // reused by both sides of the band join
        val bands = sigs.select(col("doc_id"), col("whash"),
          explode(array((0 until 8).map(t => struct(lit(t).as("band"),
            expr(s"shiftright(whash, ${8 * t}) % 256").as("byte"))): _*)).as("bb"))
          .select(col("doc_id"), col("whash"), col("bb.band"), col("bb.byte"))
        val a = bands.select(col("doc_id").as("doc_a"), col("whash").as("ha"),
          col("band"), col("byte"))
        val b = bands.select(col("doc_id").as("doc_b"), col("whash").as("hb"),
          col("band").as("band_b"), col("byte").as("byte_b"))
        a.join(b, col("band") === col("band_b") && col("byte") === col("byte_b") &&
            col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            expr("bit_count(ha ^ hb)").cast("int").as("hamming"))
          .filter(col("hamming") <= 7)
          .distinct()
          .orderBy("doc_a", "doc_b")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, text FROM documents WHERE n_chars > 0),
        px AS (
          SELECT doc_id, list_transform(generate_series(0, 63),
              i -> CASE WHEN i < length(text) THEN ascii(substring(text, i + 1, 1)) ELSE 0 END) AS px
          FROM base),
        wht AS (
          SELECT doc_id, list_transform(generate_series(1, 63),
              k -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(generate_series(0, 63),
                       i -> CAST(px[i + 1] * (1 - 2 * (bit_count(i & k) % 2)) AS BIGINT))),
                     (acc, x) -> acc + x)) AS w
          FROM px),
        sig AS (
          SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, 63),
                     k -> CASE WHEN w[k] > 0 THEN (CAST(1 AS BIGINT) << (k - 1))
                          ELSE CAST(0 AS BIGINT) END)),
                   (acc, x) -> acc + x) AS whash
          FROM wht)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.whash, b.whash)) AS INT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.whash, b.whash)) <= 7
        ORDER BY doc_a, doc_b""")),

    // -------------------------------------------------------------------
    // Audio-style PCM windowed energy: interpret the opaque payload as
    // PCM16-LE samples (the standard WAV body layout) and compute
    // per-window sample count, energy (sum of squares) and RMS, plus a
    // silence flag — the voice-activity-detection pre-filter of an
    // audio corpus pipeline. The sample decode + windowed fold is the
    // m02/m06 typed-kernel shape (a real codec drops in by replacing
    // the per-batch body); all energies are exact integer sums, RMS is
    // ONE sqrt of an exact ratio — identical IEEE in both engines.
    // Scale: payloads never leave their partition; windows explode
    // 64-samples-at-a-time per row, narrowly, with no shuffle at all
    // (the output order is the only sort, and a real pipeline drops it).
    QueryDef("m07_pcm_energy",
      (s, d) => {
        val sess = s
        import sess.implicits._
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nSamples = bytes.length / 2
            (0 until (nSamples + 63) / 64).map { w =>
              val lo = w * 64
              val hi = math.min(lo + 64, nSamples)
              var sumSq = 0L
              var k = lo
              while (k < hi) {
                val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
                val sgn = if (raw >= 32768) raw - 65536 else raw
                sumSq += sgn.toLong * sgn
                k += 1
              }
              val n = hi - lo
              val rms = BigDecimal(math.sqrt(sumSq.toDouble / n))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              (r.doc_id, w, n, sumSq, rms, sumSq < 1000L * n)
            }
          }
          .toDF("doc_id", "window_id", "n_samples", "sum_sq", "rms", "is_silence")
          .select(col("doc_id"), col("window_id").cast("int").as("window_id"),
            col("n_samples").cast("int").as("n_samples"), col("sum_sq"),
            col("rms"), col("is_silence"))
          .orderBy("doc_id", "window_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text, length(text) // 2 AS ns
          FROM documents WHERE length(text) >= 2),
        samples AS (
          SELECT doc_id, CAST(u.k AS BIGINT) AS k,
                 ascii(substring(text, CAST(2 * u.k + 1 AS INT), 1))
                 + 256 * ascii(substring(text, CAST(2 * u.k + 2 AS INT), 1)) AS raw
          FROM t, unnest(generate_series(0, ns - 1)) AS u(k)),
        signed AS (
          SELECT doc_id, k,
                 CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS sv
          FROM samples),
        win AS (
          SELECT doc_id, CAST(k // 64 AS INT) AS window_id,
                 CAST(count(*) AS INT) AS n_samples,
                 CAST(sum(CAST(sv AS BIGINT) * sv) AS BIGINT) AS sum_sq
          FROM signed GROUP BY doc_id, k // 64)
        SELECT doc_id, window_id, n_samples, sum_sq,
               round(sqrt(CAST(sum_sq AS DOUBLE) / n_samples), 6) AS rms,
               sum_sq < 1000 * CAST(n_samples AS BIGINT) AS is_silence
        FROM win
        ORDER BY doc_id, window_id""")),

    // -------------------------------------------------------------------
    // Video-style shot-boundary detection: treat each COMPLETE 32-byte
    // slice of the payload as a decoded frame, summarize it as a 16-bin
    // byte histogram (the classic color-histogram shot detector with
    // bins = byte div 16), and flag a boundary wherever the L1 distance
    // to the previous frame's histogram crosses the threshold; a
    // running boundary count assigns shot ids. The per-doc frame walk
    // is sequential BY NATURE (each frame compares to its predecessor),
    // so it runs inside the m02-style typed kernel — one narrow pass,
    // no shuffle, all-integer arithmetic, and a real decoder drops into
    // the same loop. The DuckDB oracle rebuilds histograms from
    // ord()-sliced text and windows over frame order.
    QueryDef("m08_shot_boundary",
      (s, d) => {
        val sess = s
        import sess.implicits._
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nf = bytes.length / 32
            val hists = Array.tabulate(nf) { f =>
              val h = new Array[Int](16)
              var i = f * 32
              while (i < f * 32 + 32) { h((bytes(i) & 0xff) / 16) += 1; i += 1 }
              h
            }
            var shot = 0
            (1 until nf).map { f =>
              var l1 = 0
              var b = 0
              while (b < 16) { l1 += math.abs(hists(f)(b) - hists(f - 1)(b)); b += 1 }
              val boundary = l1 >= 24
              if (boundary) shot += 1
              (r.doc_id, f, l1, boundary, shot)
            }
          }
          .toDF("doc_id", "frame_idx", "l1_prev", "is_boundary", "shot_id")
          .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
            col("l1_prev").cast("int").as("l1_prev"), col("is_boundary"),
            col("shot_id").cast("int").as("shot_id"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text, length(text) // 32 AS nf
          FROM documents WHERE length(text) >= 64),
        frames AS (
          SELECT doc_id, CAST(u.f AS INT) AS f,
                 list_transform(generate_series(0, 15), b ->
                   len(list_filter(generate_series(CAST(u.f AS INT) * 32 + 1, CAST(u.f AS INT) * 32 + 32),
                       i -> ord(text[i]) // 16 = b))) AS hist
          FROM t, unnest(generate_series(0, nf - 1)) AS u(f)),
        lagged AS (
          SELECT doc_id, f, hist,
                 lag(hist) OVER (PARTITION BY doc_id ORDER BY f) AS prev
          FROM frames),
        dist AS (
          SELECT doc_id, f,
                 CAST(list_sum(list_transform(generate_series(1, 16),
                   b -> abs(hist[b] - prev[b]))) AS INT) AS l1_prev
          FROM lagged WHERE prev IS NOT NULL)
        SELECT doc_id, f AS frame_idx, l1_prev,
               l1_prev >= 24 AS is_boundary,
               CAST(sum(CASE WHEN l1_prev >= 24 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY f) AS INT) AS shot_id
        FROM dist
        WHERE l1_prev IS NOT NULL
        ORDER BY doc_id, frame_idx""")),

    // -------------------------------------------------------------------
    // Thumbnail downsample: 2x2 average pooling of the m06 8x8 decode
    // (leading 64 payload bytes, zero-padded) to a 4x4 grid — the
    // resize step of an image pipeline, done in exact integer sums
    // with the average as an exact dyadic division (sum/4.0 is two
    // exponent decrements — bit-identical everywhere). Fully narrow:
    // 16 output cells per row, no shuffle before the output sort.
    QueryDef("m09_avg_pool",
      (s, d) => {
        val px = (r: String, c: String) =>
          s"""CASE WHEN ($r) * 8 + ($c) < length(text)
              THEN ascii(substring(text, ($r) * 8 + ($c) + 1, 1)) ELSE 0 END"""
        Tables.documents(s, d).filter(col("n_chars") > 0)
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(0, 15)")).as("cell"))
          .select(col("doc_id"),
            expr("CAST(cell div 4 AS INT)").as("py"),
            expr("CAST(cell % 4 AS INT)").as("px"),
            expr(s"""CAST(${px("cell div 4 * 2", "cell % 4 * 2")}
                   + ${px("cell div 4 * 2", "cell % 4 * 2 + 1")}
                   + ${px("cell div 4 * 2 + 1", "cell % 4 * 2")}
                   + ${px("cell div 4 * 2 + 1", "cell % 4 * 2 + 1")} AS BIGINT)""").as("psum"))
          .withColumn("pavg", col("psum").cast("double") / lit(4.0))
          .orderBy("doc_id", "py", "px")
      },
      Some {
        val px = (r: String, c: String) =>
          s"""CASE WHEN ($r) * 8 + ($c) < length(text)
              THEN ascii(substring(text, ($r) * 8 + ($c) + 1, 1)) ELSE 0 END"""
        s"""
        WITH cells AS (
          SELECT doc_id, text, CAST(u.cell AS BIGINT) AS cell
          FROM documents, unnest(generate_series(0, 15)) AS u(cell)
          WHERE n_chars > 0)
        SELECT doc_id,
               CAST(cell // 4 AS INT) AS py,
               CAST(cell % 4 AS INT) AS px,
               CAST(${px("cell // 4 * 2", "cell % 4 * 2")}
                  + ${px("cell // 4 * 2", "cell % 4 * 2 + 1")}
                  + ${px("cell // 4 * 2 + 1", "cell % 4 * 2")}
                  + ${px("cell // 4 * 2 + 1", "cell % 4 * 2 + 1")} AS BIGINT) AS psum,
               CAST(${px("cell // 4 * 2", "cell % 4 * 2")}
                  + ${px("cell // 4 * 2", "cell % 4 * 2 + 1")}
                  + ${px("cell // 4 * 2 + 1", "cell % 4 * 2")}
                  + ${px("cell // 4 * 2 + 1", "cell % 4 * 2 + 1")} AS DOUBLE) / 4.0 AS pavg
        FROM cells
        ORDER BY doc_id, py, px"""
      }),

    // -------------------------------------------------------------------
    // Sobel gradient energy over the m09 8x8 byte image: per interior
    // pixel the 3x3 Sobel gx/gy convolutions (exact small integers),
    // rolled up per document into total edge energy sum(gx^2+gy^2), the
    // peak gradient square, and the count of edge pixels above a fixed
    // threshold — the edge-density feature a visual-quality filter
    // ranks on, and pure integer arithmetic end to end (the m02 typed-
    // kernel contract: no codec, deterministic on any partitioning).
    QueryDef("m10_sobel_energy",
      (s, d) => {
        val px = (r: String, c: String) =>
          s"""CASE WHEN ($r) * 8 + ($c) < length(text)
              THEN ascii(substring(text, ($r) * 8 + ($c) + 1, 1)) ELSE 0 END"""
        val gx = s"""((${px("y - 1", "x + 1")}) + 2 * (${px("y", "x + 1")}) + (${px("y + 1", "x + 1")})
                   - (${px("y - 1", "x - 1")}) - 2 * (${px("y", "x - 1")}) - (${px("y + 1", "x - 1")}))"""
        val gy = s"""((${px("y + 1", "x - 1")}) + 2 * (${px("y + 1", "x")}) + (${px("y + 1", "x + 1")})
                   - (${px("y - 1", "x - 1")}) - 2 * (${px("y - 1", "x")}) - (${px("y - 1", "x + 1")}))"""
        Tables.documents(s, d).filter(col("n_chars") > 0)
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(0, 35)")).as("cell"))
          .select(col("doc_id"),
            expr("CAST(cell div 6 + 1 AS INT)").as("y"),
            expr("CAST(cell % 6 + 1 AS INT)").as("x"),
            col("text"))
          .select(col("doc_id"),
            expr(s"CAST($gx AS BIGINT)").as("gx"),
            expr(s"CAST($gy AS BIGINT)").as("gy"))
          .groupBy("doc_id")
          .agg(sum(expr("gx * gx + gy * gy")).as("edge_energy"),
            max(expr("gx * gx + gy * gy")).as("max_g2"),
            sum(expr("CASE WHEN gx * gx + gy * gy > 10000 THEN 1 ELSE 0 END"))
              .as("n_edge_pixels"))
          .orderBy("doc_id")
      },
      Some {
        val px = (r: String, c: String) =>
          s"""CASE WHEN ($r) * 8 + ($c) < length(text)
              THEN ascii(substring(text, ($r) * 8 + ($c) + 1, 1)) ELSE 0 END"""
        val gx = s"""((${px("y - 1", "x + 1")}) + 2 * (${px("y", "x + 1")}) + (${px("y + 1", "x + 1")})
                   - (${px("y - 1", "x - 1")}) - 2 * (${px("y", "x - 1")}) - (${px("y + 1", "x - 1")}))"""
        val gy = s"""((${px("y + 1", "x - 1")}) + 2 * (${px("y + 1", "x")}) + (${px("y + 1", "x + 1")})
                   - (${px("y - 1", "x - 1")}) - 2 * (${px("y - 1", "x")}) - (${px("y - 1", "x + 1")}))"""
        s"""
        WITH cells AS (
          SELECT doc_id, text,
                 CAST(u.cell // 6 + 1 AS INT) AS y,
                 CAST(u.cell % 6 + 1 AS INT) AS x
          FROM documents, unnest(generate_series(0, 35)) AS u(cell)
          WHERE n_chars > 0),
        g AS (
          SELECT doc_id,
                 CAST($gx AS BIGINT) AS gx,
                 CAST($gy AS BIGINT) AS gy
          FROM cells)
        SELECT doc_id,
               CAST(sum(gx * gx + gy * gy) AS BIGINT) AS edge_energy,
               CAST(max(gx * gx + gy * gy) AS BIGINT) AS max_g2,
               CAST(sum(CASE WHEN gx * gx + gy * gy > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_edge_pixels
        FROM g
        GROUP BY doc_id
        ORDER BY doc_id"""
      }),

    // -------------------------------------------------------------------
    // Histogram equalization over the m09 8x8 byte image: the classic
    // CDF remap v' = (cdf(v) - cdf_min) * 255 div (n - cdf_min), all
    // exact integers (counts, prefix sums, one integer division), with
    // the per-doc dynamic-range expansion it buys — the contrast-
    // normalization step of a visual preprocessing pipeline, and the
    // remap table itself is derivable from the output counts. One
    // explode + two window passes per doc; nothing global.
    QueryDef("m11_hist_equalize",
      (s, d) => {
        val px = Tables.documents(s, d).filter(col("n_chars") > 0)
          .select(col("doc_id"), col("text"), explode(expr("sequence(0, 63)")).as("i"))
          .select(col("doc_id"),
            expr("""CASE WHEN i < length(text)
                    THEN ascii(substring(text, i + 1, 1)) ELSE 0 END""").as("v"))
        val hist = px.groupBy("doc_id", "v").agg(count(lit(1)).as("c"))
        val wCdf = Window.partitionBy("doc_id").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wDoc = Window.partitionBy("doc_id")
        val mapped = hist
          .withColumn("cdf", sum(col("c")).over(wCdf))
          .withColumn("cdfmin", min(when(col("cdf") === col("c"), col("c"))).over(wDoc))
          .withColumn("n", sum(col("c")).over(wDoc))
          .withColumn("v2", expr("((cdf - cdfmin) * 255) div greatest(n - cdfmin, CAST(1 AS BIGINT))"))
        mapped.groupBy("doc_id")
          .agg(max(col("n")).as("n_pixels"),
            count(lit(1)).as("n_levels"),
            (max(col("v")) - min(col("v"))).cast("long").as("range_before"),
            (max(col("v2")) - min(col("v2"))).cast("long").as("range_after"))
          .withColumn("range_gain", col("range_after") - col("range_before"))
          .orderBy("doc_id")
      },
      Some("""
        WITH px AS (
          SELECT doc_id,
                 CASE WHEN u.i < length(text)
                      THEN ascii(substr(text, CAST(u.i AS INT) + 1, 1)) ELSE 0 END AS v
          FROM documents, unnest(generate_series(0, 63)) AS u(i)
          WHERE n_chars > 0),
        hist AS (SELECT doc_id, v, count(*) AS c FROM px GROUP BY doc_id, v),
        cdf AS (
          SELECT doc_id, v, c,
                 CAST(sum(c) OVER (PARTITION BY doc_id ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cdf
          FROM hist),
        stats AS (
          SELECT doc_id, v, c, cdf,
                 min(CASE WHEN cdf = c THEN c END) OVER (PARTITION BY doc_id) AS cdfmin,
                 CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
          FROM cdf),
        mapped AS (
          SELECT doc_id, v, c, n,
                 ((cdf - cdfmin) * 255) // greatest(n - cdfmin, 1) AS v2
          FROM stats)
        SELECT doc_id, max(n) AS n_pixels, count(*) AS n_levels,
               CAST(max(v) - min(v) AS BIGINT) AS range_before,
               CAST(max(v2) - min(v2) AS BIGINT) AS range_after,
               CAST(max(v2) - min(v2) AS BIGINT) - CAST(max(v) - min(v) AS BIGINT) AS range_gain
        FROM mapped
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Blur detection via Laplacian variance — the classic sharpness
    // screen (variance of the 4-neighbor Laplacian response; low
    // variance = few edges = blurry/low-information frame) that a
    // visual-data curation pipeline runs before spending decode/embed
    // compute. Same deterministic 8x8 byte "decode" as m10's Sobel;
    // the inner 6x6 responses and their population variance are all
    // exact integers (n is the fixed 36, so var_micro = (n*sumsq -
    // sum^2) * 1e6 div n^2 never leaves BIGINT). Fully narrow — no
    // shuffle until the per-doc rollup.
    QueryDef("m12_blur_score",
      (s, d) => {
        val px = (r: String, c: String) =>
          s"""CASE WHEN ($r) * 8 + ($c) < length(text)
              THEN ascii(substring(text, ($r) * 8 + ($c) + 1, 1)) ELSE 0 END"""
        val lap = s"""(4 * (${px("y", "x")}) - (${px("y - 1", "x")}) - (${px("y + 1", "x")})
                    - (${px("y", "x - 1")}) - (${px("y", "x + 1")}))"""
        Tables.documents(s, d).filter(col("n_chars") > 0)
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(0, 35)")).as("cell"))
          .select(col("doc_id"),
            expr("CAST(cell div 6 + 1 AS INT)").as("y"),
            expr("CAST(cell % 6 + 1 AS INT)").as("x"),
            col("text"))
          .select(col("doc_id"), expr(s"CAST($lap AS BIGINT)").as("l"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_px"), sum(col("l")).as("sum_l"),
            sum(expr("l * l")).as("sum_l2"))
          .select(col("doc_id"), col("sum_l"), col("sum_l2"),
            expr("(n_px * sum_l2 - sum_l * sum_l) * 1000000 div (n_px * n_px)")
              .as("lap_var_micro"))
          .withColumn("is_blurry", col("lap_var_micro") < 5000000000L)
          .orderBy("doc_id")
      },
      Some {
        val px = (r: String, c: String) =>
          s"""CASE WHEN ($r) * 8 + ($c) < length(text)
              THEN ascii(substring(text, ($r) * 8 + ($c) + 1, 1)) ELSE 0 END"""
        val lap = s"""(4 * (${px("y", "x")}) - (${px("y - 1", "x")}) - (${px("y + 1", "x")})
                    - (${px("y", "x - 1")}) - (${px("y", "x + 1")}))"""
        s"""
        WITH cells AS (
          SELECT doc_id, text,
                 CAST(u.cell // 6 + 1 AS INT) AS y,
                 CAST(u.cell % 6 + 1 AS INT) AS x
          FROM documents, unnest(generate_series(0, 35)) AS u(cell)
          WHERE n_chars > 0),
        resp AS (SELECT doc_id, CAST($lap AS BIGINT) AS l FROM cells),
        agg AS (
          SELECT doc_id, count(*) AS n_px,
                 CAST(sum(l) AS BIGINT) AS sum_l,
                 CAST(sum(l * l) AS BIGINT) AS sum_l2
          FROM resp GROUP BY doc_id)
        SELECT doc_id, sum_l, sum_l2,
               CAST((n_px * sum_l2 - sum_l * sum_l) * 1000000 // (n_px * n_px) AS BIGINT) AS lap_var_micro,
               (n_px * sum_l2 - sum_l * sum_l) * 1000000 // (n_px * n_px) < 5000000000 AS is_blurry
        FROM agg
        ORDER BY doc_id"""
      }),

    // -------------------------------------------------------------------
    // PCM zero-crossing rate per 64-sample window — m07's VAD partner:
    // energy says HOW LOUD, ZCR says roughly WHAT KIND (voiced speech
    // is low-ZCR, fricatives/noise high-ZCR; the two together are the
    // classic two-feature voice-activity detector). Same PCM16-LE
    // decode of the payload bytes in the typed kernel; a crossing is a
    // strict sign flip (product < 0) between CONSECUTIVE samples within
    // the window, so every count is an exact integer and the rate is
    // one integer division. Narrow until the final sort.
    QueryDef("m13_zero_crossing",
      (s, d) => {
        val sess = s
        import sess.implicits._
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nSamples = bytes.length / 2
            (0 until (nSamples + 63) / 64).map { w =>
              val lo = w * 64
              val hi = math.min(lo + 64, nSamples)
              var crossings = 0L
              var prev = 0
              var k = lo
              while (k < hi) {
                val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
                val sgn = if (raw >= 32768) raw - 65536 else raw
                if (k > lo && prev * sgn < 0) crossings += 1
                prev = sgn
                k += 1
              }
              val n = (hi - lo).toLong
              val rate = if (n > 1) 1000000L * crossings / (n - 1) else 0L
              (r.doc_id, w, n, crossings, rate)
            }
          }
          .toDF("doc_id", "window_id", "n_samples", "n_crossings", "zcr_micro")
          .select(col("doc_id"), col("window_id").cast("int").as("window_id"),
            col("n_samples"), col("n_crossings"), col("zcr_micro"))
          .orderBy("doc_id", "window_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text, length(text) // 2 AS ns
          FROM documents WHERE length(text) >= 2),
        samples AS (
          SELECT doc_id, CAST(u.k AS BIGINT) AS k,
                 ascii(substring(text, CAST(2 * u.k + 1 AS INT), 1))
                 + 256 * ascii(substring(text, CAST(2 * u.k + 2 AS INT), 1)) AS raw
          FROM t, unnest(generate_series(0, ns - 1)) AS u(k)),
        signed AS (
          SELECT doc_id, k, CAST(k // 64 AS INT) AS window_id,
                 CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS sv
          FROM samples),
        flagged AS (
          SELECT doc_id, window_id, sv,
                 lag(sv) OVER (PARTITION BY doc_id, window_id ORDER BY k) AS prev
          FROM signed),
        win AS (
          SELECT doc_id, window_id,
                 CAST(count(*) AS BIGINT) AS n_samples,
                 CAST(sum(CASE WHEN prev IS NOT NULL AND prev * sv < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings
          FROM flagged GROUP BY doc_id, window_id)
        SELECT doc_id, window_id, n_samples, n_crossings,
               CASE WHEN n_samples > 1 THEN 1000000 * n_crossings // (n_samples - 1)
                    ELSE 0 END AS zcr_micro
        FROM win
        ORDER BY doc_id, window_id""")),

    // -------------------------------------------------------------------
    // Sliding byte-entropy segmentation: 16-bin Shannon entropy per
    // COMPLETE 64-byte payload window — the already-compressed /
    // encrypted-segment detector a media-ingest pipeline runs before
    // wasting transcode or dedup compute (high-entropy windows are
    // incompressible). Histogram counts are exact integers; H =
    // sum c*(ln 64 - ln c)/64 evaluates ln only on those exact ints
    // (identical doubles both engines), floor-quantized micro-nats.
    // One explode + two groupBys, fully narrow per doc.
    QueryDef("m14_entropy_segments",
      (s, d) => {
        val binned = Tables.documents(s, d)
          .filter(length(col("text")) >= 64)
          .select(col("doc_id"), col("text"),
            explode(expr("sequence(0, CAST(length(text) div 64 AS INT) * 64 - 1)")).as("k"))
          .select(col("doc_id"), expr("CAST(k div 64 AS INT)").as("window_id"),
            expr("ascii(substring(text, CAST(k + 1 AS INT), 1)) div 16").as("bin"))
          .groupBy("doc_id", "window_id", "bin").agg(count(lit(1)).as("c"))
        binned.groupBy("doc_id", "window_id")
          .agg(count(lit(1)).as("n_bins"),
            expr("""CAST(floor(1000000 * aggregate(
                      transform(sort_array(collect_list(struct(bin, c))),
                        x -> x.c * (ln(CAST(64 AS DOUBLE)) - ln(CAST(x.c AS DOUBLE)))),
                      CAST(0 AS DOUBLE), (acc, x) -> acc + x) / 64) AS BIGINT)""")
              .as("h_micro"))
          .withColumn("compressed_like", col("h_micro") > 2000000L)
          .orderBy("doc_id", "window_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text FROM documents WHERE length(text) >= 64),
        bytes AS (
          SELECT doc_id, CAST(u.k // 64 AS INT) AS window_id,
                 ascii(substring(text, CAST(u.k + 1 AS INT), 1)) // 16 AS bin
          FROM t, unnest(generate_series(0, (length(text) // 64) * 64 - 1)) AS u(k)),
        binned AS (
          SELECT doc_id, window_id, bin, count(*) AS c
          FROM bytes GROUP BY doc_id, window_id, bin),
        win AS (
          SELECT doc_id, window_id, count(*) AS n_bins,
                 CAST(floor(1000000 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(c * (ln(CAST(64 AS DOUBLE)) - ln(CAST(c AS DOUBLE))) ORDER BY bin)),
                   (acc, x) -> acc + x) / 64) AS BIGINT) AS h_micro
          FROM binned GROUP BY doc_id, window_id)
        SELECT doc_id, window_id, n_bins, h_micro, h_micro > 2000000 AS compressed_like
        FROM win
        ORDER BY doc_id, window_id""")),

    // -------------------------------------------------------------------
    // ReplayGain-lite loudness normalization plan: per track (payload as
    // 16-bit LE PCM, m07's convention) the exact integer sufficient
    // statistics (n, sum of squares, peak |sample|) come from one narrow
    // typed pass — no shuffle until the final per-doc rows. The double
    // layer on top is dBFS loudness 10*log10(ms/32768^2), the gain to a
    // -20 dBFS target, and the peak headroom — and the clip decision
    // compares the two FLOOR-QUANTIZED micro-dB integers, so it is an
    // exact integer comparison, not a float one. Silent tracks
    // (sum_sq = 0) are excluded (log of zero).
    QueryDef("m15_loudness_gain",
      (s, d) => {
        val sess = s
        import sess.implicits._
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nSamples = bytes.length / 2
            if (nSamples == 0) None
            else {
              var sumSq = 0L
              var peak = 0L
              var k = 0
              while (k < nSamples) {
                val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
                val sgn = if (raw >= 32768) raw - 65536 else raw
                sumSq += sgn.toLong * sgn
                val a = math.abs(sgn.toLong)
                if (a > peak) peak = a
                k += 1
              }
              if (sumSq == 0L) None else Some((r.doc_id, nSamples, sumSq, peak))
            }
          }
          .toDF("doc_id", "n_samples", "sum_sq", "peak")
          .select(col("doc_id"), col("n_samples").cast("int").as("n_samples"),
            col("sum_sq"), col("peak"),
            expr("""CAST(floor(1000000 * 10 * log10(
                      CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)
                      / CAST(1073741824 AS DOUBLE))) AS BIGINT)""").as("loudness_udb"),
            expr("""CAST(floor(1000000 * (CAST(-20 AS DOUBLE) - 10 * log10(
                      CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)
                      / CAST(1073741824 AS DOUBLE)))) AS BIGINT)""").as("gain_udb"),
            expr("""CAST(floor(1000000 * 20 * log10(
                      CAST(peak AS DOUBLE) / CAST(32767 AS DOUBLE))) AS BIGINT)""")
              .as("headroom_udb"))
          .withColumn("would_clip", col("gain_udb") > -col("headroom_udb"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text, length(text) // 2 AS ns
          FROM documents WHERE length(text) >= 2),
        samples AS (
          SELECT doc_id, ascii(substring(text, CAST(2 * u.k + 1 AS INT), 1))
                 + 256 * ascii(substring(text, CAST(2 * u.k + 2 AS INT), 1)) AS raw
          FROM t, unnest(generate_series(0, ns - 1)) AS u(k)),
        signed AS (
          SELECT doc_id, CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS sv
          FROM samples),
        agg AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_samples,
                 CAST(sum(CAST(sv AS BIGINT) * sv) AS BIGINT) AS sum_sq,
                 CAST(max(abs(sv)) AS BIGINT) AS peak
          FROM signed GROUP BY doc_id),
        scored AS (
          SELECT doc_id, n_samples, sum_sq, peak,
                 CAST(floor(1000000 * 10 * log10(
                   CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)
                   / CAST(1073741824 AS DOUBLE))) AS BIGINT) AS loudness_udb,
                 CAST(floor(1000000 * (CAST(-20 AS DOUBLE) - 10 * log10(
                   CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)
                   / CAST(1073741824 AS DOUBLE)))) AS BIGINT) AS gain_udb,
                 CAST(floor(1000000 * 20 * log10(
                   CAST(peak AS DOUBLE) / CAST(32767 AS DOUBLE))) AS BIGINT) AS headroom_udb
          FROM agg WHERE sum_sq > 0)
        SELECT doc_id, n_samples, sum_sq, peak, loudness_udb, gain_udb, headroom_udb,
               gain_udb > -headroom_udb AS would_clip
        FROM scored
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Keyframe selection: m08's shot segmentation composed with a
    // per-frame Laplacian sharpness score (sum of |2nd differences| over
    // the 32-byte frame, m12's focus measure) — each shot's
    // representative frame is its sharpest (argmax, earliest-frame
    // tie-break, as a partial-aggregable min(struct)). The thumbnail/
    // poster-frame extractor of a video-training pipeline. All exact
    // integers; the typed kernel is narrow (no shuffle before the
    // per-shot aggregate).
    QueryDef("m16_keyframe_select",
      (s, d) => {
        val sess = s
        import sess.implicits._
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nf = bytes.length / 32
            if (nf < 2) Nil
            else {
              val hists = Array.tabulate(nf) { f =>
                val h = new Array[Int](16)
                var i = f * 32
                while (i < f * 32 + 32) { h((bytes(i) & 0xff) / 16) += 1; i += 1 }
                h
              }
              def energy(f: Int): Int = {
                var e = 0
                var i = f * 32 + 1
                while (i < f * 32 + 31) {
                  e += math.abs((bytes(i - 1) & 0xff) - 2 * (bytes(i) & 0xff) + (bytes(i + 1) & 0xff))
                  i += 1
                }
                e
              }
              var shot = 0
              (0 until nf).map { f =>
                if (f > 0) {
                  var l1 = 0
                  var b = 0
                  while (b < 16) { l1 += math.abs(hists(f)(b) - hists(f - 1)(b)); b += 1 }
                  if (l1 >= 24) shot += 1
                }
                (r.doc_id, shot, f, energy(f))
              }
            }
          }
          .toDF("doc_id", "shot_id", "frame_idx", "energy")
          .groupBy("doc_id", "shot_id")
          .agg(count(lit(1)).cast("long").as("n_frames"),
            min(struct((-col("energy")).as("ne"), col("frame_idx").as("fi"))).as("m"))
          .select(col("doc_id"), col("shot_id").cast("int").as("shot_id"),
            col("n_frames"),
            col("m.fi").cast("int").as("keyframe_idx"),
            (-col("m.ne")).cast("int").as("key_energy"))
          .orderBy("doc_id", "shot_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text, length(text) // 32 AS nf
          FROM documents WHERE length(text) >= 64),
        frames AS (
          SELECT doc_id, CAST(u.f AS INT) AS f,
                 list_transform(generate_series(0, 15), b ->
                   len(list_filter(generate_series(CAST(u.f AS INT) * 32 + 1, CAST(u.f AS INT) * 32 + 32),
                       i -> ord(text[i]) // 16 = b))) AS hist,
                 CAST(list_sum(list_transform(
                   generate_series(CAST(u.f AS INT) * 32 + 2, CAST(u.f AS INT) * 32 + 31),
                   i -> abs(ord(text[i-1]) - 2 * ord(text[i]) + ord(text[i+1])))) AS INT) AS energy
          FROM t, unnest(generate_series(0, nf - 1)) AS u(f)),
        lagged AS (
          SELECT doc_id, f, energy, hist,
                 lag(hist) OVER (PARTITION BY doc_id ORDER BY f) AS prev
          FROM frames),
        shots AS (
          SELECT doc_id, f, energy,
                 CAST(sum(CASE WHEN prev IS NOT NULL AND
                   list_sum(list_transform(generate_series(1, 16),
                     b -> abs(hist[b] - prev[b]))) >= 24 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY f) AS INT) AS shot_id
          FROM lagged),
        ranked AS (
          SELECT doc_id, shot_id, f, energy,
                 count(*) OVER (PARTITION BY doc_id, shot_id) AS n_frames,
                 row_number() OVER (PARTITION BY doc_id, shot_id
                                    ORDER BY energy DESC, f) AS rn
          FROM shots)
        SELECT doc_id, shot_id, CAST(n_frames AS BIGINT) AS n_frames,
               f AS keyframe_idx, energy AS key_energy
        FROM ranked WHERE rn = 1
        ORDER BY doc_id, shot_id""")),

    // -------------------------------------------------------------------
    // Leading/trailing silence trim (the Whisper-style preprocessing
    // pass): per track, m07's 64-sample windows and silence rule
    // (sum_sq < 1000*n), then the first/last voiced window indices and
    // the window counts a trim would cut from each end. All-silent
    // tracks flag for drop with sentinel -1 indices. Exact integers;
    // the voiced argmin/argmax are conditional min/max partial
    // aggregates over the windowed stats — no sequential pass.
    QueryDef("m18_silence_trim",
      (s, d) => {
        val sess = s
        import sess.implicits._
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nSamples = bytes.length / 2
            (0 until (nSamples + 63) / 64).map { w =>
              val lo = w * 64
              val hi = math.min(lo + 64, nSamples)
              var sumSq = 0L
              var k = lo
              while (k < hi) {
                val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
                val sgn = if (raw >= 32768) raw - 65536 else raw
                sumSq += sgn.toLong * sgn
                k += 1
              }
              (r.doc_id, w, sumSq < 1000L * (hi - lo))
            }
          }
          .toDF("doc_id", "w", "silent")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_windows"),
            min(when(!col("silent"), col("w"))).as("fv"),
            max(when(!col("silent"), col("w"))).as("lv"))
          .select(col("doc_id"), col("n_windows"),
            coalesce(col("fv"), lit(-1)).cast("int").as("first_voiced"),
            coalesce(col("lv"), lit(-1)).cast("int").as("last_voiced"),
            coalesce(col("fv"), col("n_windows")).cast("long").as("lead_trim_windows"),
            coalesce(col("n_windows") - 1 - col("lv"), lit(0L)).cast("long")
              .as("tail_trim_windows"),
            col("fv").isNull.as("all_silent"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text, length(text) // 2 AS ns
          FROM documents WHERE length(text) >= 2),
        samples AS (
          SELECT doc_id, CAST(u.k AS BIGINT) AS k,
                 ascii(substring(text, CAST(2 * u.k + 1 AS INT), 1))
                 + 256 * ascii(substring(text, CAST(2 * u.k + 2 AS INT), 1)) AS raw
          FROM t, unnest(generate_series(0, ns - 1)) AS u(k)),
        signed AS (
          SELECT doc_id, k,
                 CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS sv
          FROM samples),
        win AS (
          SELECT doc_id, CAST(k // 64 AS INT) AS w,
                 sum(CAST(sv AS BIGINT) * sv) < 1000 * count(*) AS silent
          FROM signed GROUP BY doc_id, k // 64),
        agg AS (
          SELECT doc_id, count(*) AS n_windows,
                 min(CASE WHEN NOT silent THEN w END) AS fv,
                 max(CASE WHEN NOT silent THEN w END) AS lv
          FROM win GROUP BY doc_id)
        SELECT doc_id, n_windows,
               CAST(coalesce(fv, -1) AS INT) AS first_voiced,
               CAST(coalesce(lv, -1) AS INT) AS last_voiced,
               CAST(coalesce(fv, n_windows) AS BIGINT) AS lead_trim_windows,
               CAST(coalesce(n_windows - 1 - lv, 0) AS BIGINT) AS tail_trim_windows,
               fv IS NULL AS all_silent
        FROM agg
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Spectral centroid per 16-sample PCM frame — the "brightness"
    // feature an audio-curation pipeline computes after energy (m07) /
    // ZCR (m13) / loudness (m15): an 8-bin DFT magnitude spectrum and
    // its centroid Σ k·|X_k| / Σ |X_k|. Cross-engine exactness trick:
    // a 16-point DFT only ever needs cos/sin at multiples of π/8, so
    // the twiddle factors are a FIXED 16-entry integer table in
    // micro-units — re/im are exact BIGINT sums (no runtime trig, no
    // libm divergence), magnitudes and the centroid then run the same
    // IEEE double ops in both engines, with the 8-term sums folded in
    // strict k order. All-zero spectra (constant frames have no AC
    // energy) yield NULL centroid/dominant rather than a 0/0. Scale:
    // one narrow per-row pass (the m07 kernel shape), no shuffle
    // before the final sort.
    QueryDef("m19_spectral_centroid",
      (s, d) => {
        val sess = s
        import sess.implicits._
        val C = Array(1000000L, 923880L, 707107L, 382683L, 0L, -382683L, -707107L,
          -923880L, -1000000L, -923880L, -707107L, -382683L, 0L, 382683L, 707107L, 923880L)
        val S = Array(0L, 382683L, 707107L, 923880L, 1000000L, 923880L, 707107L,
          382683L, 0L, -382683L, -707107L, -923880L, -1000000L, -923880L, -707107L, -382683L)
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nSamples = bytes.length / 2
            val sv = Array.tabulate(nSamples) { i =>
              val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
              if (raw >= 32768) raw - 65536 else raw
            }
            (0 until nSamples / 16).map { f =>
              val mags = Array.tabulate(8) { ki =>
                val k = ki + 1
                var re = 0L; var im = 0L; var n = 0
                while (n < 16) {
                  val x = sv(16 * f + n).toLong
                  val j = (k * n) % 16
                  re += x * C(j)
                  im -= x * S(j)
                  n += 1
                }
                math.sqrt(re.toDouble * re.toDouble + im.toDouble * im.toDouble)
              }
              var den = 0.0; var num = 0.0
              var k = 1
              while (k <= 8) { den += mags(k - 1); num += k.toDouble * mags(k - 1); k += 1 }
              var dom = 1; var best = mags(0)
              k = 2
              while (k <= 8) { if (mags(k - 1) > best) { best = mags(k - 1); dom = k }; k += 1 }
              val centroid =
                if (den == 0.0) None
                else Some(BigDecimal(num / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
              val magTotal = BigDecimal(den / 1000000.0)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              (r.doc_id, f, if (den == 0.0) None else Some(dom), centroid, magTotal)
            }
          }
          .toDF("doc_id", "frame_id", "dominant_bin", "centroid_bin", "mag_total")
          .select(col("doc_id"), col("frame_id").cast("int").as("frame_id"),
            col("dominant_bin").cast("int").as("dominant_bin"),
            col("centroid_bin"), col("mag_total"))
          .orderBy("doc_id", "frame_id")
      },
      Some("""
        WITH ct AS (
          SELECT [1000000, 923880, 707107, 382683, 0, -382683, -707107, -923880,
                  -1000000, -923880, -707107, -382683, 0, 382683, 707107, 923880] AS c,
                 [0, 382683, 707107, 923880, 1000000, 923880, 707107, 382683,
                  0, -382683, -707107, -923880, -1000000, -923880, -707107, -382683] AS sn),
        t AS (
          SELECT doc_id, text, length(text) // 2 AS ns
          FROM documents WHERE length(text) >= 32),
        samples AS (
          SELECT doc_id, CAST(u.i AS BIGINT) AS i,
                 ascii(substring(text, CAST(2 * u.i + 1 AS INT), 1))
                 + 256 * ascii(substring(text, CAST(2 * u.i + 2 AS INT), 1)) AS raw
          FROM t, unnest(generate_series(0, (ns // 16) * 16 - 1)) AS u(i)),
        signed AS (
          SELECT doc_id, CAST(i // 16 AS INT) AS frame_id, CAST(i % 16 AS INT) AS n,
                 CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS sv
          FROM samples),
        bins AS (
          SELECT doc_id, frame_id, kk.k AS k,
                 CAST(sum(CAST(sv AS BIGINT) * c[((kk.k * n) % 16) + 1]) AS BIGINT) AS re_micro,
                 CAST(-sum(CAST(sv AS BIGINT) * sn[((kk.k * n) % 16) + 1]) AS BIGINT) AS im_micro
          FROM signed CROSS JOIN ct, unnest(generate_series(1, 8)) AS kk(k)
          GROUP BY doc_id, frame_id, kk.k),
        mag AS (
          SELECT doc_id, frame_id, k,
                 sqrt(CAST(re_micro AS DOUBLE) * CAST(re_micro AS DOUBLE)
                      + CAST(im_micro AS DOUBLE) * CAST(im_micro AS DOUBLE)) AS m
          FROM bins),
        fr AS (
          SELECT doc_id, frame_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE), list(m ORDER BY k)),
                             (acc, x) -> acc + x) AS den,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                             list(CAST(k AS DOUBLE) * m ORDER BY k)),
                             (acc, x) -> acc + x) AS num
          FROM mag GROUP BY doc_id, frame_id),
        dom AS (
          SELECT doc_id, frame_id, k AS dominant FROM (
            SELECT doc_id, frame_id, k,
                   row_number() OVER (PARTITION BY doc_id, frame_id ORDER BY m DESC, k) AS rn
            FROM mag) WHERE rn = 1)
        SELECT f.doc_id, f.frame_id,
               CASE WHEN f.den = 0 THEN NULL ELSE CAST(d.dominant AS INT) END AS dominant_bin,
               CASE WHEN f.den = 0 THEN NULL ELSE round(f.num / f.den, 6) END AS centroid_bin,
               round(f.den / 1000000.0, 6) AS mag_total
        FROM fr f JOIN dom d ON f.doc_id = d.doc_id AND f.frame_id = d.frame_id
        ORDER BY f.doc_id, f.frame_id""")),

    // -------------------------------------------------------------------
    // Pitch detection per 64-sample PCM frame by autocorrelation — the
    // classic time-domain F0 estimator (the YIN/RAPT family's first
    // stage): R(l) = Σ_{n<64-l} s[n]·s[n+l] for candidate lags 4..32
    // (one-octave-plus band), pitch = argmax R(l) with the smallest lag
    // winning ties, voiced only when the peak is positive. Every R(l)
    // and the energy R(0) are EXACT int64 sums of sample products
    // (|s| < 2^15, ≤ 64 terms → < 2^37), so the argmax is
    // cross-engine deterministic with no float anywhere except the
    // final clarity ratio R(peak)/R(0). Same PCM16-LE payload reading
    // as m07/m13/m19. Scale: one narrow per-row pass (frames × 29 lags
    // of scalar work), no shuffle before the final sort.
    QueryDef("m20_pitch_autocorr",
      (s, d) => {
        val sess = s
        import sess.implicits._
        mediaFromDocuments(s, d)
          .flatMap { r =>
            val bytes = r.payload
            val nSamples = bytes.length / 2
            val sv = Array.tabulate(nSamples) { i =>
              val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
              (if (raw >= 32768) raw - 65536 else raw).toLong
            }
            (0 until nSamples / 64).map { f =>
              val base = 64 * f
              var r0 = 0L
              var n = 0
              while (n < 64) { r0 += sv(base + n) * sv(base + n); n += 1 }
              var bestLag = 0; var bestR = Long.MinValue
              var l = 4
              while (l <= 32) {
                var acc = 0L; var i = 0
                while (i < 64 - l) { acc += sv(base + i) * sv(base + i + l); i += 1 }
                if (acc > bestR) { bestR = acc; bestLag = l }
                l += 1
              }
              val voiced = bestR > 0L && r0 > 0L
              (r.doc_id, f,
                if (voiced) Some(bestLag) else None,
                if (voiced) Some(bestR) else None,
                r0,
                if (voiced)
                  Some(BigDecimal(bestR.toDouble / r0.toDouble)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
                else None)
            }
          }
          .toDF("doc_id", "frame_id", "pitch_lag", "r_peak", "r0", "clarity")
          .select(col("doc_id"), col("frame_id").cast("int").as("frame_id"),
            col("pitch_lag").cast("int").as("pitch_lag"), col("r_peak"),
            col("r0"), col("clarity"))
          .orderBy("doc_id", "frame_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text, length(text) // 2 AS ns
          FROM documents WHERE length(text) >= 128),
        samples AS (
          SELECT doc_id, CAST(u.i AS BIGINT) AS i,
                 ascii(substring(text, CAST(2 * u.i + 1 AS INT), 1))
                 + 256 * ascii(substring(text, CAST(2 * u.i + 2 AS INT), 1)) AS raw
          FROM t, unnest(generate_series(0, (ns // 64) * 64 - 1)) AS u(i)),
        signed AS (
          SELECT doc_id, CAST(i // 64 AS INT) AS frame_id, CAST(i % 64 AS INT) AS n,
                 CAST(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS BIGINT) AS sv
          FROM samples),
        e AS (
          SELECT doc_id, frame_id, CAST(sum(sv * sv) AS BIGINT) AS r0
          FROM signed GROUP BY doc_id, frame_id),
        ac AS (
          SELECT a.doc_id, a.frame_id, ll.l,
                 CAST(sum(a.sv * b.sv) AS BIGINT) AS r
          FROM signed a CROSS JOIN unnest(generate_series(4, 32)) AS ll(l)
          JOIN signed b ON b.doc_id = a.doc_id AND b.frame_id = a.frame_id
                       AND b.n = a.n + ll.l
          GROUP BY a.doc_id, a.frame_id, ll.l),
        best AS (
          SELECT doc_id, frame_id, l, r FROM (
            SELECT doc_id, frame_id, l, r,
                   row_number() OVER (PARTITION BY doc_id, frame_id
                                      ORDER BY r DESC, l) AS rn
            FROM ac) WHERE rn = 1)
        SELECT e.doc_id, e.frame_id,
               CASE WHEN b.r > 0 AND e.r0 > 0 THEN CAST(b.l AS INT) END AS pitch_lag,
               CASE WHEN b.r > 0 AND e.r0 > 0 THEN b.r END AS r_peak,
               e.r0,
               CASE WHEN b.r > 0 AND e.r0 > 0
                    THEN round(CAST(b.r AS DOUBLE) / CAST(e.r0 AS DOUBLE), 6) END AS clarity
        FROM e JOIN best b ON e.doc_id = b.doc_id AND e.frame_id = b.frame_id
        ORDER BY e.doc_id, e.frame_id""")),

    // -------------------------------------------------------------------
    // Perceptual hash (pHash) via an 8×8 DCT-II — the DCT sibling of
    // m06's wavelet hash: strided-mean-pool the payload bytes into an
    // 8×8 grayscale grid, transform rows then columns, and set one bit
    // per AC coefficient above the AC median. Cross-engine exactness:
    // the DCT twiddles cos(π(2n+1)k/16) are a FIXED 8×8 integer table
    // in micro-units (the m19 trick), so both passes are exact int64
    // sums (|coef| ≤ ~1.6e16); the pool is integer floor-mean; the
    // median is the ranked 32nd of 63 values — no float exists
    // anywhere in this operator. AC index (u,k)≠(0,0) maps to bit
    // u·8+k−1 ∈ [0,62], keeping the hash in positive int64. Scale:
    // one narrow per-row pass, no shuffle before the final sort.
    QueryDef("m21_phash_dct",
      (s, d) => {
        val sess = s
        import sess.implicits._
        val C = Array(
          Array(1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L),
          Array(980785L, 831470L, 555570L, 195090L, -195090L, -555570L, -831470L, -980785L),
          Array(923880L, 382683L, -382683L, -923880L, -923880L, -382683L, 382683L, 923880L),
          Array(831470L, -195090L, -980785L, -555570L, 555570L, 980785L, 195090L, -831470L),
          Array(707107L, -707107L, -707107L, 707107L, 707107L, -707107L, -707107L, 707107L),
          Array(555570L, -980785L, 195090L, 831470L, -831470L, -195090L, 980785L, -555570L),
          Array(382683L, -923880L, 923880L, -382683L, -382683L, 923880L, -923880L, 382683L),
          Array(195090L, -555570L, 831470L, -980785L, 980785L, -831470L, 555570L, -195090L))
        mediaFromDocuments(s, d)
          .filter(length(col("payload")) >= 64)
          .map { r =>
            val bytes = r.payload
            val sums = Array.fill(64)(0L); val cnts = Array.fill(64)(0L)
            var p = 0
            while (p < bytes.length) {
              val j = p % 64
              sums(j) += bytes(p) & 0xff; cnts(j) += 1; p += 1
            }
            val g = Array.tabulate(64)(j => sums(j) / cnts(j))
            val a = Array.ofDim[Long](8, 8) // a(r)(k) = Σ_c g(r,c)·C(k)(c)
            var rr = 0
            while (rr < 8) {
              var k = 0
              while (k < 8) {
                var acc = 0L; var c = 0
                while (c < 8) { acc += g(8 * rr + c) * C(k)(c); c += 1 }
                a(rr)(k) = acc; k += 1
              }
              rr += 1
            }
            val b = Array.ofDim[Long](8, 8) // b(u)(k) = Σ_r a(r)(k)·C(u)(r)
            var u = 0
            while (u < 8) {
              var k = 0
              while (k < 8) {
                var acc = 0L; var r2 = 0
                while (r2 < 8) { acc += a(r2)(k) * C(u)(r2); r2 += 1 }
                b(u)(k) = acc; k += 1
              }
              u += 1
            }
            val ac = (for (u2 <- 0 until 8; k2 <- 0 until 8 if u2 != 0 || k2 != 0)
              yield (u2 * 8 + k2 - 1, b(u2)(k2))).toArray
            val med = ac.map(_._2).sorted.apply(31)
            var phash = 0L; var nset = 0L
            ac.foreach { case (idx, v) =>
              if (v > med) { phash |= 1L << idx; nset += 1 }
            }
            (r.doc_id, phash, nset, med)
          }
          .toDF("doc_id", "phash", "n_bits_set", "median_coef")
          .orderBy("doc_id")
      },
      Some("""
        WITH ct AS (
          SELECT [[1000000, 1000000, 1000000, 1000000, 1000000, 1000000, 1000000, 1000000],
                  [980785, 831470, 555570, 195090, -195090, -555570, -831470, -980785],
                  [923880, 382683, -382683, -923880, -923880, -382683, 382683, 923880],
                  [831470, -195090, -980785, -555570, 555570, 980785, 195090, -831470],
                  [707107, -707107, -707107, 707107, 707107, -707107, -707107, 707107],
                  [555570, -980785, 195090, 831470, -831470, -195090, 980785, -555570],
                  [382683, -923880, 923880, -382683, -382683, 923880, -923880, 382683],
                  [195090, -555570, 831470, -980785, 980785, -831470, 555570, -195090]] AS c),
        t AS (
          SELECT doc_id, text, length(text) AS len
          FROM documents WHERE length(text) >= 64),
        bytes AS (
          SELECT doc_id, CAST((u.i - 1) % 64 AS INT) AS j,
                 CAST(ascii(substring(text, CAST(u.i AS INT), 1)) AS BIGINT) AS bv
          FROM t, unnest(generate_series(1, len)) AS u(i)),
        grid AS (
          SELECT doc_id, j, CAST(sum(bv) // count(*) AS BIGINT) AS g
          FROM bytes GROUP BY doc_id, j),
        rowpass AS (
          SELECT doc_id, j // 8 AS r, kk.k AS k,
                 CAST(sum(g * c[kk.k + 1][(j % 8) + 1]) AS BIGINT) AS a
          FROM grid CROSS JOIN ct, unnest(generate_series(0, 7)) AS kk(k)
          GROUP BY doc_id, j // 8, kk.k),
        colpass AS (
          SELECT doc_id, uu.u AS u, k,
                 CAST(sum(a * c[uu.u + 1][r + 1]) AS BIGINT) AS b
          FROM rowpass CROSS JOIN ct, unnest(generate_series(0, 7)) AS uu(u)
          GROUP BY doc_id, uu.u, k),
        ac AS (
          SELECT doc_id, CAST(u * 8 + k - 1 AS INT) AS idx, b
          FROM colpass WHERE NOT (u = 0 AND k = 0)),
        med AS (
          SELECT doc_id, b AS medv FROM (
            SELECT doc_id, b, row_number() OVER (PARTITION BY doc_id ORDER BY b, idx) AS rn
            FROM ac) WHERE rn = 32)
        SELECT a.doc_id,
               CAST(sum(CASE WHEN a.b > m.medv THEN CAST(1 AS BIGINT) << a.idx ELSE 0 END)
                    AS BIGINT) AS phash,
               CAST(sum(CASE WHEN a.b > m.medv THEN 1 ELSE 0 END) AS BIGINT) AS n_bits_set,
               CAST(max(m.medv) AS BIGINT) AS median_coef
        FROM ac a JOIN med m ON a.doc_id = m.doc_id
        GROUP BY a.doc_id
        ORDER BY a.doc_id""")),

    // -------------------------------------------------------------------
    // Run-length compressibility probe: byte runs in the raw payload
    // (boundary = byte differs from its predecessor, one lag window per
    // doc) and the RLE size estimate 2·runs — the zero-cost "is this
    // column worth RLE/dictionary encoding" stat a storage layer
    // gathers before choosing parquet encodings (m14's entropy probe
    // answers the same question for entropy coders). All integers;
    // ratio micro-floored. Scale: one narrow explode + one lag window
    // keyed by doc — same shape as m14.
    QueryDef("m22_rle_compressibility",
      (s, d) => {
        val w = Window.partitionBy("doc_id").orderBy("i")
        Tables.documents(s, d)
          .select(col("doc_id"), posexplode(expr(
            "transform(split(text, ''), c -> ascii(c))")).as(Seq("i", "bv")))
          .withColumn("boundary",
            when(lag(col("bv"), 1).over(w).isNull
              || lag(col("bv"), 1).over(w) =!= col("bv"), 1L).otherwise(0L))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bytes"), sum(col("boundary")).as("n_runs"))
          .select(col("doc_id"), col("n_bytes"), col("n_runs"),
            (col("n_runs") * 2).as("rle_bytes"),
            expr("n_runs * 2 * 1000000 div n_bytes").as("ratio_micro"),
            (col("n_runs") * 2 < col("n_bytes")).as("rle_wins"))
          .orderBy("doc_id")
      },
      Some("""
        WITH b AS (
          SELECT doc_id, u.i,
                 ascii(substring(text, CAST(u.i AS INT), 1)) AS bv
          FROM documents, unnest(generate_series(1, length(text))) AS u(i)),
        m AS (
          SELECT doc_id,
                 CASE WHEN lag(bv) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
                        OR lag(bv) OVER (PARTITION BY doc_id ORDER BY i) <> bv
                      THEN 1 ELSE 0 END AS boundary
          FROM b)
        SELECT doc_id, count(*) AS n_bytes,
               CAST(sum(boundary) AS BIGINT) AS n_runs,
               CAST(sum(boundary) * 2 AS BIGINT) AS rle_bytes,
               CAST(sum(boundary) * 2 * 1000000 // count(*) AS BIGINT) AS ratio_micro,
               sum(boundary) * 2 < count(*) AS rle_wins
        FROM m
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // SSIM between consecutive 64-pixel frames (Wang et al. 2004 — the
    // perceptual structural-similarity metric; complements m08's
    // histogram-L1 cut detector with the luminance/contrast/structure
    // decomposition real video dedup uses). Every moment is an exact
    // integer sum; the /64 normalizations are DYADIC, so mu/var/cov are
    // EXACT doubles, and the one SSIM combination is a single
    // identically-spelled expression in both engines (the K1/K2
    // stabilizers 6.5025/58.5225 cast from the same decimal literal to
    // the same double), floor-quantized once. Scale: pixel rows explode
    // to docs x frames x 64 with partial-agg moment sums; the
    // consecutive-frame pairing is an equi-join on (doc, pixel index).
    QueryDef("m23_ssim_frames", {
      val mu = (sv: String) => s"(CAST($sv AS DOUBLE) / CAST(64 AS DOUBLE))"
      val vr = (svv: String, sv: String) =>
        s"(CAST($svv AS DOUBLE) / CAST(64 AS DOUBLE) - ${mu(sv)} * ${mu(sv)})"
      val ssim = "CAST(floor(1000000 * (" +
        s"((2 * ${mu("sx")} * ${mu("sy")} + CAST(6.5025 AS DOUBLE))" +
        s" * (2 * (CAST(sxy AS DOUBLE) / CAST(64 AS DOUBLE) - ${mu("sx")} * ${mu("sy")}) + CAST(58.5225 AS DOUBLE)))" +
        s" / ((${mu("sx")} * ${mu("sx")} + ${mu("sy")} * ${mu("sy")} + CAST(6.5025 AS DOUBLE))" +
        s" * (${vr("sxx", "sx")} + ${vr("syy", "sy")} + CAST(58.5225 AS DOUBLE)))" +
        ")) AS BIGINT)"
      (s: SparkSession, d: String) => {
        val pix = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            expr("CAST(length(text) div 64 AS INT)").as("nf"))
          .filter(col("nf") >= 2)
          .select(col("doc_id"), col("text"), col("nf"),
            explode(expr("sequence(0, nf - 1)")).as("f"))
          .select(col("doc_id"), col("f"),
            explode(expr("sequence(0, 63)")).as("i"), col("text"))
          .select(col("doc_id"), col("f"), col("i"),
            expr("ascii(substring(text, f * 64 + i + 1, 1))").as("v"))
        val mom = pix.groupBy("doc_id", "f")
          .agg(sum(col("v")).as("sv"), sum(expr("v * v")).as("svv"))
        val sxy = pix.select(col("doc_id"), col("f"), col("i"), col("v"))
          .join(pix.select(col("doc_id").as("d2"), (col("f") - 1).as("f2"),
              col("i").as("i2"), col("v").as("v2")),
            col("doc_id") === col("d2") && col("f") === col("f2") && col("i") === col("i2"))
          .groupBy("doc_id", "f").agg(sum(expr("v * v2")).as("sxy"))
        mom.select(col("doc_id"), col("f"), col("sv").as("sx"), col("svv").as("sxx"))
          .join(mom.select(col("doc_id").as("dy"), (col("f") - 1).as("fy"),
            col("sv").as("sy"), col("svv").as("syy")),
            col("doc_id") === col("dy") && col("f") === col("fy"))
          .join(sxy, Seq("doc_id", "f"))
          .select(col("doc_id"), col("f").as("frame_pair"),
            expr(ssim).as("ssim_micro"))
          .withColumn("is_cut", col("ssim_micro") < 300000L)
          .orderBy("doc_id", "frame_pair")
      }
    },
      Some {
        val mu = (sv: String) => s"(CAST($sv AS DOUBLE) / CAST(64 AS DOUBLE))"
        val vr = (svv: String, sv: String) =>
          s"(CAST($svv AS DOUBLE) / CAST(64 AS DOUBLE) - ${mu(sv)} * ${mu(sv)})"
        val ssim = "CAST(floor(1000000 * (" +
          s"((2 * ${mu("sx")} * ${mu("sy")} + CAST(6.5025 AS DOUBLE))" +
          s" * (2 * (CAST(sxy AS DOUBLE) / CAST(64 AS DOUBLE) - ${mu("sx")} * ${mu("sy")}) + CAST(58.5225 AS DOUBLE)))" +
          s" / ((${mu("sx")} * ${mu("sx")} + ${mu("sy")} * ${mu("sy")} + CAST(6.5025 AS DOUBLE))" +
          s" * (${vr("sxx", "sx")} + ${vr("syy", "sy")} + CAST(58.5225 AS DOUBLE)))" +
          ")) AS BIGINT)"
        s"""
        WITH frames AS (
          SELECT doc_id, text, CAST(length(text) // 64 AS INT) AS nf
          FROM documents WHERE length(text) // 64 >= 2),
        pix AS (
          SELECT doc_id, CAST(uf.f AS INT) AS f, CAST(ui.i AS INT) AS i,
                 ascii(substring(text, CAST(uf.f * 64 + ui.i + 1 AS INT), 1)) AS v
          FROM frames,
               unnest(generate_series(0, nf - 1)) AS uf(f),
               unnest(generate_series(0, 63)) AS ui(i)),
        mom AS (
          SELECT doc_id, f, CAST(sum(v) AS BIGINT) AS sv,
                 CAST(sum(v * v) AS BIGINT) AS svv
          FROM pix GROUP BY doc_id, f),
        sxyt AS (
          SELECT a.doc_id, a.f, CAST(sum(a.v * b.v) AS BIGINT) AS sxy
          FROM pix a JOIN pix b
            ON a.doc_id = b.doc_id AND a.f = b.f - 1 AND a.i = b.i
          GROUP BY a.doc_id, a.f),
        paired AS (
          SELECT x.doc_id, x.f AS frame_pair,
                 x.sv AS sx, x.svv AS sxx, y.sv AS sy, y.svv AS syy, s.sxy
          FROM mom x
          JOIN mom y ON x.doc_id = y.doc_id AND y.f = x.f + 1
          JOIN sxyt s ON x.doc_id = s.doc_id AND x.f = s.f)
        SELECT doc_id, frame_pair, $ssim AS ssim_micro,
               $ssim < 300000 AS is_cut
        FROM paired
        ORDER BY doc_id, frame_pair"""
      })
  )
}
