package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Binary
import graft.sources.Tables

/** Multimodal-column queries. Document text stands in for the binary
  * payload (UTF-8 encode), exercising the real plumbing: binary
  * columns, batched per-partition decode, frame sampling by byte
  * stride. md5 exists in both engines, so the feature outputs are
  * fully oracle-checked even though the "decoder" is a stub. */
object Multimodal {

  /** Binary ingestion + batched stub decode + checksum. */
  val binaryFeatures: Q = Q(
    "mm_binary_features",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS first_byte,
      |  md5(text) AS checksum
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
    val decoded = Binary.decodeBatch(s, payloads)
    decoded.toDF()
      .join(payloads.select(col("doc_id"), md5(col("data")).as("checksum")),
        "doc_id")
      .select(col("doc_id"), col("n_bytes"), col("first_byte"), col("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Frame/patch sampling: fixed-stride byte windows per payload (the
    * video-frame / audio-window access pattern), one stub feature per
    * frame. Distributed explode — frames never leave the executor. */
  val frameSample: Q = Q(
    "mm_frame_sample",
    """SELECT doc_id, i AS frame_id,
      |  len(substr(text, i * 64 + 1, 64)) AS frame_len,
      |  md5(substr(text, i * 64 + 1, 64)) AS frame_sig
      |FROM (SELECT doc_id, text,
      |  unnest(range(0, (len(text) + 63) // 64)) AS i FROM documents)
      |ORDER BY doc_id, frame_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          floor((length(col("text")) - 1) / 64).cast("int"))).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("frame_id"),
        length(col("text").substr(col("i") * 64 + 1, lit(64))).as("frame_len"),
        md5(col("text").substr(col("i") * 64 + 1, lit(64)).cast("binary"))
          .as("frame_sig"))
      .orderBy(col("doc_id"), col("frame_id"))
  }

  /** Audio-style OVERLAPPING windows (window 320 bytes, hop 160 —
    * 50% overlap, the standard STFT framing) with an integer energy
    * per window, complementing mm_frame_sample's disjoint stride.
    * Window count is hop-quantized so overlap multiplies data 2x,
    * not O(window); energy is an exact integer byte-sum, so the
    * whole framing layout is oracle-checked. */
  val audioWindow: Q = Q(
    "mm_audio_window",
    """WITH w AS (
      |  SELECT doc_id, w AS window_id, substr(text, w * 160 + 1, 320) AS win
      |  FROM (SELECT doc_id, text,
      |    unnest(range(0, ((greatest(len(text) - 320, 0) + 159) // 160) + 1))
      |      AS w
      |    FROM documents))
      |SELECT doc_id, window_id, len(win) AS n_samples,
      |  COALESCE(CAST(list_sum(list_transform(range(1, len(win) + 1),
      |    i -> ascii(win[i]))) AS BIGINT), 0) AS energy
      |FROM w ORDER BY doc_id, window_id""".stripMargin) { (s, dir) =>
    val nWin = (greatest(length(col("text")) - 320, lit(0)) + 159)
      .divide(160).cast("long") + 1
    // materialize the window substring as an attribute FIRST: the
    // HOF lambda below re-evaluates its argument per element
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nWin - 1)).as("window_id"))
      .select(col("doc_id"), col("window_id"),
        col("text").substr((col("window_id") * 160 + 1).cast("int"),
          lit(320)).as("win"))
    // fold over an exploded char array, NOT substr(win, i, 1) per
    // element — positional substr re-seeks from the string start, so
    // the per-window cost would be O(window²)
    w.withColumn("chars", split(col("win"), ""))
      .select(col("doc_id"), col("window_id"),
        length(col("win")).as("n_samples"),
        when(length(col("win")) > 0,
          aggregate(col("chars"), lit(0L), (acc, c) => acc + ascii(c)))
          .otherwise(0L).as("energy"))
      .orderBy(col("doc_id"), col("window_id"))
  }

  /** Spectrogram feature extraction over the PCM stand-in (the
    * mm_audio_window sample model: one byte = one sample): per
    * 320-sample window (hop 160), DFT energy at 4 fixed frequency
    * bins — energy_k = re² + im², re = Σ x_i·cosq(k,i), im = Σ
    * x_i·sinq(k,i) — the feature row an audio dedup/classification
    * pipeline consumes.
    *
    * Float discipline: the trig table is QUANTIZED to integer
    * milli-units (round(cos(2πki/320)·1000)), so every product and
    * sum is pure int64 — order-independent, hash-identical. The
    * quantization itself is safe BY CONSTRUCTION: the angles are
    * rational multiples of 2π, whose only rational cosines are
    * 0, ±1/2, ±1 (Niven), so no table entry sits on a .5 rounding
    * boundary — verified numerically, the nearest entry is 1.4e-3
    * away, 10 orders above any libm ulp disagreement. Overflow headroom:
    * |Σ| ≤ 127·1000·320 ≈ 4.1e7, energy ≤ 3.4e15 ≪ int64. One
    * corpus pass, per-row arrays, shuffle-free. */
  val audioSpectrogram: Q = Q(
    "mm_audio_spectrogram",
    """WITH w AS (
      |  SELECT doc_id, w AS window_id, substr(text, w * 160 + 1, 320) AS win
      |  FROM (SELECT doc_id, text,
      |    unnest(range(0, ((greatest(len(text) - 320, 0) + 159) // 160) + 1))
      |      AS w
      |    FROM documents)),
      |comp AS (
      |  SELECT doc_id, window_id, k AS bin,
      |    CAST(COALESCE(list_sum(list_transform(range(1, len(win) + 1),
      |      i -> ascii(win[i]) * CAST(round(
      |        cos(2 * pi() * k * (i - 1) / 320.0) * 1000) AS BIGINT))),
      |      0) AS BIGINT) AS re,
      |    CAST(COALESCE(list_sum(list_transform(range(1, len(win) + 1),
      |      i -> ascii(win[i]) * CAST(round(
      |        sin(2 * pi() * k * (i - 1) / 320.0) * 1000) AS BIGINT))),
      |      0) AS BIGINT) AS im
      |  FROM w CROSS JOIN (SELECT unnest([1, 3, 7, 13]) AS k))
      |SELECT doc_id, window_id, bin, re * re + im * im AS energy
      |FROM comp ORDER BY doc_id, window_id, bin""".stripMargin) { (s, dir) =>
    val nWin = (greatest(length(col("text")) - 320, lit(0)) + 159)
      .divide(160).cast("long") + 1
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nWin - 1)).as("window_id"))
      .select(col("doc_id"), col("window_id"),
        col("text").substr((col("window_id") * 160 + 1).cast("int"),
          lit(320)).as("win"))
      .withColumn("chars", split(col("win"), ""))
    def fold(k: Int, f: Column => Column): Column =
      aggregate(
        transform(col("chars"), (c, i) =>
          ascii(c).cast("long") *
            round(f(lit(2 * math.Pi * k / 320.0) * i.cast("double"))
              * 1000, 0).cast("long")),
        lit(0L), (a, x) => a + x)
    val bins = array(Seq(1, 3, 7, 13).map(k =>
      struct(lit(k).as("bin"), fold(k, cos).as("re"),
        fold(k, sin).as("im"))): _*)
    w.select(col("doc_id"), col("window_id"),
        explode(bins).as("c"))
      .select(col("doc_id"), col("window_id"), col("c.bin").as("bin"),
        (col("c.re") * col("c.re") + col("c.im") * col("c.im"))
          .as("energy"))
      .orderBy(col("doc_id"), col("window_id"), col("bin"))
  }

  /** Scene-cut detection over the byte-stride video model (the
    * mm_frame_sample frame layout: disjoint 64-byte frames): a scene
    * boundary is a consecutive-frame pair whose per-byte absolute
    * delta sum exceeds the threshold (64·16 — mean delta 16/byte),
    * the classic content-based shot detector every video-curation
    * pipeline runs before frame sampling. Per-doc outputs: frame
    * count, scene count (boundaries + 1), total inter-frame delta.
    * Exact integers end to end; the frame pairing is one LAG window
    * per doc (frames-per-doc bounded by payload size — the bounded-
    * bands rule), delta folds are per-row array ops over O(1)
    * element taps. */
  val sceneDetect: Q = Q(
    "mm_scene_detect",
    """WITH f AS (
      |  SELECT doc_id, i AS frame_id, substr(text, i * 64 + 1, 64) AS fr
      |  FROM (SELECT doc_id, text,
      |    unnest(range(0, (len(text) + 63) // 64)) AS i FROM documents)),
      |d AS (
      |  SELECT doc_id, frame_id, fr,
      |    LAG(fr) OVER (PARTITION BY doc_id ORDER BY frame_id) AS prev
      |  FROM f),
      |delta AS (
      |  SELECT doc_id, frame_id,
      |    CASE WHEN prev IS NULL THEN NULL
      |      ELSE CAST(COALESCE(list_sum(list_transform(
      |        range(1, least(len(fr), len(prev)) + 1),
      |        i -> abs(ascii(fr[i]) - ascii(prev[i])))), 0) AS BIGINT)
      |      END AS d
      |  FROM d)
      |SELECT doc_id, COUNT(*) AS n_frames,
      |  1 + COUNT(*) FILTER (WHERE d > 1024) AS n_scenes,
      |  CAST(COALESCE(SUM(d), 0) AS BIGINT) AS total_delta
      |FROM delta GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val f = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          floor((length(col("text")) - 1) / 64).cast("int"))).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("frame_id"),
        col("text").substr(col("i") * 64 + 1, lit(64)).as("fr"))
    val w = Window.partitionBy("doc_id").orderBy("frame_id")
    val paired = f
      .withColumn("prev", lag(col("fr"), 1).over(w))
      .withColumn("a", split(col("fr"), ""))
      .withColumn("b", split(col("prev"), ""))
    val d = paired.withColumn("d",
      when(col("prev").isNull, lit(null).cast("long")).otherwise(
        aggregate(
          transform(
            sequence(lit(1), least(size(col("a")), size(col("b")))
              .cast("int")),
            i => abs(ascii(element_at(col("a"), i))
              - ascii(element_at(col("b"), i))).cast("long")),
          lit(0L), (acc, x) => acc + x)))
    d.groupBy("doc_id").agg(
        count(lit(1)).as("n_frames"),
        (lit(1L) + count(when(col("d") > 1024, 1))).as("n_scenes"),
        coalesce(sum(col("d")), lit(0L)).as("total_delta"))
      .orderBy(col("doc_id"))
  }

  /** 2-D convolution over the byte-grid image stand-in (the
    * mm_patchify pixel model: text = a 16-wide grid, one byte = one
    * pixel): Sobel-x edge energy Σ|gx| and a 3×3 box-blur checksum
    * over the interior — the feature pass an image-quality/dedup
    * pipeline runs before training. Pure integer arithmetic end to
    * end (pixel values are code points, kernels are integer), so
    * sums are exact and order-independent. The pixel grid is
    * materialized ONCE per row as a split array and accessed by
    * O(1) element_at — never a positional substr per tap (the
    * O(n²) re-seek trap); one corpus pass, per-row arrays,
    * shuffle-free. */
  val imageConv: Q = Q(
    "mm_image_conv",
    """WITH g AS (
      |  SELECT doc_id, string_split(text, '') AS px,
      |    len(text) // 16 AS h
      |  FROM documents),
      |conv AS (
      |  SELECT doc_id, h,
      |    list_sum(list_transform(range(0, (h - 2) * 14), m ->
      |      abs(-ascii(px[(m // 14) * 16 + (m % 14) + 1])
      |          + ascii(px[(m // 14) * 16 + (m % 14) + 3])
      |          - 2 * ascii(px[(m // 14 + 1) * 16 + (m % 14) + 1])
      |          + 2 * ascii(px[(m // 14 + 1) * 16 + (m % 14) + 3])
      |          - ascii(px[(m // 14 + 2) * 16 + (m % 14) + 1])
      |          + ascii(px[(m // 14 + 2) * 16 + (m % 14) + 3]))))
      |      AS edge_energy,
      |    list_sum(list_transform(range(0, (h - 2) * 14), m ->
      |      ascii(px[(m // 14) * 16 + (m % 14) + 1])
      |      + ascii(px[(m // 14) * 16 + (m % 14) + 2])
      |      + ascii(px[(m // 14) * 16 + (m % 14) + 3])
      |      + ascii(px[(m // 14 + 1) * 16 + (m % 14) + 1])
      |      + ascii(px[(m // 14 + 1) * 16 + (m % 14) + 2])
      |      + ascii(px[(m // 14 + 1) * 16 + (m % 14) + 3])
      |      + ascii(px[(m // 14 + 2) * 16 + (m % 14) + 1])
      |      + ascii(px[(m // 14 + 2) * 16 + (m % 14) + 2])
      |      + ascii(px[(m // 14 + 2) * 16 + (m % 14) + 3])))
      |      AS blur_sum
      |  FROM g WHERE h >= 3)
      |SELECT doc_id, h, CAST(edge_energy AS BIGINT) AS edge_energy,
      |  CAST(blur_sum AS BIGINT) AS blur_sum
      |FROM conv ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val g = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), "").as("px"),
        floor(length(col("text")) / 16).cast("long").as("h"))
      .filter(col("h") >= 3)
    // tap(r, c): pixel at grid row (m/14 + r), col (m%14 + c), both
    // 0-based over the interior's top-left anchor; +1 for SQL's
    // 1-based element_at
    def tap(m: Column, r: Int, c: Int): Column =
      // floor-div, NOT `/` — Column./ is double division
      ascii(element_at(col("px"),
        ((floor(m / 14).cast("long") + r) * 16
          + pmod(m, lit(14)) + c + 1).cast("int")))
        .cast("long")
    def fold(body: Column => Column): Column =
      aggregate(
        transform(sequence(lit(0L), (col("h") - 2) * 14 - 1), body),
        lit(0L), (a, x) => a + x)
    g.select(col("doc_id"), col("h"),
        fold(m => abs(-tap(m, 0, 0) + tap(m, 0, 2)
          - lit(2L) * tap(m, 1, 0) + lit(2L) * tap(m, 1, 2)
          - tap(m, 2, 0) + tap(m, 2, 2))).as("edge_energy"),
        fold(m => tap(m, 0, 0) + tap(m, 0, 1) + tap(m, 0, 2)
          + tap(m, 1, 0) + tap(m, 1, 1) + tap(m, 1, 2)
          + tap(m, 2, 0) + tap(m, 2, 1) + tap(m, 2, 2)).as("blur_sum"))
      .orderBy(col("doc_id"))
  }

  /** Resize/downsample plumbing (the image-resize analogue over 1-D
    * payloads): nearest-neighbor 4x decimation — keep every 4th
    * byte — expressed as ONE codegen'd regexp_replace pass
    * ('(.).{0,3}' → '$1'), not a positional per-sample substr loop
    * (O(len²)) and not an explode/reassemble shuffle. A real image
    * resize swaps the kernel inside the same one-pass-per-row,
    * output-plus-metadata shape.
    *
    * (?s) on BOTH sides: without DOTALL, Java's '.' refuses \r and
    * the U+0085/U+2028/U+2029 line breaks while RE2's refuses only
    * \n, so a corpus with any of those would silently shift the two
    * engines' chunk alignment apart. DOTALL makes '.' mean "any
    * char" identically everywhere — parity by construction, not by
    * corpus luck. */
  val resizeNn: Q = Q(
    "mm_resize_nn",
    """SELECT doc_id, len(text) AS n_in,
      |  len(regexp_replace(text, '(?s)(.).{0,3}', '\1', 'g')) AS n_out,
      |  md5(regexp_replace(text, '(?s)(.).{0,3}', '\1', 'g')) AS sig
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val down = regexp_replace(col("text"), "(?s)(.).{0,3}", "$1")
    Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).as("n_in"), down.as("d"))
      .select(col("doc_id"), col("n_in"), length(col("d")).as("n_out"),
        md5(col("d").cast("binary")).as("sig"))
      .orderBy(col("doc_id"))
  }

  /** ViT-style patch extraction: the payload as a 16-wide 2D image
    * cut into 4x4 patches — the strided-gather access pattern every
    * vision-transformer ingest runs before embedding (patchify). Each
    * patch is P strided substrings concatenated: pure codegen'd
    * string ops, no UDF, patches never leave the executor. COMPLETE
    * patch rows only (gh = len // (W·P) — a defined metric, mirrored
    * in the oracle); docs shorter than one patch row emit nothing.
    * Geometry is corpus-sized (docs run ~300 chars → ~16 patches
    * each); a real 224x224/16x16 deployment only changes the two
    * constants. Payload decode stays the documented stub (chars
    * stand in for bytes, identically on both engines). */
  val patchify: Q = Q(
    "mm_patchify",
    """WITH g AS (
      |  SELECT doc_id, text, len(text) // 64 AS gh FROM documents),
      |pid AS (
      |  SELECT doc_id, text, unnest(range(0, gh * 4)) AS i
      |  FROM g WHERE gh > 0),
      |p AS (
      |  SELECT doc_id, i // 4 AS patch_row, i % 4 AS patch_col,
      |    list_reduce(list_transform(range(0, 4),
      |      k -> substr(text, ((i // 4) * 4 + k) * 16 + (i % 4) * 4 + 1, 4)),
      |      (a, b) -> a || b) AS patch
      |  FROM pid)
      |SELECT doc_id, patch_row, patch_col, md5(patch) AS patch_sig
      |FROM p ORDER BY doc_id, patch_row, patch_col""".stripMargin) { (s, dir) =>
    val W = 16; val P = 4; val gw = W / P
    val withGrid = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / (W * P)).cast("long").as("gh"))
      .filter(col("gh") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("gh") * gw - 1)).as("i"))
      .select(col("doc_id"), col("text"),
        floor(col("i") / gw).cast("long").as("patch_row"),
        pmod(col("i"), lit(gw)).cast("long").as("patch_col"))
    val patch = concat((0 until P).map(k =>
      col("text").substr(
        (col("patch_row") * P + k) * W + col("patch_col") * P + 1,
        lit(P))): _*)
    withGrid
      .select(col("doc_id"), col("patch_row"), col("patch_col"),
        md5(patch.cast("binary")).as("patch_sig"))
      .orderBy(col("doc_id"), col("patch_row"), col("patch_col"))
  }

  /** REAL image decode — javax.imageio's JDK-shipped PNG reader, no
    * external libraries (the half of the "codecs stubbed" disclaimer
    * that no longer applies; audio/video remain stubbed). Each doc
    * plants a deterministic PNG payload (geometry and pixels are
    * functions of doc_id — the container has no image files), and the
    * decode stage recovers dimensions, channel count, and exact
    * integer channel sums from the BYTES alone, as a batched
    * per-partition stage on a binary column. Rows-only like
    * doc_load_files (binary format parsing has no SQL twin);
    * MultimodalSpec pins the decode against hand-computed pixel stats
    * and the planted formula, and pins that corrupt payloads drop
    * instead of killing the scan. */
  /** doc_id spine for payload SYNTHESIS, spread over the session's
    * full parallelism (guide §2.5): the documents scan is a handful
    * of small splits, and everything expensive in the mm codec
    * queries — encode, decode, fingerprint — is per-ROW work
    * downstream of it, so without this the whole family ran on 2-3
    * of 32 cores. The repartition ships 8-byte ids (round-robin —
    * deterministic per-row output, and every consumer is
    * row-independent); max() keeps a genuinely wide id source wide. */
  private def idSpine(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    val ids = Tables.documents(s, dir).select(col("doc_id"))
    ids.repartition(math.max(ids.rdd.getNumPartitions,
        s.sparkContext.defaultParallelism))
      .as[Long]
  }

  /** The planted PNG payload column both mm_image_* queries decode:
    * geometry (4 + id%5) x (3 + id%4), pixels from the ImageCodec
    * planted formula — ONE definition, because the formula is also
    * the spec's recompute target. */
  private def plantedPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    idSpine(s, dir)
      .mapPartitions(_.map { id =>
        (id, Binary.ImageCodec.plantedPng(id,
          (4 + id % 5).toInt, (3 + id % 4).toInt))
      }).toDF("doc_id", "data")
  }

  val imageDecode: Q = Q.rowsOnly("mm_image_decode") { (s, dir) =>
    Binary.ImageCodec.decodeImages(s, plantedPayloads(s, dir)).toDF()
      .orderBy(col("doc_id"))
  }

  /** Real-decode image resize — the genuine decode→kernel→stats
    * pipeline on actual pixel rasters (mm_resize_nn is the
    * byte-stream analogue): decode the planted PNG, nearest-neighbor
    * 2x downsample (out(x,y) = in(2x,2y), dims = ceil(dim/2)), exact
    * integer channel sums of the RESULT. Rows-only like
    * mm_image_decode; MultimodalSpec recomputes the downsampled sums
    * straight from the planted pixel formula. */
  val imageResize: Q = Q.rowsOnly("mm_image_resize") { (s, dir) =>
    Binary.ImageCodec.decodeResized(s, plantedPayloads(s, dir), f = 2).toDF()
      .orderBy(col("doc_id"))
  }

  /** REAL audio decode — javax.sound.sampled's JDK-shipped WAV/PCM
    * reader, no external libraries (retires the audio half of the
    * "codecs stubbed" disclaimer; video remains the stub). Each doc
    * plants a deterministic mono 16-bit WAV (sample values are a
    * function of doc_id — the container has no audio files), and the
    * decode stage recovers sample rate, channel count, bit depth, and
    * exact integer sample sums from the BYTES alone — RIFF container
    * parse included — as a batched per-partition stage on a binary
    * column. Rows-only like mm_image_decode (binary format parsing
    * has no SQL twin); MultimodalSpec pins the decode against the
    * planted sample formula and pins that corrupt payloads drop
    * instead of killing the scan. */
  private def plantedWavPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NO idSpine here (unlike the image/video builders): the audio
    // codec still goes through javax.sound.AudioSystem, whose
    // per-call provider registry is synchronized — spreading the
    // rows over 32 tasks measured SLOWER (2.3 s vs 1.1 s) than the
    // plain 2-3-task scan because the threads serialize on the
    // registry lock. De-contending it needs JDK-internal writer
    // classes; left alone, documented in OPTIMIZATION_r17.md.
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, Binary.AudioCodec.plantedWav(id,
          nSamples = (64 + id % 97).toInt, sampleRate = 8000))
      }).toDF("doc_id", "data")
  }

  val audioDecode: Q = Q.rowsOnly("mm_audio_decode") { (s, dir) =>
    Binary.AudioCodec.decodeAudios(s, plantedWavPayloads(s, dir)).toDF()
      .orderBy(col("doc_id"))
  }

  /** REAL multi-frame video-style decode — javax.imageio's JDK-shipped
    * animated-GIF reader (a genuine multi-frame container; proprietary
    * codecs like H.264 stay disclosed out-of-scope, no codec libs in
    * this container). Each doc plants a deterministic animated GIF
    * (frame count, geometry, and grayscale pixels are functions of
    * doc_id), and the decode stage extracts EVERY frame from the
    * container bytes — one output row per frame with exact integer
    * gray sums — as a batched per-partition stage. Rows-only like
    * mm_image_decode; MultimodalSpec recomputes per-frame sums from
    * the planted formula and pins the corrupt-drop contract. */
  private def plantedGifPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    idSpine(s, dir)
      .mapPartitions(_.map { id =>
        (id, Binary.VideoCodec.plantedGif(id,
          (4 + id % 5).toInt, (3 + id % 4).toInt, (2 + id % 4).toInt))
      }).toDF("doc_id", "data")
  }

  val videoFrames: Q = Q.rowsOnly("mm_video_frames") { (s, dir) =>
    Binary.VideoCodec.decodeVideos(s, plantedGifPayloads(s, dir)).toDF()
      .orderBy(col("doc_id"), col("frame_id"))
  }

  /** Perceptual image near-dedup over REAL decoded rasters — the
    * multimodal member of the dedup family (a crawl's re-encoded /
    * brightness-shifted image copies share no bytes, so content-hash
    * dedup misses them): decode each planted PNG, take its 64-bit
    * dHash (gradient-sign fingerprint — Binary.ImageCodec.dHash),
    * generate candidate pairs by BANDED equi-join (4 x 16-bit bands;
    * pigeonhole: any pair within Hamming distance 3 agrees exactly on
    * at least one band — guaranteed recall, the bit-sampling LSH for
    * Hamming space), and verify candidates with one codegen'd
    * bit_count(XOR) <= 3. The planted corpus: every doc with
    * doc_id % 7 == 3 carries a +12-brightness-shifted copy of doc
    * (id-1)'s image — every file byte differs, dHash is bit-identical
    * (no clipping by construction), so exactly those (id-1, id) pairs
    * surface at Hamming 0; all other images are pseudorandom rasters
    * ~32 bits apart. Scale shape: candidates are a bucketed equi-join
    * on (band, value) — never all-pairs — and the verify is a single
    * integer op per candidate; band fan-out is data-dependent but
    * each false candidate costs one XOR. Rows-only like
    * mm_image_decode (binary decode has no SQL twin); MultimodalSpec
    * pins the planted pair set, Hamming values, and the
    * corrupt-payload drop. */
  private def dedupPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    idSpine(s, dir)
      .mapPartitions(_.map { id =>
        val src = if (id % 7 == 3) id - 1 else id
        val shift = if (id % 7 == 3) 12 else 0
        (id, Binary.ImageCodec.plantedPngMixed(src,
          (12 + src % 5).toInt, (9 + src % 4).toInt, shift))
      }).toDF("doc_id", "data")
  }

  val imageDedup: Q = Q.rowsOnly("mm_image_dedup") { (s, dir) =>
    val hashes = Binary.ImageCodec.hashImages(s, dedupPayloads(s, dir))
      .cache() // feeds both sides of the banded self-join
    graft.operators.HammingLsh.pairs(hashes, "doc_id", "dhash")
  }

  /** Perceptual AUDIO near-dedup — the acoustic member of the dedup
    * family, completing it across modalities (text shingles, vector
    * cosine, image dHash, now waveform fingerprints): decode each
    * planted WAV's PCM, fingerprint its amplitude envelope (65 equal
    * windows, exact integer energies, bit w = sign of the
    * energy(w+1)−energy(w) gradient — the Haitsma-Kalker/Chromaprint
    * sign-of-delta family over the envelope), then the SAME banded
    * Hamming LSH + bit_count(XOR) verify as mm_image_dedup
    * (operators.HammingLsh, shared). The planted corpus: every doc
    * with doc_id % 9 == 5 carries a gain-2 re-master of doc (id-1)'s
    * clip — amplitudes stay within ±12000 so doubling never clips,
    * every window energy scales exactly 2x, every gradient sign
    * survives, so exactly those (id-1, id) pairs surface at Hamming
    * 0 while every PCM byte differs; unrelated clips are pseudorandom
    * envelopes ~32 bits apart. Scale shape identical to
    * mm_image_dedup: bucketed equi-join candidates, one integer op
    * per verify. Rows-only (binary decode); MultimodalSpec pins the
    * planted pair set, the gain-invariance law, and the corrupt /
    * too-short drop. */
  private def audioDedupPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // no idSpine — see plantedWavPayloads (AudioSystem registry lock)
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val src = if (id % 9 == 5) id - 1 else id
        val gain = if (id % 9 == 5) 2 else 1
        (id, Binary.AudioCodec.plantedWavMixed(src,
          nSamples = (400 + src % 129).toInt, sampleRate = 8000, gain = gain))
      }).toDF("doc_id", "data")
  }

  val audioDedup: Q = Q.rowsOnly("mm_audio_dedup") { (s, dir) =>
    val fps = Binary.AudioCodec.fingerprintAudios(s, audioDedupPayloads(s, dir))
      .cache() // feeds both sides of the banded self-join
    graft.operators.HammingLsh.pairs(fps, "doc_id", "afp")
  }

  /** Perceptual VIDEO near-dedup — the temporal member closing the
    * perceptual family across its three axes: the image dHash signs
    * gradients along SPACE, the audio fingerprint along the amplitude
    * envelope, this one along TIME (Binary.VideoCodec
    * .temporalFingerprint: 16 frame transitions × 4 shift-invariant
    * per-frame signals — luma sum, x/y contrast, half-difference —
    * over 17 decoded frames, the frame-envelope shape of the
    * TMK/video copy-detection family). Candidates and verify are the SHARED
    * operators.HammingLsh banded equi-join + bit_count(XOR) ≤ 3 —
    * one integer op per candidate, never all-pairs. The planted
    * corpus: every doc with doc_id % 11 == 4 carries a brightness-9
    * re-encode of doc (id-1)'s clip (pixels stay < 249, no wrap), so
    * every file byte differs, every frame sum shifts by exactly
    * w·h·9, every delta sign survives, and exactly those (id-1, id)
    * pairs surface at Hamming 0; unrelated clips are pseudorandom
    * envelopes ~32 bits apart. Rows-only (binary decode);
    * MultimodalSpec pins the planted pair set, the shift-invariance
    * law, and the corrupt / too-short drop. */
  private def videoDedupPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    idSpine(s, dir)
      .mapPartitions(_.map { id =>
        val src = if (id % 11 == 4) id - 1 else id
        val shift = if (id % 11 == 4) 9 else 0
        (id, Binary.VideoCodec.plantedGifMixed(src, 6, 5,
          Binary.VideoCodec.FingerprintFrames, shift))
      }).toDF("doc_id", "data")
  }

  val videoDedup: Q = Q.rowsOnly("mm_video_dedup") { (s, dir) =>
    val fps = Binary.VideoCodec.fingerprintVideos(s, videoDedupPayloads(s, dir))
      .cache() // feeds both sides of the banded self-join
    graft.operators.HammingLsh.pairs(fps, "doc_id", "vfp")
  }

  /** Spectral perceptual image dedup — pHash (32x32 grayscale →
    * 2-D DCT-II → low-frequency 8x8 block, bits vs the AC mean,
    * Binary.ImageCodec.pHash), the frequency-domain complement of
    * mm_image_dedup's gradient-sign dHash: dHash keys on local edges,
    * pHash on global low-frequency structure — a production pipeline
    * runs both and unions the pair sets, because each is blind to the
    * other's invariance class (noise that flips local gradients vs
    * edits that move energy between frequency bands). Same planted
    * corpus and the SAME shared banded Hamming LSH + bit_count(XOR)
    * verify (operators.HammingLsh) — one more 64-bit fingerprint
    * column through one candidate machinery. Brightness invariance
    * is exact by construction (a constant shift moves only the DC
    * coefficient, excluded from the mean), so the planted +12-shift
    * re-encodes surface at Hamming 0 here too. Rows-only (binary
    * decode); MultimodalSpec pins the planted pairs, the exact
    * brightness-invariance law, and that dHash and pHash agree on
    * this corpus's pair set. */
  val imageDedupPhash: Q = Q.rowsOnly("mm_image_dedup_phash") { (s, dir) =>
    val hashes = Binary.ImageCodec.pHashImages(s, dedupPayloads(s, dir))
      .cache() // feeds both sides of the banded self-join
    graft.operators.HammingLsh.pairs(hashes, "doc_id", "phash")
  }

  val all: Seq[Q] = Seq(binaryFeatures, frameSample, audioWindow, resizeNn,
    patchify, imageDecode, imageResize, audioDecode, videoFrames, imageDedup,
    audioDedup, videoDedup, imageDedupPhash, audioSpectrogram, imageConv, sceneDetect)
}
