package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * plumbing.
  *
  * The real decoders (image/audio codecs) are STUBBED — this container has
  * no media libraries — behind [[fakeDecodeFeatures]], a deterministic
  * stand-in keyed on content bytes. Everything around the stub is real
  * Spark plumbing and is what matters at 100 TB: binary columns ride
  * parquet as BYTE_ARRAY (scans prune them unless projected), metadata is
  * a typed struct usable in predicates WITHOUT touching the payload, and
  * per-chunk operators are array expressions that parallelize per row with
  * no shuffle. On a cluster with codec libs, swap `fakeDecodeFeatures` for
  * a `mapPartitions` (arrow-batched) decoder with the same signature.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Build an asset table from any (id, text) source — a fixture
    * generator that treats UTF-8 bytes as the opaque payload. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col(textCol)).cast("long").as("n_bytes"),
        (pmod(col(idCol), lit(640)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 1).cast("int").as("height")).as("meta"))

  /** STUB decode: deterministic "features" from the payload — md5 content
    * id, byte length, and a fake 4-dim embedding from hash bytes. The
    * real implementation decodes pixels/samples here; the signature (one
    * row in, one feature struct out, no shuffle) is the contract. */
  def fakeDecodeFeatures(df: DataFrame): DataFrame =
    df.withColumn("content_md5", md5(col("content")))
      .withColumn("content_bytes", length(col("content")).cast("long"))
      .withColumn("fake_embedding",
        expr("transform(sequence(1, 4), i -> " +
          "(instr('0123456789abcdef', substring(md5(content), i, 1)) - 1) / cast(15 as double))"))

  /** STUB resize: scales the payload stand-in by output/input pixel-area
    * ratio (capped at the original size) and rewrites the meta struct to
    * the target dimensions. The real implementation decodes, scales and
    * re-encodes here; what this pins is the Spark contract — meta is
    * recomputed WITHOUT a shuffle, predicates on the new dimensions stay
    * usable, and the payload transform is per-row. */
  def fakeResize(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val area = (targetW.toLong * targetH).toDouble
    df.withColumn("resized_bytes",
        least(col("meta.n_bytes"),
          ceil(col("meta.n_bytes") * lit(area) /
            (col("meta.width") * col("meta.height"))).cast("long")))
      .withColumn("resized_content",
        expr("substring(content, 1, cast(resized_bytes AS INT))"))
      .withColumn("meta", struct(
        col("meta.mime").as("mime"),
        col("resized_bytes").as("n_bytes"),
        lit(targetW).cast("int").as("width"),
        lit(targetH).cast("int").as("height")))
  }

  /** Frame sampling: split the payload into fixed-size chunks ("frames")
    * and keep every strideth chunk. Pure array expressions — the 100 TB
    * path: per-row work, no shuffle, and column pruning means unsampled
    * assets never leave the scan. */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.withColumn("frame_count",
        ceil(col("meta.n_bytes").cast("double") / frameBytes).cast("long"))
      .withColumn("sampled_frames",
        expr(s"""transform(
                |  filter(sequence(0, cast(frame_count - 1 AS INT)), i -> i % $stride = 0),
                |  i -> struct(i AS frame_no,
                |              md5(substring(content, i * $frameBytes + 1, $frameBytes)) AS frame_md5))
                |""".stripMargin))

  /** Explode sampled frames into a (asset_id, frame_no, frame_md5) table. */
  def frameTable(sampled: DataFrame): DataFrame =
    sampled.select(col("asset_id"), explode(col("sampled_frames")).as("f"))
      .select(col("asset_id"), col("f.frame_no").as("frame_no"),
        col("f.frame_md5").as("frame_md5"))

  /** Perceptual fingerprint over binary payloads — aHash's block-mean
    * rule applied to the STUB decode's sample stream (the payload bytes
    * read back as a codepoint sequence; a real deployment swaps the
    * stream for decoded luma/PCM samples via [[decodeWith]], the bit
    * rule is codec-agnostic): 64 equal-span blocks over the stream, bit
    * b = (block b's mean sample) > (global mean sample).
    *
    * Engine-exactness: the comparison is INTEGER-only —
    * `sum_b · L > S · l_b` (block sum, total length, total sum, block
    * length) — so no double rounding can fork between Spark and the
    * DuckDB oracle, including empty blocks on assets shorter than 64
    * samples (0 > 0 = false → bit 0).
    *
    * Scale shape: one scan-side projection per asset (the per-row
    * lambdas are O(payload) interpreted work bounded by asset size, not
    * corpus size), no shuffle; the output is a skinny (id, 64-char
    * bit-string) table that feeds the SAME Manku block-key machinery as
    * the text SimHash path — near-dup candidate volume stays linear in
    * true dups at any corpus size. */
  def perceptualHash(
      assets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content"): DataFrame = {
    // Codegen'd explode + partial-agg, NOT a per-row HOF pipeline: the
    // transparent transform/aggregate-lambda form runs INTERPRETED
    // (~20 ms/asset — it dominated the whole query), while
    // split/posexplode/ascii/sum compile into whole-stage codegen with a
    // map-side partial aggregate, and the only remaining per-row lambda
    // work is a 64-entry map lookup. Block membership uses the closed
    // form b(i) = ceil(64·i/L) − 1, PROVABLY identical to the oracle's
    // slice partition (e_b = floor((b+1)·L/64): i ≤ e_b ⟺ b+1 ≥
    // ceil(64·i/L), integer i) — so the fingerprint is bit-identical to
    // the transparent form at codegen speed.
    val decoded = assets
      .select(col(idCol), expr(s"decode($contentCol, 'UTF-8')").as("_s"))
    val chars = decoded
      .select(col(idCol), length(col("_s")).cast("long").as("_L"),
        posexplode(split(col("_s"), "")).as(Seq("_p", "_c")))
      .filter(col("_c") =!= "") // split(, '', -1) keeps a trailing empty
      .select(col(idCol), col("_L"),
        // _p is posexplode's 32-bit position: promote to BIGINT before
        // the ×64 or the product wraps on payloads past ~2^25 chars and
        // the batch form diverges from the row form's long arithmetic
        expr("(64 * (CAST(_p AS BIGINT) + 1) + _L - 1) div _L - 1").cast("int").as("b"),
        ascii(col("_c")).cast("long").as("code"))
    val agg = chars
      .groupBy(col(idCol), col("_L"), col("b"))
      .agg(sum("code").as("sb"), count(lit(1)).as("lb"))
      .groupBy(col(idCol))
      .agg(first("_L").as("_L"), sum("sb").as("_S"),
        expr("map_from_entries(collect_list(struct(b, struct(sb, lb))))").as("_m"))
    // LEFT join back to the asset base: a ZERO-LENGTH payload explodes to
    // no rows and would silently vanish from the output — it must emit
    // the all-zero fingerprint the row form produces (0 > 0 is false for
    // every block; nulls coalesce the same way)
    decoded.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        expr(
          """array_join(transform(sequence(0, 63), bb -> IF(
            |  coalesce(try_element_at(_m, bb).sb, 0L) * coalesce(_L, 0L) >
            |  coalesce(_S, 0L) * coalesce(try_element_at(_m, bb).lb, 0L),
            |  '1', '0')), '')""".stripMargin).as("phash"))
  }

  /** The stream-legal PROJECTION form of [[perceptualHash]]: identical
    * bit rule and block partition (slice boundaries ≡ the closed form —
    * same proof), computed per row with higher-order array expressions.
    * Interpreted, so ~an order slower per asset than the batch form's
    * codegen'd explode+agg — the price of statelessness; use it where a
    * groupBy can't run (streaming gates), the batch form everywhere
    * else. Both forms are value-equal (spec-pinned). */
  def perceptualHashRow(
      assets: DataFrame,
      contentCol: String = "content"): DataFrame =
    assets
      .withColumn("_s", expr(s"decode($contentCol, 'UTF-8')"))
      .withColumn("_L", length(col("_s")).cast("long"))
      .withColumn("_codes",
        expr("transform(sequence(1, CAST(greatest(_L, 1) AS INT)), i -> CAST(ascii(substring(_s, i, 1)) AS BIGINT))"))
      .withColumn("_S", expr("aggregate(_codes, 0L, (a, x) -> a + x)"))
      .withColumn("phash",
        expr(
          s"""array_join(transform(sequence(0, 63), b -> IF(
             |  aggregate(slice(_codes, CAST(b * _L DIV 64 AS INT) + 1,
             |      CAST((b + 1) * _L DIV 64 - b * _L DIV 64 AS INT)),
             |    0L, (a, x) -> a + x) * _L >
             |  _S * ((b + 1) * _L DIV 64 - b * _L DIV 64),
             |  '1', '0')), '')""".stripMargin))
      .drop("_s", "_L", "_codes", "_S")

  /** Perceptual near-dup pairs at hamming distance ≤ `maxDist` (≤ 2)
    * over [[perceptualHash]] fingerprints — block-key candidates + exact
    * verify via the shared [[Dedup.hammingPairs64]] core, never
    * all-pairs. */
  def phashPairs(
      assets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      maxDist: Int = 2): DataFrame =
    Dedup.hammingPairs64(
      perceptualHash(assets, idCol, contentCol)
        .select(col(idCol), col("phash").as("simhash")),
      idCol, maxDist)

  /** dHash — the GRADIENT fingerprint beside [[perceptualHash]]'s
    * brightness-mean aHash: 65 equal-span blocks over the decoded
    * stream, bit b (0..63) = (block b's mean) > (block b+1's mean).
    * aHash thresholds every block against one global mean, so a uniform
    * brightness/volume shift that preserves block ORDER can still move
    * bits; dHash compares ADJACENT blocks only, so it keys on local
    * structure and catches re-encodes aHash misses (and vice versa —
    * production unions both pair sets, as the asset-manifest flagship
    * does).
    *
    * Engine-exactness: the bit rule is INTEGER-only —
    * `s_b · l_{b+1} > s_{b+1} · l_b` (block sums × opposite block
    * lengths; exact up to payloads of ~2^27 bytes, far past any sample
    * stream) — and empty blocks contribute (0, 0), so short and
    * zero-length payloads produce all-zero fingerprints identically in
    * both engines. Block partition uses the same closed form as aHash
    * (b(i) = ceil(65·i/L) − 1 ≡ the oracle's slice partition — same
    * proof as [[perceptualHash]], 65 for 64).
    *
    * Scale shape: identical to aHash — codegen'd split/posexplode/sum
    * partial-agg per asset, no shuffle beyond the per-asset groupBy, and
    * the output feeds the SAME Manku block-key machinery, so candidate
    * volume stays linear in true dups. */
  def dhash(
      assets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content"): DataFrame = {
    val decoded = assets
      .select(col(idCol), expr(s"decode($contentCol, 'UTF-8')").as("_s"))
    val chars = decoded
      .select(col(idCol), length(col("_s")).cast("long").as("_L"),
        posexplode(split(col("_s"), "")).as(Seq("_p", "_c")))
      .filter(col("_c") =!= "") // split(, '', -1) keeps a trailing empty
      .select(col(idCol), col("_L"),
        // long arithmetic: _p is a 32-bit position (see perceptualHash)
        expr("(65 * (CAST(_p AS BIGINT) + 1) + _L - 1) div _L - 1").cast("int").as("b"),
        ascii(col("_c")).cast("long").as("code"))
    val agg = chars
      .groupBy(col(idCol), col("_L"), col("b"))
      .agg(sum("code").as("sb"), count(lit(1)).as("lb"))
      .groupBy(col(idCol))
      .agg(expr("map_from_entries(collect_list(struct(b, struct(sb, lb))))").as("_m"))
    // LEFT join: zero-length payloads explode to no rows but must emit
    // the all-zero fingerprint (0·0 > 0·0 false for every adjacent pair)
    decoded.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        expr(
          """array_join(transform(sequence(0, 63), bb -> IF(
            |  coalesce(try_element_at(_m, bb).sb, 0L) *
            |    coalesce(try_element_at(_m, bb + 1).lb, 0L) >
            |  coalesce(try_element_at(_m, bb + 1).sb, 0L) *
            |    coalesce(try_element_at(_m, bb).lb, 0L),
            |  '1', '0')), '')""".stripMargin).as("dhash"))
  }

  /** Gradient near-dup pairs at hamming ≤ `maxDist` (≤ 2) over [[dhash]]
    * fingerprints — the same shared block-key candidate core as
    * [[phashPairs]]. */
  def dhashPairs(
      assets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      maxDist: Int = 2): DataFrame =
    Dedup.hammingPairs64(
      dhash(assets, idCol, contentCol)
        .select(col(idCol), col("dhash").as("simhash")),
      idCol, maxDist)

  /** Every perceptual near-dup pair INVOLVING a new asset batch —
    * new↔new plus new↔old via [[Dedup.hammingPairsDelta]]'s cross-set
    * block probe — the edge feed for incremental manifest maintenance:
    * only the DELTA's payloads are fingerprinted (the old side reads a
    * standing fingerprint table, here re-derived for the fixture), and
    * with [[graft.ops.Cluster.mergeClusters]] the result reproduces the
    * full-recompute clustering exactly. */
  def phashPairsDelta(
      newAssets: DataFrame,
      oldAssets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      maxDist: Int = 2): DataFrame =
    Dedup.hammingPairsDelta(
      perceptualHash(newAssets, idCol, contentCol)
        .select(col(idCol), col("phash").as("simhash")),
      perceptualHash(oldAssets, idCol, contentCol)
        .select(col(idCol), col("phash").as("simhash")),
      idCol, maxDist)

  /** [[phashPairsDelta]] for the [[dhash]] gradient family. */
  def dhashPairsDelta(
      newAssets: DataFrame,
      oldAssets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      maxDist: Int = 2): DataFrame =
    Dedup.hammingPairsDelta(
      dhash(newAssets, idCol, contentCol)
        .select(col(idCol), col("dhash").as("simhash")),
      dhash(oldAssets, idCol, contentCol)
        .select(col(idCol), col("dhash").as("simhash")),
      idCol, maxDist)

  /** Per-frame perceptual fingerprints for a video-shaped asset: the
    * payload's sampled frame windows (length `frameLen`, stride
    * `stride` — the [[fakeFrames]] sampling shape) each get the SAME
    * integer-exact aHash as [[perceptualHash]], keyed by
    * (asset, frame_no). Frames ride a composite id through the shared
    * hash machinery (`asset_id·10⁴ + frame_no`), and the 10⁴-frames-per-
    * asset envelope that keying requires is ENFORCED in-plan: an asset
    * longer than `stride·10⁴` bytes fails loudly at execution (the KMV
    * k-contract precedent) instead of silently bleeding frame ids into
    * the next asset's id space and corrupting both fingerprint profiles.
    * Returns (idCol, frame_no, fhash). */
  def frameHashes(
      assets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      frameLen: Int = 64,
      stride: Int = 128): DataFrame = {
    val frames = assets
      .select(col(idCol), expr(s"decode($contentCol, 'UTF-8')").as("_s"))
      .withColumn("_L", length(col("_s")).cast("long"))
      .withColumn("_cnt", ceil(col("_L") / lit(stride.toDouble)).cast("int"))
      // composite-id envelope: assert_true is non-foldable, so Catalyst
      // keeps the guard in the plan and an over-envelope asset throws at
      // its row rather than aliasing into a neighbor's id space. A NULL
      // payload makes _cnt null — AssertTrue raises on a null condition
      // — so coalesce keeps null-payload rows on their historical path
      // (zero frames, no throw) and the error message intact
      .where(assert_true(coalesce(col("_cnt"), lit(0)) < lit(10000),
        concat(lit("frameHashes: asset "), col(idCol),
          lit(s" has "), coalesce(col("_cnt"), lit(0)),
          lit(s" frames; the asset_id*10^4+frame_no composite id holds" +
            s" at most 10^4 (payload must stay under stride*10^4 =" +
            s" ${stride * 10000L} bytes)"))).isNull)
      // greatest guard: sequence(0, -1) is DESCENDING in Spark, never
      // empty (round-10 fact) — filter by start < L instead
      .select(col(idCol), col("_s"),
        explode(expr(
          s"filter(sequence(0, greatest(_cnt, 1) - 1), i -> i * $stride < _L)"))
          .as("_fno"))
      .select(col(idCol), col("_fno"),
        expr(s"substring(_s, _fno * $stride + 1, $frameLen)").as("_frame"))
    val fidFrames = frames.select(
      (col(idCol) * 10000L + col("_fno")).as("fid"),
      expr("encode(_frame, 'UTF-8')").as("content"))
    perceptualHash(fidFrames, "fid", "content")
      .select(expr("fid div 10000").as(idCol),
        pmod(col("fid"), lit(10000L)).cast("long").as("frame_no"),
        col("phash").as("fhash"))
  }

  /** Video-style near-dup pairs: assets whose FRAME-FINGERPRINT SETS
    * overlap at Jaccard ≥ `threshold` — robust to the temporal edits
    * (trims, segment replacement, reorders) that move EVERY bit of a
    * whole-asset fingerprint, which is why this family exists beside
    * aHash/dHash.
    *
    * Scale shape — the standard video-dedup pipeline:
    *   1. per-frame aHash (scan-side, cost linear in payload bytes);
    *   2. candidates from an INVERTED INDEX on exact frame fingerprints
    *      (assets sharing ≥ 1 frame hash), with a df-cap dropping
    *      stop-frames seen in > `maxDf` assets — the winnowing df-cap
    *      precedent: one ubiquitous intro frame must not produce an m²
    *      candidate bucket;
    *   3. verify by exact set Jaccard over the per-asset distinct
    *      fingerprint profile (codegen'd
    *      [[graft.ops.Dedup.sortedIntersectCount]]) — output-sized.
    * Every join keys on a fingerprint or an id; nothing is all-pairs. */
  def videoPairs(
      assets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      frameLen: Int = 64,
      stride: Int = 128,
      maxDf: Int = 50,
      threshold: Double = 0.5): DataFrame =
    videoPairsFrom(
      frameHashes(assets, idCol, contentCol, frameLen, stride),
      idCol, maxDf, threshold)

  /** [[videoPairs]] served FROM a prepared (id, frame_no, fhash) frame
    * — the entry point for fingerprints that don't come from the
    * byte-window sampler, e.g. [[videoFrameHashes]] over REAL decoded
    * GIF frames. Same candidate index, df-cap, and exact-Jaccard
    * verify. */
  def videoPairsFrom(
      frames: DataFrame,
      idCol: String = "asset_id",
      maxDf: Int = 50,
      threshold: Double = 0.5): DataFrame = {
    val fh = Materialize.index(
      frames.select(col(idCol), col("fhash")), "video-fh")
    val profiles = fh.groupBy(idCol)
      .agg(sort_array(collect_set(col("fhash"))).as("fset"))
    val keyed = fh.select(col(idCol), col("fhash")).distinct()
    val hot = keyed.groupBy("fhash")
      .agg(count(lit(1)).as("_df")).filter(col("_df") > maxDf)
      .select("fhash")
    val kf = keyed.join(hot, Seq("fhash"), "left_anti")
    val cand = kf.select(col(idCol).as("id_a"), col("fhash"))
      .join(kf.select(col(idCol).as("id_b"), col("fhash")), "fhash")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(profiles.select(col(idCol).as("id_a"), col("fset").as("fa")), "id_a")
      .join(profiles.select(col(idCol).as("id_b"), col("fset").as("fb")), "id_b")
      .withColumn("_i", Dedup.sortedIntersectCount(col("fa"), col("fb")).cast("double"))
      .withColumn("jac",
        round(col("_i") / (size(col("fa")) + size(col("fb")) - col("_i")), 4))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** Temporal ALIGNMENT between frame-sharing assets — the step after
    * [[videoPairs]] says "these two share frames": WHERE do they line
    * up? For each candidate pair the offset is the mode of the
    * frame-index deltas over exactly-matching frame fingerprints (the
    * standard shot-alignment trick): a trim or clip-embed shifts every
    * surviving frame by the SAME delta, so true temporal copies
    * concentrate all their matches on one offset while sporadic
    * fingerprint collisions scatter across deltas and die under
    * `minAligned`. Reported per pair: the winning `offset`
    * (id_a's frame_no − id_b's frame_no at the mode) and `aligned_n`,
    * the number of DISTINCT id_a frame positions supporting it
    * (a frame hash repeated within one asset must not multiply
    * support).
    *
    * Scale shape: same inverted-index + stop-frame df-cap as
    * [[videoPairs]] (one ubiquitous intro frame never builds an m²
    * bucket), then the per-(pair, delta) histogram is a partial-agg
    * groupBy over match rows (bounded by the df-cap) and the per-pair
    * argmax is a max-of-struct aggregate — no windows over data-sized
    * partitions, output-sized end to end. Ties break toward the
    * smallest |offset|, then the smaller offset, deterministically. */
  def frameAlignment(
      assets: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      frameLen: Int = 64,
      stride: Int = 128,
      maxDf: Int = 50,
      minAligned: Int = 3): DataFrame =
    frameAlignmentFrom(
      frameHashes(assets, idCol, contentCol, frameLen, stride),
      idCol, maxDf, minAligned)

  /** [[frameAlignment]] served FROM a prepared (id, frame_no, fhash)
    * frame — the real-decode entry point ([[videoFrameHashes]]), so the
    * temporal-copy/trim-offset claims are measured over real pixels.
    * Same df-cap, mode-of-deltas, and tie-break discipline. */
  def frameAlignmentFrom(
      frames: DataFrame,
      idCol: String = "asset_id",
      maxDf: Int = 50,
      minAligned: Int = 3): DataFrame = {
    val fh = Materialize.index(frames, "frame-align-fh")
    val hot = fh.select(col(idCol), col("fhash")).distinct()
      .groupBy("fhash").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDf).select("fhash")
    val kept = fh.join(hot, Seq("fhash"), "left_anti")
    val support = kept
      .select(col("fhash"), col(idCol).as("id_a"), col("frame_no").as("fa"))
      .join(kept.select(col("fhash"), col(idCol).as("id_b"),
        col("frame_no").as("fb")), "fhash")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), (col("fa") - col("fb")).as("delta"),
        col("fa"))
      .distinct()
      .groupBy("id_a", "id_b", "delta")
      .agg(count(lit(1)).as("aligned_n"))
    support
      .groupBy("id_a", "id_b")
      .agg(max(struct(col("aligned_n"), (-abs(col("delta"))).as("_nd"),
        (-col("delta")).as("_ndd"), col("delta"))).as("_m"))
      .select(col("id_a"), col("id_b"), col("_m.delta").as("offset"),
        col("_m.aligned_n").as("aligned_n"))
      .filter(col("aligned_n") >= minAligned)
  }

  /** Cross-modal caption-agreement gate: per asset, how much of the
    * caption's token profile the DECODED content profile contains —
    * flagging captions that disagree with the asset they describe. The
    * content side reads the binary payload through the stub decode
    * (`decode(content, ...)`); a real deployment substitutes model-based
    * agreement (caption-model or CLIP score) at that seam, and the
    * fixed-point scoring + flag plumbing here stay identical.
    *
    * Engine-exactness: containment is 4-dp FIXED-POINT integer
    * arithmetic — `(2i·10⁴ + n) div (2n)` on positive ints, the regime
    * where Spark `div` ≡ DuckDB `//` — so the flag cannot fork on a
    * rounding half. Honest captions (token subset of content) score
    * exactly 10000.
    *
    * Scale shape: both profiles are scan-side projections, the
    * intersection is the codegen'd two-pointer
    * [[graft.ops.Dedup.sortedIntersectCount]] over per-row sorted
    * arrays, and the only shuffle is the id-keyed caption join. */
  def captionAgreement(
      assets: DataFrame,
      captions: DataFrame,
      idCol: String = "asset_id",
      captionCol: String = "caption",
      contentCol: String = "content",
      mismatchBelow: Long = 9000L): DataFrame = {
    val profile = assets.select(col(idCol),
      sort_array(array_distinct(split(expr(s"decode($contentCol, 'UTF-8')"), " ")))
        .as("_ctoks"))
    profile.join(captions, idCol)
      .withColumn("_captoks", sort_array(array_distinct(split(col(captionCol), " "))))
      .withColumn("_n", size(col("_captoks")).cast("long"))
      .withColumn("_i",
        Dedup.sortedIntersectCount(col("_captoks"), col("_ctoks")).cast("long"))
      .withColumn("contain4", expr("(2 * _i * 10000 + _n) div (2 * _n)"))
      .select(col(idCol), col("_n").as("caption_tokens"),
        col("contain4"), (col("contain4") < mismatchBelow).as("mismatch"))
  }

  /** The swappable DECODER SEAM: run a per-partition decoder over the
    * asset rows — the exact shape a real deployment plugs its codec
    * batch into (arrow/pandas-style: one partition's rows in, one
    * decoded row per asset out, schema declared up front; no shuffle,
    * parallelism = input partitions). The library ships only the
    * deterministic stub ([[stubDecoder]]) because this environment has
    * no media libraries; everything AROUND the seam — binary parquet
    * pruning, partition-parallel decode, typed output schema — is real
    * and what matters at 100 TB.
    *
    * mapPartitions on the Row RDD is deliberate here: decode is genuine
    * per-row imperative work against native codec libraries, the one
    * case the repo's Spark-first rules reserve RDD plumbing for. */
  def decodeWith(
      assets: DataFrame,
      outSchema: StructType)(
      decoder: Iterator[org.apache.spark.sql.Row] => Iterator[org.apache.spark.sql.Row]): DataFrame =
    assets.sparkSession.createDataFrame(assets.rdd.mapPartitions(decoder), outSchema)

  /** The ARROW-BATCHED decoder seam — [[decodeWith]]'s columnar
    * variant and the shape a real 100×-scale deployment runs: each
    * partition crosses the decode boundary as serialized Arrow record
    * batches (≤ `batchRows` rows each, the same interchange Spark uses
    * for Pandas UDFs), so a native codec worker (ffmpeg/JNI, a sidecar
    * process, a GPU batch decoder) consumes a handful of contiguous
    * buffers instead of row-at-a-time object traffic. The in-repo
    * worker adapts the same row-level codecs ([[gifFrameDecoder]],
    * [[imageIoDecoder]], [[wavDecoder]]) onto the batch transport —
    * spec-pinned value-equal to [[decodeWith]] — so swapping in a
    * native batch decoder changes ONLY the worker body, never the
    * plumbing. Plan shape is identical to the row seam: no shuffle,
    * parallelism = input partitions. */
  def decodeWithArrow(
      assets: DataFrame,
      outSchema: StructType,
      batchRows: Int = 512)(
      decoder: Iterator[org.apache.spark.sql.Row] => Iterator[org.apache.spark.sql.Row]): DataFrame =
    org.apache.spark.sql.graftshim.ArrowSeam.mapArrowRows(
      assets, outSchema, batchRows.toLong)(decoder)

  /** Output schema of [[stubDecoder]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content_md5", StringType),
    StructField("content_bytes", LongType)))

  /** Deterministic stand-in decoder for [[decodeWith]]: md5 content id +
    * byte length per asset, computed partition-side exactly as a codec
    * batch would be. Matches [[fakeDecodeFeatures]]'s md5/length columns
    * value-for-value (spec-pinned), so the seam and the expression path
    * agree on the contract. */
  def stubDecoder(rows: Iterator[org.apache.spark.sql.Row]): Iterator[org.apache.spark.sql.Row] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("asset_id"))
      val content = r.getAs[Array[Byte]]("content")
      md.reset()
      val hex = md.digest(content).map("%02x".format(_)).mkString
      org.apache.spark.sql.Row(id, hex, content.length.toLong)
    }
  }

  /** Output schema of [[imageIoDecoder]]: native dimensions plus the 8×8
    * luma grid (row-major, 64 ints) — the classic average-hash
    * preprocessing, ready for [[imageAHash]]. */
  val imageDecodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("luma64", ArrayType(IntegerType))))

  /** REAL image decoder for [[decodeWith]] — pure-JVM `javax.imageio`
    * (the PNG/BMP/GIF readers ship in the JDK, no native codec needed):
    * decode the asset bytes, box-resize to an 8×8 grid, and emit the
    * BT.601 integer luma per cell. Undecodable bytes yield a
    * null-dimension row instead of failing the partition (codec batches
    * must be poison-pill safe — one corrupt asset in a 100 TB corpus
    * must not kill its task). This converts the perceptual family's
    * stub-feature caveat into a measured claim: the same seam, run over
    * real pixels. */
  def imageIoDecoder(rows: Iterator[org.apache.spark.sql.Row]): Iterator[org.apache.spark.sql.Row] =
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("asset_id"))
      val content = r.getAs[Array[Byte]]("content")
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) org.apache.spark.sql.Row(id, null, null, null)
        else org.apache.spark.sql.Row(id, img.getWidth, img.getHeight, luma64Of(img))
      } catch {
        case scala.util.control.NonFatal(_) =>
          org.apache.spark.sql.Row(id, null, null, null)
      }
    }

  /** The aHash preprocessing every image-shaped decode shares: box-resize
    * to an 8×8 grid and emit the BT.601 integer luma per cell,
    * row-major. */
  private def luma64Of(img: java.awt.image.BufferedImage): Seq[Int] = {
    val small = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try g.drawImage(img, 0, 0, 8, 8, null) finally g.dispose()
    (0 until 64).map { i =>
      val rgb = small.getRGB(i % 8, i / 8)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
  }

  /** Output schema of [[gifFrameDecoder]]: one row PER COMPOSITED FRAME
    * — (asset, frame_no, logical-screen dims, 8×8 luma grid), the
    * per-frame form [[videoFrameHashes]] fingerprints. */
  val videoDecodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_no", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("luma64", ArrayType(IntegerType))))

  /** REAL multi-frame decoder for [[decodeWith]] — pure-JVM animated-GIF
    * via `javax.imageio` (the JDK GIF reader exposes every image in the
    * container through `getNumImages`/`read(i)`): each frame is
    * composited draw-over onto the logical-screen canvas at its declared
    * (left, top) offset — the delta-frame layout GIF encoders emit —
    * and the canvas snapshot after each frame yields that frame's 8×8
    * luma grid. Restore-to-background/previous disposal is approximated
    * by draw-over (documented subset: fingerprint inputs, not playback).
    * Undecodable bytes yield one null-dimension row (the same
    * poison-pill contract as [[imageIoDecoder]]) — with this, all THREE
    * media families (image r13, audio r13, video r14) measure their
    * features over real decoded samples. */
  def gifFrameDecoder(rows: Iterator[org.apache.spark.sql.Row]): Iterator[org.apache.spark.sql.Row] =
    rows.flatMap { r =>
      val id = r.getLong(r.fieldIndex("asset_id"))
      val content = r.getAs[Array[Byte]]("content")
      val poison = Seq(org.apache.spark.sql.Row(id, null, null, null, null))
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        // everything after stream creation runs under ONE finally that
        // closes it: a throw from getImageReaders/next() must not leak
        // the stream (ImageIO's default cache is file-backed — a leaked
        // stream is a temp file per undecodable asset on a long-lived
        // executor)
        try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) poison
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            if (n <= 0) poison
            else {
              val first = reader.read(0)
              var w = first.getWidth
              var h = first.getHeight
              try {
                val tree = reader.getStreamMetadata
                  .getAsTree("javax_imageio_gif_stream")
                  .asInstanceOf[org.w3c.dom.Element]
                val lsd = tree.getElementsByTagName("LogicalScreenDescriptor")
                if (lsd.getLength > 0) {
                  val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
                  w = e.getAttribute("logicalScreenWidth").toInt
                  h = e.getAttribute("logicalScreenHeight").toInt
                }
              } catch { case scala.util.control.NonFatal(_) => () }
              val canvas = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = canvas.createGraphics()
              try {
                (0 until n).map { i =>
                  val frame = if (i == 0) first else reader.read(i)
                  var x = 0
                  var y = 0
                  try {
                    val m = reader.getImageMetadata(i)
                      .getAsTree("javax_imageio_gif_image")
                      .asInstanceOf[org.w3c.dom.Element]
                    val d = m.getElementsByTagName("ImageDescriptor")
                    if (d.getLength > 0) {
                      val e = d.item(0).asInstanceOf[org.w3c.dom.Element]
                      x = e.getAttribute("imageLeftPosition").toInt
                      y = e.getAttribute("imageTopPosition").toInt
                    }
                  } catch { case scala.util.control.NonFatal(_) => () }
                  g.drawImage(frame, x, y, null)
                  org.apache.spark.sql.Row(id, i, w, h, luma64Of(canvas))
                }
              } finally g.dispose()
            }
          } finally reader.dispose()
        }
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => poison
      }
    }

  /** Per-frame 64-bit average hash over REAL pixels, as the 64-char
    * bit string the hamming/frame-set machinery keys on: bit i set ⇔
    * luma_i > grid mean ([[imageAHash]]'s rule, string-rendered to
    * match [[frameHashes]]'s fingerprint convention). Feeds
    * [[videoPairsFrom]] / [[frameAlignmentFrom]], so the whole video
    * family — frame-set Jaccard dedup and temporal alignment — runs
    * over real decoded frames. Undecoded rows are dropped. */
  def videoFrameHashes(decoded: DataFrame, idCol: String = "asset_id"): DataFrame =
    decoded.filter(col("luma64").isNotNull)
      .withColumn("_mean", expr("aggregate(luma64, 0, (a, x) -> a + x) div 64"))
      .select(col(idCol), col("frame_no").cast("long").as("frame_no"),
        expr("array_join(transform(luma64, l -> IF(l > _mean, '1', '0')), '')")
          .as("fhash"))

  /** Output schema of [[wavDecoder]]: native audio parameters plus a
    * fixed 32-bin RMS energy contour over the real PCM samples — the
    * compact per-asset profile the fingerprint and quality gates key on
    * (a bounded row per asset regardless of duration, so the decode
    * stage's output never scales with sample count). */
  val audioDecodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("energy32", ArrayType(IntegerType))))

  /** REAL audio decoder for [[decodeWith]] — pure-JVM
    * `javax.sound.sampled` (the WAV/PCM reader ships in the JDK, no
    * native codec needed): parse the RIFF/WAVE container, fold channels
    * to mono, and compute the 32-bin integer RMS energy contour.
    * Supports the WAV default (PCM signed 16-bit); anything else — or
    * undecodable bytes — yields a null-dimension row instead of failing
    * the partition (the same poison-pill contract as
    * [[imageIoDecoder]]). Together they convert BOTH media families of
    * the decoder-seam caveat into measured claims. */
  def wavDecoder(rows: Iterator[org.apache.spark.sql.Row]): Iterator[org.apache.spark.sql.Row] =
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("asset_id"))
      val content = r.getAs[Array[Byte]]("content")
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        val fmt = ais.getFormat
        val pcm16 =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16
        if (!pcm16) org.apache.spark.sql.Row(id, null, null, null, null)
        else {
          val bytes = ais.readAllBytes()
          val ch = fmt.getChannels
          val n = bytes.length / (2 * ch)
          if (n == 0) org.apache.spark.sql.Row(id, null, null, null, null)
          else {
            val sumSq = new Array[Long](32)
            val cnt = new Array[Long](32)
            val big = fmt.isBigEndian
            var i = 0
            while (i < n) {
              var acc = 0L
              var c = 0
              while (c < ch) {
                val off = (i * ch + c) * 2
                val s =
                  if (big) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                  else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
                acc += s
                c += 1
              }
              val mono = acc / ch
              val b = (i * 32L / n).toInt
              sumSq(b) += mono * mono
              cnt(b) += 1
              i += 1
            }
            val energy = (0 until 32).map(b =>
              if (cnt(b) == 0) 0
              else math.sqrt(sumSq(b).toDouble / cnt(b)).toInt)
            org.apache.spark.sql.Row(
              id, fmt.getSampleRate.toInt, ch, n.toLong, energy)
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          org.apache.spark.sql.Row(id, null, null, null, null)
      }
    }

  /** 31-bit audio fingerprint over REAL samples: the dHash idea on the
    * time axis — bit b set ⇔ energy rises from contour bin b to b+1.
    * Gain-invariant by construction (uniform volume scaling preserves
    * the rising/falling shape), integer-exact, and Hamming-comparable,
    * so the standard block-dedup machinery applies to real audio
    * unchanged. Undecoded rows are dropped. */
  def audioFingerprint(decoded: DataFrame, idCol: String = "asset_id"): DataFrame =
    decoded.filter(col("energy32").isNotNull)
      .withColumn("afp", expr(
        "aggregate(transform(sequence(0, 30), i -> " +
          "IF(element_at(energy32, i + 2) > element_at(energy32, i + 1), " +
          "shiftleft(1L, CAST(i AS INT)), 0L)), 0L, (a, x) -> a | x)"))
      .select(col(idCol), col("sample_rate"), col("channels"),
        col("n_samples"), col("afp"))

  /** 64-bit average hash over REAL pixels: mean-threshold the 8×8 luma
    * grid from [[imageIoDecoder]] (bit i set ⇔ luma_i > grid mean) —
    * integer arithmetic end-to-end, so the hash is engine- and
    * platform-exact. Identical images hash identically; small
    * brightness-preserving edits flip few bits, so the standard
    * Hamming-block dedup machinery ([[graft.ops.Dedup.hammingPairs64]])
    * applies to real imagery unchanged. Undecoded rows are dropped. */
  def imageAHash(decoded: DataFrame, idCol: String = "asset_id"): DataFrame =
    decoded.filter(col("luma64").isNotNull)
      .withColumn("_mean", expr("aggregate(luma64, 0, (a, x) -> a + x) div 64"))
      .withColumn("ahash64", expr(
        "aggregate(zip_with(luma64, sequence(0, 63), (l, i) -> " +
          "IF(l > _mean, shiftleft(1L, CAST(i AS INT)), 0L)), 0L, (a, x) -> a | x)"))
      .select(col(idCol), col("width"), col("height"), col("ahash64"))
}
