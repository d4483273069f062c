package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same codegen'd kernels as the Scala API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  — or
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * One optimizer Rule is registered — [[graft.plans.RangeJoinRewrite]],
  * which turns inequality-only point-in-interval joins (planned as
  * nested loops by the built-in strategies) into binned equi-joins. The
  * rest of the engine needs no custom Rule or SparkStrategy by design:
  * its plans are expressible with built-in operators, and the DSL's
  * algebraic rewrites run before DataFrames are built (SURVEY §4.1) —
  * the same staging the reference uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("stable_hash64"),
      info("stable_hash64", "stable_hash64(str) - 64-bit MD5-prefix content hash"),
      (args: Seq[Expression]) => StableHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(str) - polynomial rolling hash mod 1e9+7"),
      (args: Seq[Expression]) => PolyHashMod(args.head)))
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      info("float_dot", "float_dot(a, b) - sequential dot product of float arrays"),
      (args: Seq[Expression]) => FloatDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("inflate_text"),
      info("inflate_text", "inflate_text(bin) - zlib inflate to UTF-8 string"),
      (args: Seq[Expression]) => InflateText(args.head)))
    ext.injectFunction((
      FunctionIdentifier("decompress_text"),
      info("decompress_text",
        "decompress_text(bin, codec) - multi-codec decompression to UTF-8 " +
          "text; codec in {zlib,gzip,zstd,lz4,snappy,snappy_raw,deflate," +
          "auto}; null on corrupt streams or the decompression-bomb cap"),
      (args: Seq[Expression]) => DecompressText(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("compress_bytes"),
      info("compress_bytes",
        "compress_bytes(bin, codec) - compress with the named codec"),
      (args: Seq[Expression]) => CompressBytes(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("decompress_bytes"),
      info("decompress_bytes",
        "decompress_bytes(bin, codec) - byte-preserving multi-codec " +
          "decompression (the pre-charset-decode twin of decompress_text)"),
      (args: Seq[Expression]) => DecompressBytes(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("http_response"),
      info("http_response",
        "http_response(bin) - parse an HTTP response message to (version, " +
          "status, reason, headers map with lowercased first-wins keys, " +
          "raw body)"),
      (args: Seq[Expression]) => HttpResponse(args.head)))
    ext.injectFunction((
      FunctionIdentifier("http_dechunk"),
      info("http_dechunk",
        "http_dechunk(bin) - decode a Transfer-Encoding: chunked body; " +
          "null on malformed/truncated input"),
      (args: Seq[Expression]) => HttpDechunk(args.head)))
    ext.injectFunction((
      FunctionIdentifier("codec_sniff"),
      info("codec_sniff",
        "codec_sniff(bin) - codec from magic bytes: zlib/gzip/zstd/lz4/snappy or null"),
      (args: Seq[Expression]) => CodecSniff(args.head)))
    ext.injectFunction((
      FunctionIdentifier("image_meta"),
      info("image_meta",
        "image_meta(bin) - PNG/JPEG header parse to (format,width,height,channels)"),
      (args: Seq[Expression]) => ImageMeta(args.head)))
    ext.injectFunction((
      FunctionIdentifier("audio_meta"),
      info("audio_meta",
        "audio_meta(bin) - WAV/RIFF header parse to (format,sample_rate,channels,bits,n_samples)"),
      (args: Seq[Expression]) => AudioMeta(args.head)))
    ext.injectFunction((
      FunctionIdentifier("container_meta"),
      info("container_meta",
        "container_meta(bin) - MP4 (ISO-BMFF box walk) / AVI (RIFF hdrl) " +
          "header parse to (format,brand,duration_ms,width,height," +
          "n_tracks,video_codec,audio_codec)"),
      (args: Seq[Expression]) => ContainerMeta(args.head)))
    ext.injectFunction((
      FunctionIdentifier("container_tracks"),
      info("container_tracks",
        "container_tracks(bin) - per-track MP4 (tkhd/mdhd/hdlr/stsd/stts) " +
          "or AVI (strh) metadata: array of (track_id,handler,codec," +
          "duration_ms,timescale,n_samples,width,height)"),
      (args: Seq[Expression]) => ContainerTracks(args.head)))
    ext.injectFunction((
      FunctionIdentifier("gzip_members"),
      info("gzip_members",
        "gzip_members(bin) - split concatenated gzip (one WARC record " +
          "per member) into decompressed members"),
      (args: Seq[Expression]) => GzipMembers(args.head)))
    ext.injectFunction((
      FunctionIdentifier("warc_record"),
      info("warc_record",
        "warc_record(bin) - parse a WARC record to (version, headers map, body)"),
      (args: Seq[Expression]) => WarcRecord(args.head)))
    ext.injectFunction((
      FunctionIdentifier("header_get"),
      info("header_get",
        "header_get(map, name) - case-insensitive first-match header " +
          "lookup in a MAP<STRING,STRING> (WARC field names are not " +
          "case sensitive)"),
      (args: Seq[Expression]) => HeaderGet(args(0), args(1))))
    // hint coalesced to '' (= no hint) so a missing Content-Type header
    // column degrades to sniffing instead of nulling the row
    def hintArg(args: Seq[Expression]): Expression =
      if (args.length < 2)
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          "", org.apache.spark.sql.types.StringType)
      else org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(args(1),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          "", org.apache.spark.sql.types.StringType)))
    ext.injectFunction((
      FunctionIdentifier("decode_text"),
      info("decode_text",
        "decode_text(bin[, hint]) - charset-aware byte->text decode: " +
          "BOM, then Content-Type hint, then <meta charset> prescan, " +
          "then strict UTF-8, then windows-1252; malformed sequences " +
          "become U+FFFD"),
      (args: Seq[Expression]) => DecodeText(args(0), hintArg(args))))
    ext.injectFunction((
      FunctionIdentifier("charset_detect"),
      info("charset_detect",
        "charset_detect(bin[, hint]) - the normalized encoding name " +
          "decode_text would decode with"),
      (args: Seq[Expression]) => CharsetDetect(args(0), hintArg(args))))
    ext.injectFunction((
      FunctionIdentifier("html_text"),
      info("html_text",
        "html_text(str) - visible text: tags dropped (word-separating), " +
          "script/style/comments removed, entities decoded, whitespace collapsed"),
      (args: Seq[Expression]) => HtmlText(args.head)))
    ext.injectFunction((
      FunctionIdentifier("html_title"),
      info("html_title",
        "html_title(str) - first <title> content, entity-decoded; null when absent"),
      (args: Seq[Expression]) => HtmlTitle(args.head)))
    ext.injectFunction((
      FunctionIdentifier("robots_rules"),
      info("robots_rules",
        "robots_rules(str) - parse robots.txt to (agent, directive, path) rows"),
      (args: Seq[Expression]) => RobotsRules(args.head)))
    ext.injectFunction((
      FunctionIdentifier("robots_allowed"),
      info("robots_allowed",
        "robots_allowed(txt, agent, path) - RFC 9309 decision: most " +
          "specific agent group, longest rule wins, Allow beats Disallow " +
          "on ties"),
      (args: Seq[Expression]) => RobotsAllowed(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("crawl_delay"),
      info("crawl_delay",
        "crawl_delay(txt, agent) - Crawl-delay seconds from the most " +
          "specific agent group of a robots.txt, null when undeclared"),
      (args: Seq[Expression]) => CrawlDelay(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("robots_sitemaps"),
      info("robots_sitemaps",
        "robots_sitemaps(txt) - Sitemap: directive URLs of a robots.txt " +
          "in declaration order"),
      (args: Seq[Expression]) => RobotsSitemaps(args.head)))
    ext.injectFunction((
      FunctionIdentifier("sitemap_kind"),
      info("sitemap_kind",
        "sitemap_kind(str) - 'urlset' / 'sitemapindex' / null"),
      (args: Seq[Expression]) => SitemapKind(args.head)))
    ext.injectFunction((
      FunctionIdentifier("sitemap_entries"),
      info("sitemap_entries",
        "sitemap_entries(str) - sitemaps.org entries: array of " +
          "(loc, lastmod, changefreq, priority) for urlset and " +
          "sitemapindex documents"),
      (args: Seq[Expression]) => SitemapEntries(args.head)))
    ext.injectFunction((
      FunctionIdentifier("split_sentences"),
      info("split_sentences",
        "split_sentences(str) - abbreviation- and initial-aware sentence " +
          "segmentation"),
      (args: Seq[Expression]) => SplitSentences(args.head)))
    ext.injectFunction((
      FunctionIdentifier("fix_text"),
      info("fix_text",
        "fix_text(str) - repair UTF-8-read-as-latin1/cp1252 mojibake " +
          "(strict re-decode of artifact runs; non-artifacts untouched)"),
      (args: Seq[Expression]) => FixText(args.head)))
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      info("normalize_text",
        "normalize_text(str, form) - Unicode normalization, form in " +
          "NFC/NFD/NFKC/NFKD"),
      (args: Seq[Expression]) => NormalizeText(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("html_meta"),
      info("html_meta",
        "html_meta(str) - meta tags as a map keyed by lowercase " +
          "name/http-equiv/property (first wins; bare charset under " +
          "'charset')"),
      (args: Seq[Expression]) => HtmlMeta(args.head)))
    ext.injectFunction((
      FunctionIdentifier("html_anchors"),
      info("html_anchors",
        "html_anchors(str) - anchor (href, text) pairs in document " +
          "order; text entity-decoded and collapsed, unclosed anchors " +
          "auto-close at the next <a"),
      (args: Seq[Expression]) => HtmlAnchors(args.head)))
    ext.injectFunction((
      FunctionIdentifier("html_main_text"),
      info("html_main_text",
        "html_main_text(str) - main-content text: jusText-style block " +
          "segmentation, link-dense/short boilerplate dropped, short " +
          "blocks kept only next to good content; blocks joined by \\n"),
      (args: Seq[Expression]) => HtmlMainText(args.head)))
    ext.injectFunction((
      FunctionIdentifier("html_markdown"),
      info("html_markdown",
        "html_markdown(str) - structured HTML to Markdown: headings, " +
          "lists, tables, fenced code blocks, emphasis/links/images; " +
          "script/style/title/comment content excluded"),
      (args: Seq[Expression]) => HtmlMarkdown(args.head)))
    ext.injectFunction((
      FunctionIdentifier("html_blocks"),
      info("html_blocks",
        "html_blocks(str) - classification blocks behind html_main_text: " +
          "array of (text, link_len, kept)"),
      (args: Seq[Expression]) => HtmlBlocks(args.head)))
    ext.injectFunction((
      FunctionIdentifier("html_links"),
      info("html_links",
        "html_links(str) - anchor href values in document order, entity-decoded"),
      (args: Seq[Expression]) => HtmlLinks(args.head)))
    ext.injectFunction((
      FunctionIdentifier("url_parse"),
      info("url_parse",
        "url_parse(str) - lenient parse to (scheme,host,registered_domain," +
          "port,path,query); null without scheme://host"),
      (args: Seq[Expression]) => UrlParse(args.head)))
    ext.injectFunction((
      FunctionIdentifier("url_canonical"),
      info("url_canonical",
        "url_canonical(str) - dedup key: lowercase scheme/host, default " +
          "ports + fragments + tracking params dropped"),
      (args: Seq[Expression]) => UrlCanonical(args.head)))
    ext.injectFunction((
      FunctionIdentifier("image_resize"),
      info("image_resize",
        "image_resize(pixels, w, h, new_w, new_h) - bilinear grayscale " +
          "resize, half-pixel convention, exact integer fixed-point"),
      (args: Seq[Expression]) =>
        ImageResize(args(0), args(1), args(2), args(3), args(4))))
    ext.injectFunction((
      FunctionIdentifier("synth_gradient"),
      info("synth_gradient",
        "synth_gradient(seed, w, h) - seed-derived linear-gradient fixture"),
      (args: Seq[Expression]) => SynthGradient(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("byte_sum"),
      info("byte_sum", "byte_sum(bin) - sum of the buffer's unsigned bytes"),
      (args: Seq[Expression]) => ByteSum(args.head)))
    ext.injectFunction((
      FunctionIdentifier("gif_frames_composited"),
      info("gif_frames_composited",
        "gif_frames_composited(bin) - animated-GIF replay: array of full " +
          "logical-screen canvases honoring offsets, transparency, and " +
          "disposal methods 1/2/3"),
      (args: Seq[Expression]) => GifCompositedFrames(args.head)))
    ext.injectFunction((
      FunctionIdentifier("gif_frame_meta"),
      info("gif_frame_meta",
        "gif_frame_meta(bin) - per-frame GIF rects/timing/disposal " +
          "without pixel decode (LZW skipped by sub-block lengths)"),
      (args: Seq[Expression]) => GifFrameMeta(args.head)))
    ext.injectFunction((
      FunctionIdentifier("synth_anim"),
      info("synth_anim",
        "synth_anim(seed, mode) - animated-GIF fixture exercising " +
          "offsets/transparency/disposal with closed-form pixel sums"),
      (args: Seq[Expression]) => SynthAnim(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("synth_mp4"),
      info("synth_mp4",
        "synth_mp4(seed, with_audio) - standards-layout MP4 fixture whose " +
          "box fields derive from seed in closed form"),
      (args: Seq[Expression]) => SynthMp4(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("dhash64"),
      info("dhash64",
        "dhash64(bin, w, h) - perceptual difference hash of a raw grayscale buffer"),
      (args: Seq[Expression]) => DHash64(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("jpeg_encode_gray"),
      info("jpeg_encode_gray",
        "jpeg_encode_gray(pixels, w, h, quant) - grayscale baseline JFIF " +
          "bytes with a flat quant table"),
      (args: Seq[Expression]) => JpegEncodeGray(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("jpeg_decode"),
      info("jpeg_decode",
        "jpeg_decode(bin) - baseline JPEG decode (huffman + dequant + " +
          "idct) to (width,height,channels,pixels) with luma pixels"),
      (args: Seq[Expression]) => JpegDecodeGray(args.head)))
    ext.injectFunction((
      FunctionIdentifier("gif_encode_gray"),
      info("gif_encode_gray",
        "gif_encode_gray(pixels, w, h) - GIF89a bytes with an identity " +
          "gray table and a literal-code LZW stream"),
      (args: Seq[Expression]) => GifEncodeGray(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("gif_decode"),
      info("gif_decode",
        "gif_decode(bin) - GIF LZW decode (first frame) to " +
          "(width,height,channels,pixels) with luma pixels"),
      (args: Seq[Expression]) => GifDecodeGray(args.head)))
    ext.injectFunction((
      FunctionIdentifier("gif_encode_frames"),
      info("gif_encode_frames",
        "gif_encode_frames(pixels, w, h, n) - animated GIF89a bytes: n " +
          "frames sliced from the concatenated buffer, GCE per frame"),
      (args: Seq[Expression]) => GifEncodeFrames(args(0), args(1), args(2),
        args(3))))
    ext.injectFunction((
      FunctionIdentifier("gif_frames"),
      info("gif_frames",
        "gif_frames(bin) - animated GIF decode to " +
          "ARRAY<(width,height,channels,pixels)>, one entry per frame"),
      (args: Seq[Expression]) => GifFrames(args.head)))
    ext.injectFunction((
      FunctionIdentifier("bmp_encode_gray"),
      info("bmp_encode_gray",
        "bmp_encode_gray(pixels, w, h, topDown) - 8-bit palette grayscale " +
          "BMP bytes"),
      (args: Seq[Expression]) => BmpEncodeGray(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("bmp_decode"),
      info("bmp_decode",
        "bmp_decode(bin) - uncompressed 8/24/32-bit BMP decode to " +
          "(width,height,channels,pixels) with luma pixels"),
      (args: Seq[Expression]) => BmpDecodeGray(args.head)))
    ext.injectFunction((
      FunctionIdentifier("audio_fingerprint"),
      info("audio_fingerprint",
        "audio_fingerprint(bin) - 64-bit loudness-envelope hash of a PCM WAV"),
      (args: Seq[Expression]) => AudioFingerprint(args.head)))
    ext.injectFunction((
      FunctionIdentifier("synth_audio"),
      info("synth_audio",
        "synth_audio(seed, nPerSeg, perturb) - deterministic PCM WAV with " +
          "audio_fingerprint == seed"),
      (args: Seq[Expression]) => SynthAudio(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("png_encode_gray"),
      info("png_encode_gray",
        "png_encode_gray(pixels, w, h, filterMode) - grayscale PNG bytes " +
          "(filterMode 0-4 fixed, 5 cycles all five row filters)"),
      (args: Seq[Expression]) => PngEncodeGray(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("png_decode"),
      info("png_decode",
        "png_decode(bin) - full PNG decode (inflate + unfilter) to " +
          "(width,height,channels,pixels) with single-channel luma pixels"),
      (args: Seq[Expression]) => PngDecodeGray(args.head)))
    ext.injectFunction((
      FunctionIdentifier("synth_image"),
      info("synth_image",
        "synth_image(seed, w, h, perturb) - deterministic raw image with dhash64 == seed"),
      (args: Seq[Expression]) => SynthImage(args(0), args(1), args(2), args(3))))
    // kernels with a literal size parameter: evaluated at registration
    // (a non-foldable argument is a usage error)
    def litInt(e: Expression): Int =
      e.eval().asInstanceOf[Number].intValue
    ext.injectFunction((
      FunctionIdentifier("synth_image_step"),
      info("synth_image_step",
        "synth_image_step(seed, w, h, perturb, step) - synth_image with a " +
          "chosen gradient step (lossy-codec fixtures)"),
      (args: Seq[Expression]) =>
        SynthImageStep(args(0), args(1), args(2), args(3), litInt(args(4)))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(text, n) - word n-gram shingle array"),
      (args: Seq[Expression]) => WordShingles(args(0), litInt(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(hashes, k) - k affine minhashes of a long array"),
      (args: Seq[Expression]) => MinHashSig(args(0), litInt(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("sign_lsh_bucket"),
      info("sign_lsh_bucket",
        "sign_lsh_bucket(vec, planes) - hyperplane sign bucket id"),
      (args: Seq[Expression]) => SignLshBucket(args(0), litInt(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("hadamard_rotate"),
      info("hadamard_rotate",
        "hadamard_rotate(vec, dim) - signed Walsh-Hadamard rotation (OPQ)"),
      (args: Seq[Expression]) => {
        // same fail-fast as the Scala API (vectors.hadamard_rotate): a
        // non-power-of-two dim would silently yield a non-orthogonal
        // transform with an inexact sqrt(dim) normalization
        val dim = litInt(args(1))
        require(dim > 0 && (dim & (dim - 1)) == 0,
          s"hadamard_rotate needs a power-of-two dim (got $dim)")
        HadamardRotate(args(0), dim)
      }))

    // Table-valued surface for the temporal joins: the reference's whole
    // API is declarative (indra_db/client/readonly/query.py:350-1078), so
    // the operators Spark lacks in SQL become FROM-clause functions over
    // named views — `SELECT ... FROM asof_join('facts','k','ts',...)`.
    // The builder runs at analysis time: it resolves the view names via
    // the active session and returns the operator's logical plan.
    def litStr(e: Expression): String =
      e.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    ext.injectTableFunction((
      FunctionIdentifier("asof_join"),
      info("asof_join",
        "asof_join(factsView, factKey, factTs, dimsView, dimKey, dimTs, " +
          "tieBreak, payloadCol, ...) - backward as-of join of two views"),
      (args: Seq[Expression]) => {
        require(args.length >= 8,
          "asof_join(factsView, factKey, factTs, dimsView, dimKey, dimTs, " +
            "tieBreak, payloadCol [, payloadCol ...])")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.Temporal.asofJoin(
          spark.table(litStr(args(0))), litStr(args(1)), litStr(args(2)),
          spark.table(litStr(args(3))), litStr(args(4)), litStr(args(5)),
          payload = args.drop(7).map(litStr),
          rightTieBreak = litStr(args(6))).queryExecution.logical
      }))
    ext.injectTableFunction((
      FunctionIdentifier("range_join"),
      info("range_join",
        "range_join(pointsView, pointTs, intervalsView, startCol, endCol, " +
          "binUs) - point-in-interval binned join of two views"),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "range_join(pointsView, pointTs, intervalsView, startCol, " +
            "endCol, binUs)")
        val spark = org.apache.spark.sql.SparkSession.active
        // validate=false: the bin-bound check runs a Spark job, which has
        // no place inside analysis; results are exact for any bin
        graft.operators.Temporal.rangeJoin(
          spark.table(litStr(args(0))), litStr(args(1)),
          spark.table(litStr(args(2))), litStr(args(3)), litStr(args(4)),
          binUs = args(5).eval().asInstanceOf[Number].longValue,
          validate = false).queryExecution.logical
      }))
  }
}
