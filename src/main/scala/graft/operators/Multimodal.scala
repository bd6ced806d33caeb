package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: treat
  * image/audio/video as opaque `binary` payloads with typed metadata,
  * and run decode / feature-extraction as partition-batched
  * transforms (the Scala analogue of a vectorized Python UDF: one
  * batch of rows per partition iteration, no per-row driver calls).
  *
  * Raster images (PNG/BMP/GIF) DECODE FOR REAL via the JDK's
  * `javax.imageio` ([[decode]]: true dimensions + a luminance-
  * histogram feature vector). Formats the JDK cannot decode
  * (video/audio containers, exotic codecs) fall back to
  * [[decodeStub]] — deterministic fake dimensions/features from the
  * payload bytes, clearly marked as the splice point for an external
  * codec. Everything around the splice — schema, Dataset encoders,
  * partition batching, feature-vector shape, downstream similarity
  * compatibility — is real and tested either way.
  *
  * Scale: payloads stay distributed (never collected); per-partition
  * work is pure map-side; feature vectors are fixed-size
  * `Array[Float]` compatible with [[Similarity]] operators, so the
  * near-dup / ANN paths compose directly.
  */
object Multimodal {

  /** ImageIO defaults to DISK-backed stream caches: every
    * `ImageIO.read`/`write`/`createImageInputStream` call creates and
    * deletes a temp file, so per-row PNG work pays a filesystem round
    * trip per image — measured ~4× slower single-threaded (250 ms vs
    * 66 ms for 500 8×8 encode+decode round trips) and worse under 32
    * concurrent tasks contending on the temp directory (the r6
    * mm_image_dhash ×6 bench regression: 2000 vectors × ~0.5 ms of
    * temp-file churn per pass). Our payloads are small in-memory
    * byte arrays; memory-backed caches are strictly better. JVM-global
    * and idempotent — each executor JVM flips it once on first touch
    * of any ImageIO entry point via this lazy. */
  private lazy val imageIOMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** An opaque media row: payload + the metadata a real pipeline
    * carries alongside (dimensions unknown until decode). */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, entropy: Double, features: Array[Float])

  val FeatureDim = 16

  /** Real header parsing for the common raster formats — pure byte
    * logic, no codec required. Returns (width, height) when the
    * payload starts with a recognized magic. */
  def imageDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length >= 24 && p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      Some((be32(16), be32(20)))                             // PNG IHDR
    else if (p.length >= 22 && p(0) == 'B' && p(1) == 'M') le32(14) match {
      // dispatch on the DIB header size: 12 = OS/2 BITMAPCOREHEADER
      // (16-bit dims), 40+ = BITMAPINFOHEADER family (32-bit dims,
      // height may be negative = top-down)
      case 12 => Some((le16(18), le16(20)))
      case n if n >= 40 && p.length >= 26 => Some((le32(18), math.abs(le32(22))))
      case _ => None
    }
    else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
      Some((le16(6), le16(8)))                               // GIF logical screen
    else if (p.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk segments to the first frame header (SOF0..SOF15
      // minus DHT/JPG/DAC, per ITU T.81); payload = precision(1),
      // height(2), width(2)
      var j = 2
      var dims: Option[(Int, Int)] = None
      while (dims.isEmpty && j + 3 < p.length && u8(j) == 0xFF) {
        val m = u8(j + 1)
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) j += 2 // standalone markers
        else {
          val len = be16(j + 2)
          if (len < 2) j = p.length
          else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (j + 8 < p.length) dims = Some((be16(j + 7), be16(j + 5)))
            j = p.length
          }
          else if (m == 0xDA) j = p.length // scan data starts — no SOF found
          else j += 2 + len
        }
      }
      dims
    }
    else None
  }

  /** Decode: real header parse for PNG/BMP/GIF; otherwise a
    * deterministic STUB standing in for a full codec (javax.imageio /
    * ffmpeg bindings are the splice point) — fake "dimensions" from a
    * byte-fold hash. Either way, "features" are a 16-bin byte
    * histogram normalized to unit L1 mass, so downstream contracts
    * (shape, determinism, similarity compatibility) hold for every
    * payload. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val (width, height) = imageDims(payload).getOrElse {
      val h = payload.foldLeft(17L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000003L)
      ((h % 1920 + 1).toInt, (h / 1920 % 1080 + 1).toInt)
    }
    val hist = new Array[Float](FeatureDim)
    payload.foreach(b => hist((b & 0xff) / (256 / FeatureDim)) += 1f)
    val total = math.max(payload.length, 1).toFloat
    (width, height, hist.map(_ / total))
  }

  /** Shannon entropy (bits/byte) of the payload, 0 for empty. */
  def byteEntropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xff) += 1)
    val n = payload.length.toDouble
    counts.filter(_ > 0).map { c =>
      val p = c / n; -p * math.log(p) / math.log(2)
    }.sum
  }

  /** REAL raster decode via `javax.imageio` (the PNG/BMP/GIF readers
    * ship in every JDK — no external codec needed): dimensions from
    * the decoded image and features = 16-bin LUMINANCE histogram
    * (ITU-R BT.601 integer weights, deterministic) normalized to unit
    * L1 mass — the same shape/contract as the stub's byte histogram,
    * so downstream [[Similarity]] composition is unchanged. Payloads
    * that are not a known raster format (or fail to decode) fall back
    * to [[decodeStub]]; video/audio remain the documented stub splice
    * point (no demuxer in the JDK). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    imageIOMemCache
    val img =
      if (imageDims(payload).isEmpty) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }
    img match {
      case Some(i) =>
        val w = i.getWidth; val h = i.getHeight
        val hist = new Array[Float](FeatureDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = i.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum / (256 / FeatureDim)) += 1f
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1).toFloat
        (w, h, hist.map(_ / n))
      case None => decodeStub(payload)
    }
  }

  /** Decode + feature-extract, batched per partition. The iterator
    * form means one JVM-level loop per partition (no per-row lambda
    * dispatch through Catalyst) — where a heavier codec would also
    * amortize its init cost (load model / codec context once per
    * partition). Raster payloads decode for REAL ([[decode]] /
    * javax.imageio); everything else takes the deterministic stub. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec context, model weights)
      rows.map { r =>
        val (w, h, feats) = decode(r.payload)
        DecodedMedia(r.media_id, r.kind, r.payload.length.toLong, w, h,
          byteEntropy(r.payload), feats)
      }
    }
  }

  /** One sampled frame of a media payload: which frame, its stream
    * timestamp, and its bytes. */
  case class FrameRow(media_id: Long, frame_idx: Int, t_ms: Long, frame: Array[Byte])

  /** Parsed RIFF/WAVE container: PCM layout + the data chunk's span
    * inside the payload. */
  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataOffset: Int, dataBytes: Int) {
    /** Whole bytes per `ms` milliseconds of audio (PCM byte rate). */
    def bytesFor(ms: Long): Long =
      sampleRate.toLong * channels * (bitsPerSample / 8) * ms / 1000L
  }

  /** REAL RIFF/WAVE header parse — pure little-endian byte logic, no
    * codec: walks the chunk list (word-aligned, per the RIFF spec) for
    * `fmt ` (channels, sample rate, bit depth) and `data` (PCM span).
    * A declared data size overrunning the payload is clamped to the
    * bytes actually present (truncated file ≡ shorter recording).
    * Returns None for anything that is not a well-formed PCM WAV. */
  def wavInfo(p: Array[Byte]): Option[WavInfo] = {
    def u8(i: Int) = p(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int, s: String) = s.indices.forall(j => p(i + j) == s(j).toByte)
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None     // (offset, clamped length)
    while (off + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val sz = le32(off + 4)
      if (sz < 0) return None // malformed size
      if (tag(off, "fmt ") && sz >= 16 && off + 24 <= p.length)
        fmt = Some((le16(off + 10), le32(off + 12), le16(off + 22)))
      if (tag(off, "data"))
        data = Some((off + 8, math.min(sz.toLong, (p.length - off - 8).toLong).toInt))
      off += 8 + sz + (sz & 1) // chunks are 2-byte aligned
    }
    for {
      (ch, sr, bits) <- fmt
      (dOff, dLen) <- data
      if ch > 0 && sr > 0 && bits > 0 && bits % 8 == 0 && dLen >= 0
    } yield WavInfo(sr, ch, bits, dOff, dLen)
  }

  /** REAL MJPEG demux: byte spans of the complete JPEG frames in a
    * concatenated-JPEG stream (the MJPEG container form — each frame a
    * standalone JPEG). The walk follows ITU T.81 segment structure:
    * SOI, length-prefixed segments, SOS entropy data (where 0xFF00
    * byte stuffing and restart markers FFD0–D7 are NOT frame
    * boundaries), EOI. Malformed stretches are skipped byte-by-byte,
    * so a corrupted frame drops without desynchronizing the rest of
    * the stream — the resilience a real demuxer needs on truncated
    * captures. Pure JDK byte logic, no codec. */
  def jpegFrameSpans(p: Array[Byte]): IndexedSeq[(Int, Int)] = {
    def u8(k: Int) = p(k) & 0xff
    def be16(k: Int) = (u8(k) << 8) | u8(k + 1)
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var i = 0
    while (i + 1 < p.length) {
      if (u8(i) == 0xFF && u8(i + 1) == 0xD8) {
        val start = i
        var j = i + 2
        var end = -1
        var ok = true
        while (ok && end < 0 && j + 1 < p.length) {
          if (u8(j) != 0xFF) ok = false // lost segment sync — malformed
          else u8(j + 1) match {
            case 0xD9 => end = j + 2
            case 0xD8 => ok = false // nested SOI — malformed
            case m if m == 0x01 || (m >= 0xD0 && m <= 0xD7) => j += 2
            case 0xDA =>
              if (j + 3 >= p.length) ok = false
              else {
                j += 2 + be16(j + 2)
                // entropy-coded data: skip stuffed FF00 and restarts
                var scanning = true
                while (scanning && j + 1 < p.length) {
                  if (u8(j) == 0xFF && u8(j + 1) != 0x00 &&
                    !(u8(j + 1) >= 0xD0 && u8(j + 1) <= 0xD7)) scanning = false
                  else j += 1
                }
                if (j + 1 >= p.length) ok = false
              }
            case _ =>
              if (j + 3 >= p.length) ok = false
              else {
                val len = be16(j + 2)
                if (len < 2) ok = false else j += 2 + len
              }
          }
        }
        if (end > 0) { out += ((start, end)); i = end }
        else i += 1
      } else i += 1
    }
    out.result()
  }

  /** REAL animated-GIF timing parse: per-frame delays (centiseconds)
    * from the Graphic Control Extension blocks (0x21 0xF9 0x04 …,
    * delay LE16 at +4 — GIF89a spec §23). Pure byte scan, no decode;
    * frames without a GCE contribute delay 0, matching the spec's
    * default. Empty for anything that is not a GIF. */
  def gifFrameDelaysCs(p: Array[Byte]): IndexedSeq[Int] = {
    def u8(i: Int) = p(i) & 0xff
    if (p.length < 6 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F' || p(3) != '8')
      return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[Int]
    var i = 6
    while (i + 7 < p.length) {
      if (u8(i) == 0x21 && u8(i + 1) == 0xF9 && u8(i + 2) == 0x04) {
        out += (u8(i + 4) | (u8(i + 5) << 8))
        i += 8
      } else i += 1
    }
    out.result()
  }

  /** REAL animated-GIF frame extraction via the JDK's gif
    * `ImageReader`: one `FrameRow` per sampled frame, the payload a
    * PNG re-encode of the decoded raster (standalone and readable by
    * [[decode]]), `t_ms` the CUMULATIVE per-frame delay from the
    * container's own GCE blocks — actual stream timestamps, like the
    * WAV path, not a synthetic timeline. Returns None when the
    * payload is not a multi-image-readable GIF (caller falls through
    * to the next demuxer). */
  private def gifFrames(mediaId: Long, p: Array[Byte], sampleEvery: Int): Option[Iterator[FrameRow]] = {
    if (p.length < 6 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F' || p(3) != '8') return None
    imageIOMemCache
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(p))
    val readers = javax.imageio.ImageIO.getImageReaders(in)
    if (!readers.hasNext) { in.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(in, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      val delays = gifFrameDelaysCs(p)
      // cumulative start times: frame i begins after the delays of 0..i-1
      val starts = delays.scanLeft(0L)((acc, d) => acc + d * 10L)
      Some(Iterator.range(0, n, sampleEvery).map { i =>
        val img = reader.read(i)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        FrameRow(mediaId, i, if (i < starts.length) starts(i) else i * 40L, bos.toByteArray)
      }.toIndexedSeq.iterator) // materialize before closing the reader
    } catch { case _: Exception => None }
    finally { reader.dispose(); in.close() }
  }

  /** REAL Y4M (YUV4MPEG2) demux — the uncompressed interchange format
    * ffmpeg and every codec test suite speak. Pure byte logic: the
    * space-separated header line carries W/H, the F<num>:<den> frame
    * rate, and the C chroma subsampling (default 420 per spec); each
    * frame is a `FRAME[params]\n` marker followed by fixed-size
    * planar YUV. Emitted frames are the LUMA plane re-encoded as a
    * standalone grayscale PNG (readable by [[decode]], like the GIF
    * path's PNGs), `t_ms` = frame_idx · 1000·den/num — the stream's
    * own clock. A trailing partial frame is dropped (truncated
    * capture ≡ shorter clip); an unknown chroma tag or malformed
    * header falls through to the next demuxer. */
  private[operators] def y4mFrames(mediaId: Long, p: Array[Byte],
      sampleEvery: Int): Option[Iterator[FrameRow]] = {
    val magic = "YUV4MPEG2 "
    if (p.length < magic.length + 4 ||
      !magic.indices.forall(i => p(i) == magic(i).toByte)) return None
    val hdrEnd = p.indexOf('\n'.toByte)
    if (hdrEnd < 0) return None
    val params = new String(p, 0, hdrEnd, "ISO-8859-1").split(' ').drop(1)
    def param(tag: Char): Option[String] =
      params.find(s => s.nonEmpty && s.head == tag).map(_.tail)
    val parsed = for {
      w <- param('W').flatMap(_.toIntOption) if w > 0
      h <- param('H').flatMap(_.toIntOption) if h > 0
      rate = param('F').map(_.split(":", 2)).collect {
        case Array(n, d) if n.toIntOption.exists(_ > 0) && d.toIntOption.exists(_ > 0) =>
          (n.toInt, d.toInt)
      }.getOrElse((25, 1)) // spec default when F is absent
      chroma = param('C').getOrElse("420")
      frameSize <- chroma match {
        case c if c.startsWith("420") => Some(w * h + 2 * ((w / 2) * (h / 2)))
        case c if c.startsWith("422") => Some(w * h * 2)
        case c if c.startsWith("444") => Some(w * h * 3)
        case "mono"                   => Some(w * h)
        case _                        => None // unknown chroma → not ours
      }
    } yield (w, h, rate, frameSize)
    parsed.map { case (w, h, (fn, fd), frameSize) =>
      // walk the FRAME markers; stop at the first malformed/truncated one
      val offsets = IndexedSeq.newBuilder[Int]
      var off = hdrEnd + 1
      var ok = true
      while (ok && off + 6 <= p.length) {
        ok = "FRAME".indices.forall(i => p(off + i) == "FRAME" (i).toByte)
        if (ok) {
          val nl = p.indexOf('\n'.toByte, off + 5)
          ok = nl >= 0 && nl + 1 + frameSize <= p.length
          if (ok) { offsets += (nl + 1); off = nl + 1 + frameSize }
        }
      }
      val frames = offsets.result()
      Iterator.range(0, frames.length, sampleEvery).map { i =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setDataElements(0, 0, w, h,
          java.util.Arrays.copyOfRange(p, frames(i), frames(i) + w * h))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        FrameRow(mediaId, i, i.toLong * 1000L * fd / fn, bos.toByteArray)
      }
    }
  }

  /** One sample (frame/packet) of an ISO BMFF (MP4) track: its byte
    * span inside the payload and its stream timestamp. */
  case class Mp4Sample(offset: Long, size: Long, tMs: Long)

  /** Parsed MP4 sample table for one track: the media timescale and
    * every sample's true byte span + timestamp. */
  case class Mp4Info(timescale: Long, samples: IndexedSeq[Mp4Sample])

  /** REAL STRUCTURAL MP4 (ISO BMFF / ISO 14496-12) demux — the same
    * discipline as [[wavInfo]]'s RIFF parse: pure big-endian byte
    * logic over the container's OWN index, no codec anywhere. The box
    * tree (`moov → trak → mdia → {mdhd, minf → stbl}`) carries a
    * complete sample index:
    *
    *  - `stsz` — per-sample byte sizes (or one uniform size),
    *  - `stco`/`co64` — absolute file offset of each chunk,
    *  - `stsc` — how many samples each chunk run holds,
    *  - `stts` — per-sample time deltas in `mdhd`'s timescale.
    *
    * Walking chunk runs and accumulating sizes yields every sample's
    * exact byte span; accumulating deltas yields its timestamp — real
    * frame boundaries and times WITHOUT decoding a single codec byte,
    * which is precisely what a distributed pipeline needs to shard,
    * sample, and route video payloads. Track selection dispatches on
    * each trak's `hdlr` handler type: `vide` wins over `soun` wins
    * over untyped (the frame-sampling consumer wants the video sample
    * table of an A/V movie); ties fall to the first complete trak in
    * file order. Samples overrunning the payload are dropped
    * (truncated download ≡ shorter clip, the WAV clamping rule);
    * 64-bit box sizes and `co64` offsets are honored; anything
    * malformed returns None and falls through to the next demuxer. */
  def mp4Info(p: Array[Byte]): Option[Mp4Info] = {
    def u8(i: Int) = (p(i) & 0xff).toLong
    def be32(i: Int): Long = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String = new String(p, i, 4, "ISO-8859-1")
    // (boxStart, payloadStart, boxEnd) triples of the children of [from, to)
    def children(from: Long, to: Long): IndexedSeq[(Long, Long, Long)] = {
      val out = IndexedSeq.newBuilder[(Long, Long, Long)]
      var off = from
      var ok = true
      while (ok && off + 8 <= to) {
        val sz32 = be32(off.toInt)
        val (size, hdr) =
          if (sz32 == 1L && off + 16 <= to) (be64(off.toInt + 8), 16L)
          else if (sz32 == 0L) (to - off, 8L) // box extends to container end
          else (sz32, 8L)
        if (size < hdr || off + size > to) ok = false
        else { out += ((off, off + hdr, off + size)); off += size }
      }
      out.result()
    }
    def find(from: Long, to: Long, name: String): Option[(Long, Long)] =
      children(from, to).collectFirst {
        case (s, ps, e) if fourcc(s.toInt + 4) == name => (ps, e)
      }
    if (p.length < 16) return None
    // sanity: the top level must parse as boxes and carry a moov
    val top = children(0L, p.length.toLong)
    if (top.isEmpty) return None
    val moov = top.collectFirst {
      case (s, ps, e) if fourcc(s.toInt + 4) == "moov" => (ps, e) }
    moov.flatMap { case (moovStart, moovEnd) =>
      // every trak whose stbl carries the full table set, tagged with
      // its hdlr handler_type; selection below prefers video
      val traks = children(moovStart, moovEnd).iterator
        .filter { case (s, _, _) => fourcc(s.toInt + 4) == "trak" }
        .flatMap { case (_, trakStart, trakEnd) =>
          for {
            (mdiaS, mdiaE) <- find(trakStart, trakEnd, "mdia")
            (mdhdS, _) <- find(mdiaS, mdiaE, "mdhd")
            timescale <- {
              val v = u8(mdhdS.toInt) // version byte of the full box
              val ts = if (v == 1L) be32(mdhdS.toInt + 20) else be32(mdhdS.toInt + 12)
              if (ts > 0) Some(ts) else None
            }
            (minfS, minfE) <- find(mdiaS, mdiaE, "minf")
            (stblS, stblE) <- find(minfS, minfE, "stbl")
            (stszS, _) <- find(stblS, stblE, "stsz")
            (sttsS, _) <- find(stblS, stblE, "stts")
            (stscS, _) <- find(stblS, stblE, "stsc")
            chunkOffsets <- find(stblS, stblE, "stco")
              .map { case (s, _) =>
                val n = be32(s.toInt + 4).toInt
                IndexedSeq.tabulate(n)(i => be32(s.toInt + 8 + 4 * i)) }
              .orElse(find(stblS, stblE, "co64").map { case (s, _) =>
                val n = be32(s.toInt + 4).toInt
                IndexedSeq.tabulate(n)(i => be64(s.toInt + 8 + 8 * i)) })
            samples <- {
              val uniform = be32(stszS.toInt + 4)
              val nSamples = be32(stszS.toInt + 8).toInt
              val sizes =
                if (uniform != 0L) IndexedSeq.fill(nSamples)(uniform)
                else IndexedSeq.tabulate(nSamples)(i => be32(stszS.toInt + 12 + 4 * i))
              // stsc runs: (firstChunk 1-based, samplesPerChunk)
              val nRuns = be32(stscS.toInt + 4).toInt
              val runs = IndexedSeq.tabulate(nRuns)(i =>
                (be32(stscS.toInt + 8 + 12 * i), be32(stscS.toInt + 12 + 12 * i)))
              // stts runs: (count, delta) → cumulative start times
              val nTts = be32(sttsS.toInt + 4).toInt
              val deltas = IndexedSeq.tabulate(nTts)(i =>
                (be32(sttsS.toInt + 8 + 8 * i), be32(sttsS.toInt + 12 + 8 * i)))
              val times = {
                val b = IndexedSeq.newBuilder[Long]
                var t = 0L
                deltas.foreach { case (cnt, d) =>
                  var k = 0L
                  while (k < cnt) { b += t; t += d; k += 1 }
                }
                b.result()
              }
              if (runs.isEmpty || chunkOffsets.isEmpty || nSamples == 0) None
              else {
                // walk chunks in order; each chunk's sample count comes
                // from the stsc run active at that chunk index
                val out = IndexedSeq.newBuilder[Mp4Sample]
                var sample = 0
                var chunk = 1
                var run = 0
                while (sample < nSamples && chunk <= chunkOffsets.length) {
                  while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
                  val perChunk = runs(run)._2
                  var off = chunkOffsets(chunk - 1)
                  var k = 0L
                  while (k < perChunk && sample < nSamples) {
                    val sz = sizes(sample)
                    val t = if (sample < times.length) times(sample) else 0L
                    if (off + sz <= p.length) // truncated-payload clamp
                      out += Mp4Sample(off, sz, t * 1000L / timescale)
                    off += sz; sample += 1; k += 1
                  }
                  chunk += 1
                }
                val res = out.result()
                if (res.nonEmpty) Some(res) else None
              }
            }
            // hdlr (FullBox: 4B version/flags, 4B pre_defined, then
            // handler_type fourcc) tags the trak's media kind; absent
            // hdlr → empty tag, still selectable as a fallback
            handler = find(mdiaS, mdiaE, "hdlr")
              .collect { case (s, e) if s + 12 <= e => fourcc(s.toInt + 8) }
              .getOrElse("")
          } yield (handler, Mp4Info(timescale, samples))
        }.toIndexedSeq
      // A/V dispatch on hdlr: a movie with audio+video traks yields
      // the VIDEO sample table (the frame-sampling consumer's
      // contract), audio-only files their sound track, and legacy
      // files with no/unknown handler the first complete trak —
      // never first-complete-wins over a typed track.
      traks.collectFirst { case ("vide", i) => i }
        .orElse(traks.collectFirst { case ("soun", i) => i })
        .orElse(traks.headOption.map(_._2))
    }
  }

  /** [[mp4Info]] as a frame iterator for [[sampleFrames]]: one row per
    * sampled MP4 sample with its TRUE byte span and container
    * timestamp. The bytes are codec payload (decoding them is the
    * external-codec splice point); the spans and times are real. */
  private def mp4Frames(mediaId: Long, p: Array[Byte],
      sampleEvery: Int): Option[Iterator[FrameRow]] =
    mp4Info(p).map { info =>
      Iterator.range(0, info.samples.length, sampleEvery).map { i =>
        val s = info.samples(i)
        FrameRow(mediaId, i, s.tMs,
          java.util.Arrays.copyOfRange(p, s.offset.toInt, (s.offset + s.size).toInt))
      }
    }

  case class WebmSample(offset: Long, size: Long, tMs: Long)
  /** Parsed Matroska/WebM structure: timestamp scale (ns per tick)
    * and every (Simple)Block frame span — laced blocks contribute one
    * span per laced frame. */
  case class WebmInfo(timescaleNs: Long, samples: IndexedSeq[WebmSample])

  /** Structural Matroska/WebM demux — the EBML twin of [[mp4Info]],
    * JDK-only byte logic, no codec. Walks Segment →
    * Info.TimestampScale and Segment → Cluster⁺ →
    * Timestamp/SimpleBlock/BlockGroup.Block per the public Matroska
    * spec (RFC 8794 EBML framing + the matroska.org element
    * registry): an element is ID vint (marker bits kept) + size vint
    * (marker stripped; all-ones = unknown size → element extends to
    * its parent's end, the shape live-muxed Segments/Clusters use) +
    * payload; a (Simple)Block's payload is track vint, big-endian
    * s16 timestamp relative to the cluster, flags byte, frame data.
    * Frame spans and absolute times
    * ((cluster + relative) · TimestampScale) are the container's
    * own; the bytes stay codec payload — same external-codec splice
    * contract as MP4. LACED blocks (flags & 0x06 ≠ 0 — how Matroska
    * packs tiny audio packets) are unpacked into per-frame spans via
    * their size table (Xiph 255-runs, fixed equal split, or EBML
    * vint + signed-vint deltas; the last frame is the leftover to
    * block end), each span carrying the block's own timestamp (lacing
    * encodes no per-frame times). Any truncated/inconsistent
    * structure — including a malformed lace table — parses to None or
    * drops that block, so the caller falls through to the stub
    * instead of emitting garbage spans. */
  def webmInfo(p: Array[Byte]): Option[WebmInfo] = {
    def u8(i: Long) = (p(i.toInt) & 0xff).toLong
    // (value, width); IDs keep the marker bit, sizes strip it
    def vint(i: Long, keepMarker: Boolean): Option[(Long, Int)] = {
      if (i >= p.length) return None
      val b0 = u8(i)
      if (b0 == 0L) return None // width > 8: invalid
      var width = 1
      var mask = 0x80L
      while ((b0 & mask) == 0) { width += 1; mask >>= 1 }
      if (i + width > p.length) return None
      var v = if (keepMarker) b0 else b0 & (mask - 1L)
      var k = 1
      while (k < width) { v = (v << 8) | u8(i + k); k += 1 }
      Some((v, width))
    }
    def unknownSize(v: Long, width: Int): Boolean = v == (1L << (7 * width)) - 1
    // (id, payloadStart, payloadEnd) triples of the children of [from, to)
    def children(from: Long, to: Long): IndexedSeq[(Long, Long, Long)] = {
      val out = IndexedSeq.newBuilder[(Long, Long, Long)]
      var off = from
      var ok = true
      while (ok && off < to) {
        val parsed = for {
          (id, idW) <- vint(off, keepMarker = true)
          (sz, szW) <- vint(off + idW, keepMarker = false)
        } yield {
          val ps = off + idW + szW
          val pe = if (unknownSize(sz, szW)) to else ps + sz
          (id, ps, pe)
        }
        parsed match {
          case Some((id, ps, pe)) if ps <= pe && pe <= to =>
            out += ((id, ps, pe)); off = pe
          case _ => ok = false
        }
      }
      out.result()
    }
    def uintBE(from: Long, to: Long): Long = {
      var v = 0L
      var i = from
      while (i < to) { v = (v << 8) | u8(i); i += 1 }
      v
    }
    if (p.length < 8) return None
    val top = children(0L, p.length.toLong)
    if (!top.exists(_._1 == 0x1A45DFA3L)) return None // EBML header gate
    top.collectFirst { case (0x18538067L, ps, pe) => (ps, pe) }.flatMap {
      case (segS, segE) =>
        val seg = children(segS, segE)
        val timescaleNs = (for {
          (infoS, infoE) <- seg.collectFirst { case (0x1549A966L, s, e) => (s, e) }
          (tsS, tsE) <- children(infoS, infoE).collectFirst { case (0x2AD7B1L, s, e) => (s, e) }
        } yield uintBE(tsS, tsE)).filter(_ > 0).getOrElse(1000000L)
        val samples = IndexedSeq.newBuilder[WebmSample]
        seg.foreach {
          case (0x1F43B675L, clS, clE) => // Cluster
            val kids = children(clS, clE)
            val clusterTs = kids.collectFirst { case (0xE7L, s, e) => uintBE(s, e) }.getOrElse(0L)
            def block(ps: Long, pe: Long): Unit =
              for ((_, trackW) <- vint(ps, keepMarker = false)) {
                val tOff = ps + trackW
                if (tOff + 3 <= pe) {
                  val rel = (((u8(tOff) << 8) | u8(tOff + 1)).toShort).toLong
                  val flags = u8(tOff + 2)
                  val dataS = tOff + 3
                  val tMs = (clusterTs + rel) * timescaleNs / 1000000L
                  if ((flags & 0x06L) == 0L) {
                    if (dataS < pe) samples += WebmSample(dataS, pe - dataS, tMs)
                  } else if (dataS < pe) {
                    // LACED block (RFC 9559 §10.3): u8 frame-count−1,
                    // then a per-mode size table for the first n−1
                    // frames — Xiph (255-run + terminator bytes), fixed
                    // (equal split of the remainder), or EBML (first
                    // size as an unsigned vint, the rest as
                    // range-shifted SIGNED vint deltas); the LAST
                    // frame's size is always the leftover to block end.
                    // Lacing carries no per-frame times — every frame
                    // keeps the block's own container timestamp. Any
                    // inconsistent table (overrun, non-dividing fixed
                    // split, negative size) drops the block rather
                    // than emitting garbage spans.
                    val nFrames = (u8(dataS) + 1).toInt
                    var cur = dataS + 1
                    val sizes: Option[Array[Long]] =
                      if (nFrames == 1) Some(Array(pe - cur))
                      else (flags & 0x06L) match {
                        case 0x02L => // Xiph
                          val szs = new Array[Long](nFrames)
                          var okL = true
                          var i = 0
                          while (okL && i < nFrames - 1) {
                            var s = 0L
                            var b = 255L
                            while (okL && b == 255L) {
                              if (cur >= pe) okL = false
                              else { b = u8(cur); cur += 1; s += b }
                            }
                            szs(i) = s; i += 1
                          }
                          if (okL) { szs(nFrames - 1) = pe - cur - szs.view.take(nFrames - 1).sum; Some(szs) }
                          else None
                        case 0x04L => // fixed-size
                          val total = pe - cur
                          if (total >= 0 && total % nFrames == 0)
                            Some(Array.fill(nFrames)(total / nFrames))
                          else None
                        case _ => // 0x06 EBML
                          val szs = new Array[Long](nFrames)
                          vint(cur, keepMarker = false) match {
                            case Some((first, w)) if cur + w <= pe =>
                              cur += w; szs(0) = first
                              var okL = true
                              var i = 1
                              while (okL && i < nFrames - 1) {
                                vint(cur, keepMarker = false) match {
                                  case Some((raw, w2)) if cur + w2 <= pe =>
                                    cur += w2
                                    // signed vint: stored value minus (2^(7w−1) − 1)
                                    szs(i) = szs(i - 1) + (raw - ((1L << (7 * w2 - 1)) - 1))
                                    i += 1
                                  case _ => okL = false
                                }
                              }
                              if (okL) { szs(nFrames - 1) = pe - cur - szs.view.take(nFrames - 1).sum; Some(szs) }
                              else None
                            case _ => None
                          }
                      }
                    sizes.foreach { szs =>
                      if (szs.forall(_ >= 0) && cur + szs.sum <= pe) {
                        var off = cur
                        szs.foreach { s => samples += WebmSample(off, s, tMs); off += s }
                      }
                    }
                  }
                }
              }
            kids.foreach {
              case (0xA3L, ps, pe) => block(ps, pe) // SimpleBlock
              case (0xA0L, gs, ge) => // BlockGroup → Block
                children(gs, ge).foreach {
                  case (0xA1L, ps, pe) => block(ps, pe)
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
        val res = samples.result()
        if (res.nonEmpty) Some(WebmInfo(timescaleNs, res)) else None
    }
  }

  /** [[webmInfo]] as a frame iterator for [[sampleFrames]] — same
    * contract as [[mp4Frames]]: true byte spans, container times,
    * codec-payload bytes. */
  private def webmFrames(mediaId: Long, p: Array[Byte],
      sampleEvery: Int): Option[Iterator[FrameRow]] =
    webmInfo(p).map { info =>
      Iterator.range(0, info.samples.length, sampleEvery).map { i =>
        val s = info.samples(i)
        FrameRow(mediaId, i, s.tMs,
          java.util.Arrays.copyOfRange(p, s.offset.toInt, (s.offset + s.size).toInt))
      }
    }

  /** Frame sampling — the video/audio analogue of [[decodeAll]]:
    * every `sampleEvery`-th frame of each payload is emitted as its
    * own row, so downstream per-frame ops (decode, embed, dedup)
    * compose relationally.
    *
    * WAV payloads DEMUX FOR REAL ([[wavInfo]]): a frame is `frameMs`
    * of PCM audio cut from the data chunk at the format's true byte
    * rate, so `t_ms` is the actual stream timestamp and frame bytes
    * are the actual samples of that interval. MJPEG payloads
    * (concatenated JPEGs — the simplest real video container) demux
    * for real too ([[jpegFrameSpans]]): each emitted frame is one
    * complete JPEG, ready for [[decode]] (javax.imageio reads JPEG),
    * at `frameMs` per frame on the timeline. Animated GIFs demux for
    * real as well ([[gifFrames]]): JDK ImageReader frames re-encoded
    * as standalone PNGs with t_ms from the container's OWN per-frame
    * GCE delays. Y4M streams demux for real ([[y4mFrames]]): FRAME
    * markers walked at the header's exact plane size, luma planes
    * re-encoded as grayscale PNGs, t_ms from the header's F rate.
    * MP4 payloads demux STRUCTURALLY for real ([[mp4Info]]): the
    * `stbl` sample tables give every sample's true byte span and
    * container timestamp with no codec — frame BYTES remain codec
    * payload (decoding them is the external-codec splice point), but
    * boundaries and times are the container's own. WebM/Matroska
    * payloads demux structurally too ([[webmInfo]]): the EBML
    * cluster walk yields each (Simple)Block's frame spans — laced
    * audio blocks unpacked per their size table — at the
    * (cluster + relative) · TimestampScale time, same splice
    * contract. Remaining
    * containers (exotic codecs, raw elementary streams) keep the
    * documented STUB:
    * contiguous `frameBytes`-sized slices (an ffmpeg-style demuxer
    * splices into the same marked seek point). All paths drop a
    * trailing partial frame, as a real demuxer drops a truncated last
    * packet. Row explosion happens map-side inside the partition
    * iterator — 1 input row → n sampled rows with NO shuffle, and the
    * demuxer context initializes once per PARTITION, not per row. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 1024,
      sampleEvery: Int = 5, frameMs: Long = 40L): Dataset[FrameRow] = {
    require(frameBytes > 0 && sampleEvery > 0 && frameMs > 0,
      "sampleFrames needs frameBytes > 0, sampleEvery > 0, frameMs > 0")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (demuxer/codec context)
      rows.flatMap { r =>
        wavInfo(r.payload) match {
          case Some(w) if w.bytesFor(frameMs) > 0 =>
            // real demux: fixed event-time windows over the PCM span
            val bpf = w.bytesFor(frameMs)
            val nFrames = (w.dataBytes / bpf).toInt
            Iterator.range(0, nFrames, sampleEvery).map { i =>
              val start = w.dataOffset + i * bpf
              FrameRow(r.media_id, i, i * frameMs,
                java.util.Arrays.copyOfRange(r.payload, start.toInt, (start + bpf).toInt))
            }
          case _ => mp4Frames(r.media_id, r.payload, sampleEvery)
              .orElse(webmFrames(r.media_id, r.payload, sampleEvery))
              .orElse(y4mFrames(r.media_id, r.payload, sampleEvery))
              .orElse(gifFrames(r.media_id, r.payload, sampleEvery)) match {
            case Some(frames) => frames
            case None =>
            val jpegSpans =
              if (r.payload.length >= 4 && r.payload(0) == 0xFF.toByte &&
                r.payload(1) == 0xD8.toByte) jpegFrameSpans(r.payload)
              else IndexedSeq.empty
            if (jpegSpans.nonEmpty)
              // real MJPEG demux: one row per sampled complete JPEG
              Iterator.range(0, jpegSpans.length, sampleEvery).map { i =>
                val (s, e) = jpegSpans(i)
                FrameRow(r.media_id, i, i * frameMs,
                  java.util.Arrays.copyOfRange(r.payload, s, e))
              }
            else {
              val nFrames = r.payload.length / frameBytes
              Iterator.range(0, nFrames, sampleEvery).map { i =>
                // a real demuxer seeks here; the stub slices the container
                FrameRow(r.media_id, i, i * frameMs,
                  java.util.Arrays.copyOfRange(r.payload, i * frameBytes, (i + 1) * frameBytes))
              }
            }
          }
        }
      }
    }
  }

  /** Harness adapter: the testdata has no binary table, so stand in
    * with the documents' UTF-8 bytes as opaque payloads — exercises
    * the identical plumbing (binary column, metadata, batching). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      coalesce(col("lang"), lit("und")).as("kind"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  /** SQL-expressible payload stats (oracle-checkable): per kind,
    * count, total bytes, distinct content hashes. */
  def payloadStats(docs: DataFrame): DataFrame =
    fromDocuments(docs).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        countDistinct(sha2(col("payload"), 256)).as("n_distinct"))
      .orderBy(col("kind").asc)

  // ---- perceptual hashing ----------------------------------------------

  /** Quantize a unit-scale value to an 8-bit gray level —
    * ⌊(v+1)·127.5⌋ clamped to [0, 255]. IEEE floor: identical on any
    * engine, which is what lets a SQL oracle replay the whole
    * encode→decode→hash round trip below. */
  def grayLevel(v: Double): Int =
    math.min(255, math.max(0, math.floor((v + 1.0) * 127.5).toInt))

  /** Deterministic w×h 8-bit grayscale PNG from row-major gray
    * levels. PNG is lossless, so the DECODED raster returns these
    * exact samples — byte-level encoder details (chunking, filters)
    * never matter downstream. */
  def encodeGrayPng(levels: Array[Int], w: Int, h: Int): Array[Byte] = {
    imageIOMemCache
    require(levels.length == w * h, s"need $w*$h levels, got ${levels.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < levels.length) {
      raster.setSample(i % w, i / w, 0, levels(i)); i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference hash (dHash) of a decoded raster: bit r·(w−1)+c set
    * iff pixel(r, c+1) > pixel(r, c) — the standard
    * brightness-invariant perceptual fingerprint (gradients survive
    * uniform exposure shifts that break byte hashes). For an 8×8
    * raster that is 56 bits in a Long. Returns None when the payload
    * is not a decodable raster. */
  def imageDHash(payload: Array[Byte]): Option[Long] = {
    imageIOMemCache
    val img = try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }
    img.map { i =>
      val w = i.getWidth; val h = i.getHeight
      require((w - 1) * h <= 64, s"raster ${w}x$h exceeds 64 dhash bits")
      val r = i.getRaster
      var bits = 0L; var y = 0
      while (y < h) {
        var x = 0
        while (x < w - 1) {
          if (r.getSample(x + 1, y, 0) > r.getSample(x, y, 0))
            bits |= 1L << (y * (w - 1) + x)
          x += 1
        }
        y += 1
      }
      bits
    }
  }

  /** Quantize a unit-scale value to signed 16-bit PCM —
    * ⌊v·32767 + 0.5⌋ clamped to [−32768, 32767]; IEEE floor, so a SQL
    * oracle replays it exactly. */
  def pcm16Level(v: Double): Int =
    math.min(32767, math.max(-32768, math.floor(v * 32767.0 + 0.5).toInt))

  /** Deterministic mono 16-bit PCM RIFF/WAVE: the canonical 44-byte
    * header + little-endian samples. Byte-stable by construction (no
    * encoder library, no optional chunks). */
  def encodePcm16Wav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val dataBytes = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = s.foreach(c => b.put(c.toByte))
    tag("RIFF"); b.putInt(36 + dataBytes); tag("WAVE")
    tag("fmt "); b.putInt(16); b.putShort(1); b.putShort(1) // PCM, mono
    b.putInt(sampleRate); b.putInt(sampleRate * 2)          // byte rate
    b.putShort(2); b.putShort(16)                           // block align, bits
    tag("data"); b.putInt(dataBytes)
    samples.foreach(s => b.putShort(s.toShort))
    b.array()
  }

  /** Per-frame audio signature through the REAL demux path — the
    * audio twin of [[embeddingDHash]]: embedding → PCM quantization →
    * WAV bytes → [[wavInfo]] RIFF parse + [[sampleFrames]] frame
    * slicing → integer-exact per-frame features:
    *
    *  - `energy` = Σ s² over the frame's samples (exact in Long — no
    *    FP anywhere, so the gate has zero tolerance);
    *  - `zero_crossings` = sign flips between consecutive samples
    *    (the classic cheap voicing/noisiness discriminator).
    *
    * The oracle computes both from the floats directly; a hash match
    * over every (vector, frame) certifies the header layout, data
    * offset, frame windowing, and little-endian sample decode of the
    * real WAV path. Defaults: 8 kHz mono 16-bit, 2 ms frames → 16
    * samples/frame, 4 frames per 64-dim vector. */
  def embeddingAudioSignature(embeddings: DataFrame, sampleRate: Int = 8000,
      frameMs: Long = 2L): DataFrame = {
    import embeddings.sparkSession.implicits._
    val media = embeddings
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull
        && size(col("embedding")) === 64)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, vec) =>
        MediaRow(id, "wav",
          encodePcm16Wav(vec.map(v => pcm16Level(v.toDouble)), sampleRate))
      }
    sampleFrames(media, sampleEvery = 1, frameMs = frameMs)
      .map { f =>
        val bb = java.nio.ByteBuffer.wrap(f.frame)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val s = Array.fill(f.frame.length / 2)(bb.getShort.toInt)
        val energy = s.foldLeft(0L)((a, x) => a + x.toLong * x)
        val zc = (1 until s.length).count(i => (s(i - 1) < 0) != (s(i) < 0)).toLong
        (f.media_id, f.frame_idx, energy, zc)
      }
      .toDF("vec_id", "frame_idx", "energy", "zero_crossings")
  }

  /** Per-vector perceptual hash through the REAL image path:
    * embedding → gray levels → PNG bytes (ImageIO encoder) → decode
    * (ImageIO reader) → raster dHash. The long way around is the
    * point — it certifies the binary plumbing: the oracle computes
    * the same 56 bits straight from the embedding floats, so any
    * encoder/decoder sample drift, row-major mix-up, or channel
    * surprise flips the hash gate. Partition-batched iterator
    * (genuine binary I/O — the [[decode]] precedent); output
    * (vec_id, dhash). */
  def embeddingDHash(embeddings: DataFrame, w: Int = 8, h: Int = 8): DataFrame = {
    import embeddings.sparkSession.implicits._
    embeddings
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull
        && size(col("embedding")) === w * h)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, vec) =>
          val levels = vec.map(v => grayLevel(v.toDouble))
          val png = encodeGrayPng(levels, w, h)
          val hash = imageDHash(png).getOrElse(
            throw new IllegalStateException(s"vec $id: synthesized PNG failed to decode"))
          (id, hash)
        }
      }
      .toDF("vec_id", "dhash")
  }

  /** Deterministic mono Y4M (YUV4MPEG2) from row-major gray levels:
    * the canonical space-separated header (`W`/`H`/`F`/`Cmono`)
    * followed by `FRAME\n`-delimited raw Y planes — `nFrames` frames
    * of `w×h` samples each. Byte-stable by construction (no encoder
    * library, no optional parameters), and `Cmono` keeps every frame
    * a pure luma plane, so the decoded rasters return these exact
    * samples. */
  def encodeGrayY4m(levels: Array[Int], w: Int, h: Int,
      fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    require(w > 0 && h > 0 && levels.length % (w * h) == 0,
      s"levels (${levels.length}) must be whole $w*$h frames")
    require(fpsNum > 0 && fpsDen > 0, "frame rate must be positive")
    val nFrames = levels.length / (w * h)
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Cmono\n".getBytes("ISO-8859-1")
    val marker = "FRAME\n".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (marker.length + w * h))
    out.write(header)
    var f = 0
    while (f < nFrames) {
      out.write(marker)
      var i = 0
      while (i < w * h) { out.write(levels(f * w * h + i) & 0xff); i += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Per-frame perceptual hash through the REAL video demux path —
    * the video twin of [[embeddingDHash]] (and of
    * [[embeddingAudioSignature]]'s WAV round trip): embedding → gray
    * levels → mono Y4M bytes ([[encodeGrayY4m]]) → [[sampleFrames]]
    * (which routes through [[y4mFrames]]'s header parse + FRAME-marker
    * walk and re-encodes each raw Y plane as PNG) → ImageIO decode →
    * per-frame raster dHash. The oracle computes the same bits and
    * container timestamps straight from the embedding floats, so a
    * hash gate over every (vector, frame) certifies the Y4M header
    * arithmetic, frame boundaries, the 1000·fd/fn timestamp rule, and
    * the per-frame decode — end-to-end under the DuckDB gate. A
    * 64-dim vector yields 4 frames of 4×4 luma at F25:1 → t_ms = 40·f
    * and a 12-bit dHash per frame. */
  def embeddingVideoFrameHash(embeddings: DataFrame, w: Int = 4, h: Int = 4): DataFrame = {
    import embeddings.sparkSession.implicits._
    val media = embeddings
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull
        && size(col("embedding")) % (w * h) === 0 && size(col("embedding")) > 0)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, vec) =>
        MediaRow(id, "y4m", encodeGrayY4m(vec.map(v => grayLevel(v.toDouble)), w, h))
      }
    sampleFrames(media, sampleEvery = 1)
      .map { f =>
        val hash = imageDHash(f.frame).getOrElse(throw new IllegalStateException(
          s"vec ${f.media_id} frame ${f.frame_idx}: demuxed PNG failed to decode"))
        (f.media_id, f.frame_idx, f.t_ms, hash)
      }
      .toDF("vec_id", "frame_idx", "t_ms", "framehash")
  }
}
