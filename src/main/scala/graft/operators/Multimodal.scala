package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque binary payloads + typed metadata,
  * decoded/feature-extracted in batched partition passes.
  *
  * The Spark-side plumbing is real (binary columns, typed Dataset,
  * mapPartitions batch shape — the Scala analog of `mapInPandas`); the
  * actual media decode is STUBBED with a deterministic fake (this
  * container ships no image/audio codecs): "width/height" are derived
  * from the first payload bytes, so results are reproducible and
  * oracle-checkable.
  */
object Multimodal {

  case class BinaryDoc(doc_id: Long, payload: Array[Byte], media_type: String)
  case class DecodedDoc(doc_id: Long, media_type: String, n_bytes: Int,
                        head_byte: Int, content_md5: String,
                        fake_width: Int, fake_height: Int)

  /** Attach a binary payload column (UTF-8 bytes of text — stands in
    * for image/audio bytes) plus metadata. */
  def toBinaryTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  case class FrameRow(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** Batched frame sampling — the 1→N explode shape of video decode:
    * the payload is treated as a stream of fixed-size frames
    * (`frameChars` bytes each, ASCII text standing in for frame
    * data), and every `stride`-th frame is emitted with its digest.
    * Streams the partition iterator; never materializes a whole
    * partition of frames. */
  def frameSample(spark: SparkSession, binTable: DataFrame,
                  frameChars: Int, stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    binTable.as[BinaryDoc].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { d =>
        val s = new String(d.payload, java.nio.charset.StandardCharsets.UTF_8)
        s.grouped(frameChars).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 =>
            val digest = md.clone().asInstanceOf[java.security.MessageDigest]
            digest.update(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            FrameRow(d.doc_id, i,
              digest.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  case class ChunkRow(doc_id: Long, chunk_idx: Int, off: Int, n_chars: Int,
                      chunk_md5: String)

  /** Overlapping-window audio chunking — the STFT/feature-extraction
    * shape of audio decode: the payload is sliced into `chunkChars`
    * windows every `hopChars` (hop < chunk ⇒ overlap), each emitted
    * with its digest. Streams the partition iterator like
    * [[frameSample]]; a real codec would decode PCM in the same
    * batched pass. */
  def audioChunks(spark: SparkSession, binTable: DataFrame,
                  chunkChars: Int, hopChars: Int): Dataset[ChunkRow] = {
    import spark.implicits._
    binTable.as[BinaryDoc].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { d =>
        val s = new String(d.payload, java.nio.charset.StandardCharsets.UTF_8)
        Iterator.from(0).map(_ * hopChars).takeWhile(_ < s.length).zipWithIndex
          .map { case (off, i) =>
            val chunk = s.substring(off, math.min(off + chunkChars, s.length))
            val digest = md.clone().asInstanceOf[java.security.MessageDigest]
            digest.update(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            ChunkRow(d.doc_id, i, off, chunk.length,
              digest.digest().map("%02x".format(_)).mkString)
          }
      }
    }
  }

  /** Aspect-preserving resize of the decoded (fake) dimensions into a
    * maxSide×maxSide box — pure integer Column math (codegen'd), the
    * metadata half of a real resize whose pixel work would live in a
    * frameSample-shaped batched pass. */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val mx = greatest(col("fake_width"), col("fake_height"))
    decoded.select(
      col("doc_id"), col("fake_width"), col("fake_height"),
      greatest(lit(1), floor(col("fake_width") * maxSide / mx).cast("int"))
        .as("out_width"),
      greatest(lit(1), floor(col("fake_height") * maxSide / mx).cast("int"))
        .as("out_height"))
  }

  case class FeatureRow(doc_id: Long, features: Seq[Long], dom_bin: Long)

  /** Deterministic fake feature extraction — a codepoint-value
    * histogram per payload (`bins` equal-width bins over 0..255,
    * codepoints ≥256 ignored): the batched mapPartitions shape of a
    * real embedding/feature model over media bytes (model inference
    * would replace the histogram loop in the same partition pass,
    * emitting float vectors for the ANN family; a raw-byte histogram
    * is the same loop over `d.payload` directly). Binning per decoded
    * codepoint rather than per UTF-8 byte keeps the vector bit-exact
    * against a SQL oracle (`ascii(c) // 16`) on any text, not just
    * ASCII. Counts are exact integers, so the vector is
    * oracle-checkable bit-for-bit. */
  def featureExtract(spark: SparkSession, binTable: DataFrame,
                     bins: Int = 16): Dataset[FeatureRow] = {
    import spark.implicits._
    binTable.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        val s = new String(d.payload, java.nio.charset.StandardCharsets.UTF_8)
        val hist = new Array[Long](bins)
        s.foreach { c =>
          val cp = c.toInt
          if (cp < 256) hist((cp * bins) / 256) += 1
        }
        FeatureRow(d.doc_id, hist.toSeq, hist.indexOf(hist.max).toLong)
      }
    }
  }

  /** Batched "decode": one pass per partition, streaming the iterator
    * (no per-row task overhead, no full-partition materialization) —
    * the shape a real codec UDF needs at 100 TB. */
  def decode(spark: SparkSession, binTable: DataFrame): Dataset[DecodedDoc] = {
    import spark.implicits._
    binTable.as[BinaryDoc].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { d =>
        val b = d.payload
        val digest = md.clone().asInstanceOf[java.security.MessageDigest]
        digest.update(b)
        val hex = digest.digest().map("%02x".format(_)).mkString
        DecodedDoc(
          doc_id = d.doc_id,
          media_type = d.media_type,
          n_bytes = b.length,
          head_byte = if (b.nonEmpty) b(0) & 0xff else -1,
          content_md5 = hex,
          fake_width = 1 + (if (b.nonEmpty) (b(0) & 0xff) % 64 else 0),
          fake_height = 1 + (if (b.length > 1) (b(1) & 0xff) % 64 else 0))
      }
    }
  }
}
