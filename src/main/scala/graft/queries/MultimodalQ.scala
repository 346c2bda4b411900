package graft.queries

import graft.QueryGroup
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: binary payload + metadata → batched
  * decode stub → feature columns. The decode itself is a deterministic
  * fake (no codecs in this container) but the whole Spark plumbing —
  * binary column, typed Dataset, mapPartitions batching — is real and
  * the outputs are oracle-checked (payload bytes are UTF-8 text, so
  * DuckDB can recompute every derived value).
  */
object MultimodalQ extends QueryGroup {

  override def queries = Seq(

    q("mm1_decode",
      """SELECT doc_id, 'image/fake' AS media_type,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS head_byte,
        |  md5(text) AS content_md5,
        |  1 + ascii(substr(text, 1, 1)) % 64 AS fake_width,
        |  1 + ascii(substr(text, 2, 1)) % 64 AS fake_height
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.decode(s, Multimodal.toBinaryTable(t(s, dir)("documents")))
        .toDF()
        .select("doc_id", "media_type", "n_bytes", "head_byte", "content_md5",
          "fake_width", "fake_height")
        .orderBy("doc_id")
    },

    // Frame sampling: payload as a stream of 32-byte frames, every 2nd
    // frame emitted with its digest (the 1→N video-decode shape).
    q("mm2_frame_sample",
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(ceil(length(text) / 32.0) AS BIGINT))) AS i
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  md5(substr(text, CAST(i * 32 + 1 AS INT), 32)) AS frame_md5
        |FROM f WHERE i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.frameSample(s,
          Multimodal.toBinaryTable(t(s, dir)("documents")),
          frameChars = 32, stride = 2)
        .toDF()
        .orderBy("doc_id", "frame_idx")
    },

    // Aspect-preserving resize metadata into a 32×32 box (integer
    // math; the pixel half of a real resize stays in frameSample's
    // batched pass).
    q("mm3_resize",
      """SELECT doc_id,
        |  1 + ascii(substr(text, 1, 1)) % 64 AS fake_width,
        |  1 + ascii(substr(text, 2, 1)) % 64 AS fake_height,
        |  greatest(1, CAST(floor((1 + ascii(substr(text, 1, 1)) % 64) * 32.0
        |    / greatest(1 + ascii(substr(text, 1, 1)) % 64, 1 + ascii(substr(text, 2, 1)) % 64)) AS INT)) AS out_width,
        |  greatest(1, CAST(floor((1 + ascii(substr(text, 2, 1)) % 64) * 32.0
        |    / greatest(1 + ascii(substr(text, 1, 1)) % 64, 1 + ascii(substr(text, 2, 1)) % 64)) AS INT)) AS out_height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.resizeMeta(
          Multimodal.decode(s,
            Multimodal.toBinaryTable(t(s, dir)("documents"))).toDF(),
          maxSide = 32)
        .orderBy("doc_id")
    },

    // Overlapping audio windows: 64-byte chunks every 48 bytes (25%
    // overlap — the STFT hop shape); 1→N batched pass per partition.
    q("mm4_audio_chunks",
      """WITH o AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0,
        |      CAST(floor((length(text) - 1) / 48.0) AS BIGINT))) AS i
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx, CAST(i * 48 AS INT) AS off,
        |  least(64, length(text) - CAST(i * 48 AS INT)) AS n_chars,
        |  md5(substr(text, CAST(i * 48 + 1 AS INT), 64)) AS chunk_md5
        |FROM o ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      Multimodal.audioChunks(s,
          Multimodal.toBinaryTable(t(s, dir)("documents")),
          chunkChars = 64, hopChars = 48)
        .toDF()
        .orderBy("doc_id", "chunk_idx")
    },

    // Feature extraction: 16-bin codepoint-value histogram per payload
    // — the batched model-inference shape (a real extractor would emit
    // float embeddings for the v* ANN family in the same pass).
    // Integer counts keep the vector bit-exact across engines; the
    // vector is rendered as a ':'-joined string so the driver's
    // row-sorting comparator can hash it (raw list columns are
    // unsortable in pandas).
    q("mm5_features",
      """WITH ch AS (SELECT doc_id, string_split(text, '') AS cs FROM documents),
        |h AS (SELECT doc_id, list_transform(generate_series(0, 15),
        |        b -> CAST(len(list_filter(cs, c -> ascii(c) // 16 = b)) AS BIGINT)) AS fv
        |      FROM ch)
        |SELECT doc_id, array_to_string(fv, ':') AS features,
        |  CAST(list_position(fv, list_max(fv)) - 1 AS BIGINT) AS dom_bin
        |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.featureExtract(s,
          Multimodal.toBinaryTable(t(s, dir)("documents")), bins = 16)
        .toDF()
        .select(col("doc_id"),
          concat_ws(":", transform(col("features"), _.cast("string")))
            .as("features"),
          col("dom_bin"))
        .orderBy("doc_id")
    })
}
