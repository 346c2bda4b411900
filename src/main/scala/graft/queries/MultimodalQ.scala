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
    })
}
