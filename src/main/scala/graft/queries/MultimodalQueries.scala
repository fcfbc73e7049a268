package graft.queries

import graft.ops.MultimodalOps
import graft.tables.Tables

/** Multimodal-column plumbing over a deterministic asset table derived from
  * `documents` (binary payload + typed metadata). The Catalyst-only path
  * (metadata, checksum via binary→string round-trip, frame sampling) is
  * oracle-checked; the stub-decoder path is rows-only here and exactness-
  * tested in MultimodalSpec. */
object MultimodalQueries {

  import OracleText.FINGERPRINT

  val defs: Seq[QueryDef] = Seq(

    // Binary column round-trip + periodic frame sampling, pure expressions:
    // the payload is only touched in the projected expression, never decoded
    // by a UDF. frame_codes joined to a string (array compare portability).
    QueryDef.withOracle("mm_frames",
      s"""SELECT doc_id AS asset_id,
         |  (['audio','image','video'])[CAST(doc_id % 3 AS INT) + 1] AS format,
         |  octet_length(encode(text)) AS n_bytes,
         |  $FINGERPRINT AS checksum,
         |  array_to_string(list_transform(
         |    range(0, CAST(least(floor((length(text) - 1) / 64) + 1, 8) AS BIGINT)),
         |    i -> CAST(unicode(substr(text, CAST(i * 64 + 1 AS INT), 1)) AS VARCHAR)),
         |    ',') AS frame_codes
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.assetsFromDocuments(Tables(s, dir, "documents")),
        stride = 64, maxFrames = 8)
        .orderBy("asset_id")
    },

    // Stub-decoder feature extraction (mapPartitions batch iteration —
    // the real-codec plumbing). Deterministic fake decode -> rows-only.
    QueryDef.rowsOnly("mm_decode") { (s, dir) =>
      MultimodalOps.decodeFeatures(
        MultimodalOps.assetsFromDocuments(Tables(s, dir, "documents")))
        .toDF().orderBy("asset_id")
    }
  )
}
