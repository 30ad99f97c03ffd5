package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryRegistry._
import graft.functions.{Multimodal, SimHash}
import graft.sources.Tables

/** SimHash fingerprinting + multimodal decode plumbing — the remaining
  * SURVEY.md §2.B dedup/multimodal rows not covered in LlmQueries.
  */
object MediaDedupQueries {

  val entries: Seq[Entry] = Seq(
    // SimHash per-doc fingerprint (non-SQL: depends on xxhash64; the
    // near-dup semantics are unit-tested on planted pairs).
    Entry(
      "b2_simhash",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), SimHash.simhash(col("text")).as("simhash"))
          .orderBy("doc_id"),
      None
    ),

    // B6b: partition-wise typed decode of binary payloads (mapInPandas
    // analogue). The stub's arithmetic is mirrored exactly in SQL so the
    // plumbing is oracle-checked end to end.
    Entry(
      "b6_multimodal_decode",
      (s, d) => {
        val decoded = Multimodal.decodeStub(s, Multimodal.withPayload(Tables.documents(s, d)))
        decoded.toDF()
          .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
            round(col("brightness"), 6).as("brightness"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
             |CAST(1 + length(text) % 64 AS INT) AS width,
             |CAST(1 + (length(text) // 64) % 64 AS INT) AS height,
             |round(list_sum(list_transform(range(1, 17), i -> CAST(ord(substring(text, CAST(i AS INT), 1)) AS DOUBLE))) / 16.0 / 255.0, 6) AS brightness
             |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin)
    )
  )
}
