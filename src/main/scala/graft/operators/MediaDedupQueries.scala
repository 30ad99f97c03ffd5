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
        // spread (r19): the token explode + votes otherwise run inside
        // the single-row-group scan task — serial on any core count
        spread(Tables.documents(s, d))
          .select(col("doc_id"), SimHash.simhash(col("text")).as("simhash"))
          .orderBy("doc_id"),
      None
    ),

    // B2d': SimHash, ORACLE-CHECKED twin — 16-bit fingerprint whose
    // per-token bits come from md5 hex nibbles instead of xxhash64, so
    // DuckDB replays the whole vote-and-sign pipeline. Same semantics
    // as SimHash.simhash: distinct tokens of lower(trim(text)), vote
    // +1/-1 per bit, signature bit set iff the vote sum is > 0.
    Entry(
      "b2_simhash_md5",
      (s, d) => {
        // bit b of a token = bit (3 - b%4) of hex nibble b/4 of md5(token)
        val voteCols = (0 until 16).map { b =>
          val nib = conv(substring(col("dg"), b / 4 + 1, 1), 16, 10).cast("int")
          val bit = shiftright(nib, 3 - b % 4).bitwiseAND(lit(1))
          sum(bit * 2 - 1).as(s"n$b")
        }
        val fp = (0 until 16).map { b =>
          when(col(s"n$b") > 0, lit(1L << (15 - b))).otherwise(lit(0L))
        }.reduce(_ + _)
        // no spread here (r19, measured): the token explode is light —
        // the exchange cost 0.4 s against a 0.5 s serial stage
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(split(lower(trim(col("text"))), " "))).as("tok"))
          .select(col("doc_id"), md5(col("tok")).as("dg"))
          .groupBy("doc_id")
          .agg(voteCols.head, voteCols.tail: _*)
          .select(col("doc_id"), fp.as("simhash16"))
          .orderBy("doc_id")
      },
      Some {
        val votes = (0 until 16).map { b =>
          val nib = s"(strpos('0123456789abcdef', substring(dg, ${b / 4 + 1}, 1)) - 1)"
          s"sum((($nib >> ${3 - b % 4}) & 1) * 2 - 1) AS n$b"
        }.mkString(",\n|  ")
        val fp = (0 until 16).map(b => s"CASE WHEN n$b > 0 THEN ${1L << (15 - b)} ELSE 0 END")
          .mkString(" + ")
        s"""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
           |FROM documents),
           |dig AS (SELECT doc_id, md5(tok) AS dg FROM toks),
           |votes AS (SELECT doc_id,
           |  $votes
           |  FROM dig GROUP BY doc_id)
           |SELECT doc_id, CAST($fp AS BIGINT) AS simhash16 FROM votes
           |ORDER BY doc_id NULLS FIRST""".stripMargin
      }
    ),

    // B6c: frame sampling over opaque binary payloads — every 8th-byte
    // offset yields a 4-byte "frame" (the batch shape of video
    // frame-sampling / audio windowing: pure expressions, one generator,
    // no UDF; a real codec would replace the substring with a decode).
    Entry(
      "b6_frame_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .filter(length(col("payload")) >= 4)
        docs
          .withColumn("frames",
            transform(
              expr("sequence(0, CAST((length(payload) - 4) / 8 AS INT))"),
              f => hex(col("payload").substr(f * 8 + 1, lit(4)))))
          .select(col("doc_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame_hex")))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
             |FROM documents WHERE doc_id < 100 AND octet_length(encode(text)) >= 4)
             |SELECT doc_id,
             |CAST(unnest(range(0, (n - 4) // 8 + 1)) AS INT) AS frame_idx,
             |unnest(list_transform(range(0, (n - 4) // 8 + 1),
             |f -> substring(hx, CAST(8 * 2 * f + 1 AS INT), 8))) AS frame_hex
             |FROM h ORDER BY doc_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin)
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
      // Oracle in BYTE semantics (octet_length + hex-pair decode of the
      // UTF-8 bytes), guarded for payloads < 16 bytes — char-based
      // length/ord would drift on non-ASCII documents (ADVICE.md r01).
      Some("""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents)
             |SELECT doc_id, CAST(n AS INT) AS n_bytes,
             |CAST(1 + n % 64 AS INT) AS width,
             |CAST(1 + (n // 64) % 64 AS INT) AS height,
             |round(CASE WHEN n >= 16 THEN list_sum(list_transform(range(1, 17), i ->
             |CAST((strpos('0123456789ABCDEF', substring(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16 +
             |(strpos('0123456789ABCDEF', substring(hx, CAST(2*i AS INT), 1)) - 1) AS DOUBLE))) / 16.0 / 255.0 END, 6) AS brightness
             |FROM h ORDER BY doc_id NULLS FIRST""".stripMargin)
    )
  )
}
