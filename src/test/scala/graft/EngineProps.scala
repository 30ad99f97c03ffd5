package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Algebraic laws from SURVEY.md §5.3.2: dedup idempotence, epoch-ms
  * roundtrip, set-op cardinality. */
object EngineProps extends Properties("engine") {

  private lazy val spark = SparkFixture.session
  import spark.implicits._

  private val smallTexts =
    Gen.nonEmptyListOf(Gen.oneOf("aa bb", "cc dd", "aa  bb", "x", "Y z"))

  property("exact dedup is idempotent") = forAll(smallTexts) { texts =>
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def dedup(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(md5(lower(trim(col("text")))).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
    val once = dedup(df).count()
    val twice = dedup(dedup(df).join(df, "doc_id").select("doc_id", "text")).count()
    once == twice
  }

  property("timestamp_millis ∘ unix_millis = identity on ms-precision instants") =
    forAll(Gen.choose(0L, 4102444800000L)) { ms => // 1970..2100
      val r = Seq(ms).toDF("ms")
        .select(unix_millis(timestamp_millis(col("ms"))).as("back"))
        .collect().head.getLong(0)
      r == ms
    }

  property("|A ∪all B| = |A| + |B| and |A ∩ B| + |A except B| = |distinct A|") =
    forAll(Gen.listOf(Gen.choose(0, 20)), Gen.listOf(Gen.choose(0, 20))) { (xs, ys) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      val unionAll = a.union(b).count() == xs.length + ys.length
      val partition =
        a.intersect(b).count() + a.except(b).count() == a.distinct().count()
      unionAll && partition
    }

  // random small corpora over a tiny alphabet — repeated substrings
  // guarantee real merge activity, not just early stops
  private val corpora: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(
      Gen.oneOf("ab", "abc", "aab", "ba", "cab", "abab", "a", "bc"))
      .map(_.mkString(" ")))

  property("BPE: driver-side and distributed merge training are bit-identical") =
    forAll(corpora) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      rows(graft.operators.Bpe.trainMerges(docs, 8)) ==
        rows(graft.operators.Bpe.trainMerges(docs, 8, localVocabLimit = 0))
    }

  // random per-user event offsets (seconds within an hour)
  private val eventSets: Gen[List[(Long, Int)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.choose(1L, 4L)
      sec <- Gen.choose(0, 3599)
    } yield (user, sec))

  property("sessionize: events conserved, one session per user at infinite gap") =
    forAll(eventSets) { evs =>
      val df = evs.zipWithIndex.map { case ((u, sec), i) =>
        (i.toLong, java.sql.Timestamp.from(
          java.time.Instant.parse("2026-01-01T00:00:00Z").plusSeconds(sec)),
          u, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val sessions = graft.operators.Analytics.sessionize(df, gapUs = 60L * 1000000)
        .collect()
      val users = evs.map(_._1).toSet
      val conserved = sessions.map(_.getLong(2)).sum == evs.length
      val oneAtInfinite = graft.operators.Analytics
        .sessionize(df, gapUs = Long.MaxValue / 2).count() == users.size
      // within a session, span is consistent: end >= start and bounded
      // by the hour of generated data
      val sane = sessions.forall { r =>
        val (st, en) = (r.getLong(3), r.getLong(4))
        en >= st && en - st <= 3600L * 1000000
      }
      conserved && oneAtInfinite && sane
    }
}
