package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{LakehouseQueries, MinHash}

/** Lake-maintenance operators: Z-order key properties, CDC upsert
  * branch semantics, date-spine completeness, connected components on
  * a crafted multi-hop graph. */
class LakehouseSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("zkey16 interleaves bits: known values and monotone block locality") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
    val z = df.select(LakehouseQueries.zkey16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x bits -> even positions, y bits -> odd positions.
    assert(z === Seq(0L, 1L, 2L, 3L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("zkey16 preserves 2-d locality: same 8x8 tile => same zkey>>6") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"), LakehouseQueries.zkey16(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // Top bits of z are exactly the interleave of the tile coords.
      val tile = (x >> 3, y >> 3)
      val zTile = z >> 6
      val expected = (0 until 13).map { i =>
        (((tile._1 >> i) & 1) << (2 * i)) + (((tile._2 >> i) & 1) << (2 * i + 1))
      }.sum
      assert(zTile === expected, s"($x,$y)")
    }
  }

  test("upsert merge exercises U, K and I branches") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("c_custkey", "c_name", "c_acctbal")
    val changes = Seq((1L, 99.0), (7L, 7.0)).toDF("user_id", "value")
    val merged = base.join(changes, col("c_custkey") === col("user_id"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("user_id")).as("key"),
        coalesce(col("value"), col("c_acctbal")).as("acctbal"),
        when(col("c_custkey").isNull, "I")
          .when(col("user_id").isNull, "K").otherwise("U").as("op"))
      .orderBy("key")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(merged.toSeq === Seq((1L, 99.0, "U"), (2L, 20.0, "K"), (7L, 7.0, "I")))
  }

  test("date spine covers every day inclusive with ISO weekday") {
    val spine = Seq(("2024-02-27", "2024-03-02")).toDF("lo", "hi")
      .select(explode(sequence(col("lo").cast("date"), col("hi").cast("date"),
        expr("interval 1 day"))).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        (weekday(col("d")) + 1).as("dow"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(spine.length === 5) // leap-year Feb 29 included
    assert(spine.head === ("2024-02-27", 2)) // Tuesday
    assert(spine.map(_._1).contains("2024-02-29"))
    assert(spine.last === ("2024-03-02", 6)) // Saturday
  }

  test("connected components merges multi-hop chains to component minimum") {
    // 1-2-3 chain (no direct 1-3 edge), 4-5 pair, 9 isolated member-less.
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val comp = MinHash.connectedComponents(ids, pairs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comp.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
  }

  test("iterative CC path agrees with local union-find on a long chain") {
    // 0-1-2-...-19 path plus 30-31; diameter 19 forces several
    // pointer-jump rounds on the distributed path.
    val chain = (0L until 19L).map(i => (i, i + 1)) ++ Seq((30L, 31L))
    val pairs = chain.toDF("doc_a", "doc_b")
    val ids = ((0L to 19L) ++ Seq(30L, 31L, 99L)).toDF("doc_id")
    val viaLocal = MinHash.connectedComponents(ids, pairs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val und = pairs.select(col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
    val viaIter = MinHash.iterativeComponents(ids, und)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaLocal === viaIter)
    assert(viaLocal.filter(_._1 <= 19L).forall(_._2 == 0L))
    assert(viaLocal.filter(t => t._1 == 30L || t._1 == 31L).forall(_._2 == 30L))
    assert(viaLocal.find(_._1 == 99L).get._2 === 99L) // singleton keeps itself
  }

  test("b2_canonical_keep picks one max-norm member per multi-member cluster") {
    val sf = "/root/testdata/sf0.01"
    def q(n: String) = LakehouseQueries.entries.find(_.name == n).get.q(spark, sf)
    val clusters = q("b2_cc_clusters")
      .groupBy("dup_group").count().filter(col("count") >= 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keep = q("b2_canonical_keep").collect()
    // exactly the multi-member clusters appear, with matching sizes
    assert(keep.map(_.getLong(0)).toSet === clusters.keySet)
    keep.foreach { r =>
      assert(r.getLong(1) === clusters(r.getLong(0)))
      assert(r.getDouble(3) > 0)
    }
    // one row per cluster
    assert(keep.map(_.getLong(0)).distinct.length === keep.length)
  }

  test("b2_graph_rank: isolated nodes hold the teleport mass, linked nodes exceed it") {
    val sf = "/root/testdata/sf0.01"
    def q(n: String) = LakehouseQueries.entries.find(_.name == n).get.q(spark, sf)
    // members of any dup cluster are exactly the nodes with edges
    val linked = q("b2_cc_clusters")
      .groupBy("dup_group").count().filter(col("count") >= 2)
      .join(q("b2_cc_clusters"), "dup_group")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pr = q("b2_graph_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pr.foreach { case (id, p) =>
      if (linked(id)) assert(p > 150000L, s"linked node $id")
      else assert(p === 150000L, s"isolated node $id") // teleport mass in micro-units
    }
  }

  test("unpivot emits one long row per metric column") {
    val wide = Seq(("A", 1.0, 2.0)).toDF("k", "m1", "m2")
    val long = wide.unpivot(Array(col("k")), Array(col("m1"), col("m2")), "metric", "val")
      .orderBy("metric")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(long.toSeq === Seq(("A", "m1", 1.0), ("A", "m2", 2.0)))
  }
}
