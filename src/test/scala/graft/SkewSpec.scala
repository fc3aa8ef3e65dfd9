package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.bsp.Skew

/** Salted-join correctness: identical results to the plain join on a
  * hub-skewed edge table, and the hot key actually spreads over salts. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin == plain join on a hub-skewed key; hot key spreads across salts") {
    // hub node 7 receives 90% of edges
    val edges = ((1L to 900L).map(i => (i % 50, 7L)) ++
      (1L to 100L).map(i => (i % 50, i % 20))).toDF("src", "dst")
    val dim = (0L to 20L).map(i => (i, s"host-$i")).toDF("dst", "host")
    val plain = edges.join(dim, Seq("dst")).select("src", "dst", "host").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(edges, dim, "dst", salts = 8)
      .select("src", "dst", "host").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    // left join keeps unmatched rows (dst 7 matched; add an unmatched key)
    val edges2 = edges.union(Seq((1L, 999L)).toDF("src", "dst"))
    val left = Skew.saltedJoin(edges2, dim, "dst", salts = 4, joinType = "left")
    assert(left.count() == plain.length + 1)
    assert(left.filter($"dst" === 999L).head().isNullAt(2))
    // the hot key's rows carry several distinct salts (the point of salting)
    val saltSpread = edges.filter($"dst" === 7L)
      .withColumn("s", pmod(hash($"src"), lit(8)).cast("int"))
      .select("s").distinct().count()
    assert(saltSpread > 4)
  }

  test("saltedSum == plain sum") {
    val df = ((1L to 500L).map(i => ("hot", i.toDouble)) ++
      Seq(("cold", 1.0), ("cold", 2.0))).toDF("k", "v")
    val got = Skew.saltedSum(df, "k", "v", salts = 16).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("hot") == (1L to 500L).sum.toDouble)
    assert(got("cold") == 3.0)
  }
}
