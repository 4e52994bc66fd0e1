package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-27 operators: duplicate-span detection, bitmap exact distinct,
  * pivot/unpivot round-trip — each replayed against an independent
  * brute-force computation (Scala collections or a second Spark plan
  * with different operators), not just the DuckDB oracle.
  */
class ReshapeOpsSpec extends SparkSpec {

  "TextOps.dupSpans" should "match a sequential brute-force replay on the sf0.001 corpus" in {
    // independent reference: plain Scala — per-doc 5-gram strings with
    // positions, grams in >=2 distinct docs, islands merged sequentially
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val w = 5
    val grams = docs.flatMap { case (id, ws) =>
      if (ws.length < w) Array.empty[(Long, Long, String)]
      else (0 to ws.length - w).map(i =>
        (id, (i + 1).toLong, ws.slice(i, i + w).mkString(" "))).toArray
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = grams.filter(g => dup(g._3))
      .groupBy(_._1).toSeq.flatMap { case (id, gs) =>
        val ps = gs.map(_._2).sorted
        // sequential island merge
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        for (p <- ps) {
          if (spans.nonEmpty && spans.last._2 == p - 1) {
            val (st, _, n) = spans.remove(spans.length - 1)
            spans += ((st, p, n + 1))
          } else spans += ((p, p, 1L))
        }
        spans.map { case (st, en, n) => (id, st, en, n, en - st + w) }
      }.sortBy(t => (t._1, t._2))

    val got = TextOps.dupSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.toSeq shouldBe expected
    // sanity: the fixture actually exercises the op
    got.length should be > 10
    // maximality: spans from the same doc never touch (a shared edge
    // would mean the island merge failed to coalesce them)
    got.groupBy(_._1).values.foreach { spans =>
      spans.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => b._2 should be > (a._3 + 1)
        case _           => ()
      }
    }
  }

  "RelationalExt.bitmapDistinct" should "equal count(distinct) per group" in {
    val expected = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(count_distinct(col("o_custkey")).as("n_distinct"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = RelationalExt.bitmapDistinct(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got shouldBe expected
  }

  it should "pack keys that share a word slot into one word" in {
    val s = spark
    import s.implicits._
    // 3 keys in slot 0 (1,2,63), 1 key in slot 1 (64), duplicates collapse
    val df = Seq(("A", 1L), ("A", 2L), ("A", 2L), ("A", 63L), ("A", 64L))
      .toDF("o_orderpriority", "o_custkey")
    val words = df
      .select(col("o_orderpriority"),
        expr("o_custkey div 64").as("wslot"),
        expr("shiftleft(1L, CAST(o_custkey % 64 AS INT))").as("bit"))
      .groupBy("o_orderpriority", "wslot")
      .agg(bit_or(col("bit")).as("word"))
      .orderBy("wslot")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    words shouldBe Array((0L, (1L << 1) | (1L << 2) | (1L << 63)), (1L, 1L))
  }

  "RelationalExt.unpivotQuarters" should "round-trip pivot∘unpivot to the direct aggregate" in {
    val direct = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        concat(lit("q"), quarter(col("o_orderdate"))).as("qtr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_year", "qtr").agg(sum("cents").as("rev_cents"))
      .orderBy("o_year", "qtr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = RelationalExt.unpivotQuarters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got shouldBe direct
  }

  "RelationalExt.scalarLuhnCheck" should "agree with a digit-list Luhn reference" in {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // reference: textbook Luhn over the decimal string, not unrolled math
    def luhn(pan: Long): Long =
      pan.toString.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val dd = d * 2; dd / 10 + dd % 10 } else d
      }.sum.toLong
    val want = cust.groupBy(_._2).toSeq.sortBy(_._1).map { case (seg, g) =>
      val sums = g.map(c => luhn(4000000000000L + c._1 * 7919L))
      (seg, g.length.toLong, sums.count(_ % 10 == 0).toLong, sums.sum)
    }
    val got = RelationalExt.scalarLuhnCheck(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
    // roughly a tenth of random PANs pass Luhn; both outcomes must bind
    got.map(_._3).sum should be > 0L
    got.map(_._3).sum should be < cust.length.toLong
  }

  "RelationalExt.scalarIpv4Parse" should "replay parse + validation from the string domain" in {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = cust.groupBy(_._2).toSeq.sortBy(_._1).map { case (seg, g) =>
      val parsed = g.map { case (c, _) =>
        // reference path: build the string, then parse it back
        val ip = s"${c * 31 % 300}.${c * 17 % 256}.${c * 13 % 256}.${c * 7 % 256}"
        val o = ip.split("\\.").map(_.toLong)
        (o(0) <= 255 && o(1) <= 255 && o(2) <= 255 && o(3) <= 255,
          o(0) == 10L, o(3))
      }
      (seg, g.length.toLong, parsed.count(_._1).toLong,
        parsed.count(p => p._1 && p._2).toLong,
        parsed.filter(_._1).map(_._3).sum)
    }
    val got = RelationalExt.scalarIpv4Parse(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // the 0..299 first-octet domain makes ~15% invalid — both bind
    val (n, nv) = (got.map(_._2).sum, got.map(_._3).sum)
    nv should (be > 0L and be < n)
  }

  "RelationalExt.scalarUrlParse (r13)" should "replay the URL build + parse census" in {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = cust.groupBy(_._2).toSeq.sortBy(_._1).map { case (seg, g) =>
      val parsed = g.map { case (k, _) =>
        val scheme = if (k % 7 == 0) "ftp" else if (k % 3 == 0) "http" else "https"
        val host = s"shop${k % 50}.example.com"
        val path = if (k % 4 == 0) "" else s"/cat/${k % 20}"
        val query = if (k % 5 == 0) s"?q=${k % 9}&page=2" else ""
        val url = s"$scheme://$host$path$query"
        (url.matches("^https?://.*"), url.contains("?"), path.isEmpty, host)
      }
      (seg, g.length.toLong, parsed.count(_._1).toLong,
        parsed.count(_._2).toLong, parsed.count(_._3).toLong,
        parsed.map(_._4).distinct.length.toLong)
    }
    val got = RelationalExt.scalarUrlParse(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // the planted ftp scheme makes validation bind; queries and root
    // paths both occur
    val (n, nv) = (got.map(_._2).sum, got.map(_._3).sum)
    nv should (be > 0L and be < n)
    got.map(_._4).sum should be > 0L
    got.map(_._5).sum should be > 0L
  }

  "RelationalExt.scalarBase64Census (r13)" should "replay RFC 4648 lengths and round-trip totality" in {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "source", "substring(text, 1, 16) AS h")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, g) =>
      val lens = g.map { case (id, _, h) =>
        val b64 = java.util.Base64.getEncoder
          .encodeToString(h.getBytes("UTF-8"))
        (id, b64.length.toLong, new String(
          java.util.Base64.getDecoder.decode(b64), "UTF-8") == h)
      }
      (src, lens.length.toLong, lens.count(_._3).toLong,
        lens.map(_._2).sum, lens.map(t => t._1 * t._2).sum)
    }
    val got = RelationalExt.scalarBase64Census(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // round trips are total, and every encoded length is 4*ceil(16/3)
    // = 24 for full-width prefixes (shorter docs pad differently)
    got.foreach { case (_, nd, ok, _, _) => ok shouldBe nd }
  }

  "RelationalExt.joinCidrLpm (r13)" should "replay the longest-prefix election" in {
    val blocks = Seq( // (name, first-bits value, prefix len) — published table
      ("any64/2", 64L, 2), ("mid80/4", 80L, 4), ("fine84/7", 84L, 7),
      ("ten10/8", 10L, 8), ("teninner10.32/11", 10L * 256L + 32L, 11),
      ("private172.16/12", 172L * 256L + 16L, 12),
      ("upper192/3", 192L, 3), ("high224/4", 224L, 4))
      .map { case (n, top, p) =>
        val lo = top << (32 - (if (p <= 8) 8 else 16))
        (n, lo, lo + (1L << (32 - p)) - 1L, p.toLong)
      }
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val assigned = cust.map { case (k, seg) =>
      val ip = (k * 2654435761L) % 4294967296L
      val covering = blocks.filter(b => ip >= b._2 && ip <= b._3)
      val best =
        if (covering.isEmpty) ("unmatched", 0L)
        else {
          val b = covering.minBy(b => (-b._4, b._1))
          (b._1, b._4)
        }
      (seg, best._1, best._2, ip)
    }
    val want = assigned.groupBy(t => (t._1, t._2, t._3)).toSeq
      .map { case ((seg, b, p), g) =>
        (seg, b, p, g.length.toLong, g.map(_._4).sum)
      }.sortBy(t => (t._1, t._2))
    val got = RelationalExt.joinCidrLpm(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // the election is load-bearing: at least one IP sits in a NESTED
    // block (covered by >1 published range), and unmatched traffic
    // exists (the table does not cover the space)
    assigned.count(t => blocks.count(b =>
      t._4 >= b._2 && t._4 <= b._3) >= 2) should be > 0
    got.exists(_._2 == "unmatched") shouldBe true
  }

  "RelationalExt.scalarIbanMod97 (r13)" should "agree with a BigInteger reference" in {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def mod97(digits: String): Long =
      (new java.math.BigInteger(digits)).mod(
        java.math.BigInteger.valueOf(97)).longValue
    val want = cust.groupBy(_._2).toSeq.sortBy(_._1).map { case (seg, g) =>
      val rows = g.map { case (k, _) =>
        val bban = "%018d".format(k * 7919)
        val kk = 98 - mod97(bban + "131400")
        val presented = "%018d".format(k * 7919 + (if (k % 11 == 0) 1 else 0))
        val valid = mod97(presented + "1314" + "%02d".format(kk)) == 1
        (kk, valid, k % 11 == 0)
      }
      (seg, g.length.toLong, rows.count(_._2).toLong,
        rows.count(_._3).toLong, rows.map(_._1).sum)
    }
    val got = RelationalExt.scalarIbanMod97(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // the ISO property: every clean row validates, every corrupt row
    // fails (the +1 shifts the residue by 10^6 mod 97 = 27 ≠ 0)
    got.foreach(t => t._3 shouldBe (t._2 - t._4))
    got.map(_._4).sum should be > 0L
  }

  "RelationalExt.bowleySkew (r13)" should "match brute-force type-1 quartiles" in {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val want = cust.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, g) =>
      val sorted = g.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length.toLong
      def q(rank: Long) = sorted((rank - 1).toInt)
      val (q1, q2, q3) = (q((n + 3) / 4), q((n + 1) / 2), q((3 * n + 3) / 4))
      val bow = if (q3 > q1)
        BigDecimal(1e6 * (q1 + q3 - 2 * q2).toDouble / (q3 - q1).toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      else 0L
      (seg, n, q1, q2, q3, bow)
    }
    val got = RelationalExt.bowleySkew(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe want
    // quartiles are order statistics: monotone within every segment
    got.foreach { t =>
      t._3 should be <= t._4
      t._4 should be <= t._5
    }
  }

  "RelationalExt.percentileCont (r13)" should "match the type-7 definition exactly" in {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val want = cust.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, g) =>
      val sorted = g.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length.toLong
      def q(p: Long): Long = {
        val lo = 1 + (n - 1) * p / 100
        val fr = (n - 1) * p % 100
        val xlo = sorted((lo - 1).toInt)
        val xhi = if (lo < n) sorted(lo.toInt) else xlo
        100L * xlo + fr * (xhi - xlo)
      }
      (seg, n, q(25), q(50), q(75))
    }
    val got = RelationalExt.percentileCont(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    got shouldBe want
    // type-7 sits between the bracketing order statistics, so the
    // continuous quartiles are monotone too
    got.foreach { t =>
      t._3 should be <= t._4
      t._4 should be <= t._5
    }
    // cross-check against Spark's own percentile_cont on dollars
    import org.apache.spark.sql.functions.{col, expr => sexpr}
    val ref = spark.read.parquet(s"$sfDir/customer.parquet")
      .groupBy(col("c_mktsegment"))
      .agg(sexpr("percentile_cont(0.5) WITHIN GROUP (ORDER BY round(c_acctbal * 100))")
        .as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { t =>
      (t._4.toDouble / 100.0) shouldBe (ref(t._1) +- 1e-6)
    }
  }
}
