package graft

import graft.operators.{Dedup, Relational, Text}
import org.apache.spark.sql.functions._

/** Semantic cross-checks for the r11 audit-family gate queries
  * (q130–q134): each is re-derived here by an INDEPENDENT formulation
  * (string-keyed instead of hash-keyed, brute force instead of
  * blocked, exact instead of sketch) so the gate plan's shortcuts —
  * 64-bit gram hashes, blocking keys, sketch bounds — are proven
  * equivalent, not assumed.
  */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q130 table profile: exact facts match direct aggregates, HLL verdict holds") {
    val rows = Relational.q130.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    rows.keySet shouldBe Set("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")
    val li = Tables.lineitem(spark, sfDir)
    rows.foreach { case (c, (nRows, nNulls, nDistinct, hllOk)) =>
      withClue(s"$c: ") {
        nRows shouldBe li.count()
        nNulls shouldBe li.where(col(c).isNull).count()
        nDistinct shouldBe li.select(c).na.drop().distinct().count()
        hllOk shouldBe true
      }
    }
  }

  test("q131 dup spans: hash-keyed gram join ≡ string-keyed recomputation") {
    val got = Dedup.q131.build(spark, sfDir)
      .select($"doc_id", $"n_spans", $"dup_spans", $"mostly_copied")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // independent formulation: join on the gram STRINGS (no xxhash64),
    // doc-frequency via distinct doc sets
    val g = Dedup.ngrams(Tables.documents(spark, sfDir), 8)
    val gdf = g.distinct().groupBy($"shingle").agg(count(lit(1)).as("df"))
    val want = g.join(gdf, "shingle")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when($"df" >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .where($"dup_spans" > 0)
      .withColumn("mostly_copied", $"dup_spans" * 4 >= $"n_spans")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    got shouldBe want
    got should not be empty // the corpus plants near-dups that share 8-grams
  }

  test("q132 name linkage: blocked pairs ≡ brute-force same-block pairs, and blocking is the only recall cut") {
    val got = Relational.q132.build(spark, sfDir)
      .select($"name_a", $"name_b", $"dist")
      .as[(String, String, Int)].collect().toSet
    // brute force over the distinct-name dictionary (tiny at any sf:
    // it grows with the vocabulary, not the rows)
    val names = Tables.part(spark, sfDir).select($"p_name").distinct()
      .as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val all = for {
      a <- names; b <- names if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b))
    val sameBlock = all.filter { case (a, b, _) =>
      a.split(" ").last == b.split(" ").last
    }.toSet
    got shouldBe sameBlock
    got should not be empty
    // pairs outside the block are dropped BY DESIGN (the documented
    // recall/efficiency trade of blocking) — pin that the cut is the
    // block key and nothing else
    (all.toSet -- sameBlock).foreach { case (a, b, _) =>
      got should not contain ((a, b, lev(a, b)))
    }
  }

  test("q133 bloom decontamination: exact member counts match a direct fingerprint join; verdicts all true") {
    val got = Dedup.q133.build(spark, sfDir)
      .select($"source", $"n_docs", $"n_members", $"bloom_no_false_neg", $"bloom_fp_bounded")
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    got.length shouldBe 10 // train sources src0..src9
    got.foreach { case (src, _, _, noFn, fpOk) =>
      withClue(s"$src: ") { noFn shouldBe true; fpOk shouldBe true }
    }
    // independent exact arm: fingerprint-string semi-join
    val fps = Tables.documents(spark, sfDir)
      .select($"source", substring($"source", 4, 10).cast("int").as("sn"),
        graft.functions.fingerprint($"text").as("fp"))
    val ev = fps.where($"sn" >= 10).select($"fp").distinct()
    val want = fps.where($"sn" < 10)
      .join(ev.withColumn("m", lit(1)), Seq("fp"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"m".isNotNull, 1L).otherwise(0L)).as("n_members"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (src, nDocs, nMembers, _, _) =>
      withClue(s"$src: ") { (nDocs, nMembers) shouldBe want(src) }
    }
  }

  test("q135 incremental profile: counts lossless under merge, estimates inside the rsd band") {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val orders = Tables.orders(spark, sfDir)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val full = asMap(Relational.profileReport(Relational.tableProfile(orders, cols)))
    // three-way split this time (the gate uses two) — the additive
    // facts must merge LOSSLESSLY at any arity/layout; the sketch
    // estimate gets the design band, not bit-equality (in the small-
    // cardinality coupon regime union-of-parts and direct-build can
    // legitimately differ by a hair)
    val slices = (0 to 2).map(i =>
      Relational.tableProfile(orders.where(pmod(col("o_orderkey"), lit(3)) === i), cols))
    val merged = asMap(Relational.profileReport(
      Relational.mergeProfiles(slices.reduce(_.unionByName(_)))))
    merged.keySet shouldBe full.keySet
    cols.foreach { c =>
      val (fr, fn, fe) = full(c)
      val (mr, mn, me) = merged(c)
      withClue(s"$c: ") {
        (mr, mn) shouldBe ((fr, fn)) // counts are exact under merge
        val exact = orders.select(c).na.drop().distinct().count()
        math.abs(me - exact).toDouble / exact should be < 0.1
        math.abs(fe - exact).toDouble / exact should be < 0.1
      }
    }
    // gate verdicts all true and exact facts match direct aggregates
    val gate = Relational.q135.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    gate.keySet shouldBe cols.toSet
    gate.foreach { case (c, (nRows, nNulls, nDistinct, ok)) =>
      withClue(s"$c: ") {
        nRows shouldBe orders.count()
        nNulls shouldBe orders.where(col(c).isNull).count()
        nDistinct shouldBe orders.select(c).na.drop().distinct().count()
        ok shouldBe true
      }
    }
  }

  test("q136 containment: hash-keyed cut pairs ≡ string-keyed brute force; measure genuinely asymmetric") {
    val got = Dedup.q136.build(spark, sfDir)
      .select($"contained_id", $"container_id", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    // independent formulation: string shingles, no cut, no hot-array
    // machinery — plain distinct-3-gram co-occurrence
    val sh = Dedup.shingleSets(Tables.documents(spark, sfDir))
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val co = sh.toDF("d1", "shingle").join(sh.toDF("d2", "shingle"), "shingle")
      .where($"d1" =!= $"d2")
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("c"))
    val want = co.join(sz.toDF("d1", "n1"), "d1")
      .select($"d1", $"d2", ($"c".cast("double") / $"n1").as("cont"))
      .where($"cont" >= 0.9)
      .as[(Long, Long, Double)].collect().toSet
    got shouldBe want
    got should not be empty
    // the measure is ASYMMETRIC by construction: at least one
    // contained pair on this corpus fails the 0.9 RESEMBLANCE bar
    // (the doc-inside-doc case Jaccard misses)
    val jac09 = Dedup.jaccardPairs(Tables.documents(spark, sfDir), 0.9)
      .select($"d1", $"d2").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    (got.map { case (a, b, _) => (a, b) } -- jac09) should not be empty
  }

  test("q134 CMS heavy hitters: top-20 set matches exact counts; sketch verdicts all true") {
    val got = Text.q134.build(spark, sfDir)
      .select($"t", $"n", $"est_ge_exact", $"overestimate_bounded")
      .as[(String, Long, Boolean, Boolean)].collect()
    got.length shouldBe 20
    got.foreach { case (t, _, ge, bounded) =>
      withClue(s"$t: ") { ge shouldBe true; bounded shouldBe true }
    }
    val exact = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.words($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
      .sortBy { case (t, n) => (-n, t) }.take(20).toSet
    got.map { case (t, n, _, _) => (t, n) }.toSet shouldBe exact
  }
}
