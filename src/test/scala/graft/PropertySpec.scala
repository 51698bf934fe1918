package graft

import graft.operators.{Dedup, Pack}
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) property tests: the algebraic
  * contracts the crafted-example specs pin pointwise, checked across
  * many random datasets — skew, ties, degenerate sizes included. A
  * fixed seed keeps CI reproducible; failures print the trial knobs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("capPerKey equals the single-window top-K on 20 random skewed datasets") {
    import org.apache.spark.sql.expressions.Window
    (1 to 20).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(5)
      val n = 20 + rnd.nextInt(200)
      // pri drawn from a SMALL range so ties are common — the
      // deterministic (pri, id) tiebreak is part of the contract
      val rows = (0 until n).map { i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}", rnd.nextInt(40).toLong)
      }
      val k = 1 + rnd.nextInt(7)
      val salts = 1 + rnd.nextInt(9)
      val df = spark.createDataFrame(rows).toDF("id", "key", "pri")
      val two = Pack.capPerKey(df, "key", "pri", "id", k, salts)
        .select($"id").as[Long].collect().toSet
      val one = df.withColumn("rn", row_number().over(
          Window.partitionBy($"key").orderBy($"pri".asc, $"id".asc)))
        .where($"rn" <= k).select($"id").as[Long].collect().toSet
      withClue(s"trial $trial (n=$n keys=$nKeys k=$k salts=$salts): ") {
        two shouldBe one
      }
    }
  }

  test("passageDedup on random collision-heavy corpora: counts conserve, each distinct passage kept once") {
    (1 to 10).foreach { trial =>
      // 4-word vocab + 3-token passages force heavy cross-doc and
      // in-doc passage collisions (4^3 = 64 possible passages)
      val vocab = Vector("aa", "bb", "cc", "dd")
      val docs = (0 until 30).map { i =>
        (i.toLong, (0 until (1 + rnd.nextInt(20)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val out = Dedup.passageDedup(df, passageLen = 3)
        .select($"doc_id", $"n_kept", $"n_dropped")
        .as[(Long, Long, Long)].collect()
      val chunks = Pack.chunkDocs(df, 3, 3)
        .select($"doc_id", $"chunk").as[(Long, String)].collect()
      val perDoc = chunks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      withClue(s"trial $trial: ") {
        out.length shouldBe docs.length // every doc emits a row
        out.foreach { case (id, k, d) => (k + d) shouldBe perDoc(id) }
        out.map(_._2).sum shouldBe chunks.map(_._2).distinct.length.toLong
      }
    }
  }

  test("minhashDeltaPairs ≡ full-run delta restriction on 5 random splits") {
    val documents = Tables.documents(spark, sfDir)
    val full = Dedup.minhashPairs(documents, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    (1 to 5).foreach { trial =>
      val m = 2 + rnd.nextInt(5)
      val r = rnd.nextInt(m)
      val delta = documents.where($"doc_id" % m === r)
      val corpus = documents.where($"doc_id" % m =!= r)
      val deltaIds = delta.select($"doc_id").as[Long].collect().toSet
      val inc = Dedup.minhashDeltaPairs(
          Dedup.minhashSignatures(corpus).localCheckpoint(), delta, 0.5)
        .select($"d1", $"d2").as[(Long, Long)].collect().toSet
      withClue(s"trial $trial (split % $m == $r): ") {
        inc shouldBe full.filter(p => deltaIds(p._1) || deltaIds(p._2))
      }
    }
  }
}
