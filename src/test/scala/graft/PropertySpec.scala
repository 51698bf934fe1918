package graft

import graft.jx.JxCompiler
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

  test("q48 single-pass canonicalization equals the two-pass form (crafted + random + corpus)") {
    import org.apache.spark.sql.Column
    // r19: q48 fused its two regexp_replace passes into one
    // ([^a-z0-9]+ → ' '); equivalence argument in Text.scala. Pin it
    // against the ORIGINAL two-pass spelling over crafted edges,
    // random punct/whitespace/unicode strings, and the real corpus.
    def fused(c: Column): Column =
      trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    def twoPass(c: Column): Column =
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))
    val alphabet = "ab1 \t\n\r.,;:!?-_\"'é→Ж  Z9"
    val crafted = Seq("", " ", "\t", "a\tb", "x--y .. z", " é",
      "A.B,C", "  lead trail  ", "a  b", "..", "a1b2c3", "ALL CAPS!")
    val random = (1 to 500).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (crafted ++ random).toDF("text")
    df.select(fused(col("text")).as("f"), twoPass(col("text")).as("t"))
      .where(!(col("f") <=> col("t"))).count() shouldBe 0L
    Tables.documents(spark, sfDir)
      .select(fused(col("text")).as("f"), twoPass(col("text")).as("t"))
      .where(!(col("f") <=> col("t"))).count() shouldBe 0L
  }

  test("run-fused char-class strips equal the per-char form (crafted + random + corpus)") {
    import org.apache.spark.sql.Column
    // r19: q37/qualityGate strip char classes with "" as the
    // replacement; deleting every maximal RUN ([c]+) produces the
    // identical string to deleting per CHARACTER ([c]) — runs are
    // non-overlapping leftmost matches either way and nothing between
    // them changes. Pin all three fused classes against the original
    // per-char spellings.
    val classes = Seq("\\s", "[^.,;:!?]", "[^0-9]")
    def perChar(c: Column, cls: String): Column = regexp_replace(c, cls, "")
    def fused(c: Column, cls: String): Column = regexp_replace(c, cls + "+", "")
    val alphabet = "ab1 \t\n\r.,;:!?-_\"'é→Ж  Z9"
    val crafted = Seq("", " ", "\t\t", "a\tb", "x--y .. z", " é",
      "A.B,C", "  lead trail  ", "a  b", "...", "12 34", "!?!?")
    val random = (1 to 500).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (crafted ++ random).toDF("text")
    for (cls <- classes) {
      withClue(s"class $cls: ") {
        df.select(fused(col("text"), cls).as("f"), perChar(col("text"), cls).as("p"))
          .where(!(col("f") <=> col("p"))).count() shouldBe 0L
        Tables.documents(spark, sfDir)
          .select(fused(col("text"), cls).as("f"), perChar(col("text"), cls).as("p"))
          .where(!(col("f") <=> col("p"))).count() shouldBe 0L
      }
    }
  }

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

  test("vocabCoverage on random Zipf corpora: monotone, achieving, tight (q87)") {
    (1 to 8).foreach { trial =>
      val vocab = 5 + rnd.nextInt(60)
      val nDocs = 5 + rnd.nextInt(30)
      // Zipf-ish: term t appears with weight ~ 1/(t+1)
      val docs = (0 until nDocs).map { i =>
        val len = 3 + rnd.nextInt(40)
        val text = (0 until len).map { _ =>
          val t = (vocab / (1 + rnd.nextInt(vocab))) - 1
          s"w${math.min(t, vocab - 1)}"
        }.mkString(" ")
        (i.toLong, text)
      }
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val shares = Seq(0.5, 0.9, 0.99)
      val out = operators.Text.vocabCoverage(df, shares)
        .select($"share", $"vocab_size", $"coverage")
        .as[(Double, Long, Double)].collect().sortBy(_._1)
      val toks = docs.flatMap(_._2.split("\\s+"))
      val nDistinct = toks.distinct.length
      withClue(s"trial $trial (vocab=$vocab docs=$nDocs): ") {
        out.map(_._1).toSeq shouldBe shares // one row per share
        // vocab_size monotone in share; coverage achieves its target
        out.map(_._2).toSeq shouldBe out.map(_._2).sorted.toSeq
        out.foreach { case (share, vs, cov) =>
          cov should be >= share
          cov should be <= 1.0 + 1e-12
          vs should be >= 1L
          vs should be <= nDistinct.toLong
        }
        // tightness: one fewer term must NOT reach the target — check
        // against a brute-force greedy fill
        val cnts = toks.groupBy(identity).map(_._2.length.toLong).toSeq
          .sorted(Ordering[Long].reverse)
        val total = cnts.sum.toDouble
        out.foreach { case (share, vs, _) =>
          val withVs = cnts.take(vs.toInt).sum / total
          val withLess = cnts.take(vs.toInt - 1).sum / total
          withVs should be >= share - 1e-12
          if (vs > 1) withLess should be < share
        }
      }
    }
  }

  test("memorizationRate bounds and extremes on planted corpora (q83)") {
    (1 to 8).foreach { trial =>
      val nTrain = 3 + rnd.nextInt(10)
      def sentence(seed: Int, len: Int) =
        (0 until len).map(i => s"t${seed}_$i").mkString(" ")
      val train = (0 until nTrain).map(i => (i.toLong, sentence(i, 12 + rnd.nextInt(20))))
      // eval: one verbatim train copy, one disjoint doc, one half-copy
      val copied = train(rnd.nextInt(nTrain))._2
      val disjoint = (0 until 20).map(i => s"x${trial}_$i").mkString(" ")
      val halfSrc = train(rnd.nextInt(nTrain))._2.split(" ")
      val half = (halfSrc.take(8) ++ (0 until 8).map(i => s"y${trial}_$i")).mkString(" ")
      val trainDf = spark.createDataFrame(train).toDF("doc_id", "text")
      val evalDf = spark.createDataFrame(Seq(
        (100L, copied), (101L, disjoint), (102L, half))).toDF("doc_id", "text")
      val out = Dedup.memorizationRate(trainDf, evalDf, n = 8)
        .select($"doc_id", $"seen_rate").as[(Long, Double)].collect().toMap
      withClue(s"trial $trial: ") {
        out(100L) shouldBe 1.0 // verbatim copy: every window seen
        out(101L) shouldBe 0.0 // disjoint vocab: nothing seen
        out(102L) should (be > 0.0 and be < 1.0) // partial overlap
      }
    }
  }

  test("tfidfKeywords: ranks dense, scores ordered, terms from the doc (q79)") {
    val docs = Tables.documents(spark, sfDir)
    val out = operators.Text.tfidfKeywords(docs, k = 3)
      .select($"doc_id", $"rnk", $"term", $"score")
      .as[(Long, Long, String, Double)].collect()
    val byDoc = out.groupBy(_._1)
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2).toSeq shouldBe (1L to sorted.length)
      // scores nonincreasing along ranks; every keyword occurs in the doc
      sorted.map(_._4).toSeq.reverse shouldBe sorted.map(_._4).toSeq.sorted
      val toks = texts(id).trim.split("\\s+").toSet
      sorted.foreach { case (_, _, term, _) => toks should contain(term) }
    }
  }

  test("jx where-clause fuzz: 40 random expression trees ≡ mirrored Column filters") {
    // Random boolean trees over lineitem numerics, built SIMULTANEOUSLY
    // as jx JSON and as the equivalent hand-built Column — the
    // compiler must agree with the direct DataFrame filter on every
    // tree (operator nesting, arithmetic inside comparisons,
    // conditionals, precedence via structure).
    import org.apache.spark.sql.Column
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val total = li.count()
    def num(depth: Int): (String, Column) =
      rnd.nextInt(if (depth >= 2) 3 else 5) match {
        case 0 => ("\"l_quantity\"", col("l_quantity"))
        case 1 => ("\"l_extendedprice\"", col("l_extendedprice"))
        case 2 =>
          val k = 1 + rnd.nextInt(50); (k.toString, lit(k))
        case 3 =>
          val (aj, ac) = num(depth + 1); val (bj, bc) = num(depth + 1)
          (s"""{"add": [$aj, $bj]}""", ac + bc)
        case 4 =>
          val (aj, ac) = num(depth + 1); val (bj, bc) = num(depth + 1)
          (s"""{"mult": [$aj, $bj]}""", ac * bc)
      }
    def cmp(): (String, Column) = {
      val (aj, ac) = num(1); val (bj, bc) = num(1)
      rnd.nextInt(3) match {
        case 0 => (s"""{"gt": [$aj, $bj]}""", ac > bc)
        case 1 => (s"""{"lt": [$aj, $bj]}""", ac < bc)
        case 2 => (s"""{"gte": [$aj, $bj]}""", ac >= bc)
      }
    }
    def bool(depth: Int): (String, Column) =
      rnd.nextInt(if (depth >= 2) 1 else 4) match {
        case 0 => cmp()
        case 1 =>
          val (aj, ac) = bool(depth + 1); val (bj, bc) = bool(depth + 1)
          (s"""{"and": [$aj, $bj]}""", ac && bc)
        case 2 =>
          val (aj, ac) = bool(depth + 1); val (bj, bc) = bool(depth + 1)
          (s"""{"or": [$aj, $bj]}""", ac || bc)
        case 3 =>
          val (aj, ac) = bool(depth + 1)
          (s"""{"not": $aj}""", !ac)
      }
    (1 to 40).foreach { trial =>
      val (wj, wc) = bool(0)
      val json = s"""{"from": "lineitem",
        "select": ["l_orderkey", "l_quantity"], "where": $wj}"""
      val got = JxCompiler.query(spark, sfDir, json).count()
      val want = li.where(wc).count()
      withClue(s"trial $trial where=$wj: ") { got shouldBe want }
      want should be <= total
    }
  }

  test("jx string-op fuzz: 30 random string trees ≡ mirrored Column filters") {
    import org.apache.spark.sql.Column
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority", $"o_orderstatus")
    def len(c: Column) = org.apache.spark.sql.functions.length(c)
    val fields = Seq(
      ("o_orderpriority", col("o_orderpriority")),
      ("o_orderstatus", col("o_orderstatus")))
    def str(depth: Int): (String, Column) =
      rnd.nextInt(if (depth >= 2) 3 else 9) match {
        case 0 => ("\"o_orderpriority\"", col("o_orderpriority"))
        case 1 => ("\"o_orderstatus\"", col("o_orderstatus"))
        case 2 =>
          val v = Seq("1", "O", "1-URGENT", "F")(rnd.nextInt(4))
          (s"""{"literal": "$v"}""", lit(v))
        case 3 =>
          val (aj, ac) = str(depth + 1); (s"""{"lower": $aj}""", lower(ac))
        case 4 =>
          val (aj, ac) = str(depth + 1); (s"""{"upper": $aj}""", upper(ac))
        case 5 =>
          val (aj, ac) = str(depth + 1); val (bj, bc) = str(depth + 1)
          (s"""{"concat": [$aj, $bj]}""", concat_ws("", ac, bc))
        case 6 =>
          val (f, c) = fields(rnd.nextInt(2)); val n = 1 + rnd.nextInt(3)
          (s"""{"left": {"$f": $n}}""", substring(c, 1, n))
        case 7 =>
          val (f, c) = fields(rnd.nextInt(2)); val n = 1 + rnd.nextInt(3)
          (s"""{"right": {"$f": $n}}""",
            c.substr(greatest(len(c) - n + 1, lit(1)), lit(n)))
        case 8 =>
          val (f, c) = fields(rnd.nextInt(2)); val n = 1 + rnd.nextInt(3)
          if (rnd.nextBoolean())
            (s"""{"not_left": {"$f": $n}}""",
              c.substr(lit(n + 1), greatest(len(c) - n, lit(0))))
          else
            (s"""{"not_right": {"$f": $n}}""",
              c.substr(lit(1), greatest(len(c) - n, lit(0))))
      }
    (1 to 30).foreach { trial =>
      val (aj, ac) = str(0); val (bj, bc) = str(0)
      val (wj, wc) =
        if (rnd.nextBoolean()) (s"""{"eq": [$aj, $bj]}""", ac === bc)
        else (s"""{"ne": [$aj, $bj]}""", ac =!= bc)
      val json = s"""{"from": "orders", "select": ["o_orderkey"], "where": $wj}"""
      val got = JxCompiler.query(spark, sfDir, json).count()
      val want = o.where(wc).count()
      withClue(s"trial $trial where=$wj: ") { got shouldBe want }
    }
  }

  test("subtreeRollup ≡ brute-force reachability on 10 random DAGs (q90)") {
    (1 to 10).foreach { trial =>
      val n = 5 + rnd.nextInt(20)
      // child -> parent with parent < child guarantees acyclic; extra
      // edges create diamonds (the double-count hazard)
      val edges = (1 until n).flatMap { c =>
        val nPar = 1 + rnd.nextInt(2)
        (0 until nPar).map(_ => (c.toLong, rnd.nextInt(c).toLong))
      }.distinct
      val nodes = (0 until n).map(_.toLong)
      val fact = nodes.toDF("node").withColumn("m", $"node" * 7 + 1)
      val out = graft.operators.Hierarchy
        .subtreeRollup(edges.toDF("child", "parent"), fact)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // brute force: children adjacency, DFS per node
      val kids = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      def reach(a: Long): Set[Long] = {
        var seen = Set(a); var frontier = kids.getOrElse(a, Set.empty)
        while (frontier.nonEmpty) {
          seen ++= frontier
          frontier = frontier.flatMap(x => kids.getOrElse(x, Set.empty)) -- seen
        }
        seen
      }
      withClue(s"trial $trial (n=$n, ${edges.size} edges): ") {
        out.keySet shouldBe nodes.toSet
        nodes.foreach { a =>
          val r = reach(a)
          out(a) shouldBe ((r.size.toLong, r.map(_ * 7 + 1).sum))
        }
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

  test("sourceDrift ≡ brute-force TVD on 10 random corpora; 0 for a lone source (q107)") {
    (1 to 10).foreach { trial =>
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      val nSrc = 1 + rnd.nextInt(4)
      val rows = (0 until (10 + rnd.nextInt(40))).map { i =>
        (i.toLong, s"s${rnd.nextInt(nSrc)}",
          (0 until (1 + rnd.nextInt(12)))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = spark.createDataFrame(rows).toDF("doc_id", "source", "text")
      val out = operators.Text.sourceDrift(df)
        .select($"source", $"n_terms", $"tot_s", $"tvd")
        .as[(String, Long, Long, Double)].collect()
      // brute force over the DENSE source×vocab grid with exact ints
      val cnt = rows.flatMap { case (_, s, t) => t.split("\\s+").map(s -> _) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tot = cnt.values.sum
      val bySrc = cnt.keys.map(_._1).toSet
      val want = bySrc.map { s =>
        val totS = cnt.collect { case ((`s`, _), c) => c }.sum
        val sumFull = vocab.map { t =>
          val cs = cnt.getOrElse((s, t), 0L)
          val g = cnt.collect { case ((_, `t`), c) => c }.sum
          (BigInt(cs) * tot - BigInt(g) * totS).abs
        }.sum
        s -> (totS, sumFull.toDouble / (2.0 * totS * tot))
      }.toMap
      withClue(s"trial $trial (nSrc=$nSrc): ") {
        out.length shouldBe want.size
        out.foreach { case (s, nTerms, totS, tvd) =>
          totS shouldBe want(s)._1
          tvd shouldBe want(s)._2
          nTerms shouldBe cnt.keys.count(_._1 == s).toLong
          tvd should be >= 0.0
          tvd should be <= 1.0
        }
        if (bySrc.size == 1) out.head._4 shouldBe 0.0
      }
    }
  }

  test("vocabGrowth ≡ brute-force prefix distinct counts on 10 random corpora (q157)") {
    (1 to 10).foreach { trial =>
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
      val rows = (0 until (10 + rnd.nextInt(40))).map { i =>
        (i.toLong,
          (0 until rnd.nextInt(12))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      val got = operators.Text.vocabGrowth(df, 3)
        .select($"dec", $"n_docs_cum", $"vocab_cum")
        .as[(Int, Long, Long)].collect().sortBy(_._1)
      got.map(_._1).toSeq shouldBe (1 to 10)
      // brute force: same decile rule, distinct 3-grams per prefix
      val m = rows.map(_._1).max
      def decOf(id: Long) = math.min(10, (id * 10 / (m + 1)).toInt + 1)
      def grams(t: String) = t.trim.split("\\s+").toSeq
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      (1 to 10).foreach { d =>
        val prefix = rows.filter(r => decOf(r._1) <= d)
        val (_, nd, v) = got(d - 1)
        nd shouldBe prefix.size.toLong
        v shouldBe prefix.flatMap(r => grams(r._2)).distinct.size.toLong
      }
      // cumulative ⇒ monotone in both coordinates
      got.sliding(2).foreach { case Array(a, b) =>
        b._2 should be >= a._2; b._3 should be >= a._3
      }
    }
  }

  test("LM model: incremental fold ≡ full recount, frozen-model scoring ≡ self-trained (q154)") {
    import org.apache.spark.sql.functions.{coalesce, col, lit, substring}
    val docs = Tables.documents(spark, sfDir)
    val isT = substring(col("source"), 4, 10).cast("int") >= 15
    val base = docs.where($"doc_id" % 10 =!= 0)
    val delta = docs.where($"doc_id" % 10 === 0)
    // additive fold ≡ full recount, exactly (integer counts / set union)
    operators.Text.lmBigramIncrement(
        operators.Text.lmBigramCounts(base, isT), delta, isT)
      .as[(String, Long)].collect().toSet shouldBe
      operators.Text.lmBigramCounts(docs, isT).as[(String, Long)].collect().toSet
    operators.Text.lmVocabIncrement(
        operators.Text.lmVocab(base, isT), delta, isT)
      .as[String].collect().toSet shouldBe
      operators.Text.lmVocab(docs, isT).as[String].collect().toSet
    // scoring under the persisted model ≡ the self-trained form
    // (same formula; per-doc float sums may associate differently)
    val self = operators.Text.lmPerplexity(docs, isT)
      .select($"doc_id", $"n_bigrams", $"log_prob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val under = operators.Text.lmPerplexityUnder(docs,
        operators.Text.lmBigramCounts(docs, isT),
        operators.Text.lmVocab(docs, isT))
      .select($"doc_id", $"n_bigrams", $"log_prob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    under.keySet shouldBe self.keySet
    self.foreach { case (id, (_, n, lp)) =>
      under(id)._2 shouldBe n
      under(id)._3 shouldBe lp +- 1e-9
    }
  }

  test("gateAblation is consistent with the gate output (q158)") {
    val df = Tables.documents(spark, sfDir)
    val gate = operators.Text.qualityGate(df)
      .select($"keep", $"drop_reasons").as[(Boolean, String)].collect()
    val failing = gate.filter(!_._1).map(_._2.split(",").toSeq)
    val got = operators.Text.gateAblation(df)
      .select($"rule", $"n_failing", $"n_sole")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got.keySet shouldBe failing.flatten.toSet
    got.foreach { case (rule, (nf, ns)) =>
      nf shouldBe failing.count(_.contains(rule)).toLong
      ns shouldBe failing.count(rs => rs == Seq(rule)).toLong
      ns should be <= nf
    }
  }

  test("lmPerplexity ≡ driver-side recompute on 10 random corpora (q154)") {
    (1 to 10).foreach { trial =>
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      val rows = (0 until (12 + rnd.nextInt(30))).map { i =>
        (i.toLong,
          (0 until rnd.nextInt(10))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      val isT = $"doc_id" % 3 === 0
      val got = operators.Text.lmPerplexity(df, isT)
        .select($"doc_id", $"n_bigrams", $"log_prob", $"ppl")
        .as[(Long, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      // driver model: add-1-smoothed bigram LM over the target slice
      def toks(t: String) = t.trim.split("\\s+").toSeq
      val target = rows.filter(_._1 % 3 == 0)
      val bg = target.flatMap { case (_, t) =>
        toks(t).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ctx = bg.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val v = target.flatMap { case (_, t) => toks(t) }.distinct.size
      val want = rows.flatMap { case (id, t) =>
        val pairs = toks(t).sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1))).toSeq
        if (pairs.isEmpty) None
        else {
          val lp = pairs.map { p =>
            math.log(bg.getOrElse(p, 0L) + 1.0) -
              math.log(ctx.getOrElse(p._1, 0L) + v.toDouble)
          }.sum
          Some(id -> (pairs.size.toLong, lp, math.exp(-lp / pairs.size)))
        }
      }.toMap
      withClue(s"trial $trial: ") {
        got.keySet shouldBe want.keySet
        want.foreach { case (id, (n, lp, ppl)) =>
          val (_, gn, glp, gppl) = got(id)
          gn shouldBe n
          glp shouldBe lp +- 1e-9
          gppl shouldBe ppl +- 1e-9
          gppl should be > 0.0
        }
      }
    }
  }

  test("lengthDrift ≡ brute-force KS on 10 random corpora; 0 for a lone source (q156)") {
    (1 to 10).foreach { trial =>
      val nSrc = 1 + rnd.nextInt(4)
      val rows = (0 until (10 + rnd.nextInt(40))).map { i =>
        (i.toLong, s"s${rnd.nextInt(nSrc)}",
          (0 until rnd.nextInt(15)).map(_ => "w").mkString(" "))
      }
      val df = spark.createDataFrame(rows).toDF("doc_id", "source", "text")
      val got = operators.Text.lengthDrift(df)
        .select($"source", $"n_docs", $"ks")
        .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
      def len(t: String) = t.trim.split("\\s+").length
      val all = rows.map { case (_, s, t) => (s, len(t)) }
      val n = all.size
      val grid = all.map(_._2).distinct.sorted
      val bySrc = all.groupBy(_._1)
      withClue(s"trial $trial (nSrc=$nSrc): ") {
        got.keySet shouldBe bySrc.keySet
        bySrc.foreach { case (s, rs) =>
          val ns = rs.size
          val ks = grid.map { x =>
            val cs = rs.count(_._2 <= x).toLong
            val g = all.count(_._2 <= x).toLong
            (BigInt(cs) * n - BigInt(g) * ns).abs
          }.max.toDouble / (ns.toDouble * n.toDouble)
          val (_, gn, gks) = got(s)
          gn shouldBe ns.toLong
          gks shouldBe ks +- 1e-15
          gks should be >= 0.0
          gks should be <= 1.0
        }
        if (bySrc.size == 1) got.head._2._3 shouldBe 0.0
      }
    }
  }

  test("cohortRetention ≡ brute-force matrix on 10 random event logs (q109)") {
    (1 to 10).foreach { trial =>
      val nUsers = 1 + rnd.nextInt(12)
      val rows = (0 until (10 + rnd.nextInt(80))).map { i =>
        val day = rnd.nextInt(15)
        (i.toLong, rnd.nextInt(nUsers).toLong,
          java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 0${rnd.nextInt(10)}:30:00"))
      }
      val df = spark.createDataFrame(rows).toDF("event_id", "user_id", "ts")
      val out = operators.Etl.cohortRetention(df)
        .select($"cohort", $"day_offset", $"n_active", $"n_cohort", $"retention")
        .as[(java.sql.Timestamp, Long, Long, Long, Double)].collect()
      val day = rows.map { case (_, u, ts) => (u, ts.toLocalDateTime.toLocalDate) }
      val firstDay = day.groupBy(_._1).view.mapValues(_.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))).toMap
      val cohortSize = firstDay.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = day.distinct.map { case (u, d) =>
        (firstDay(u), d.toEpochDay - firstDay(u).toEpochDay)
      }.groupBy(identity).map { case ((c, off), hits) =>
        (c, off) -> hits.size.toLong
      }
      withClue(s"trial $trial (nUsers=$nUsers): ") {
        out.length shouldBe want.size
        out.foreach { case (cts, off, nAct, nCoh, ret) =>
          val c = cts.toLocalDateTime.toLocalDate
          nAct shouldBe want((c, off))
          nCoh shouldBe cohortSize(c)
          ret shouldBe nAct.toDouble / nCoh
        }
      }
    }
  }

  test("basketPairs ≡ brute-force pair counts and lift on 10 random baskets (q110)") {
    (1 to 10).foreach { trial =>
      val nOrders = 3 + rnd.nextInt(10)
      val nParts = 3 + rnd.nextInt(8)
      val rows = (0 until (10 + rnd.nextInt(80))).map { _ =>
        (rnd.nextInt(nOrders).toLong, rnd.nextInt(nParts).toLong)
      }
      val minSup = 1 + rnd.nextInt(3)
      val df = spark.createDataFrame(rows).toDF("l_orderkey", "l_partkey")
      val out = operators.Relational.basketPairs(df, minSup)
        .select($"p1", $"p2", $"n_pair", $"c1", $"c2", $"lift")
        .as[(Long, Long, Long, Long, Long, Double)].collect()
      val it = rows.distinct
      val byOrder = it.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val partCnt = it.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nTot = byOrder.size.toLong
      val want = byOrder.values.toSeq.flatMap { ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= minSup).toMap
      withClue(s"trial $trial (orders=$nOrders parts=$nParts minSup=$minSup): ") {
        out.length shouldBe want.size
        out.foreach { case (p1, p2, n, c1, c2, lift) =>
          n shouldBe want((p1, p2))
          c1 shouldBe partCnt(p1)
          c2 shouldBe partCnt(p2)
          lift shouldBe (n * nTot).toDouble / (c1 * c2)
        }
      }
    }
  }

  test("basketPairs maxBasketSize: planted mega-basket fanout bounded; cap above max is inert (q110)") {
    // 3 normal orders + one mega-basket of 60 distinct parts
    val normal = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 3L))
    val mega = (100L until 160L).map(p => (9L, p))
    val df = spark.createDataFrame(normal ++ mega).toDF("l_orderkey", "l_partkey")

    // capped: the mega-basket contributes C(8,2)=28 pairs, not C(60,2)=1770
    val capped = operators.Relational.basketPairs(df, minSupport = 1, maxBasketSize = 8)
      .select($"p1", $"p2", $"n_pair").as[(Long, Long, Long)].collect()
    val megaPairs = capped.count { case (p1, _, _) => p1 >= 100L }
    megaPairs shouldBe 28
    // the kept keys are the smallest 8 (sorted-array slice → deterministic)
    capped.filter(_._1 >= 100L).flatMap(t => Seq(t._1, t._2)).toSet shouldBe
      (100L until 108L).toSet
    // normal baskets are untouched by the cap
    capped.filter(_._1 < 100L).map(t => (t._1, t._2)).toSet shouldBe
      Set((1L, 2L), (1L, 3L), (2L, 3L))

    // a cap above the data's max basket is a no-op: identical output
    val unc = operators.Relational.basketPairs(df, 1)
      .orderBy($"p1", $"p2")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val wide = operators.Relational.basketPairs(df, 1, maxBasketSize = 1000)
      .orderBy($"p1", $"p2")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    wide shouldBe unc

    // the loud half: the report counts what the cap chopped
    val rep = operators.Relational.basketTruncationReport(df, 8)
      .as[(Long, Long, Long, Long)].collect().head
    rep shouldBe ((4L, 1L, 60L, 28L + 1L + 1L + 1L))
  }

  test("rfmSegments ≡ brute-force quartile scoring on 10 random order sets (q111)") {
    (1 to 10).foreach { trial =>
      val nCust = 2 + rnd.nextInt(12)
      val rows = (0 until (5 + rnd.nextInt(60))).map { i =>
        (rnd.nextInt(nCust).toLong,
          java.sql.Date.valueOf(f"2024-0${1 + rnd.nextInt(9)}-${1 + rnd.nextInt(28)}%02d"),
          BigDecimal(100 + rnd.nextInt(90000), 2)) // 1.00 .. 901.00
      }
      val df = spark.createDataFrame(rows).toDF("o_custkey", "o_orderdate", "o_totalprice")
      val out = operators.Relational.rfmSegments(df)
        .select($"o_custkey", $"recency", $"frequency", $"monetary",
          $"r_score", $"f_score", $"m_score", $"segment")
        .as[(Long, Long, Long, Double, Int, Int, Int, String)].collect()
      val per = rows.groupBy(_._1).map { case (c, os) =>
        c -> ((os.map(_._2.toLocalDate).maxBy(_.toEpochDay),
          os.size.toLong, os.map(_._3).sum))
      }
      val mxd = per.values.map(_._1).maxBy(_.toEpochDay)
      val rec = per.view.mapValues(v => mxd.toEpochDay - v._1.toEpochDay).toMap
      def disc[T](vs: Seq[T], p: Double)(implicit o: Ordering[T]): T =
        vs.sorted(o)(math.ceil(vs.size * p).toInt - 1)
      def scoreUp[T](v: T, vs: Seq[T])(implicit o: Ordering[T]): Int =
        1 + Seq(0.25, 0.5, 0.75).count(p => o.gt(v, disc(vs, p)))
      def scoreDown[T](v: T, vs: Seq[T])(implicit o: Ordering[T]): Int =
        1 + Seq(0.75, 0.5, 0.25).count(p => o.lt(v, disc(vs, p)))
      val recs = per.keys.toSeq.map(rec)
      val freqs = per.values.toSeq.map(_._2)
      val mons = per.values.toSeq.map(_._3)
      withClue(s"trial $trial (nCust=$nCust): ") {
        out.length shouldBe per.size
        out.foreach { case (c, r, f, m, rs, fs, ms, seg) =>
          r shouldBe rec(c)
          f shouldBe per(c)._2
          m shouldBe per(c)._3.toDouble
          rs shouldBe scoreDown(rec(c), recs)
          fs shouldBe scoreUp(per(c)._2, freqs)
          ms shouldBe scoreUp(per(c)._3, mons)
          seg shouldBe s"$rs$fs$ms"
        }
      }
    }
  }

  test("kpiDaily ≡ brute-force lag/moving-average on 10 random event logs (q112)") {
    (1 to 10).foreach { trial =>
      val types = Seq("a", "b", "c")
      val rows = (0 until (10 + rnd.nextInt(120))).map { i =>
        (i.toLong, types(rnd.nextInt(types.size)),
          java.sql.Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(20)}%02d 0${rnd.nextInt(10)}:15:00"))
      }
      val df = spark.createDataFrame(rows).toDF("event_id", "event_type", "ts")
      val out = operators.Etl.kpiDaily(df)
        .select($"day", $"event_type", $"n", $"prev_n", $"delta", $"ma7")
        .as[(java.sql.Timestamp, String, Long, Option[Long], Option[Long], Double)]
        .collect()
      val daily = rows.groupBy { case (_, t, ts) =>
        (t, ts.toLocalDateTime.toLocalDate)
      }.view.mapValues(_.size.toLong).toMap
      withClue(s"trial $trial: ") {
        out.length shouldBe daily.size
        out.groupBy(_._2).foreach { case (t, rs) =>
          val sorted = rs.sortBy(_._1.getTime)
          val ns = sorted.map(_._3)
          sorted.zipWithIndex.foreach { case ((ts, _, n, prev, delta, ma7), i) =>
            n shouldBe daily((t, ts.toLocalDateTime.toLocalDate))
            prev shouldBe (if (i == 0) None else Some(ns(i - 1)))
            delta shouldBe (if (i == 0) None else Some(n - ns(i - 1)))
            val frame = ns.slice(math.max(0, i - 6), i + 1)
            ma7 shouldBe frame.sum.toDouble / frame.size
          }
        }
      }
    }
  }

  test("keywordSearch ≡ brute-force linear-idf ranking on 10 random corpora (q108)") {
    (1 to 10).foreach { trial =>
      val vocab = Vector("xx", "yy", "zz", "ww")
      val terms = Seq("xx", "yy")
      val rows = (0 until (5 + rnd.nextInt(30))).map { i =>
        (i.toLong, (0 until rnd.nextInt(10))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val k = 1 + rnd.nextInt(6)
      val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      val out = operators.Text.keywordSearch(df, terms, k)
        .select($"doc_id", $"tf_xx", $"tf_yy", $"score")
        .as[(Long, Long, Long, Double)].collect()
      val n = rows.size.toLong
      val tf = rows.map { case (id, t) =>
        val ws = t.split("\\s+")
        id -> terms.map(q => ws.count(_ == q).toLong)
      }.toMap
      val dfreq = terms.indices.map(i => tf.values.count(_(i) > 0).toLong)
      val scored = tf.collect { case (id, tfs) if tfs.exists(_ > 0) =>
        val s = terms.indices.map { i =>
          if (tfs(i) > 0) (tfs(i) * n).toDouble / dfreq(i) else 0.0
        }.reduce(_ + _)
        (id, tfs.head, tfs(1), s)
      }.toSeq
      val want = scored.sortBy(r => (-r._4, r._1)).take(k)
      withClue(s"trial $trial (k=$k n=$n): ") {
        out.toSeq shouldBe want
      }
    }
  }
}
