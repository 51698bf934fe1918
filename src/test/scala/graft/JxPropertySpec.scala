package graft

import graft.jx.JxCompiler
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based DIFFERENTIAL test of the jx expression compiler:
  * random expression trees evaluated two independent ways — compiled
  * to a Catalyst Column through the production path, and interpreted
  * by a ~40-line reference evaluator written here against SQL
  * semantics (null propagation in arithmetic, Kleene three-valued
  * and/or, null-safe `ne`, when-null-condition-takes-else). Any
  * divergence on any generated tree over the fixture rows is a
  * compiler bug (or a semantics the scaladoc must pin). The oracled
  * gate queries cover the grammar point-wise; this covers its
  * CLOSURE under composition.
  */
class JxPropertySpec extends SparkSpec {
  import spark.implicits._

  // fixture: integral-valued doubles keep +,-,* exact in IEEE double,
  // so compiled-vs-interpreted comparison is bit-exact, no tolerance;
  // tsec is a nullable whole-second epoch (late 2023, random offsets
  // crossing week/month/year boundaries) backing the timestamp column
  private val rows: Seq[(Long, Option[Double], Long, Option[String], Option[Long])] = {
    val rnd = new scala.util.Random(7)
    (0L until 48L).map { id =>
      val x = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(21).toDouble - 10)
      val s = if (rnd.nextInt(6) == 0) None else Some(rnd.alphanumeric.take(rnd.nextInt(5)).mkString)
      val t = if (rnd.nextInt(6) == 0) None
        else Some(1698796800L + (rnd.nextInt(200) - 100) * 86400L + rnd.nextInt(86400))
      (id, x, rnd.nextInt(21).toLong - 10, s, t)
    }
  }
  private lazy val df = {
    val d = rows.toDF("id", "x", "y", "s", "tsec")
      .withColumn("t", org.apache.spark.sql.functions.timestamp_seconds(col("tsec")))
    d.cache(); d.count() // one materialization for ~180 property cases
    d
  }

  // ---- expression ASTs, rendered to jx JSON and interpreted locally
  sealed trait N
  case object FX extends N; case object FY extends N
  case class NLit(v: Long) extends N
  case class NBin(op: String, a: N, b: N) extends N // add | sub | mult
  case class NAbs(a: N) extends N
  case class NCoalesce(a: N, b: N) extends N
  case class NMinMax(isMax: Boolean, args: List[N]) extends N // null-skipping clamp
  case class NWhen(c: B, t: N, e: N) extends N
  case class NLen(a: N) extends N // length of s — exercises string→num
  case class NUnix(a: D) extends N // {"unix": ts} — date→num bridge
  // {"unix": ts} normalized to DAYS since the fixture base — the form
  // the fuzzer feeds into arithmetic. Raw epoch seconds (~1.7e9) in a
  // random mult chain leave the differential envelope two ways: the
  // product exceeds 2^53 (the interpreter's double loses the exactness
  // the comparison relies on) and can exceed Long.Max, where the
  // ENGINE's contract is ANSI loud overflow (64-bit jx by design — a
  // documented divergence from python bigints; a fuzz seed caught
  // exactly this in r9). Day-normalized values (±~210) keep every
  // depth-4 product exact IEEE on both sides while still exercising
  // unix/sub/div compilation.
  case class NUnixDay(a: D) extends N
  case class NDateDiff(a: D, b: D, unit: Option[String]) extends N
  sealed trait D // timestamp-valued expressions (whole seconds)
  case object FT extends D // field t
  case class DLit(epochSec: Long) extends D // {"date": unixsec}
  case class DAdd(a: D, amt: N, unit: String) extends D
  case class DFloor(a: D, unit: String) extends D // calendar trunc
  sealed trait S
  case object FS extends S // field s
  case class SLit(v: String) extends S
  case class SCase(up: Boolean, a: S) extends S // lower | upper
  case class SConcat(a: S, b: S) extends S // concat_ws: skips nulls
  sealed trait B
  case class BCmp(op: String, a: N, b: N) extends B // gt gte lt lte eq ne
  case class BSCmp(ne: Boolean, a: S, b: S) extends B // string eq/ne
  case class BSubstr(find: Boolean, p: String) extends B // prefix | find on s
  case class BAnd(a: B, b: B) extends B
  case class BOr(a: B, b: B) extends B
  case class BNot(a: B) extends B
  case class BMissing(neg: Boolean) extends B // missing/exists on x

  private def njson(n: N): String = n match {
    case FX => "\"x\""
    case FY => "\"y\""
    case NLit(v) => v.toString
    case NBin(op, a, b) => s"""{"$op": [${njson(a)}, ${njson(b)}]}"""
    case NAbs(a) => s"""{"abs": ${njson(a)}}"""
    case NCoalesce(a, b) => s"""{"coalesce": [${njson(a)}, ${njson(b)}]}"""
    case NMinMax(isMax, args) =>
      s"""{"${if (isMax) "max" else "min"}": [${args.map(njson).mkString(", ")}]}"""
    case NWhen(c, t, e) => s"""{"when": ${bjson(c)}, "then": ${njson(t)}, "else": ${njson(e)}}"""
    case NLen(_) => """{"length": "s"}"""
    case NUnix(a) => s"""{"unix": ${djson(a)}}"""
    case NUnixDay(a) =>
      s"""{"div": [{"sub": [{"unix": ${djson(a)}}, {"literal": 1698796800}]}, {"literal": 86400}]}"""
    case NDateDiff(a, b, u) =>
      val tail = u.map(x => s""", "$x"""").getOrElse("")
      s"""{"date_diff": [${djson(a)}, ${djson(b)}$tail]}"""
  }
  private def djson(d: D): String = d match {
    case FT => "\"t\""
    case DLit(v) => s"""{"date": $v}"""
    case DAdd(a, amt, u) => s"""{"date_add": [${djson(a)}, ${njson(amt)}, "$u"]}"""
    case DFloor(a, u) => s"""{"floor": [${djson(a)}, "$u"]}"""
  }
  private def sjson(s: S): String = s match {
    case FS => "\"s\""
    case SLit(v) => s"""{"literal": "$v"}"""
    case SCase(up, a) => s"""{"${if (up) "upper" else "lower"}": ${sjson(a)}}"""
    case SConcat(a, b) => s"""{"concat": [${sjson(a)}, ${sjson(b)}]}"""
  }
  private def bjson(b: B): String = b match {
    case BSCmp(ne, a, bb) =>
      s"""{"${if (ne) "ne" else "eq"}": [${sjson(a)}, ${sjson(bb)}]}"""
    case BSubstr(find, p) =>
      s"""{"${if (find) "find" else "prefix"}": {"s": "$p"}}"""
    case BCmp(op, a, bb) => s"""{"$op": [${njson(a)}, ${njson(bb)}]}"""
    case BAnd(a, bb) => s"""{"and": [${bjson(a)}, ${bjson(bb)}]}"""
    case BOr(a, bb) => s"""{"or": [${bjson(a)}, ${bjson(bb)}]}"""
    case BNot(a) => s"""{"not": ${bjson(a)}}"""
    case BMissing(neg) => if (neg) """{"exists": "x"}""" else """{"missing": "x"}"""
  }

  // ---- the independent evaluator (SQL semantics, written from spec)
  private type Row = (Long, Option[Double], Long, Option[String], Option[Long])
  private val unitSecs = Map("second" -> 1L, "minute" -> 60L,
    "hour" -> 3600L, "day" -> 86400L, "week" -> 604800L)
  // calendar truncation in UTC via java.time, independent of Spark:
  // weeks start Monday, months on the 1st (date_trunc's alignment)
  private def truncUtc(sec: Long, unit: String): Long = {
    import java.time._
    import java.time.temporal.TemporalAdjusters
    val z = Instant.ofEpochSecond(sec).atZone(ZoneOffset.UTC)
    val out = unit match {
      case "minute" => z.withSecond(0)
      case "hour" => z.withMinute(0).withSecond(0)
      case "day" => z.toLocalDate.atStartOfDay(ZoneOffset.UTC)
      case "week" => z.toLocalDate
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        .atStartOfDay(ZoneOffset.UTC)
      case "month" => z.toLocalDate.withDayOfMonth(1)
        .atStartOfDay(ZoneOffset.UTC)
    }
    out.toEpochSecond
  }
  private def evalD(d: D, r: Row): Option[Long] = d match {
    case FT => r._5
    case DLit(v) => Some(v)
    case DAdd(a, amt, u) =>
      for (x <- evalD(a, r); m <- evalN(amt, r))
        yield x + m.toLong * unitSecs(u)
    case DFloor(a, u) => evalD(a, r).map(truncUtc(_, u))
  }
  private def evalN(n: N, r: Row): Option[Double] = n match {
    case FX => r._2
    case FY => Some(r._3.toDouble)
    case NLit(v) => Some(v.toDouble)
    case NBin(op, a, b) =>
      for (x <- evalN(a, r); y <- evalN(b, r)) yield op match {
        case "add" => x + y
        case "sub" => x - y
        case "mult" => x * y
      }
    case NAbs(a) => evalN(a, r).map(math.abs)
    case NCoalesce(a, b) => evalN(a, r).orElse(evalN(b, r))
    case NMinMax(isMax, args) => // greatest/least SKIP null operands
      val vs = args.flatMap(evalN(_, r))
      if (vs.isEmpty) None else Some(if (isMax) vs.max else vs.min)
    case NWhen(c, t, e) => // null condition takes the else branch
      if (evalB(c, r).contains(true)) evalN(t, r) else evalN(e, r)
    case NLen(_) => r._4.map(_.length.toDouble)
    case NUnix(a) => evalD(a, r).map(_.toDouble)
    case NUnixDay(a) => evalD(a, r).map(x => (x - 1698796800L).toDouble / 86400)
    case NDateDiff(a, b, u) =>
      for (x <- evalD(a, r); y <- evalD(b, r)) yield u match {
        case None => (x - y).toDouble
        case Some(un) => (x - y).toDouble / unitSecs(un)
      }
  }
  private def evalS(s: S, r: Row): Option[String] = s match {
    case FS => r._4
    case SLit(v) => Some(v)
    case SCase(up, a) => evalS(a, r).map(v => if (up) v.toUpperCase else v.toLowerCase)
    case SConcat(a, b) => // concat_ws semantics: null args are SKIPPED
      Some(evalS(a, r).getOrElse("") + evalS(b, r).getOrElse(""))
  }
  private def evalB(b: B, r: Row): Option[Boolean] = b match {
    case BSCmp(true, a, bb) => // null-safe ne, as in the numeric case
      (evalS(a, r), evalS(bb, r)) match {
        case (None, None) => Some(false)
        case (x, y) => Some(x != y)
      }
    case BSCmp(false, a, bb) =>
      for (x <- evalS(a, r); y <- evalS(bb, r)) yield x == y
    case BSubstr(find, p) =>
      r._4.map(v => if (find) v.contains(p) else v.startsWith(p))
    case BCmp("ne", a, bb) => // null-safe: !(a <=> b)
      (evalN(a, r), evalN(bb, r)) match {
        case (None, None) => Some(false)
        case (x, y) => Some(x != y)
      }
    case BCmp(op, a, bb) =>
      for (x <- evalN(a, r); y <- evalN(bb, r)) yield op match {
        case "gt" => x > y
        case "gte" => x >= y
        case "lt" => x < y
        case "lte" => x <= y
        case "eq" => x == y
      }
    case BAnd(a, bb) => (evalB(a, r), evalB(bb, r)) match { // Kleene
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case BOr(a, bb) => (evalB(a, r), evalB(bb, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case BNot(a) => evalB(a, r).map(!_)
    case BMissing(neg) => Some(if (neg) r._2.isDefined else r._2.isEmpty)
  }

  // ---- generators (depth-bounded)
  private def genN(d: Int): Gen[N] =
    if (d <= 0) Gen.oneOf(Gen.const(FX), Gen.const(FY), Gen.choose(-5L, 5L).map(NLit))
    else Gen.frequency(
      2 -> Gen.oneOf(Gen.const(FX), Gen.const(FY), Gen.choose(-5L, 5L).map(NLit)),
      2 -> (for { op <- Gen.oneOf("add", "sub", "mult"); a <- genN(d - 1); b <- genN(d - 1) }
        yield NBin(op, a, b)),
      1 -> genN(d - 1).map(NAbs),
      1 -> (for { a <- genN(d - 1); b <- genN(d - 1) } yield NCoalesce(a, b)),
      1 -> (for { isMax <- Gen.oneOf(true, false); k <- Gen.choose(2, 3)
                  args <- Gen.listOfN(k, genN(d - 1)) } yield NMinMax(isMax, args)),
      1 -> (for { c <- genB(d - 1); t <- genN(d - 1); e <- genN(d - 1) } yield NWhen(c, t, e)),
      1 -> Gen.const(NLen(FX)),
      1 -> genD(d - 1).map(NUnixDay),
      1 -> (for { a <- genD(d - 1); b <- genD(d - 1)
                  u <- Gen.option(Gen.oneOf("second", "minute", "hour", "day", "week")) }
        yield NDateDiff(a, b, u)))
  // bounded numeric trees for date_add AMOUNTS: the fuzzer's first
  // run proved an unbounded amount (an epoch-second value scaled by
  // weeks) lands outside Spark's timestamp range and aborts the job
  // (ANSI long overflow) where the plain-long interpreter wraps —
  // out-of-domain by the operator's contract, so amounts come from
  // the pre-date grammar (|amt| ≲ 1e3 → shifts of at most ~20 years)
  private def genNB(d: Int): Gen[N] =
    if (d <= 0) Gen.oneOf(Gen.const(FX), Gen.const(FY), Gen.choose(-5L, 5L).map(NLit))
    else Gen.frequency(
      2 -> Gen.oneOf(Gen.const(FX), Gen.const(FY), Gen.choose(-5L, 5L).map(NLit)),
      2 -> (for { op <- Gen.oneOf("add", "sub", "mult"); a <- genNB(d - 1); b <- genNB(d - 1) }
        yield NBin(op, a, b)),
      1 -> genNB(d - 1).map(NAbs),
      1 -> (for { a <- genNB(d - 1); b <- genNB(d - 1) } yield NCoalesce(a, b)),
      1 -> Gen.const(NLen(FX)))
  private def genD(d: Int): Gen[D] = {
    val leaf: Gen[D] = Gen.oneOf(Gen.const(FT),
      Gen.choose(1690000000L, 1706000000L).map(DLit))
    if (d <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      2 -> (for { a <- genD(d - 1); amt <- genNB(d - 1)
                  u <- Gen.oneOf("second", "minute", "hour", "day", "week") }
        yield DAdd(a, amt, u)),
      2 -> (for { a <- genD(d - 1)
                  u <- Gen.oneOf("minute", "hour", "day", "week", "month") }
        yield DFloor(a, u)))
  }
  private val genLit: Gen[String] = Gen.oneOf("", "a", "ab", "Z", "q0")
  private def genS(d: Int): Gen[S] =
    if (d <= 0) Gen.oneOf(Gen.const(FS), genLit.map(SLit))
    else Gen.frequency(
      2 -> Gen.oneOf(Gen.const(FS), genLit.map(SLit)),
      1 -> (for { up <- Gen.oneOf(true, false); a <- genS(d - 1) } yield SCase(up, a)),
      1 -> (for { a <- genS(d - 1); b <- genS(d - 1) } yield SConcat(a, b)))
  private def genB(d: Int): Gen[B] =
    if (d <= 0) Gen.oneOf(Gen.const(BMissing(false)), Gen.const(BMissing(true)))
    else Gen.frequency(
      3 -> (for { op <- Gen.oneOf("gt", "gte", "lt", "lte", "eq", "ne")
                  a <- genN(d - 1); b <- genN(d - 1) } yield BCmp(op, a, b)),
      1 -> (for { ne <- Gen.oneOf(true, false); a <- genS(d - 1); b <- genS(d - 1) }
        yield BSCmp(ne, a, b)),
      1 -> (for { f <- Gen.oneOf(true, false); p <- genLit } yield BSubstr(f, p)),
      1 -> (for { a <- genB(d - 1); b <- genB(d - 1) } yield BAnd(a, b)),
      1 -> (for { a <- genB(d - 1); b <- genB(d - 1) } yield BOr(a, b)),
      1 -> genB(d - 1).map(BNot),
      1 -> Gen.oneOf(Gen.const(BMissing(false)), Gen.const(BMissing(true))))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60).withWorkers(1), p)
    withClue(res.status.toString) { res.passed shouldBe true }
  }

  test("compiled where ≡ three-valued interpreter on random predicate trees") {
    check(Prop.forAll(genB(4)) { b =>
      val kept = df.where(JxCompiler.compileExpr(JxCompiler.parse(bjson(b))))
        .select($"id").as[Long].collect().toSet
      val want = rows.filter(r => evalB(b, r).contains(true)).map(_._1).toSet
      kept == want
    })
  }

  test("compiled string pipeline ≡ interpreter on random string trees") {
    check(Prop.forAll(genS(4)) { s =>
      val got = df.select($"id",
        JxCompiler.compileExpr(JxCompiler.parse(sjson(s))).as("v"))
        .as[(Long, Option[String])].collect().toMap
      rows.forall(r => got(r._1) == evalS(s, r))
    })
  }

  test("compiled projection ≡ null-propagating interpreter on random numeric trees") {
    check(Prop.forAll(genN(4)) { n =>
      val got = df.select($"id",
        JxCompiler.compileExpr(JxCompiler.parse(njson(n))).cast("double").as("v"))
        .as[(Long, Option[Double])].collect().toMap
      rows.forall(r => got(r._1) == evalN(n, r))
    })
  }

  // ---- QUERY-level fuzz: whole jx documents (where + groupby +
  // aggregate select) against an independent in-memory evaluator.
  // The scalar tests above cover expression compilation; this covers
  // CLAUSE ASSEMBLY — filter-before-aggregate order, computed groupby
  // naming, null group keys, count-vs-count(value), all-null sums.
  private sealed trait GTerm
  private case object GS extends GTerm // group on s (nullable string)
  private case object GBucket extends GTerm // {"name":"b","value":{"floor":["y",3]}}
  private sealed trait Agg
  private case object ACount extends Agg // value-less count = rows
  private case object ASumX extends Agg
  private case object AMinY extends Agg
  private case object AMaxX extends Agg
  private case object ACardS extends Agg
  private case class GQ(where: Option[B], gb: Seq[GTerm], aggs: Seq[Agg])

  private def gqJson(q: GQ): String = {
    val w = q.where.map(b => s""""where": ${bjson(b)}, """).getOrElse("")
    val gb =
      if (q.gb.isEmpty) ""
      else "\"groupby\": [" + q.gb.map {
        case GS => "\"s\""
        case GBucket => """{"name": "b", "value": {"floor": ["y", 3]}}"""
      }.mkString(", ") + "], "
    val sel = q.aggs.zipWithIndex.map { case (a, i) =>
      a match {
        case ACount => s"""{"name": "a$i", "aggregate": "count"}"""
        case ASumX => s"""{"name": "a$i", "value": "x", "aggregate": "sum"}"""
        case AMinY => s"""{"name": "a$i", "value": "y", "aggregate": "minimum"}"""
        case AMaxX => s"""{"name": "a$i", "value": "x", "aggregate": "maximum"}"""
        case ACardS => s"""{"name": "a$i", "value": "s", "aggregate": "cardinality"}"""
      }
    }.mkString(", ")
    s"""{"from": "fx", $w$gb"select": [$sel]}"""
  }

  // independent evaluation over the raw fixture rows (keys as Options)
  private def gqEval(q: GQ): Map[Seq[Option[Any]], Seq[Option[Double]]] = {
    val kept = rows.filter(r => q.where.forall(b => evalB(b, r).contains(true)))
    def key(r: Row): Seq[Option[Any]] = q.gb.map {
      case GS => r._4
      case GBucket => Some(math.floor(r._3.toDouble / 3) * 3)
    }
    def aggRow(rs: Seq[Row]): Seq[Option[Double]] = q.aggs.map {
      case ACount => Some(rs.size.toDouble)
      case ASumX =>
        val xs = rs.flatMap(_._2); if (xs.isEmpty) None else Some(xs.sum)
      case AMinY =>
        if (rs.isEmpty) None else Some(rs.map(_._3).min.toDouble)
      case AMaxX =>
        val xs = rs.flatMap(_._2); if (xs.isEmpty) None else Some(xs.max)
      case ACardS => Some(rs.flatMap(_._4).distinct.size.toDouble)
    }
    // SQL global-aggregate contract: with no grouping keys the result
    // is ALWAYS one row, even over zero input rows (count=0, null
    // value aggregates) — groupBy would instead vanish
    if (q.gb.isEmpty) Map(Seq.empty[Option[Any]] -> aggRow(kept))
    else kept.groupBy(key).map { case (k, rs) => k -> aggRow(rs) }
  }

  private val genGQ: Gen[GQ] = for {
    w <- Gen.option(genB(3))
    gb <- Gen.someOf(Seq(GS, GBucket)).map(_.toSeq)
    aggs <- Gen.nonEmptyContainerOf[List, Agg](
      Gen.oneOf(ACount, ASumX, AMinY, AMaxX, ACardS)).map(_.take(3))
  } yield GQ(w, gb, aggs)

  test("compiled jx QUERY ≡ independent evaluator on random where+groupby+aggregates") {
    check(Prop.forAll(genGQ) { q =>
      val compiled = JxCompiler.queryOn(spark, sfDir, gqJson(q), Map("fx" -> df))
      val keyN = q.gb.size
      val got = compiled.collect().map { r =>
        val k = (0 until keyN).map(i => Option(r.get(i)).map {
          case d: Double => d: Any
          case l: Long => l.toDouble: Any
          case v => v
        })
        val vs = (keyN until keyN + q.aggs.size).map(i => Option(r.get(i)).map {
          case d: Double => d
          case l: Long => l.toDouble
          case dec: java.math.BigDecimal => dec.doubleValue
          case v => v.toString.toDouble
        })
        k -> vs
      }.toMap
      val want = gqEval(q).map { case (k, vs) =>
        k.map(_.map {
          case d: Double => d: Any
          case other => other
        }) -> vs
      }
      got == want
    })
  }

  test("compiled list/union aggregates ≡ sorted multiset/set evaluator on random where+groupby") {
    // the r10 `list` aggregate's contract is a SORTED MULTISET
    // (duplicates intact, layout-independent order) vs `union`'s
    // sorted set — fuzz both against a direct evaluation over the
    // fixture rows, under random filters and both group shapes
    check(Prop.forAll(Gen.option(genB(3)), Gen.oneOf(true, false)) { (w, groupByS) =>
      val wj = w.map(b => s""""where": ${bjson(b)}, """).getOrElse("")
      val gb = if (groupByS) """"groupby": ["s"], """ else ""
      val q = s"""{"from": "fx", $wj$gb"select": [
        {"name": "ls", "value": "y", "aggregate": "list"},
        {"name": "un", "value": "y", "aggregate": "union"}]}"""
      val kept = rows.filter(r => w.forall(b => evalB(b, r).contains(true)))
      val groups: Map[Option[String], Seq[Row]] =
        if (groupByS) kept.groupBy(_._4)
        else Map(None -> kept) // global aggregate: always one row
      val want = groups.map { case (k, rs) =>
        (if (groupByS) k else None) ->
          (rs.map(_._3).sorted, rs.map(_._3).distinct.sorted)
      }
      val compiled = JxCompiler.queryOn(spark, sfDir, q, Map("fx" -> df))
      val got = compiled.collect().map { r =>
        val off = if (groupByS) 1 else 0
        val k = if (groupByS) Option(r.get(0)).map(_.toString) else None
        k -> ((r.getSeq[Long](off).toSeq, r.getSeq[Long](off + 1).toSeq))
      }.toMap
      got == want
    })
  }

  test("compiled date pipeline ≡ java.time interpreter on random date trees") {
    // whole-second epoch read-back via the jx unix bridge: date_add
    // shifts, calendar floors (Monday weeks, 1st-of-month), literals
    // and the nullable field compose; equality is exact longs
    check(Prop.forAll(genD(4)) { dtree =>
      val got = df.select($"id",
        JxCompiler.compileExpr(
          JxCompiler.parse(s"""{"unix": ${djson(dtree)}}""")).as("v"))
        .as[(Long, Option[Long])].collect().toMap
      rows.forall(r => got(r._1) == evalD(dtree, r))
    })
  }

  // ---- format:"nested" round-trip property: for ANY conflict-free
  // dotted-name tree, toNested ∘ flatten is the identity on values
  // (and sibling order is preserved within each level)

  /** Random leaf-path sets as trees (so leaf/prefix conflicts are
    * impossible by construction): each node is a leaf or an internal
    * node with 1–3 distinctly-named children, depth ≤ 3.
    */
  private def genTree(depth: Int, seg: Gen[String]): Gen[List[List[String]]] =
    if (depth == 0) Gen.const(List(Nil))
    else Gen.frequency(
      2 -> Gen.const(List(Nil)), // leaf
      3 -> (for {
        n <- Gen.choose(1, 3)
        names <- Gen.listOfN(n, seg).map(_.distinct)
        subs <- Gen.sequence[List[List[List[String]]], List[List[String]]](
          names.map(_ => genTree(depth - 1, seg)))
      } yield names.zip(subs).flatMap { case (nm, ps) => ps.map(nm :: _) }))

  private def flatten(schema: org.apache.spark.sql.types.StructType,
      prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: org.apache.spark.sql.types.StructType =>
          flatten(st, prefix + f.name + ".")
        case _ => Seq(prefix + f.name)
      }
    }

  test("format nested: toNested ∘ flatten is the identity on random dotted-name trees") {
    val seg = Gen.oneOf("a", "b", "c", "d", "e")
    check(Prop.forAll(genTree(3, seg)) { paths0 =>
      val paths = paths0.filter(_.nonEmpty).map(_.mkString("."))
      paths.isEmpty || {
        val flat = (1 to 3).map(r =>
          org.apache.spark.sql.Row.fromSeq(paths.indices.map(i => r * 100 + i)))
        val schema = org.apache.spark.sql.types.StructType(paths.map(p =>
          org.apache.spark.sql.types.StructField(p,
            org.apache.spark.sql.types.IntegerType)))
        val fdf = spark.createDataFrame(
          java.util.Arrays.asList(flat: _*), schema)
        val nested = JxCompiler.toNested(fdf)
        // flattening the nested schema recovers exactly the leaf set
        val back = flatten(nested.schema)
        // and re-flattened values match the originals per column
        val reflat = nested.select(back.map(p =>
          p.split('.').foldLeft(null: org.apache.spark.sql.Column) {
            case (null, s) => col(s"`$s`")
            case (c, s) => c.getField(s)
          }.as(p)): _*)
        back.toSet == paths.toSet &&
          reflat.select(paths.map(p => col(s"`$p`")): _*).collect().toSeq ==
            fdf.collect().toSeq
      }
    })
  }
}
