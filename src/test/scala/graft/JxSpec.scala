package graft

import graft.jx.JxCompiler
import graft.Tables
import org.apache.spark.sql.functions._

/** jx compiler coverage beyond the oracled q26: each jx document is
  * compared against the hand-written DataFrame equivalent.
  */
class JxSpec extends SparkSpec {
  import spark.implicits._

  private def li = Tables.lineitem(spark, sfDir)
  private def run(json: String) = JxCompiler.query(spark, sfDir, json)

  test("filter + select + limit") {
    val got = run("""{"from":"lineitem",
      "where":{"eq":{"l_returnflag":"R"}},
      "select":["l_orderkey","l_quantity"],
      "sort":[{"value":"l_orderkey","sort":1},{"value":"l_quantity","sort":-1}],
      "limit":20}""")
    got.count() shouldBe 20L
    got.columns.toSeq shouldBe Seq("l_orderkey", "l_quantity")
  }

  test("arithmetic expressions and comparisons") {
    val got = run("""{"from":"lineitem",
      "where":{"gt":[{"mult":["l_extendedprice",{"sub":[{"literal":1},"l_discount"]}]},{"literal":50000}]},
      "select":["l_orderkey"]}""")
    val want = li.where(col("l_extendedprice") * (lit(1) - col("l_discount")) > 50000)
      .select("l_orderkey")
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    got.count() shouldBe want.count()
  }

  test("prefix, missing, in, or") {
    val got = run("""{"from":"orders",
      "where":{"or":[{"prefix":{"o_orderpriority":"1"}},
                     {"in":{"o_orderstatus":["F"]}}]},
      "select":["o_orderkey"]}""")
    val want = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority").startsWith("1") || col("o_orderstatus").isin("F"))
      .select("o_orderkey")
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("suffix mirrors prefix (pyLibrary SuffixOp)") {
    val got = run("""{"from":"orders",
      "where":{"suffix":{"o_orderpriority":"URGENT"}},
      "select":["o_orderkey"]}""")
    val want = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority").endsWith("URGENT"))
      .select("o_orderkey")
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    got.count() should be > 0L // URGENT priorities exist — non-vacuous
  }

  test("groupby with aggregates matches DataFrame aggregation") {
    val got = run("""{"from":"lineitem",
      "groupby":["l_returnflag"],
      "select":[{"name":"n","aggregate":"count"},
                {"name":"mx","value":"l_quantity","aggregate":"maximum"}]}""")
    val want = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), max(col("l_quantity")).as("mx"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("union aggregate: sorted distinct set per group") {
    val got = run("""{"from":"lineitem",
      "groupby":["l_returnflag"],
      "select":[{"name":"flags","value":"l_linestatus","aggregate":"union"}]}""")
    val want = li.groupBy(col("l_returnflag"))
      .agg(array_sort(collect_set(col("l_linestatus"))).as("flags"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("window rownum per edge partition") {
    val got = run("""{"from":"orders",
      "window":{"name":"rn","aggregate":"rownum",
                "edges":["o_custkey"],
                "sort":[{"value":"o_orderdate","sort":1},{"value":"o_orderkey","sort":1}]},
      "select":["o_custkey","o_orderkey","rn"]}""")
    // window columns are selectable; rn=1 gives one first-order row per customer
    got.where($"rn" === 1).count() shouldBe
      Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    got.count() shouldBe Tables.orders(spark, sfDir).count()
  }

  test("edges are cell-complete: empty cells kept with count 0") {
    val got = run("""{"from":"events",
      "where":{"gte":{"value":90}},
      "edges":["user_id","event_type"],
      "select":[{"name":"n","aggregate":"count"}]}""")
    val src = Tables.events(spark, sfDir).where($"value" >= 90)
    val nUsers = src.select("user_id").distinct().count()
    val nTypes = src.select("event_type").distinct().count()
    got.count() shouldBe nUsers * nTypes // every cell, populated or not
    val zeros = got.where($"n" === 0).count()
    val populated = src.groupBy($"user_id", $"event_type").count().count()
    zeros shouldBe nUsers * nTypes - populated
    zeros should be > 0L // the filter must actually create empty cells
  }

  test("time-domain edges: calendar buckets, empty cells emitted, out-of-range dropped") {
    // events span Jan 2024 only: Dec 2023 and Feb 2024 are empty
    // months that must still appear as zero-filled cells
    val got = run("""{"from":"events",
      "edges":[{"name":"mo","value":"ts",
        "domain":{"type":"time","min":"2023-12-01 00:00:00",
                  "max":"2024-03-01 00:00:00","interval":"month"}}],
      "select":[{"name":"n","aggregate":"count"}]}""").orderBy("mo").collect()
    got.length shouldBe 3
    got.map(_.getTimestamp(0).toString.take(10)) shouldBe
      Array("2023-12-01", "2024-01-01", "2024-02-01")
    got(0).getLong(1) shouldBe 0L
    got(2).getLong(1) shouldBe 0L
    val inRange = Tables.events(spark, sfDir)
      .where(col("ts") >= "2023-12-01" && col("ts") < "2024-03-01").count()
    got.map(_.getLong(1)).sum shouldBe inRange
  }

  test("time-domain edges: unaligned min floors to its calendar bucket, rows before min drop") {
    val got = run("""{"from":"events",
      "edges":[{"name":"wk","value":"ts",
        "domain":{"type":"time","min":"2024-01-03 00:00:00",
                  "max":"2024-01-15 00:00:00","interval":"week"}}],
      "select":[{"name":"n","aggregate":"count"}]}""").orderBy("wk").collect()
    // Wed Jan 3 floors to Mon Jan 1; max Jan 15 (a week start) excluded
    got.map(_.getTimestamp(0).toString.take(10)) shouldBe
      Array("2024-01-01", "2024-01-08")
    val ev = Tables.events(spark, sfDir)
    got(0).getLong(1) shouldBe
      ev.where(col("ts") >= "2024-01-03" && col("ts") < "2024-01-08").count()
    got(1).getLong(1) shouldBe
      ev.where(col("ts") >= "2024-01-08" && col("ts") < "2024-01-15").count()
  }

  test("duration-domain edges: unit and numeric intervals agree, cells complete, out-of-range dropped") {
    val unit = run("""{"from":"events",
      "edges":[{"name":"db","value":{"mult":["value",60]},
        "domain":{"type":"duration","min":0,"max":600,"interval":"minute"}}],
      "select":[{"name":"n","aggregate":"count"}]}""").orderBy("db").collect()
    val numeric = run("""{"from":"events",
      "edges":[{"name":"db","value":{"mult":["value",60]},
        "domain":{"type":"duration","min":0,"max":600,"interval":60}}],
      "select":[{"name":"n","aggregate":"count"}]}""").orderBy("db").collect()
    unit.map(r => (r.getLong(0), r.getLong(1))) shouldBe
      numeric.map(r => (r.getLong(0), r.getLong(1)))
    unit.length shouldBe 10 // cell-complete: every minute start in [0, 600)
    unit.map(_.getLong(0)) shouldBe (0L until 600L by 60L).toArray
    val inRange = Tables.events(spark, sfDir)
      .where(col("value") * 60 >= 0 && col("value") * 60 < 600).count()
    unit.map(_.getLong(1)).sum shouldBe inRange
    inRange should be > 0L // the filter is doing real work, not vacuous
  }

  test("edges with null values: the null partition keeps its counts (allowNulls semantics)") {
    // pyLibrary jx shows a null partition for rows missing the edge
    // value; a null-unsafe cell join would emit the null cell with
    // count 0 and silently drop the aggregate row. Pin the counts.
    val df = spark.createDataFrame(Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, None), (4L, None), (5L, Some("b"))
    ).map { case (i, v) => (i, v.orNull) }).toDF("id", "cat")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","edges":["cat"],
         "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    got shouldBe Map(Some("a") -> 2L, Some("b") -> 1L, None -> 2L)
  }

  test("duration-domain edges: calendar unit (week) rejected — that's the time domain's job") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"events",
        "edges":[{"name":"db","value":"value",
          "domain":{"type":"duration","min":0,"max":600,"interval":"week"}}],
        "select":[{"name":"n","aggregate":"count"}]}""").collect()
    }
    e.getMessage should include("duration domain interval not supported")
  }

  test("time-domain edges: unsupported interval errors loudly") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"events",
        "edges":[{"name":"h","value":"ts",
          "domain":{"type":"time","min":"2024-01-01 00:00:00",
                    "max":"2024-01-02 00:00:00","interval":"fortnight"}}],
        "select":[{"name":"n","aggregate":"count"}]}""").collect()
    }
    e.getMessage should include("interval")
  }

  test("lenient mode: unknown fields are `missing`, strict mode errors") {
    def runL(json: String) = JxCompiler.query(spark, sfDir, json, lenient = true)
    // strict default: analyzer error on the unknown field
    intercept[Exception] {
      run("""{"from":"orders","where":{"eq":{"no_such_col":5}},
        "select":["o_orderkey"]}""").collect()
    }
    // filter on a missing field matches nothing (pyLibrary: missing
    // compares as missing -> false)
    runL("""{"from":"orders","where":{"eq":{"no_such_col":5}},
      "select":["o_orderkey"]}""").count() shouldBe 0L
    // `missing` on it matches everything
    val total = Tables.orders(spark, sfDir).count()
    runL("""{"from":"orders","where":{"missing":"no_such_col"},
      "select":["o_orderkey"]}""").count() shouldBe total
    // select emits a null column
    val sel = runL("""{"from":"orders","select":["o_orderkey","no_such_col"],
      "limit":3}""").collect()
    sel.foreach(r => assert(r.isNullAt(1)))
    // groupby collapses to one null group with the full count
    val grp = runL("""{"from":"orders","groupby":["no_such_col"],
      "select":[{"name":"n","aggregate":"count"}]}""").collect()
    grp.length shouldBe 1
    grp(0).isNullAt(0) shouldBe true
    grp(0).getLong(1) shouldBe total
    // names the query defines (aggregate outputs) are not injected:
    // sorting by the aggregate name still works leniently
    val sorted = runL("""{"from":"orders","groupby":["o_orderstatus"],
      "select":[{"name":"n","aggregate":"count"}],
      "sort":[{"value":"n","sort":-1}]}""").collect()
    sorted.map(_.getLong(1)).toSeq shouldBe
      sorted.map(_.getLong(1)).sortBy(-_).toSeq
  }

  test("groupby (unlike edges) emits only populated cells") {
    val got = run("""{"from":"events",
      "where":{"gte":{"value":90}},
      "groupby":["user_id","event_type"],
      "select":[{"name":"n","aggregate":"count"}]}""")
    val src = Tables.events(spark, sfDir).where($"value" >= 90)
    got.count() shouldBe src.groupBy($"user_id", $"event_type").count().count()
    got.where($"n" === 0).count() shouldBe 0L
  }

  test("scalar expression operators: length, lower, left, coalesce, between") {
    val got = run("""{"from":"orders",
      "where":{"and":[
        {"between":{"o_totalprice":[1000, 200000]}},
        {"eq":[{"left":{"o_orderpriority":1}},{"literal":"1"}]}]},
      "select":["o_orderkey",
        {"name":"pr_lower","value":{"lower":"o_orderpriority"}},
        {"name":"len_pr","value":{"length":"o_orderpriority"}},
        {"name":"c","value":{"coalesce":["o_orderstatus",{"literal":"?"}]}}]}""")
    val want = Tables.orders(spark, sfDir)
      .where($"o_totalprice".between(1000, 200000) &&
        substring($"o_orderpriority", 1, 1) === "1")
      .select($"o_orderkey", lower($"o_orderpriority").as("pr_lower"),
        org.apache.spark.sql.functions.length($"o_orderpriority").as("len_pr"),
        coalesce($"o_orderstatus", lit("?")).as("c"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    got.count() should be > 0L
  }

  test("scalar max/min: clamp semantics, null operands skipped") {
    // {"max":[a,b]} / {"min":[...]} — pyLibrary's expression clamp:
    // missing operands are IGNORED (null only when all are null)
    val got = run("""{"from":"orders",
      "select":["o_orderkey",
        {"name":"clamped","value":{"min":[{"max":["o_totalprice",10000]},150000]}},
        {"name":"mx3","value":{"max":["o_totalprice",{"literal":null},0]}},
        {"name":"allnull","value":{"min":[{"literal":null},{"literal":null}]}}]}""")
    val want = Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        least(greatest($"o_totalprice", lit(10000)), lit(150000)).as("clamped"),
        greatest($"o_totalprice", lit(null), lit(0)).as("mx3"),
        lit(null).as("allnull"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    // the clamp actually bites on this data: some rows at each bound
    got.where($"clamped" === 10000).count() should be > 0L
    got.where($"clamped" === 150000).count() should be > 0L
    // null skipped, not poisoning: mx3 is never null
    got.where($"mx3".isNull).count() shouldBe 0L
  }

  test("scalar expression operators: right, not_left, not_right, concat, abs, casts") {
    val got = run("""{"from":"orders",
      "select":["o_orderkey",
        {"name":"r2","value":{"right":{"o_orderpriority":2}}},
        {"name":"nl2","value":{"not_left":{"o_orderpriority":2}}},
        {"name":"nr2","value":{"not_right":{"o_orderpriority":2}}},
        {"name":"big","value":{"right":{"o_orderstatus":9}}},
        {"name":"cc","value":{"concat":["o_orderstatus",{"literal":"-"},"o_orderpriority"]}},
        {"name":"am","value":{"abs":{"sub":["o_totalprice","o_totalprice","o_totalprice"]}}},
        {"name":"ks","value":{"string":"o_orderkey"}},
        {"name":"pn","value":{"number":{"left":{"o_orderpriority":1}}}}]}""")
    val o = Tables.orders(spark, sfDir)
    def len(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.length(c)
    val pr = $"o_orderpriority"
    val want = o.select($"o_orderkey",
      pr.substr(greatest(len(pr) - 1, lit(1)), lit(2)).as("r2"),
      pr.substr(lit(3), greatest(len(pr) - 2, lit(0))).as("nl2"),
      pr.substr(lit(1), greatest(len(pr) - 2, lit(0))).as("nr2"),
      // n past the length keeps the whole (1-char) string, never ""
      $"o_orderstatus".as("big"),
      concat_ws("", $"o_orderstatus", lit("-"), pr).as("cc"),
      abs($"o_totalprice" - $"o_totalprice" - $"o_totalprice").as("am"),
      $"o_orderkey".cast("string").as("ks"),
      substring(pr, 1, 1).cast("double").as("pn"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    got.count() should be > 0L
  }

  test("percentile aggregates map to the mergeable sketch") {
    val got = run("""{"from":"lineitem","groupby":["l_returnflag"],
      "select":[{"name":"med","value":"l_quantity","aggregate":"median"},
                {"name":"p90","value":"l_quantity","aggregate":"percentile","percentile":0.9}]}""")
    val want = li.groupBy($"l_returnflag").agg(
      percentile_approx($"l_quantity", lit(0.5), lit(10000)).as("med"),
      percentile_approx($"l_quantity", lit(0.9), lit(10000)).as("p90"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("nested from: inner aggregation feeds outer filter and sort") {
    val got = run("""{"from":
        {"from":"lineitem",
         "groupby":["l_returnflag","l_linestatus"],
         "select":[{"name":"n","aggregate":"count"},
                   {"name":"mx","value":"l_quantity","aggregate":"maximum"}]},
      "where":{"gt":["n",{"literal":100}]},
      "sort":[{"value":"n","sort":-1}],
      "select":["l_returnflag","l_linestatus","n","mx"]}""")
    val inner = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), max($"l_quantity").as("mx"))
    val want = inner.where($"n" > 100)
      .select($"l_returnflag", $"l_linestatus", $"n", $"mx")
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    // outer sort applied: first row is the biggest group
    got.head().getAs[Long]("n") shouldBe
      want.orderBy($"n".desc).head().getAs[Long]("n")
  }

  test("find/contains filters on substring") {
    val got = run("""{"from":"orders",
      "where":{"find":{"o_orderpriority":"URGENT"}},
      "select":["o_orderkey"]}""")
    val want = Tables.orders(spark, sfDir)
      .where($"o_orderpriority".contains("URGENT")).select("o_orderkey")
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    got.count() should be > 0L
  }

  test("all clauses together: where + edges + sort + limit") {
    val got = run("""{"from":"events",
      "where":{"gte":{"value":50}},
      "edges":["event_type"],
      "select":[{"name":"n","aggregate":"count"},
                {"name":"total","value":"value","aggregate":"sum"}],
      "sort":[{"value":"n","sort":-1}],
      "limit":3}""")
    got.count() shouldBe 3L
    val ns = got.select($"n").as[Long].collect()
    ns.toSeq shouldBe ns.sortBy(-_).toSeq // sorted desc
    got.columns.toSeq shouldBe Seq("event_type", "n", "total")
  }

  test("plain select with edges is rejected, not silently dropped") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"events","edges":["event_type"],
        "select":["user_id",{"name":"n","aggregate":"count"}]}""")
    }
    e.getMessage should include("non-aggregate select")
  }

  test("groupby mixed with edges is rejected, not silently resolved") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"events","groupby":["user_id"],"edges":["event_type"],
        "select":[{"name":"n","aggregate":"count"}]}""")
    }
    e.getMessage should include("mutually exclusive")
  }

  test("value-less non-count aggregates error loudly") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"lineitem","groupby":["l_returnflag"],
        "select":[{"name":"s","aggregate":"sum"}]}""")
    }
    e.getMessage should include("requires a value")
  }

  test("unsupported operator raises a clear error") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"lineitem","where":{"frobnicate":{"x":1}},"select":["l_orderkey"]}""")
    }
    e.getMessage should include("frobnicate")
  }

  test("multi-key operator object is rejected, not first-property-read") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"lineitem","where":{"eq":{"l_returnflag":"R"},"typo":1},"select":["l_orderkey"]}""")
    }
    e.getMessage should include("exactly one property")
    val e2 = intercept[IllegalArgumentException] {
      run("""{"from":"orders","where":{"prefix":{"o_orderpriority":"1","o_comment":"x"}},"select":["o_orderkey"]}""")
    }
    e2.getMessage should include("exactly one field")
  }

  test("when/then/else and case conditionals") {
    val got = run("""{"from":"lineitem",
      "select":["l_orderkey",
        {"name":"big","value":{"when":{"gte":{"l_quantity":25}},"then":{"literal":"big"},"else":{"literal":"small"}}},
        {"name":"band","value":{"case":[
          {"when":{"lt":{"l_quantity":10}},"then":{"literal":"low"}},
          {"when":{"lt":{"l_quantity":40}},"then":{"literal":"mid"}},
          {"literal":"high"}]}}]}""")
    val want = li.select($"l_orderkey",
      when($"l_quantity" >= 25, "big").otherwise("small").as("big"),
      when($"l_quantity" < 10, "low")
        .when($"l_quantity" < 40, "mid").otherwise("high").as("band"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("case without default yields null for unmatched rows") {
    val got = run("""{"from":"lineitem",
      "select":[{"name":"only_low","value":{"case":[
        {"when":{"lt":{"l_quantity":5}},"then":{"literal":"low"}}]}}]}""")
    got.where($"only_low".isNull).count() shouldBe
      li.where($"l_quantity" >= 5).count()
  }

  test("mod and floor expressions (python semantics)") {
    val got = run("""{"from":"lineitem",
      "select":["l_orderkey","l_linenumber",
        {"name":"m","value":{"mod":["l_partkey",{"literal":7}]}},
        {"name":"f","value":{"floor":{"div":["l_extendedprice",{"literal":1000}]}}},
        {"name":"fi","value":{"floor":["l_extendedprice",{"literal":500}]}}]}""")
    val want = li.select($"l_orderkey", $"l_linenumber",
      pmod($"l_partkey", lit(7)).as("m"),
      floor($"l_extendedprice" / 1000).as("f"),
      (floor($"l_extendedprice" / 500) * 500).as("fi"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("nested-document from: leaf-path explode matches the flat join") {
    import org.apache.spark.sql.functions.{collect_list, struct}
    val o = Tables.orders(spark, sfDir)
    val nested = o.join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderstatus")
      .agg(collect_list(struct($"l_linenumber", $"l_quantity")).as("lines"))
    val got = JxCompiler.queryOn(spark, sfDir, """{
      "from":"bugs.lines",
      "where":{"gte":{"lines.l_quantity":45}},
      "select":["o_orderkey","lines.l_linenumber","lines.l_quantity"]}""",
      Map("bugs" -> nested))
    val want = o.join(li, $"o_orderkey" === $"l_orderkey")
      .where($"l_quantity" >= 45)
      .select($"o_orderkey", $"l_linenumber".as("lines.l_linenumber"),
        $"l_quantity".as("lines.l_quantity"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
    got.count() should be > 0L
  }

  test("nested-document from: struct descent then array explode, aggregated") {
    import org.apache.spark.sql.functions.{collect_list, struct}
    // two levels: a struct wrapper holding an inner document array
    val nested = li.groupBy($"l_orderkey")
      .agg(struct($"l_orderkey".as("id"),
        collect_list(struct($"l_quantity")).as("items")).as("doc"))
      .select($"doc")
    val got = JxCompiler.queryOn(spark, sfDir, """{
      "from":"t.doc.items",
      "groupby":["doc.id"],
      "select":[{"name":"n","aggregate":"count"},
                {"name":"qty","value":"doc.items.l_quantity","aggregate":"sum"}]}""",
      Map("t" -> nested))
    val want = li.groupBy($"l_orderkey".as("doc.id"))
      .agg(count(lit(1)).as("n"), util.dsum($"l_quantity", 4).as("qty"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("from a non-nested column errors loudly") {
    val e = intercept[IllegalArgumentException] {
      JxCompiler.query(spark, sfDir, """{"from":"orders.o_totalprice","select":["o_orderkey"]}""")
    }
    e.getMessage should include("not a nested document")
    val e2 = intercept[IllegalArgumentException] {
      JxCompiler.query(spark, sfDir, """{"from":"orders.nope","select":["o_orderkey"]}""")
    }
    e2.getMessage should include("no column")
  }

  test("format table: header + native-typed rows (reference transport shape)") {
    val got = run("""{"from":"events",
      "where":{"gte":{"value":90}},
      "groupby":["event_type"],
      "select":[{"name":"n","aggregate":"count"}],
      "format":"table"}""").collect()
    got.length shouldBe 1
    val header = got(0).getSeq[String](0)
    header shouldBe Seq("event_type", "n")
    // cells keep their native types: event_type stays a string, the
    // count stays a LONG (the r5 shape stringified every cell)
    val rows = got(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    val flat = run("""{"from":"events",
      "where":{"gte":{"value":90}},
      "groupby":["event_type"],
      "select":[{"name":"n","aggregate":"count"}]}""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.toSet shouldBe flat.toSet
  }

  test("format table honors the query's sort clause in row order") {
    val got = run("""{"from":"events",
      "where":{"gte":{"value":90}},
      "groupby":["event_type"],
      "select":[{"name":"n","aggregate":"count"}],
      "sort":[{"value":"n","sort":-1},{"value":"event_type","sort":1}],
      "format":"table"}""").collect()
    got.length shouldBe 1
    val rows = got(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    // the data array is IN sort order (n desc, type asc as tiebreak),
    // not canonical cell order — the list format is the reference
    val want = rows.sortBy { case (t, n) => (-n, t) }
    rows shouldBe want
    rows.size should be > 1 // order assertion is non-vacuous
  }

  test("cube format keeps null edge values aligned between domain and data arrays") {
    val src = Seq((Option("a"), 1L), (Option.empty[String], 2L),
      (Option("b"), 3L), (Option.empty[String], 4L)).toDF("k", "v")
    val got = JxCompiler.queryOn(spark, sfDir, """{
      "from":"t","edges":["k"],
      "select":[{"name":"n","aggregate":"count"}],
      "format":"cube"}""", Map("t" -> src)).collect()
    got.length shouldBe 1
    val dom = got(0).getSeq[String](got(0).fieldIndex("domain_k"))
    val n = got(0).getSeq[Long](got(0).fieldIndex("n"))
    dom.length shouldBe 3 // null, "a", "b" — null kept in the domain
    n.length shouldBe dom.length // aligned, not shifted
    dom.head shouldBe null // null sorts first, matching the pack order
    n(dom.indexOf("a")) shouldBe 1L
    n(dom.indexOf("b")) shouldBe 1L
  }

  test("named categorical edge works end-to-end, including cube format") {
    val got = run("""{"from":"events",
      "where":{"gte":{"value":90}},
      "edges":[{"name":"et","value":"event_type"}],
      "select":[{"name":"n","aggregate":"count"}],
      "format":"cube"}""").collect()
    got.length shouldBe 1
    val dom = got(0).getSeq[String](got(0).fieldIndex("domain_et"))
    dom.toSet shouldBe Tables.events(spark, sfDir).where($"value" >= 90)
      .select($"event_type").distinct().as[String].collect().toSet
    got(0).getSeq[Long](got(0).fieldIndex("n")).sum shouldBe
      Tables.events(spark, sfDir).where($"value" >= 90).count()
  }

  test("format cube: domains and data arrays align with the flat cell-complete form") {
    val cube = run(graft.operators.Jx.q57Json).collect()
    cube.length shouldBe 1
    val row = cube(0)
    val users = row.getSeq[Long](row.fieldIndex("domain_user_id"))
    val types = row.getSeq[String](row.fieldIndex("domain_event_type"))
    val nMat = row.getSeq[Seq[Long]](row.fieldIndex("n"))
    // Any, not Double: empty cells are null and must stay null
    val totalMat = row.getSeq[Seq[Any]](row.fieldIndex("total"))
    users shouldBe users.sorted
    types shouldBe types.sorted
    nMat.length shouldBe users.length
    nMat.head.length shouldBe types.length
    // every cell equals the flat (oracled q27-shaped) result
    val flat = run(graft.operators.Jx.q57Json.replace(""",
      |  "format": "cube"""".stripMargin, "")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Any]("total"))).toMap
    flat.size shouldBe users.length * types.length
    for (i <- users.indices; j <- types.indices) {
      val (fn, ft) = flat((users(i), types(j)))
      nMat(i)(j) shouldBe fn
      totalMat(i)(j) shouldBe ft
    }
  }

  // --- limited value domains: top-N + OTHER ---

  private def limited(df: org.apache.spark.sql.DataFrame, lim: Int) =
    JxCompiler.queryOn(spark, sfDir,
      s"""{"from":"t",
          "edges":[{"name":"cat","value":"v",
                    "domain":{"type":"default","limit":$lim}}],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap

  test("limited domain: top-N by count, overflow collapses into OTHER") {
    // a:3, b:2, c:1, d:1 — limit 2 keeps a and b; c+d land in OTHER
    val df = Seq("a", "a", "a", "b", "b", "c", "d").toDF("v")
    limited(df, 2) shouldBe Map(
      Some("a") -> 3L, Some("b") -> 2L, Some("OTHER") -> 2L)
  }

  test("limited domain: count ties break toward the smaller value") {
    // b:2, c:2, a:1 — limit 1 must pick b (count desc, value asc),
    // never c; a deterministic boundary is what makes the oracle
    // mirror (ROW_NUMBER ORDER BY n DESC, v ASC) exact
    val df = Seq("b", "b", "c", "c", "a").toDF("v")
    limited(df, 1) shouldBe Map(Some("b") -> 2L, Some("OTHER") -> 3L)
  }

  test("limited domain: null keeps its own partition, never counts toward top-N") {
    // null:3 outnumbers everything but must NOT occupy a top-N slot
    // nor fold into OTHER (allowNulls: missing-value is not a value)
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None, None)
      .map(v => Tuple1(v.orNull)).toDF("v")
    limited(df, 1) shouldBe Map(
      Some("a") -> 2L, Some("OTHER") -> 1L, None -> 3L)
  }

  test("limited domain: limit >= cardinality emits no OTHER cell") {
    val df = Seq("a", "a", "b").toDF("v")
    limited(df, 5) shouldBe Map(Some("a") -> 2L, Some("b") -> 1L)
  }

  test("limited domain crossed with a plain edge stays cell-complete") {
    // the limited axis (limit 1: keep a; b+c -> OTHER) crossed with
    // x/y must emit every (cat, k) cell, zero-filled where empty —
    // (OTHER, y) has no rows and must still appear with n=0
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "x"), ("c", "x"))
      .toDF("v", "k")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "edges":[{"name":"cat","value":"v",
                    "domain":{"type":"default","limit":1}},
                   "k"],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got shouldBe Map(
      ("a", "x") -> 2L, ("a", "y") -> 1L,
      ("OTHER", "x") -> 2L, ("OTHER", "y") -> 0L)
  }

  test("set domain: limit truncates the explicit partition list in author order") {
    val df = Seq("p", "q", "r", "p").toDF("v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "edges":[{"name":"cat","value":"v",
                    "domain":{"type":"set","partitions":["p","q","r"],"limit":2}}],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // r is truncated off the domain: its rows drop, its cell is gone
    got shouldBe Map("p" -> 2L, "q" -> 1L)
  }

  test("allowNulls false drops the null partition before sampling and aggregation") {
    val df = Seq(Some("a"), Some("a"), None, Some("b"), None)
      .map(v => Tuple1(v.orNull)).toDF("v")
    // default: null keeps its partition (pyLibrary allowNulls=true)
    val withNulls = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","edges":[{"name":"cat","value":"v"}],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    withNulls shouldBe Map(Some("a") -> 2L, Some("b") -> 1L, None -> 2L)
    // opt-out: null rows vanish from the axis entirely
    val noNulls = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","edges":[{"name":"cat","value":"v","allowNulls":false}],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    noNulls shouldBe Map(Some("a") -> 2L, Some("b") -> 1L)
    // composes with the limited domain: nulls neither rank nor remap
    val lim = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","edges":[{"name":"cat","value":"v","allowNulls":false,
          "domain":{"type":"default","limit":1}}],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    lim shouldBe Map(Some("a") -> 2L, Some("OTHER") -> 1L)
  }

  test("groupby on a computed expression: named bucket column groups and projects") {
    val got = run("""{"from":"lineitem",
      "groupby":[{"name":"qty_bin","value":{"mult":[{"floor":{"div":["l_quantity",10]}},{"literal":10}]}}],
      "select":[{"name":"n","aggregate":"count"}]}""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = li.groupBy((floor(col("l_quantity") / 10) * 10).as("qty_bin"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe want
    // default name when no explicit name: the value's field text
    val named = run("""{"from":"lineitem",
      "groupby":["l_returnflag", {"name":"rf2","value":"l_linestatus"}],
      "select":[{"name":"n","aggregate":"count"}]}""")
    named.columns.toSeq shouldBe Seq("l_returnflag", "rf2", "n")
  }

  test("eq/ne with a list value is pyLibrary's match-any sugar (IN / NOT IN)") {
    val inGot = run("""{"from":"lineitem",
      "where":{"eq":{"l_returnflag":["A","R"]}},
      "select":["l_orderkey"]}""").count()
    val inWant = li.where(col("l_returnflag").isin("A", "R")).count()
    inGot shouldBe inWant
    val neGot = run("""{"from":"lineitem",
      "where":{"ne":{"l_returnflag":["A","R"]}},
      "select":["l_orderkey"]}""").count()
    neGot shouldBe li.count() - inWant // returnflag is never null here
    // empty eq-list matches nothing; its negation matches everything
    run("""{"from":"lineitem","where":{"eq":{"l_returnflag":[]}},
      "select":["l_orderkey"]}""").count() shouldBe 0L
    run("""{"from":"lineitem","where":{"ne":{"l_returnflag":[]}},
      "select":["l_orderkey"]}""").count() shouldBe li.count()
  }

  test("predicate-partition set domain: ordered first-match-wins, absent cells zero-filled") {
    val df = Seq(5.0, 15.0, 25.0, 250.0).toDF("v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "edges":[{"name":"band","domain":{"type":"set","partitions":[
            {"name":"tiny","where":{"lt":{"v":10}}},
            {"name":"small","where":{"lt":{"v":100}}},
            {"name":"empty","where":{"gt":{"v":1000}}}]}}],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5 -> tiny (first match even though small also matches);
    // 15, 25 -> small; 250 matches NOTHING and drops;
    // "empty" is listed so its zero-filled cell must appear
    got shouldBe Map("tiny" -> 1L, "small" -> 2L, "empty" -> 0L)
  }

  test("predicate partitions mixed with plain values are rejected loudly") {
    val df = Seq(1.0).toDF("v")
    val e = intercept[IllegalArgumentException] {
      JxCompiler.queryOn(spark, sfDir,
        """{"from":"t",
            "edges":[{"name":"band","value":"v",
              "domain":{"type":"set","partitions":[
                {"name":"a","where":{"lt":{"v":10}}}, 5]}}],
            "select":[{"name":"n","aggregate":"count"}]}""",
        Map("t" -> df))
    }
    e.getMessage should include("ambiguous")
  }

  // --- range-bound window aggregates ---

  test("window range: trailing frame is half-open [min, max) around the current row") {
    // values 10,20,30,40 sorted by id; {"min":-1,"max":1} = previous
    // row + current row (max exclusive — the pyLibrary range
    // convention), so sums are 10, 30, 50, 70
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("id", "v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "window":[{"name":"s2","value":"v","aggregate":"sum",
                     "sort":["id"],"range":{"min":-1,"max":1}}],
          "select":["id","s2"]}""",
      Map("t" -> df))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got shouldBe Map(1L -> 10.0, 2L -> 30.0, 3L -> 50.0, 4L -> 70.0)
  }

  test("window range: forward frame and short-frame edges (partition boundaries)") {
    // {"min":0,"max":2} = current + next row; the last row's frame is
    // just itself — frames truncate at partition edges, never wrap
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 7.0), ("b", 1L, 9.0))
      .toDF("g", "id", "v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "window":[{"name":"mx","value":"v","aggregate":"maximum",
                     "edges":["g"],"sort":["id"],"range":{"min":0,"max":2}}],
          "select":["g","id","mx"]}""",
      Map("t" -> df))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got shouldBe Map(("a", 1L) -> 7.0, ("a", 2L) -> 7.0, ("b", 1L) -> 9.0)
  }

  test("window range: average divides the frame sum by the frame count") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 60.0)).toDF("id", "v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "window":[{"name":"a2","value":"v","aggregate":"average",
                     "sort":["id"],"range":{"min":-1,"max":1}}],
          "select":["id","a2"]}""",
      Map("t" -> df))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got shouldBe Map(1L -> 10.0, 2L -> 15.0, 3L -> 40.0)
  }

  test("window range without a sort clause is rejected, not silently unordered") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      JxCompiler.queryOn(spark, sfDir,
        """{"from":"t",
            "window":[{"name":"s","value":"v","aggregate":"sum",
                       "range":{"min":-1,"max":1}}],
            "select":["id","s"]}""",
        Map("t" -> df))
    }
    e.getMessage should include("sort")
  }

  test("limited domain: edge-level limit is accepted as domain-limit shorthand") {
    val df = Seq("a", "a", "b", "c").toDF("v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "edges":[{"name":"cat","value":"v","limit":1}],
          "select":[{"name":"n","aggregate":"count"}]}""",
      Map("t" -> df))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 2L, "OTHER" -> 2L)
  }

  // --- date/time scalar expressions (pyLibrary Date/Duration ops) ---

  private def tsDf = {
    import java.sql.Timestamp
    Seq(
      (1L, Some(Timestamp.valueOf("2024-01-15 12:00:00"))),
      (2L, Some(Timestamp.valueOf("2024-01-16 00:00:00"))),
      (3L, Option.empty[Timestamp])
    ).toDF("id", "t")
  }

  test("date_diff: seconds by default, exact double division with a unit") {
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"x",
          "select":["id",
            {"name":"age_s","value":{"date_diff":[{"date":"2024-01-17 00:00:00"},"t"]}},
            {"name":"age_d","value":{"date_diff":[{"date":"2024-01-17 00:00:00"},"t","day"]}}]}""",
      Map("x" -> tsDf))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    got(1L) shouldBe (Some(129600L), Some(1.5)) // 36 hours = 1.5 days, not 1
    got(2L) shouldBe (Some(86400L), Some(1.0))
    got(3L) shouldBe (None, None) // null timestamp propagates, never 0
  }

  test("date_add shifts by fixed-width units; floor truncates to calendar buckets") {
    import java.sql.Timestamp
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"x",
          "select":["id",
            {"name":"plus2h","value":{"date_add":["t",2,"hour"]}},
            {"name":"wk","value":{"floor":["t","week"]}},
            {"name":"mo","value":{"floor":["t","month"]}}]}""",
      Map("x" -> tsDf))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    got(1L) shouldBe (Some(Timestamp.valueOf("2024-01-15 14:00:00")),
      Some(Timestamp.valueOf("2024-01-15 00:00:00")), // Jan 15 2024 IS a Monday
      Some(Timestamp.valueOf("2024-01-01 00:00:00")))
    got(2L)._2 shouldBe Some(Timestamp.valueOf("2024-01-15 00:00:00"))
    got(3L) shouldBe (None, None, None) // nulls propagate through every op
  }

  test("unix + numeric date round-trip; date-literal bounds in comparisons") {
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"x",
          "where":{"gte":{"t":{"date":"2024-01-16 00:00:00"}}},
          "select":["id",{"name":"u","value":{"unix":"t"}},
            {"name":"rt","value":{"date":{"unix":"t"}}}]}""",
      Map("x" -> tsDf)).collect()
    got.map(_.getLong(0)).toSeq shouldBe Seq(2L) // null t never matches a bound
    // TZ-independent oracle for the unix value: Spark's own parse of
    // the same instant text under the session timezone
    val want = tsDf.sparkSession.range(1)
      .select(unix_timestamp(lit("2024-01-16 00:00:00"))).head().getLong(0)
    got(0).getLong(1) shouldBe want
    // unix → date round-trips to the same (second-resolution) instant
    got(0).getTimestamp(2) shouldBe java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
  }

  test("jx duration units are fixed-width only: month is rejected with guidance") {
    val e = intercept[IllegalArgumentException] {
      JxCompiler.queryOn(spark, sfDir,
        """{"from":"x","select":[{"name":"d","value":{"date_diff":["t","t","month"]}}]}""",
        Map("x" -> tsDf))
    }
    e.getMessage should include("floor")
  }

  // --- ne missing-value semantics (pyLibrary: missing is NOT any value) ---

  test("ne matches missing docs: scalar, list, and expression-pair forms") {
    val df = Seq(Some("a"), Some("b"), None).toDF("f")
    def n(json: String): Long =
      JxCompiler.queryOn(spark, sfDir, json, Map("t" -> df)).count()
    // scalar: b and null both differ from "a"
    n("""{"from":"t","where":{"ne":{"f":"a"}},"select":["f"]}""") shouldBe 2L
    // list sugar: only null survives ne-[a,b] ... plus nothing else
    n("""{"from":"t","where":{"ne":{"f":["a","b"]}},"select":["f"]}""") shouldBe 1L
    // empty list: everything survives (consistent with the above)
    n("""{"from":"t","where":{"ne":{"f":[]}},"select":["f"]}""") shouldBe 3L
    // expression-pair form is null-safe the same way
    n("""{"from":"t","where":{"ne":["f",{"literal":"a"}]},"select":["f"]}""") shouldBe 2L
  }

  // --- window hardening ---

  test("window partitioned by a computed edge and by a time-domain edge") {
    import java.sql.Timestamp
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-15 01:00:00"), 10.0),
      (2L, Timestamp.valueOf("2024-01-15 23:00:00"), 20.0),
      (3L, Timestamp.valueOf("2024-01-16 05:00:00"), 40.0)
    ).toDF("id", "t", "v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"x",
          "window":[
            {"name":"day_sum","value":"v","aggregate":"sum",
             "edges":[{"name":"day","value":"t",
                       "domain":{"type":"time","interval":"day"}}]},
            {"name":"bucket_n","aggregate":"count",
             "edges":[{"name":"b","value":{"floor":{"div":["v",15]}}}]}],
          "select":["id","day_sum","bucket_n"]}""",
      Map("x" -> df))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // day partitions: {10,20} on the 15th, {40} on the 16th
    // floor(v/15) buckets: 10->0, 20->1, 40->2
    got shouldBe Map(1L -> (30.0, 1L), 2L -> (30.0, 1L), 3L -> (40.0, 1L))
  }

  test("unsorted window aggregate spans the whole partition (share-of-group shape)") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("g", "v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "window":[{"name":"tot","value":"v","aggregate":"sum","edges":["g"]}],
          "select":["g","v","tot"]}""",
      Map("t" -> df))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    got shouldBe Map(("a", 1.0) -> 4.0, ("a", 3.0) -> 4.0, ("b", 5.0) -> 5.0)
  }

  test("range on a rownum/rank window is rejected loudly, not silently ignored") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      JxCompiler.queryOn(spark, sfDir,
        """{"from":"t",
            "window":[{"name":"rk","aggregate":"rownum","sort":["id"],
                       "range":{"min":-1,"max":1}}],
            "select":["id","rk"]}""",
        Map("t" -> df))
    }
    e.getMessage should include("meaningless")
    // and rownum without any sort is nondeterministic — also rejected
    val e2 = intercept[IllegalArgumentException] {
      JxCompiler.queryOn(spark, sfDir,
        """{"from":"t","window":[{"name":"rk","aggregate":"rownum"}],
            "select":["id","rk"]}""",
        Map("t" -> df))
    }
    e2.getMessage should include("sort")
  }

  // --- toTable contract enforcement + unorderable cells ---

  test("format table: aggregate-sized contract is enforced, not advisory") {
    spark.conf.set("graft.jx.tableMaxRows", "3")
    try {
      val e = intercept[Exception] {
        run("""{"from":"lineitem","select":["l_orderkey"],"format":"table"}""")
          .collect()
      }
      // the guard message may sit anywhere in the failure cause chain
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      chain should include("tableMaxRows")
      // within bounds the same query shape still delivers
      run("""{"from":"lineitem","select":["l_orderkey"],"limit":3,"format":"table"}""")
        .collect()(0).getSeq[org.apache.spark.sql.Row](1).size shouldBe 3
    } finally spark.conf.unset("graft.jx.tableMaxRows")
  }

  test("format table: unorderable cells (maps) survive the canonical sort") {
    val df = Seq(("b", Map("k" -> 2)), ("a", Map("k" -> 1))).toDF("g", "m")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","select":["g","m"],"format":"table"}""", Map("t" -> df))
      .collect()
    got.length shouldBe 1
    // canonical (unsorted-query) order is by row JSON: "a" first
    val rows = got(0).getSeq[org.apache.spark.sql.Row](1)
    rows.map(_.getString(0)) shouldBe Seq("a", "b")
    rows.map(_.getMap[String, Int](1)("k")) shouldBe Seq(1, 2)
  }

  test("unnamed computed groupby terms are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"lineitem",
        "groupby":[{"value":{"floor":{"div":["l_quantity",10]}}}],
        "select":[{"name":"n","aggregate":"count"}]}""")
    }
    e.getMessage should include("name")
  }

  test("query pipelining flattens into one plan: a single aggregation exchange") {
    // the nested-from HAVING idiom must NOT introduce a
    // materialization boundary — Catalyst fuses both query levels,
    // so the only exchange is the inner groupBy's shuffle
    val df = run(graft.operators.Jx.q102Json)
    val plan = df.queryExecution.executedPlan.toString
    "Exchange [a-z]*hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }

  test("window median: exact partition median — odd, even, null-skipping, all-null") {
    val df = Seq[(String, java.lang.Double)](
      ("odd", 1d), ("odd", 9d), ("odd", 5d), // median 5
      ("even", 1d), ("even", 2d), ("even", 10d), ("even", 20d), // (2+10)/2 = 6
      ("nulls", 3d), ("nulls", null), ("nulls", 7d), // nulls skip → (3+7)/2 = 5
      ("allnull", null), ("allnull", null) // no values → null
    ).toDF("g", "v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t",
          "window":[{"name":"med","value":"v","aggregate":"median","edges":["g"]}],
          "select":["g","med"]}""",
      Map("t" -> df))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    got shouldBe Map("odd" -> Some(5.0), "even" -> Some(6.0),
      "nulls" -> Some(5.0), "allnull" -> None)
  }

  test("window median rejects sort and range frames loudly") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      JxCompiler.queryOn(spark, sfDir,
        """{"from":"t",
            "window":[{"name":"m","value":"v","aggregate":"median",
                       "edges":["g"],"sort":["v"]}],
            "select":["g","m"]}""",
        Map("t" -> df))
    }
    e.getMessage should include("running median")
    val e2 = intercept[IllegalArgumentException] {
      JxCompiler.queryOn(spark, sfDir,
        """{"from":"t",
            "window":[{"name":"m","value":"v","aggregate":"median",
                       "edges":["g"],"range":{"min":-1,"max":1}}],
            "select":["g","m"]}""",
        Map("t" -> df))
    }
    e2.getMessage should include("whole-partition")
  }

  test("variance/std aggregates: sample moments, nulls skipped") {
    // 2,4,4,4,5,5,7,9: Σx=40, Σx²=232, n=8 → var = (232−200)/7 = 32/7;
    // the null row must not count toward n or the sums
    val df = Seq[java.lang.Double](2d, 4d, 4d, 4d, 5d, 5d, 7d, 9d, null)
      .map(Tuple1(_)).toDF("x").withColumn("g", lit("a"))
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","groupby":["g"],
          "select":[{"name":"v","value":"x","aggregate":"variance"},
                    {"name":"s","value":"x","aggregate":"std"}]}""",
      Map("t" -> df)).collect()(0)
    // outputs are quantized to DECIMAL(18,4) (engine float policy):
    // var = 32/7 = 4.571428… → 4.5714, std = 2.138094… → 2.1381
    got.getDouble(1) shouldBe 4.5714 +- 1e-12
    got.getDouble(2) shouldBe 2.1381 +- 1e-12
  }

  test("format nested: dotted select names re-assemble into documents") {
    val got = run("""{"from":"orders",
      "where":{"lt":{"o_orderkey":100}},
      "select":[{"name":"key","value":"o_orderkey"},
                {"name":"cust.id","value":"o_custkey"},
                {"name":"cust.status","value":"o_orderstatus"},
                {"name":"cust.order.priority","value":"o_orderpriority"}],
      "format":"nested"}""")
    got.columns.toSeq shouldBe Seq("key", "cust")
    got.schema("cust").dataType match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fieldNames.toSeq shouldBe Seq("id", "status", "order")
        s("order").dataType match {
          case inner: org.apache.spark.sql.types.StructType =>
            inner.fieldNames.toSeq shouldBe Seq("priority")
          case other => fail(s"order is not a struct: $other")
        }
      case other => fail(s"cust is not a struct: $other")
    }
    val want = Tables.orders(spark, sfDir).where(col("o_orderkey") < 100)
      .select(col("o_orderkey").as("key"),
        struct(col("o_custkey").as("id"), col("o_orderstatus").as("status"),
          struct(col("o_orderpriority").as("priority")).as("order")).as("cust"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("format nested round-trips the nested-from flattening losslessly") {
    // descend into stored nested documents (flattens to dot-names),
    // then re-nest at the boundary: the inner document must come back
    // as a struct with the original leaf names
    val nested = graft.operators.Jx.storedNestedOrders(spark, sfDir)
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"bugs.lines",
        "where":{"gte":{"lines.l_quantity":45}},
        "select":["o_orderkey","lines.l_linenumber","lines.l_quantity"],
        "format":"nested"}""",
      Map("bugs" -> nested))
    got.columns.toSeq shouldBe Seq("o_orderkey", "lines")
    val want = nested
      .select(col("o_orderkey"), explode(col("lines")).as("l"))
      .where(col("l.l_quantity") >= 45)
      .select(col("o_orderkey"),
        struct(col("l.l_linenumber").as("l_linenumber"),
          col("l.l_quantity").as("l_quantity")).as("lines"))
    got.except(want).count() shouldBe 0L
    want.except(got).count() shouldBe 0L
  }

  test("format nested rejects a name that is both leaf and prefix") {
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"orders",
        "select":[{"name":"a","value":"o_orderkey"},
                  {"name":"a.b","value":"o_custkey"}],
        "format":"nested"}""").schema
    }
    e.getMessage should include("both a leaf column and a nested prefix")
  }

  test("select leaves: deep leaf expansion, and leaves ∘ nested = identity") {
    // leaves over struct columns: recursively dot-named
    val got = run("""{
      "from": {"from":"orders", "where":{"lt":{"o_orderkey":100}},
        "select":[{"name":"key","value":"o_orderkey"},
                  {"name":"cust.id","value":"o_custkey"},
                  {"name":"cust.order.priority","value":"o_orderpriority"}],
        "format":"nested"},
      "select": "leaves"}""")
    got.columns.toSeq shouldBe Seq("key", "cust.id", "cust.order.priority")
    val want = Tables.orders(spark, sfDir).where(col("o_orderkey") < 100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .as[(Long, Long, String)].collect().toSet
    got.as[(Long, Long, String)].collect().toSet shouldBe want
    // on an already-flat record, leaves is the identity projection
    val flat = run("""{"from":"orders","where":{"lt":{"o_orderkey":100}},"select":"leaves"}""")
    flat.columns.toSeq shouldBe Tables.orders(spark, sfDir).columns.toSeq
    // 'leaves' does not combine with other select terms
    val e = intercept[IllegalArgumentException] {
      run("""{"from":"orders","select":["leaves","o_orderkey"]}""").schema
    }
    e.getMessage should include("selects every leaf")
  }

  test("escaped dotted names address literal dotted keys; from still splits on real dots") {
    // a record whose KEY literally contains a dot — pyLibrary's a\.b
    val weird = Seq((1L, "x"), (2L, "y")).toDF("bug.id", "status")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"weird",
        "where":{"eq":{"bug\\.id":2}},
        "select":[{"name":"renamed","value":"bug\\.id"},"status"]}""",
      Map("weird" -> weird))
    got.as[(Long, String)].collect().toSeq shouldBe Seq((2L, "y"))
    // unescaped form addresses the same flat column (the record
    // bridge names descended paths and literal dotted keys alike)
    JxCompiler.queryOn(spark, sfDir,
      """{"from":"weird","where":{"eq":{"bug.id":1}},"select":["status"]}""",
      Map("weird" -> weird))
      .as[String].collect().toSeq shouldBe Seq("x")
  }

  test("list aggregate: duplicates preserved (vs union's set), emitted sorted") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 1L), ("b", 3L))
      .toDF("k", "v")
    val got = JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","groupby":["k"],
        "select":[{"name":"vals","aggregate":"list","value":"v"},
                  {"name":"set","aggregate":"union","value":"v"}],
        "sort":["k"]}""",
      Map("t" -> df))
      .as[(String, Seq[Long], Seq[Long])].collect().toSeq
    got shouldBe Seq(
      ("a", Seq(1L, 1L, 2L), Seq(1L, 2L)), // list keeps the dup, union drops it
      ("b", Seq(3L), Seq(3L)))
    // layout-independence: a different partitioning yields the same lists
    JxCompiler.queryOn(spark, sfDir,
      """{"from":"t","groupby":["k"],
        "select":[{"name":"vals","aggregate":"list","value":"v"}],
        "sort":["k"]}""",
      Map("t" -> df.repartition(7)))
      .as[(String, Seq[Long])].collect().toSeq shouldBe Seq(
      ("a", Seq(1L, 1L, 2L)), ("b", Seq(3L)))
  }
}
