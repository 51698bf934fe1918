package graft.operators

import graft.{Q, QueryPack}
import graft.jx.JxCompiler

/** The jx query-language entry: q26 runs a representative jx JSON
  * document (filter + group-by + aggregates + sort) through the
  * compiler. More operator combinations are covered by JxSpec.
  */
object Jx extends QueryPack {

  val q26Json: String =
    """{
      |  "from": "lineitem",
      |  "where": {"and": [
      |    {"gte": {"l_quantity": 10}},
      |    {"in": {"l_returnflag": ["A", "R"]}},
      |    {"not": {"eq": {"l_linestatus": "X"}}}
      |  ]},
      |  "groupby": ["l_returnflag", "l_linestatus"],
      |  "select": [
      |    {"name": "n", "aggregate": "count"},
      |    {"name": "qty", "value": "l_quantity", "aggregate": "sum"},
      |    {"name": "avg_price", "value": "l_extendedprice", "aggregate": "average"},
      |    {"name": "max_disc", "value": "l_discount", "aggregate": "maximum"},
      |    {"name": "n_parts", "value": "l_partkey", "aggregate": "cardinality"}
      |  ]
      |}""".stripMargin

  val q26 = Q(
    "q26_jx_query",
    (s, d) => JxCompiler.query(s, d, q26Json),
    Some("""SELECT l_returnflag, l_linestatus,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           |  MAX(l_discount) AS max_disc,
           |  COUNT(DISTINCT l_partkey) AS n_parts
           |FROM lineitem
           |WHERE l_quantity >= 10 AND l_returnflag IN ('A', 'R')
           |  AND NOT l_linestatus = 'X'
           |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    "jx JSON query (where/groupby/select aggregates) through the compiler")

  val all: Seq[Q] = Seq(q26)
}
