package graft

/** The driver contract around SparkEntry: every declared query must carry a
  * DuckDB oracle (a query without one silently downgrades to a rows-only
  * check), names must be unique across groups, and the flagship entry must
  * return rows.
  */
class EntryContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across groups (no silent map override)") {
    val groups: Seq[(String, Set[String])] = Seq(
      "tpch" -> graft.queries.Tpch.queries.keySet,
      "windows" -> graft.queries.Windows.sql.keySet,
      "relational" -> (graft.queries.Relational.sql.keySet ++
        graft.queries.Relational.sparkSql.keySet),
      "llm" -> graft.queries.Llm.queries.keySet,
      "io" -> graft.queries.Io.queries.keySet,
      "ops" -> graft.queries.Ops.queries.keySet)
    for {
      (ga, a) <- groups; (gb, b) <- groups if ga < gb
    } assert((a & b).isEmpty, s"$ga and $gb both declare: ${(a & b).toSeq.sorted}")
  }

  // A duplicate key inside ONE Map literal is invisible at runtime (the
  // later entry silently wins — exactly how a second ts_gap_fill shadowed
  // the first during round 10), so this gate scans the SOURCE: each
  // declared name may appear as a map key at most twice across the query
  // files (once in `queries`, once in the oracle map).
  test("no entry name is declared more than twice in the query sources") {
    val dir = new java.io.File("src/main/scala/graft/queries")
    val text = dir.listFiles.filter(_.getName.endsWith(".scala"))
      .map(f => new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .mkString("\n")
    val offenders = SparkEntry.queries.keySet.toSeq.sorted.flatMap { name =>
      val n = ("\"" + java.util.regex.Pattern.quote(name) + "\"\\s*->").r
        .findAllIn(text).size
      if (n > 2) Some(s"$name declared $n times") else None
    }
    assert(offenders.isEmpty, offenders.mkString(", "))
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).collect().length > 0)
  }

  // The driver's pandas comparator sort_values()s every output column and
  // cannot order numpy arrays ("unhashable type" — round-4 verdict, the
  // llm_normalize red row). The local check.py normalizes Python lists, so
  // without this gate an array-typed entry passes locally and fails the
  // driver. Declared outputs must be scalar columns, full stop.
  test("no declared query outputs an array/map/struct column") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sfSmoke).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"driver comparator cannot sort complex columns: ${offenders.mkString(", ")}")
  }
}
