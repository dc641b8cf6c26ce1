package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Nested-type operators: struct construction/field access, map
  * construction/lookup, and the array algebra beyond HOFs — the rest of the
  * complex-type surface (the reference's p4 struct columns are the §1.4
  * analog; these queries prove the machinery cross-engine through nested
  * parquet output).
  */
object NestedTypes {

  val defs: Seq[QueryDef] = Seq(

    // ---- q57: struct columns through the sink ------------------------------
    // Structs are built, then every gate column is read *back out of* the
    // struct (field access proves the machinery) — the gate output itself is
    // flat scalars, because the driver's pandas-based checker cannot sort
    // dict-valued columns. NestedTypesSpec covers the struct-through-parquet
    // round-trip that used to be emitted here.
    QueryDef(
      "q57_struct_ops",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderkey" <= 200)
          .select($"o_orderkey",
            struct($"o_custkey".as("cust"), $"o_totalprice".as("price"),
              $"o_orderpriority".as("prio")).as("o"),
            struct($"o_orderstatus".as("st"),
              year($"o_orderdate").as("yr")).as("meta"))
          .select($"o_orderkey",
            $"o.cust".as("cust"), $"o.price".as("price"), $"o.prio".as("prio"),
            $"meta.st".as("st"), $"meta.yr".as("yr"),
            ($"o.price" > 100000).as("pricey"))
          .orderBy($"o_orderkey")
      },
      Some("""WITH t AS (
             |  SELECT o_orderkey,
             |    struct_pack(cust := o_custkey, price := o_totalprice, prio := o_orderpriority) AS o,
             |    struct_pack(st := o_orderstatus, yr := CAST(year(o_orderdate) AS INT)) AS meta
             |  FROM orders WHERE o_orderkey <= 200)
             |SELECT o_orderkey,
             |  o.cust AS cust, o.price AS price, o.prio AS prio,
             |  meta.st AS st, meta.yr AS yr,
             |  o.price > 100000 AS pricey
             |FROM t ORDER BY o_orderkey""".stripMargin)),

    // ---- q58: map construction + lookup ------------------------------------
    // Maps are built from entries and read back by key; emitted as sorted
    // entry arrays (map column order is undefined in parquet, so the
    // deterministic form is the sorted entry list).
    QueryDef(
      "q58_map_ops",
      (s, d) => {
        import s.implicits._
        val m = map_from_entries(array(
          struct(lit("status").as("key"), $"o_orderstatus".as("value")),
          struct(lit("prio").as("key"), $"o_orderpriority".as("value"))))
        Tables.orders(s, d)
          .filter($"o_orderkey" <= 200)
          .select($"o_orderkey", m.as("m"))
          .select($"o_orderkey",
            element_at($"m", "status").as("status"),
            element_at($"m", "prio").as("prio"),
            size($"m").as("m_size"),
            array_join(sort_array(map_keys($"m")), ",").as("keys_sorted"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  o_orderstatus AS status,
             |  o_orderpriority AS prio,
             |  2 AS m_size,
             |  'prio,status' AS keys_sorted
             |FROM orders WHERE o_orderkey <= 200
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- q59: array algebra beyond HOFs ------------------------------------
    QueryDef(
      "q59_array_algebra",
      (s, d) => {
        import s.implicits._
        val a = slice($"embedding", 1, 4)
        val b = slice($"embedding", 3, 4)
        Tables.embeddings(s, d)
          .filter($"vec_id" < 200)
          .select($"vec_id",
            size(array_union(a, b)).as("n_union"),
            size(array_intersect(a, b)).as("n_inter"),
            size(array_except(a, b)).as("n_except"),
            arrays_overlap(a, b).as("overlaps"),
            size(flatten(array(a, b))).as("n_flat"),
            size(array_remove(a, element_at($"embedding", 1))).as("n_removed"),
            array_contains(a, element_at($"embedding", 2)).as("has_second"))
          .orderBy($"vec_id")
      },
      Some("""WITH t AS (
             |  SELECT vec_id, embedding[1:4] AS a, embedding[3:6] AS b, embedding AS e
             |  FROM embeddings WHERE vec_id < 200)
             |SELECT vec_id,
             |  len(list_distinct(list_concat(a, b))) AS n_union,
             |  len(list_intersect(a, b)) AS n_inter,
             |  len(list_filter(list_distinct(a), x -> NOT list_contains(b, x))) AS n_except,
             |  len(list_intersect(a, b)) > 0 AS overlaps,
             |  len(a) + len(b) AS n_flat,
             |  len(list_filter(a, x -> x != e[1])) AS n_removed,
             |  list_contains(a, e[2]) AS has_second
             |FROM t ORDER BY vec_id""".stripMargin)),
  )
}
