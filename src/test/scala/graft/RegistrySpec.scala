package graft

/** Driver-contract invariants over the query registry itself — the drift
  * insurance the gate cannot give (a silently shadowed name or a gate row
  * without an oracle would surface as a confusing driver artifact, not a
  * compile error). */
class RegistrySpec extends SparkSpec {

  test("query names are unique across all modules") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate QueryDef names: $dups")
  }

  test("every gate query carries an oracle (rows-only rows read as permanent errors)") {
    val bare = SparkEntry.allDefs.filter(d => d.gate && d.oracle.isEmpty).map(_.name)
    assert(bare.isEmpty, s"gate rows without oracle: $bare")
  }

  test("queries/oracleSql maps are consistent projections of allDefs") {
    val defs = SparkEntry.allDefs
    assert(SparkEntry.queries.keySet == defs.filter(_.gate).map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet == defs.filter(_.oracle.nonEmpty).map(_.name).toSet)
    // the driver smoke-checks entry() for rows
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("headline (benched) queries build against sf0.001 without error") {
    // a broken headline would otherwise first surface in the driver's
    // BENCH artifact as a 'failed' row
    SparkEntry.allDefs.filter(_.headline).foreach { d =>
      assert(d.build(spark, sf0001).columns.nonEmpty, d.name)
    }
  }
}
