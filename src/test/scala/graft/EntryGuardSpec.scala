package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-contract surface itself (no SparkSession needed —
  * building the maps is pure). Round-8 lesson: a throwing query silently
  * shrank the correctness board from 142 to 141 declared entries; these
  * asserts make any change to the board an explicit, test-visible act.
  */
class EntryGuardSpec extends AnyFunSuite {

  test("queries.size equals the declared board size") {
    assert(SparkEntry.queries.size === SparkEntry.declaredQueryCount,
      s"query surface changed: update SparkEntry.declaredQueryCount " +
        s"(found ${SparkEntry.queries.size})")
  }

  test("oracleSql keys + rowsOnlyQueries exactly partition queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val r = SparkEntry.rowsOnlyQueries
    assert((o & r) === Set.empty[String],
      "a query cannot be both oracle-checked and rows-only")
    assert((o | r) === q,
      s"unaccounted queries (no oracle, not declared rows-only): ${(q -- o -- r).toSeq.sorted}; " +
        s"orphan oracle/rows-only entries: ${((o | r) -- q).toSeq.sorted}")
  }

  test("per-module query maps do not shadow each other's keys") {
    import graft.queries._
    val maps = Seq(
      "QRelational" -> QRelational.queries, "QWindows" -> QWindows.queries,
      "QSampling" -> QSampling.queries, "QScalars" -> QScalars.queries,
      "QEvents" -> QEvents.queries, "QText" -> QText.queries,
      "QVectors" -> QVectors.queries, "QMultimodal" -> QMultimodal.queries,
      "QSources" -> QSources.queries)
    val perModule = maps.map(_._2.size).sum
    assert(perModule === SparkEntry.queries.size,
      "duplicate query keys across modules: the ++ union dropped " +
        s"${perModule - SparkEntry.queries.size} entries")
  }
}
