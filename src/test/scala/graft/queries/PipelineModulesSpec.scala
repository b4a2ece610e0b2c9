package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The Pipeline module split's composition contract: the three module
  * maps are pairwise disjoint (a name claimed twice would silently
  * shadow one implementation in the ++ composition) and every oracle
  * belongs to its own module's query map (an oracle landing in the
  * wrong module would still compose, but the module boundary would be
  * a lie). Pure map algebra — no SparkSession.
  */
class PipelineModulesSpec extends AnyFunSuite {

  test("module query maps are pairwise disjoint and compose to Pipeline.queries") {
    val d = Pipeline.dedupQueries.keySet
    val a = Pipeline.annQueries.keySet
    val m = Pipeline.mediaQueries.keySet
    assert((d & a).isEmpty, s"dedup/ann overlap: ${d & a}")
    assert((d & m).isEmpty, s"dedup/media overlap: ${d & m}")
    assert((a & m).isEmpty, s"ann/media overlap: ${a & m}")
    assert(Pipeline.queries.keySet == (d ++ a ++ m))
  }

  test("every module oracle names a query in its OWN module") {
    assert((Pipeline.dedupOracles.keySet -- Pipeline.dedupQueries.keySet).isEmpty)
    assert((Pipeline.annOracles.keySet -- Pipeline.annQueries.keySet).isEmpty)
    assert((Pipeline.mediaOracles.keySet -- Pipeline.mediaQueries.keySet).isEmpty)
  }
}
