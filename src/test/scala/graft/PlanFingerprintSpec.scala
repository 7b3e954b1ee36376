package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fingerprint must be invariant to every globally-counted token a
  * plan string carries — expression ids, plan ids, codegen stage ids,
  * lambda-variable numbers — or hashes churn when an unrelated query is
  * registered and cross-round plan attribution breaks.
  */
class PlanFingerprintSpec extends AnyFunSuite {

  test("normalize strips expression ids, paths, and JVM lambda identities") {
    val a = PlanFingerprint.normalize(
      "Project [l_orderkey#12L, transform(v#3, lambdafunction((lambda x_15#44 / nrm#9), lambda x_15#44, false))] " +
        "FileScan parquet [file:/root/testdata/sf0.001/lineitem.parquet] " +
        "graft.ext.Multimodal$$Lambda$1234/0x00007f3@6b3e2a41")
    val b = PlanFingerprint.normalize(
      "Project [l_orderkey#98L, transform(v#7, lambdafunction((lambda x_63#21 / nrm#2), lambda x_63#21, false))] " +
        "FileScan parquet [file:/tmp/other/lineitem.parquet] " +
        "graft.ext.Multimodal$$Lambda$77/0x00001aa@99ffee00")
    assert(a == b, s"normalization not invariant:\n$a\n$b")
  }

  test("skeleton keeps tree shape, drops codegen stage ids") {
    val skel = PlanFingerprint.skeleton(
      """*(3) HashAggregate(keys=[k#1], functions=[sum(v#2)])
        |+- Exchange hashpartitioning(k#1, 4)
        |   +- *(1) HashAggregate(keys=[k#1], functions=[partial_sum(v#2)])""".stripMargin)
    assert(skel == Seq("HashAggregate", "+- Exchange", "   +- HashAggregate"))
  }
}
