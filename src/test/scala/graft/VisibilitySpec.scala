package graft

import graft.functions.VisibilityCheck
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the Accumulo-style visibility-expression evaluator —
  * precedence, grouping, fail-closed behavior, and the SQL surface. */
class VisibilitySpec extends AnyFunSuite {
  private def chk(vis: String, auths: String): Boolean =
    VisibilityCheck.check(UTF8String.fromString(vis), UTF8String.fromString(auths))

  test("single labels and empty expression") {
    assert(chk("public", "public"))
    assert(!chk("pii", "public"))
    assert(chk("", "anything")) // empty = visible to all
    assert(chk("   ", ""))
    assert(!chk("public", "")) // no auths held
  }

  test("& requires all, | requires any") {
    assert(chk("a&b", "a,b"))
    assert(!chk("a&b", "a"))
    assert(chk("a|b", "b"))
    assert(!chk("a|b", "c"))
  }

  test("& binds tighter than | and parens regroup") {
    // a|b&c parses as a|(b&c)
    assert(chk("a|b&c", "a"))
    assert(!chk("a|b&c", "b"))
    assert(chk("a|b&c", "b,c"))
    // (a|b)&c
    assert(!chk("(a|b)&c", "a"))
    assert(chk("(a|b)&c", "a,c"))
    assert(chk("((a))", "a"))
    assert(chk("(pii&admin)|public", "public"))
    assert(!chk("(pii&admin)|restricted", "public,internal"))
  }

  test("auth parsing trims and ignores empties") {
    assert(chk("a&b", " a , b ,"))
    assert(chk("label-1.x_2", "label-1.x_2"))
  }

  test("malformed expressions fail closed with an error") {
    intercept[IllegalArgumentException](chk("(a", "a"))
    intercept[IllegalArgumentException](chk("a&", "a"))
    intercept[IllegalArgumentException](chk("a b", "a"))
    intercept[IllegalArgumentException](chk("&a", "a"))
  }

  test("parser agrees with direct AST evaluation on 500 random expressions") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic replay
    val labels = Vector("a", "b", "c", "d", "e")
    sealed trait N
    case class L(s: String) extends N
    case class And(l: N, r: N) extends N
    case class Or(l: N, r: N) extends N
    def gen(depth: Int): N =
      if (depth == 0 || rnd.nextInt(3) == 0) L(labels(rnd.nextInt(labels.size)))
      else if (rnd.nextBoolean()) And(gen(depth - 1), gen(depth - 1))
      else Or(gen(depth - 1), gen(depth - 1))
    // precedence-correct rendering: an Or child under And needs parens
    def renderAndChild(n: N): String = n match {
      case Or(_, _) => s"(${render(n)})"
      case other => render(other)
    }
    def render(n: N): String = n match {
      case L(s) => s
      case And(l, r) => s"${renderAndChild(l)}&${renderAndChild(r)}"
      case Or(l, r) => s"${render(l)}|${render(r)}"
    }
    def eval(n: N, held: Set[String]): Boolean = n match {
      case L(s) => held(s)
      case And(l, r) => eval(l, held) && eval(r, held)
      case Or(l, r) => eval(l, held) || eval(r, held)
    }
    (1 to 500).foreach { _ =>
      val ast = gen(4)
      val held = labels.filter(_ => rnd.nextBoolean()).toSet
      val s = render(ast)
      assert(chk(s, held.mkString(",")) == eval(ast, held),
        s"expression '$s' with auths $held")
    }
  }

  test("SQL surface: vis_check inside whole-stage codegen") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("public", true), ("pii&internal", false),
      ("pii|internal", true), ("(pii&admin)|public", true))
      .toDF("vis", "want")
    val got = df.selectExpr("want", "vis_check(vis, 'public,internal') AS got")
    assert(got.filter($"want" =!= $"got").count() == 0)
  }
}
