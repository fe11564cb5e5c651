package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class PathMatcherSpec extends AnyFunSuite {

  test("path validation rejects empty tokens") {
    assert(PathMatcher.isValidPath("/time/from"))
    assert(!PathMatcher.isValidPath("/time//from"))
    assert(!PathMatcher.isValidPath(""))
    assert(!PathMatcher.isValidPath("time/from"))
  }

  test("exact template match with parameters") {
    assert(PathMatcher.matches("/time/from", "/time/from"))
    assert(PathMatcher.matches("/weekSchedule/%{day}/start", "/weekSchedule/2/start"))
    assert(!PathMatcher.matches("/weekSchedule/%{day}/start", "/weekSchedule/2/stop"))
    assert(!PathMatcher.matches("/weekSchedule/%{day}/start", "/weekSchedule/2"))
    assert(!PathMatcher.matches("/time/from", "/time/from/extra"))
  }

  test("object aggregation matches parent level") {
    assert(PathMatcher.matchesParentLevel("/string", "/"))
    assert(PathMatcher.matchesParentLevel("/a/%{p}/leaf", "/a/x"))
    assert(!PathMatcher.matchesParentLevel("/a/%{p}/leaf", "/a/x/leaf"))
  }

  test("resolve picks the right fixture mapping") {
    import AstarteValueType._
    val mappings = Seq(
      Mapping("com.test.LCDMonitor", 1, "/time/from", ALongInteger),
      Mapping("com.test.LCDMonitor", 1, "/time/to", ALongInteger),
      Mapping("com.test.LCDMonitor", 1, "/weekSchedule/%{day}/start", ALongInteger),
      Mapping("com.test.LCDMonitor", 1, "/weekSchedule/%{day}/stop", ALongInteger),
      Mapping("com.test.LCDMonitor", 1, "/lcdCommand", AString))
    val r = PathMatcher.resolve(mappings, Aggregation.Individual, "/weekSchedule/9/start")
    assert(r.exists(_.endpoint == "/weekSchedule/%{day}/start"))
    assert(PathMatcher.resolve(mappings, Aggregation.Individual, "/nope").isEmpty)
    assert(PathMatcher.resolve(mappings, Aggregation.Individual, "/time//from").isEmpty)
  }

  test("bindings extraction") {
    assert(PathMatcher.bindings("/weekSchedule/%{day}/start", "/weekSchedule/7/start")
      == Map("day" -> "7"))
  }

  test("trigger path pattern: empty tokens are wildcards, count exact") {
    assert(PathMatcher.triggerPathMatches("/weekSchedule//start", "/weekSchedule/3/start"))
    assert(!PathMatcher.triggerPathMatches("/weekSchedule//start", "/weekSchedule/3/stop"))
    assert(!PathMatcher.triggerPathMatches("/weekSchedule//start", "/weekSchedule/3/4/start"))
    assert(PathMatcher.triggerPathMatches("/time/from", "/time/from"))
  }

  test("property: a template always matches its own instantiation") {
    val token = Gen.alphaNumStr.suchThat(_.nonEmpty)
    val tmplGen = Gen.listOfN(3, Gen.oneOf(token, Gen.const("%{p}")))
      .map(ts => "/" + ts.mkString("/"))
    val prop = Prop.forAll(tmplGen, token) { (tmpl, value) =>
      PathMatcher.matches(tmpl, tmpl.replace("%{p}", value))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
