package graft

import graft.config.Config
import graft.etl.ProcessorError
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Config tree: parse, fail-fast validation, URL resolution
  * (reference: src/models.rs — see Model.scala scaladoc).
  */
class ConfigSpec extends AnyFunSuite {

  /** Run a ScalaCheck property inside a funsuite test (no scalatestplus
    * bridge in the offline cache).
    */
  protected def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val sample =
    """{"apis":{"compras":{
      |  "base_url":"https://api.example.gov/v1/",
      |  "endpoints":{"materiais":{
      |     "root_path":"resultado",
      |     "grupos":"/modulo-material/grupos",
      |     "porId":"/modulo-material/{id}"
      |}}}}}""".stripMargin

  test("parse: routes are all non-root_path textual keys") {
    val cfg = Config.loadFromString(sample).toOption.get
    val g = cfg.apis("compras").endpoints("materiais")
    assert(g.rootPath.contains("resultado"))
    assert(g.routes.keySet == Set("grupos", "porId"))
  }

  test("resolveEndpointUrl joins base and path with exactly one slash") {
    val cfg = Config.loadFromString(sample).toOption.get
    assert(cfg.resolveEndpointUrl("compras", "materiais", "grupos") ==
      Right("https://api.example.gov/v1/modulo-material/grupos"))
  }

  test("resolution errors are contextual at each level") {
    val cfg = Config.loadFromString(sample).toOption.get
    assert(cfg.resolveEndpointUrl("nope", "materiais", "grupos").isLeft)
    assert(cfg.resolveEndpointUrl("compras", "nope", "grupos").isLeft)
    assert(cfg.resolveEndpointUrl("compras", "materiais", "nope").isLeft)
  }

  test("validate fails fast on empty base_url and empty endpoints") {
    val empty = """{"apis":{"a":{"base_url":"  ","endpoints":{"g":{"r":"/x"}}}}}"""
    assert(Config.loadFromString(empty).left.toOption.exists(_.isInstanceOf[ProcessorError.Config]))
    val noEp = """{"apis":{"a":{"base_url":"https://x","endpoints":{}}}}"""
    assert(Config.loadFromString(noEp).isLeft)
  }

  test("missing apis object rejected") {
    assert(Config.loadFromString("""{"nope":1}""").isLeft)
  }

  test("templated-route detection") {
    assert(Config.isTemplatedRoute("/proposicoes/{id}"))
    assert(!Config.isTemplatedRoute("/proposicoes"))
  }

  test("property: joinUrls yields exactly one slash at the seam") {
    val seg = Gen.alphaNumStr.suchThat(_.nonEmpty)
    val slash = Gen.oneOf("", "/")
    checkProp(Prop.forAll(seg, slash, slash, seg) { (b, s1, s2, p) =>
      Config.joinUrls("https://" + b + s1, s2 + p) == s"https://$b/$p"
    })
  }
}
