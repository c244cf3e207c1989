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

  private val tomlSample =
    """# comment line
      |[compras]  # trailing comment
      |base_url = "https://api.example.gov/v1/"
      |
      |[compras.endpoints.materiais]
      |root_path = "resultado"
      |grupos = "/modulo-material/grupos"
      |porId = "/modulo-material/{id}"
      |""".stripMargin

  test("TOML: same tree as the JSON shape, routes flattened, comments stripped") {
    val cfg = Config.loadTomlString(tomlSample).toOption.get
    val g = cfg.apis("compras").endpoints("materiais")
    assert(g.rootPath.contains("resultado"))
    assert(g.routes.keySet == Set("grupos", "porId"))
    assert(cfg.resolveEndpointUrl("compras", "materiais", "grupos") ==
      Right("https://api.example.gov/v1/modulo-material/grupos"))
  }

  test("TOML: fail-fast on constructs outside the subset and on unknown shapes") {
    assert(Config.loadTomlString("[a]\nbase_url = 123").isLeft)
    assert(Config.loadTomlString("[[a]]\nx = \"y\"").isLeft)
    assert(Config.loadTomlString("[a.b]\nx = \"y\"").isLeft)         // not api/endpoints shape
    assert(Config.loadTomlString("[a]\nnot_base = \"y\"").isLeft)    // unknown api-level key
    assert(Config.loadTomlString("x = \"y\"").isLeft)                // top-level pair
    assert(Config.loadTomlString("[a]\nbase_url = \"u\"").isLeft)    // no endpoints -> validate
  }

  test("TOML: duplicate tables and duplicate keys fail fast, not last-wins") {
    // real TOML rejects redefinition; a typo'd config must not load
    // with one route silently dropped
    val dupTable = Config.loadTomlString(
      """[a]
        |base_url = "u1"
        |[a.endpoints.g]
        |r = "/x"
        |[a]
        |base_url = "u2"
        |""".stripMargin)
    assert(dupTable.swap.exists(_.toString.contains("duplicate table [a]")))
    val dupKey = Config.loadTomlString(
      """[a]
        |base_url = "u"
        |[a.endpoints.g]
        |grupos = "/x"
        |grupos = "/y"
        |""".stripMargin)
    assert(dupKey.swap.exists(_.toString.contains("duplicate key 'grupos'")))
    // same key in DIFFERENT tables is fine (routes repeat across groups)
    val ok = Config.loadTomlString(
      """[a]
        |base_url = "u"
        |[a.endpoints.g1]
        |grupos = "/x"
        |[a.endpoints.g2]
        |grupos = "/y"
        |""".stripMargin)
    assert(ok.isRight, ok)
  }

  test("TOML: loads the reference's real config file and resolves its URLs") {
    val refPath = "/root/reference/endpoints_publicos.toml"
    assume(new java.io.File(refPath).exists(), "reference config not present")
    val cfg = Config.loadFromFile(refPath).fold(e => fail(e.toString), identity)
    // the apis the reference file declares, resolved exactly as the
    // reference's main loop would (resolve + template skip)
    assert(cfg.apis.nonEmpty && cfg.apis.contains("compras_federal"))
    assert(cfg.resolveEndpointUrl("compras_federal", "material", "grupo") ==
      Right("https://dadosabertos.compras.gov.br/modulo-material/1_consultarGrupoMaterial"))
    val all = for {
      (api, a) <- cfg.apis.toSeq
      (group, g) <- a.endpoints.toSeq
      (key, path) <- g.routes.toSeq
    } yield cfg.resolveEndpointUrl(api, group, key)
    assert(all.nonEmpty && all.forall(_.isRight))
    // every resolved URL is absolute with a single slash at the seam
    all.map(_.toOption.get).foreach { u =>
      assert(u.startsWith("https://") && !u.contains(".br//"), u)
    }
    // root_path metadata survives (material group uses "resultado")
    assert(cfg.apis("compras_federal").endpoints("material").rootPath.contains("resultado"))
  }

  test("property: joinUrls yields exactly one slash at the seam") {
    val seg = Gen.alphaNumStr.suchThat(_.nonEmpty)
    val slash = Gen.oneOf("", "/")
    checkProp(Prop.forAll(seg, slash, slash, seg) { (b, s1, s2, p) =>
      Config.joinUrls("https://" + b + s1, s2 + p) == s"https://$b/$p"
    })
  }
}
