package graft.config

import graft.etl.ProcessorError
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Configuration tree for the ingestion pipeline.
  *
  * Same shape as the reference's TOML model (reference:
  * src/models.rs:21-48): `apis → {base_url, endpoints → {group →
  * {root_path?, routes…}}}`. Any key in a group that is not `root_path`
  * is a route (the reference captures this with serde
  * `#[serde(flatten)]`, src/models.rs:44-47). The build is offline with
  * no TOML library, so the engine's config format is JSON parsed with
  * Spark's bundled Jackson.
  */
final case class EndpointGroup(
    rootPath: Option[String],
    routes: Map[String, String]
)

final case class ApiConfig(
    baseUrl: String,
    endpoints: Map[String, EndpointGroup]
)

final case class Config(apis: Map[String, ApiConfig]) {

  /** Fail-fast validation (reference: src/models.rs:66-82): every api
    * must have a non-empty base_url and at least one endpoint group.
    */
  def validate(): Either[ProcessorError, Config] = {
    apis.collectFirst {
      case (name, api) if api.baseUrl.trim.isEmpty =>
        ProcessorError.Config(s"api '$name' has an empty base_url")
      case (name, api) if api.endpoints.isEmpty =>
        ProcessorError.Config(s"api '$name' has no endpoints")
    } match {
      case Some(err) => Left(err)
      case None      => Right(this)
    }
  }

  /** `apis[api].endpoints[group].routes[key]` lookup chain with
    * contextual errors (reference: src/models.rs:85-107).
    */
  def resolveEndpointUrl(
      api: String,
      group: String,
      key: String
  ): Either[ProcessorError, String] =
    for {
      a <- apis
        .get(api)
        .toRight(ProcessorError.Config(s"unknown api '$api'"))
      g <- a.endpoints
        .get(group)
        .toRight(ProcessorError.Config(s"unknown endpoint group '$api.$group'"))
      path <- g.routes
        .get(key)
        .toRight(ProcessorError.Config(s"unknown route '$api.$group.$key'"))
    } yield Config.joinUrls(a.baseUrl, path)
}

object Config {

  /** Safe base+path join stripping duplicate slashes
    * (reference: src/models.rs:110-114).
    */
  def joinUrls(base: String, path: String): String =
    base.stripSuffix("/") + "/" + path.stripPrefix("/")

  /** Routes containing `{` are parameterized templates and are skipped
    * by the orchestrator (reference: src/main.rs:79-81).
    */
  def isTemplatedRoute(path: String): Boolean = path.contains("{")

  /** Load + validate a config file (reference: src/models.rs:56-63).
    * `.toml` files parse with the hand-rolled subset parser in
    * [[Toml]] — the reference's own `endpoints_publicos.toml` loads
    * verbatim — anything else parses as JSON with the same shape:
    *
    * {{{
    * { "apis": { "compras": {
    *     "base_url": "https://…",
    *     "endpoints": { "materiais": {
    *        "root_path": "resultado",
    *        "grupos": "/modulo-material/1_consultarGrupoMaterial" } } } } }
    * }}}
    */
  def loadFromFile(path: String): Either[ProcessorError, Config] =
    try {
      if (path.endsWith(".toml"))
        loadTomlString(
          new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
            java.nio.charset.StandardCharsets.UTF_8))
      else {
        val mapper = new ObjectMapper()
        val root = mapper.readTree(new java.io.File(path))
        parse(root).flatMap(_.validate())
      }
    } catch {
      case e: Exception =>
        Left(ProcessorError.Config(s"cannot read $path: ${e.getMessage}"))
    }

  /** TOML layout mirrors the reference exactly: `[api]` tables carry
    * `base_url`, `[api.endpoints.group]` tables carry an optional
    * `root_path` plus the flattened route map (any other key is a
    * route — reference src/models.rs:44-47). Unknown table shapes and
    * unknown api-level keys fail fast like serde's strict decode.
    */
  def loadTomlString(text: String): Either[ProcessorError, Config] =
    Toml.parse(text).flatMap(fromTables).flatMap(_.validate())

  private def fromTables(
      tables: Vector[Toml.Table]): Either[ProcessorError, Config] = {
    val baseUrls = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val groups =
      scala.collection.mutable.LinkedHashMap.empty[String, Vector[(String, EndpointGroup)]]
    tables.foreach { t =>
      t.path match {
        case Nil =>
          if (t.pairs.nonEmpty)
            return Left(ProcessorError.Config(
              s"top-level key '${t.pairs.head._1}' outside any api table"))
        case api :: Nil =>
          t.pairs.foreach {
            case ("base_url", v) => baseUrls(api) = v
            case (k, _) =>
              return Left(
                ProcessorError.Config(s"unknown key '$k' in api table [$api]"))
          }
        case api :: "endpoints" :: group :: Nil =>
          val rootPath = t.pairs.collectFirst { case ("root_path", v) => v }
          val routes = t.pairs.filter(_._1 != "root_path").toMap
          groups(api) =
            groups.getOrElse(api, Vector.empty) :+ (group -> EndpointGroup(rootPath, routes))
        case other =>
          return Left(ProcessorError.Config(
            s"unsupported table [${other.mkString(".")}] — expected [api] or [api.endpoints.group]"))
      }
    }
    val apiNames = (baseUrls.keys ++ groups.keys).toVector.distinct
    Right(Config(apiNames.map { api =>
      api -> ApiConfig(
        baseUrls.getOrElse(api, ""),
        groups.getOrElse(api, Vector.empty).toMap)
    }.toMap))
  }

  def loadFromString(json: String): Either[ProcessorError, Config] =
    try parse(new ObjectMapper().readTree(json)).flatMap(_.validate())
    catch {
      case e: Exception =>
        Left(ProcessorError.Config(s"cannot parse config: ${e.getMessage}"))
    }

  private def parse(root: JsonNode): Either[ProcessorError, Config] = {
    val apisNode = root.path("apis")
    if (!apisNode.isObject)
      return Left(ProcessorError.Config("missing top-level 'apis' object"))
    val apis = apisNode.properties().asScala.map { e =>
      val (name, node) = (e.getKey, e.getValue)
      val baseUrl = node.path("base_url").asText("")
      val endpoints = node.path("endpoints").properties().asScala.map { g =>
        val (gName, gNode) = (g.getKey, g.getValue)
        val rootPath =
          Option(gNode.get("root_path")).filter(_.isTextual).map(_.asText)
        // Any non-root_path key in the group is a route — the
        // schema-on-read flatten of reference src/models.rs:44-47.
        val routes = gNode
          .properties()
          .asScala
          .filter(e => e.getKey != "root_path" && e.getValue.isTextual)
          .map(e => e.getKey -> e.getValue.asText)
          .toMap
        gName -> EndpointGroup(rootPath, routes)
      }.toMap
      name -> ApiConfig(baseUrl, endpoints)
    }.toMap
    Right(Config(apis))
  }
}
