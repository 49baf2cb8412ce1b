package graft.sink

/** Database/schema extracted from a JDBC URL (reference UrlParams,
  * sqltask/base/common.py:15-17).
  */
final case class UrlParams(database: Option[String], schema: Option[String])

/** URL database/schema handling (SURVEY §2.7 D7): the reference packs an
  * optional schema into the URL's database segment as `database/schema`
  * and rebinds engines to another namespace by rewriting that segment
  * (get_url_params / modify_url, sqltask/engine_specs/base.py:119-158;
  * EngineContext.create_new, sqltask/base/engine.py:37-53). SQLAlchemy
  * hands the reference a pre-parsed `url.database`; for JDBC URLs we
  * isolate the equivalent segment ourselves:
  *
  *  - network style `jdbc:postgresql://host:5432/dbname?x=y` — the part
  *    after the first '/' following the authority;
  *  - embedded style `jdbc:derby:memory:dbname;create=true` — the part
  *    after the last ':' of the main section.
  *
  * Attribute tails (`;k=v` / `?k=v`) are preserved verbatim across a
  * rebind, so connection options survive namespace switches.
  */
object JdbcUrl {

  /** (prefix, databaseSegment, attributeTail) — concatenating the three
    * reproduces the input exactly.
    */
  private def split(url: String): (String, String, String) = {
    val cut = url.indexWhere(c => c == ';' || c == '?')
    val (main, tail) =
      if (cut >= 0) (url.substring(0, cut), url.substring(cut))
      else (url, "")
    val dbStart = {
      val auth = main.indexOf("//")
      if (auth >= 0) {
        val s = main.indexOf('/', auth + 2)
        if (s >= 0) s + 1 else main.length
      } else main.lastIndexOf(':') + 1
    }
    (main.substring(0, dbStart), main.substring(dbStart), tail)
  }

  /** Extract database and packed schema (reference get_url_params,
    * base.py:144-158): the schema is what follows a '/' inside the
    * database segment, only meaningful on dialects with schema support.
    */
  def getUrlParams(url: String,
      supportsSchemas: Boolean = true): UrlParams = {
    val (_, db, _) = split(url)
    if (db.isEmpty) UrlParams(None, None)
    else if (supportsSchemas && db.contains("/")) {
      val Array(d, s) = db.split("/", 2)
      UrlParams(Some(d).filter(_.nonEmpty), Some(s).filter(_.nonEmpty))
    } else UrlParams(Some(db), None)
  }

  /** Rebind the URL to another database and/or schema (reference
    * modify_url, base.py:118-142): an unspecified side falls back to
    * the current URL's value; no schema support ⇒ URL unchanged.
    * Divergence, documented: the reference early-returns when
    * `database is None`, making a schema-only rebind a silent no-op
    * even though its fallback code below handles exactly that case
    * (dead code at base.py:134-137) — here a schema-only rebind works,
    * which is the evident intent.
    */
  def modifyUrl(url: String, database: Option[String] = None,
      schema: Option[String] = None,
      supportsSchemas: Boolean = true): String = {
    if (!supportsSchemas || (database.isEmpty && schema.isEmpty)) return url
    val (prefix, _, tail) = split(url)
    val cur = getUrlParams(url, supportsSchemas)
    val db = database.orElse(cur.database).getOrElse("")
    val sch = schema.orElse(cur.schema)
    prefix + sch.fold(db)(s => s"$db/$s") + tail
  }
}
