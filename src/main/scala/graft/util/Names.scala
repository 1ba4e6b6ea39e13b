package graft.util

/** Key/name normalization helpers.
  *
  * Mirrors the reference's name handling (behavioral spec only):
  *  - camelCase -> snake_case decamelization applied to every JSON key before
  *    flattening (reference: seghouse/jobs/send_to_warehouse.py:338 via
  *    `humps.decamelize`).
  *  - event-key cleaning: strip, drop spaces, `:`->`_`, `-`->`_`
  *    (reference: seghouse/util/json_util.py:23-24).
  *  - track event-name normalization: drop spaces, `&`->`and`, decamelize,
  *    lowercase (reference: seghouse/jobs/send_to_warehouse.py:48-52).
  *
  * These are pure string functions: column NAMES are driver-side metadata, so
  * no UDF / Catalyst expression is needed for them. For column VALUES (the
  * track `event` field) the same chain is expressed with built-in
  * `regexp_replace`/`lower` columns in [[graft.etl.Normalize]] so it stays
  * inside whole-stage codegen.
  */
object Names {

  private val AcronymBoundary = "([A-Z]+)([A-Z][a-z])".r
  private val CamelBoundary   = "([a-z\\d])([A-Z])".r

  /** camelCase / PascalCase / ACRONYMCase -> snake_case (then lowercase). */
  def decamelize(s: String): String = {
    val s1 = AcronymBoundary.replaceAllIn(s, m => m.group(1) + "_" + m.group(2))
    val s2 = CamelBoundary.replaceAllIn(s1, m => m.group(1) + "_" + m.group(2))
    s2.toLowerCase
  }

  /** Clean one JSON key path segment: strip, remove spaces, `:`/`-` -> `_`. */
  def cleanEventKey(k: String): String =
    k.trim.replace(" ", "").replace(":", "_").replace("-", "_")

  /** Track event name -> SQL-safe table-name-ish token. */
  def normalizeEventName(e: String): String =
    decamelize(e.replace(" ", "").replace("&", "and")).toLowerCase

  /** The two regex patterns, exposed so the column-value variant in
    * etl.Normalize provably applies the identical transformation. */
  val acronymBoundaryPattern: String = "([A-Z]+)([A-Z][a-z])"
  val camelBoundaryPattern: String   = "([a-z0-9])([A-Z])"
}
