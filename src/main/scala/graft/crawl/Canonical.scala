package graft.crawl

/**
 * URL canonicalization — the key function under the seen-set
 * (`BASELINE.json.north_star`: "partitioned cuckoo-filter URL-seen set keyed
 * by canonicalized+xxhash64 URLs").
 *
 * The reference dedups on exact numeric post ids (/root/reference/weibo.py:1698-1699,
 * SQLite PK replace weibo.py:2536-2540); at web scale the id is the URL, so a
 * canonical form must be fixed before hashing. Rules (idempotent:
 * canonicalize∘canonicalize == canonicalize, property-tested):
 *
 *  1. scheme and host lowercased;
 *  2. fragment stripped;
 *  3. default ports removed (:80 http, :443 https);
 *  4. empty path → "/";
 *  5. trailing "?" (empty query) stripped;
 *  6. path dot-segments resolved ("/a/./b/../c" → "/a/c").
 *
 * Query-parameter reordering is deliberately NOT done: parameter order can be
 * semantically meaningful and the reference never reorders its own cursors.
 */
object Canonical {

  def canonicalize(url: String): String = {
    if (url == null) return null
    val u = url.trim
    val schemeEnd = u.indexOf("://")
    if (schemeEnd < 0) return stripFragment(u) // not absolute; leave mostly as-is
    val scheme = u.substring(0, schemeEnd).toLowerCase
    val rest = u.substring(schemeEnd + 3)
    val authorityEnd = {
      val i = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
      if (i < 0) rest.length else i
    }
    var authority = rest.substring(0, authorityEnd).toLowerCase
    if (scheme == "http" && authority.endsWith(":80")) authority = authority.dropRight(3)
    if (scheme == "https" && authority.endsWith(":443")) authority = authority.dropRight(4)
    var tail = stripFragment(rest.substring(authorityEnd))
    if (tail.isEmpty) tail = "/"
    else if (tail.startsWith("?")) tail = "/" + tail
    // split path vs query; resolve dot-segments in path only
    val qIdx = tail.indexOf('?')
    val (path, query) = if (qIdx < 0) (tail, "") else (tail.substring(0, qIdx), tail.substring(qIdx))
    val cleanQuery = if (query == "?") "" else query
    s"$scheme://$authority${resolveDots(path)}$cleanQuery"
  }

  private def stripFragment(s: String): String = {
    val i = s.indexOf('#')
    if (i < 0) s else s.substring(0, i)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, for absolute paths. */
  private def resolveDots(path: String): String = {
    if (!path.contains("/.")) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]
    val hasTrailingSlash = path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")
    path.split("/", -1).foreach {
      case "" | "." => // skip
      case ".."     => if (out.nonEmpty) out.remove(out.length - 1)
      case seg      => out += seg
    }
    val joined = out.mkString("/", "/", if (hasTrailingSlash && out.nonEmpty) "/" else "")
    if (joined.isEmpty) "/" else joined
  }

  /** Lowercase host (without port) of an absolute url; "" if unparseable.
    * Politeness/partitioning key (north rule: salted repartitioning on host-hash). */
  def host(url: String): String = {
    if (url == null) return ""
    val u = url.trim
    val schemeEnd = u.indexOf("://")
    if (schemeEnd < 0) return ""
    val rest = u.substring(schemeEnd + 3)
    val end = {
      val i = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
      if (i < 0) rest.length else i
    }
    val auth = rest.substring(0, end)
    val colon = auth.lastIndexOf(':')
    val hostPart = if (colon >= 0 && auth.drop(colon + 1).forall(_.isDigit)) auth.substring(0, colon) else auth
    hostPart.toLowerCase
  }
}
