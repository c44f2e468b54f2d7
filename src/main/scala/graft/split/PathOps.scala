package graft.split

/** Path/key helpers mirroring the reference's listing semantics
  * (reference/src/Split/parquet-splitter.py:48-81,119-121).
  *
  * "Date" is really just the basename stem — non-`YYYYMMDD` stems are
  * accepted, exactly like the reference (SURVEY.md §2.2.5).
  */
object PathOps {

  /** `rstrip('/') + '/'` prefix normalization (parquet-splitter.py:119-121). */
  def normalizePrefix(p: String): String = p.replaceAll("/+$", "") + "/"

  /** Basename of a key/path (text after the last '/'). */
  def basename(key: String): String = {
    val i = key.lastIndexOf('/')
    if (i < 0) key else key.substring(i + 1)
  }

  /** Stems of keys ending in `suffix`: basename minus the suffix.
    * Dedup via Set, mirroring extract_dates_from_keys
    * (parquet-splitter.py:62-81). */
  def stemsWithSuffix(keys: Seq[String], suffix: String): Set[String] =
    keys.iterator
      .map(basename)
      .filter(_.endsWith(suffix))
      .map(b => b.dropRight(suffix.length))
      .toSet
}
