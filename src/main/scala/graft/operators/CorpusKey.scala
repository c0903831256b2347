package graft.operators

/** Memo keys for per-corpus trained artifacts ([[QualityIndex]],
  * [[LangIndex]], [[CentroidIndex]]): canonical directory + an MD5 hex
  * fingerprint of the named table's file metadata (names, sizes,
  * mtimes). An in-session rewrite of the table changes the fingerprint
  * and invalidates the memo, so no consumer ever scores under a stale
  * model. MD5 (128-bit) rather than String.hashCode (32-bit — the r15
  * advisory: a hashCode collision, or a same-size same-mtime-second
  * rewrite of a DIFFERENT byte payload, would silently serve a stale
  * model instead of retraining). Local-FS metadata only — for remote
  * stores the canonical-path fallback degrades to path-keyed memoing.
  */
object CorpusKey {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def key(d: String, table: String): String = {
    val canon =
      try new java.io.File(d).getCanonicalPath catch { case _: Exception => d }
    val t = new java.io.File(canon, table)
    val parts =
      if (t.isDirectory)
        Option(t.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      else if (t.isFile) Seq(t)
      else Seq.empty
    val fp = md5hex(parts.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|"))
    s"$canon/$table#$fp"
  }
}
