package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions

/** Merge-table BPE tokenization — the real token-budget currency of an
  * LLM data pipeline (whitespace counts misestimate budgets by 2-5×).
  *
  * Semantics (the priority-queue BPE variant): per-CODE-POINT lowercase
  * the text (the simple 1:1 UnicodeData mapping — `Character.toLowerCase
  * (int)`, which is also what DuckDB's utf8proc `lower()` applies, so
  * `lower(text)` on the oracle side reproduces it exactly; the JVM's
  * full STRING mapping would not: it expands e.g. U+0130 'İ' to two code
  * points); unicode letter runs `\p{L}+` are BPE words, every other
  * non-whitespace code point is ONE token (the byte-fallback analog) —
  * counted per code point, so supplementary-plane characters (emoji)
  * are one token, not two UTF-16 halves. A word starts as its code-point
  * symbols; repeatedly the LOWEST-RANK adjacent symbol pair present in
  * [[merges]] is merged at its LEFTMOST occurrence, until no pair
  * applies. One merge per step (not GPT-2's all-occurrences sweep) —
  * same family, but each step is a pure deterministic string rewrite, so
  * the DuckDB oracle can replay it exactly with a recursive CTE
  * ([[sqlWordLenCte]]) and the result is engine- and partition-
  * independent by construction.
  *
  * The merge table is a small public-English fixture (chained merges up
  * to whole common words), standing in for a learned vocabulary; the
  * algorithm is vocabulary-agnostic.
  *
  * Scale: [[BpeCountExpr]] is a per-DOCUMENT fallback-dispatch expression
  * (one virtual call per row, like minhash16) with a per-thread word→len
  * memo — corpus vocabulary is Zipfian, so the merge loop runs roughly
  * once per DISTINCT word per task, and the op stays a scan-speed narrow
  * projection with no shuffle.
  */
object Bpe {

  /** Rank-ordered merge table (rank = index). */
  val merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"), ("r", "e"),
    ("th", "e"), ("e", "n"), ("a", "t"), ("o", "r"), ("s", "t"), ("a", "r"),
    ("a", "l"), ("o", "u"), ("in", "g"), ("an", "d"), ("e", "d"), ("i", "s"),
    ("i", "t"), ("l", "e"), ("s", "e"), ("t", "o"), ("o", "f"), ("c", "h"),
    ("w", "h"), ("h", "a"), ("s", "c"), ("sc", "an"), ("r", "o"), ("ro", "w"),
    ("t", "a"), ("ta", "b"), ("tab", "le"), ("al", "u"), ("alu", "e"),
    ("v", "alue"), ("k", "e"), ("ke", "y"), ("ha", "s"), ("has", "h"),
    ("m", "er"), ("mer", "g"), ("merg", "e"), ("p", "ar"), ("par", "t"),
    ("s", "p"), ("sp", "ar"), ("spar", "k"), ("q", "u"), ("qu", "er"),
    ("quer", "y"), ("w", "in"), ("win", "d"), ("o", "w"), ("wind", "ow"),
    ("g", "r"), ("gr", "ou"), ("grou", "p"), ("o", "in"), ("j", "oin"),
    ("or", "d"), ("ord", "er"), ("s", "or"), ("sor", "t"), ("fa", "st"),
    ("f", "a"), ("s", "l"), ("sl", "ow"), ("b", "at"), ("bat", "ch"),
    ("a", "g"), ("ag", "g"), ("u", "p"), ("d", "up"), ("l", "in"),
    ("lin", "e"), ("c", "o"), ("i", "l"), ("t", "or"), ("u", "m"))

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** BPE-encode one lowercase word; returns the symbol sequence. Initial
    * symbols are CODE POINTS (the oracle's RE2 `(.)` splitter also walks
    * runes), so a supplementary-plane letter is one symbol, never a
    * surrogate pair split in half.
    */
  def encode(word: String): Vector[String] = encodeLoop(word, rank)

  /** BPE-encode one word under an ARBITRARY rank-ordered merge table —
    * the portability contract for exported
    * [[graft.operators.TokenizerIndex]] tables: identical
    * lowest-rank-first one-merge-per-step loop as [[encode]], so a
    * learned table priced here matches any standard BPE implementation
    * (rank map built per call; bulk callers should price through the
    * artifact's vocab frame instead).
    */
  def encodeWith(word: String, table: Seq[(String, String)]): Vector[String] = {
    val rk = new java.util.HashMap[String, Integer]()
    table.zipWithIndex.foreach { case ((a, b), i) => rk.put(a + " " + b, i) }
    encodeLoop(word, rk)
  }

  private def encodeLoop(
      word: String, rank: java.util.HashMap[String, Integer]): Vector[String] = {
    val syms = scala.collection.mutable.ArrayBuffer[String]()
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      syms += new String(Character.toChars(cp))
      ci += Character.charCount(cp)
    }
    runMerges(syms, rank)
  }

  /** The lowest-rank-first one-merge-per-step loop over an initial
    * symbol sequence — shared by the code-point and byte-level encoders
    * (one merge contract, two base alphabets).
    */
  private def runMerges(
      syms: scala.collection.mutable.ArrayBuffer[String],
      rank: java.util.HashMap[String, Integer]): Vector[String] = {
    var continue = syms.length > 1
    while (continue) {
      var bestI = -1
      var bestR = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestR) { bestR = r; bestI = i }
        i += 1
      }
      if (bestI < 0) continue = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
      }
    }
    syms.toVector
  }

  /** Token count of one word (memoized per thread; Zipfian corpora hit
    * the memo almost always). The cap bounds worst-case memory on
    * adversarial unique-word corpora.
    */
  private val memoCap = 1 << 16
  private val memo: ThreadLocal[java.util.HashMap[String, Integer]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer]())
  def encodeLen(word: String): Int = {
    val m = memo.get()
    val cached = m.get(word)
    if (cached != null) cached.intValue()
    else {
      val n = encode(word).length
      if (m.size() >= memoCap) m.clear()
      m.put(word, n)
      n
    }
  }

  // ---- byte-level mode (r15): 256 base symbols, NO OOV ----
  //
  // Production tokenizers (the GPT-2 family) are byte-level BPE: a
  // word's base symbols are its UTF-8 BYTES, so every string tokenizes
  // by construction and there is no out-of-vocabulary pricing bias on
  // vocab-miss-heavy corpora (code, rare scripts) — the r14 verdict's
  // ask #2. Symbols are lowercase-hex byte pairs ("74", "68", merged →
  // "7468"), which is also how the DuckDB oracle represents them:
  // `lower(hex(encode(w)))` split into pairs replays the identical
  // initial symbol string, and the same recursive merge CTE runs over
  // it unchanged.

  /** Lowercase-hex UTF-8 coding of a string — the byte-mode symbol
    * alphabet (shared with the oracle's `lower(hex(encode(…)))`).
    */
  private[graft] def hexOf(s: String): String = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length * 2)
    bs.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Byte-level merge table: the SAME fixture merges re-coded over hex
    * byte symbols (every fixture merge is ASCII, so the re-coding is
    * 1:1 — "t"+"h" becomes "74"+"68"). A learned byte-level table drops
    * in the same way; the loop is table-agnostic.
    */
  val bytesMerges: Vector[(String, String)] =
    merges.map { case (a, b) => (hexOf(a), hexOf(b)) }

  private val bytesRank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    bytesMerges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, i)
    }
    m
  }

  /** Byte-level BPE-encode one lowercase word: initial symbols are the
    * hex-coded UTF-8 bytes, then the identical lowest-rank-first
    * one-merge-per-step loop as [[encode]]. Total coverage: any word
    * encodes (worst case = its byte count), never an OOV.
    */
  def encodeBytes(word: String): Vector[String] = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val syms = new scala.collection.mutable.ArrayBuffer[String](bs.length)
    bs.foreach(b => syms += f"${b & 0xff}%02x")
    runMerges(syms, bytesRank)
  }

  private val byteLenMemo: ThreadLocal[java.util.HashMap[String, Integer]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer]())
  def encodeBytesLen(word: String): Int = {
    val m = byteLenMemo.get()
    val cached = m.get(word)
    if (cached != null) cached.intValue()
    else {
      val n = encodeBytes(word).length
      if (m.size() >= memoCap) m.clear()
      m.put(word, n)
      n
    }
  }

  /** UTF-8 byte length of one code point — the byte-mode price of a
    * residual (non-letter, non-whitespace) code point: residuals are
    * their raw bytes, one token per byte (no merges — the residual
    * class is punctuation/digit singletons where merges don't pay),
    * ≡ the oracle's `octet_length(encode(residual_text))`.
    */
  private def utf8Len(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4

  /** Full-document BYTE-LEVEL token count over RAW text:
    * Σ encodeBytesLen(lowercased letter runs) + one token per UTF-8
    * byte of every other non-whitespace code point. Same fold, same
    * word/residual split as [[tokenCount]] — only the pricing of each
    * unit changes, so the two counts are directly comparable per doc.
    */
  def tokenCountBytes(text: String): Long = {
    var total = 0L
    foldText(text, w => total += encodeBytesLen(w),
      lc => total += utf8Len(lc))
    total
  }

  /** Whitespace for tokenization purposes — EXACTLY the `[\p{L} \t\n\r]`
    * residual class the oracle SQL uses (see [[sqlOtherCount]]); other
    * unicode whitespace (NBSP etc.) deliberately counts as a residual
    * token in BOTH engines.
    */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r'

  /** Per-code-point fold over RAW text shared by [[tokenCount]] and
    * [[pieces]]: each code point is simple-lowercased, letter runs
    * become BPE words, residual non-whitespace code points are single
    * tokens. Mirrors the oracle's `lower(text)` + `\p{L}` exactly
    * (letter-ness is decided on the LOWERED code point, as the oracle —
    * which lowers first — does).
    */
  private def foldText(text: String, onWord: String => Unit,
      onResidual: Int => Unit): Unit = {
    var i = 0
    val n = text.length
    val sb = new java.lang.StringBuilder
    while (i < n) {
      val cp = text.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      if (Character.isLetter(lc)) {
        sb.setLength(0)
        var run = true
        while (i < n && run) {
          val c2 = text.codePointAt(i)
          val l2 = Character.toLowerCase(c2)
          if (Character.isLetter(l2)) {
            sb.appendCodePoint(l2)
            i += Character.charCount(c2)
          } else run = false
        }
        onWord(sb.toString)
      } else {
        if (!isWs(lc)) onResidual(lc)
        i += Character.charCount(cp)
      }
    }
  }

  /** Full-document token count over RAW text: Σ encodeLen(lowercased
    * letter runs) + one token per other non-whitespace CODE POINT.
    */
  def tokenCount(text: String): Long = {
    var total = 0L
    foldText(text, w => total += encodeLen(w), _ => total += 1)
    total
  }

  private val pieceMemo: ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[String]]())
  private def piecesOf(word: String): Array[String] = {
    val m = pieceMemo.get()
    val cached = m.get(word)
    if (cached != null) cached
    else {
      val p = encode(word).toArray
      if (m.size() >= memoCap) m.clear()
      m.put(word, p)
      p
    }
  }

  /** The full piece sequence of RAW text — the tokens [[tokenCount]]
    * counts (lowercased word pieces in order, one piece per residual
    * non-whitespace code point, itself lowercased as the oracle's
    * whole-text `lower()` does).
    */
  def pieces(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    foldText(text, w => out ++= piecesOf(w),
      lc => out += new String(Character.toChars(lc)))
    out.result()
  }

  /** The lowercased letter-run words of RAW text, in order — the merge-
    * loop-free share of the fold, used by BPE TRAINING (C14) and the
    * learned-table counter, ≡ the oracle's
    * `regexp_extract_all(lower(text), '\p{L}+')`.
    */
  def words(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    foldText(text, w => out += w, _ => ())
    out.result()
  }

  /** Residual (non-letter, non-whitespace) code-point count of RAW text
    * — [[tokenCount]] minus the word-token share, ≡ [[sqlOtherCount]].
    */
  def residualCount(text: String): Long = {
    var n = 0L
    foldText(text, _ => (), _ => n += 1)
    n
  }

  /** Residual UTF-8 BYTE count of RAW text — the byte-mode residual
    * price, ≡ [[sqlOtherCountBytes]].
    */
  def residualCountBytes(text: String): Long = {
    var n = 0L
    foldText(text, _ => (), lc => n += utf8Len(lc))
    n
  }

  /** `bpe_count(text): long` over RAW text (lowercasing is part of the
    * expression's own per-code-point fold) — per-document dispatch (like
    * minhash16, CodegenFallback costs one call per document, nothing per
    * word/char).
    */
  case class BpeCountExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_count"
    override def nullSafeEval(input: Any): Any =
      tokenCount(input.toString)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `bpe_pieces(text): array<string>` over RAW text — the encoded piece
    * sequence itself (C13's vocabulary-utilization input).
    */
  case class BpePiecesExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "bpe_pieces"
    override def nullSafeEval(input: Any): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        pieces(input.toString).map(
          org.apache.spark.unsafe.types.UTF8String.fromString): Vector[Any])
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `bpe_words(text): array<string>` — the lowercased unicode letter
    * runs of RAW text (no merge table involved; the training/count-
    * learned word extractor).
    */
  case class BpeWordsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "bpe_words"
    override def nullSafeEval(input: Any): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        words(input.toString).map(
          org.apache.spark.unsafe.types.UTF8String.fromString): Vector[Any])
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One greedy-scan BPE merge round over a space-separated symbol
    * string: every left-to-right NON-OVERLAPPING adjacent occurrence of
    * (a, b) becomes the single symbol `ab` — identical semantics to the
    * double-space replace trick the oracle CTE replays
    * ([[sqlTrainCtes]]: doubling boundary spaces makes the
    * non-overlapping substring replace's match set exactly the greedy
    * scan's merge set), but computed in ONE pass with no intermediate
    * doubled/patterned strings. This is the r11 `watch` advisory's fix:
    * the training round was 3 chained `replace` projections (~4 string
    * passes, one over a 2×-length string) per round, 24 deep between
    * persists.
    */
  def mergeStep(s: String, a: String, b: String): String = {
    if (s.isEmpty) s
    else {
      val toks = s.split(" ")
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < toks.length) {
        if (sb.length > 0) sb.append(' ')
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          sb.append(a).append(b)
          i += 2
        } else {
          sb.append(toks(i))
          i += 1
        }
      }
      sb.toString
    }
  }

  /** `bpe_merge_step(s, a, b): string` — [[mergeStep]] as an expression
    * (per-ROW dispatch like the other BPE expressions; the training
    * loop's vocab rows are words, so the fallback call is one per word
    * per round).
    */
  case class BpeMergeStepExpr(
      first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "bpe_merge_step"
    override def nullSafeEval(s: Any, a: Any, b: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        mergeStep(s.toString, a.toString, b.toString))
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** `bpe_count_bytes(text): long` over RAW text — the byte-level
    * (no-OOV) twin of `bpe_count`.
    */
  case class BpeCountBytesExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_count_bytes"
    override def nullSafeEval(input: Any): Any =
      tokenCountBytes(input.toString)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `bpe_residual(text): long` — residual code-point token count. */
  case class BpeResidualExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_residual"
    override def nullSafeEval(input: Any): Any =
      residualCount(input.toString)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `bpe_residual_bytes(text): long` — residual UTF-8 byte count. */
  case class BpeResidualBytesExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_residual_bytes"
    override def nullSafeEval(input: Any): Any =
      residualCountBytes(input.toString)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def registerAll(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCountExpr].getName, "bpe_count"),
      (args: Seq[Expression]) => BpeCountExpr(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_pieces"),
      new ExpressionInfo(classOf[BpePiecesExpr].getName, "bpe_pieces"),
      (args: Seq[Expression]) => BpePiecesExpr(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_words"),
      new ExpressionInfo(classOf[BpeWordsExpr].getName, "bpe_words"),
      (args: Seq[Expression]) => BpeWordsExpr(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_residual"),
      new ExpressionInfo(classOf[BpeResidualExpr].getName, "bpe_residual"),
      (args: Seq[Expression]) => BpeResidualExpr(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_residual_bytes"),
      new ExpressionInfo(
        classOf[BpeResidualBytesExpr].getName, "bpe_residual_bytes"),
      (args: Seq[Expression]) => BpeResidualBytesExpr(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_count_bytes"),
      new ExpressionInfo(classOf[BpeCountBytesExpr].getName, "bpe_count_bytes"),
      (args: Seq[Expression]) => BpeCountBytesExpr(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_merge_step"),
      new ExpressionInfo(classOf[BpeMergeStepExpr].getName, "bpe_merge_step"),
      (args: Seq[Expression]) => BpeMergeStepExpr(args(0), args(1), args(2))))
  }

  // ---- DuckDB oracle twins (generated from the SAME merge table) ----

  /** `(0,'t','h'),(1,'i','n'),...` VALUES body for the merges CTE. */
  private def mergesValues: String = merges.zipWithIndex
    .map { case ((a, b), i) => s"($i,'$a','$b')" }.mkString(",")

  /** Recursive-CTE fragment computing `wlen(w, n)` — BPE token count per
    * distinct word of `docsRel.textCol` (already lowercased there) — by
    * replaying one leftmost-lowest-rank merge per recursion step on a
    * space-separated symbol string. Bind into a `WITH RECURSIVE` chain.
    */
  def sqlWordLenCte(docsRel: String, textCol: String): String = s"""
      bpe_merges(mrank, a, b) AS (VALUES $mergesValues),
      bpe_w0(w) AS (
        SELECT DISTINCT unnest(regexp_extract_all($textCol, '\\p{L}+'))
        FROM $docsRel),
      bpe_enc(w, s) AS (
        SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) FROM bpe_w0
        UNION ALL
        SELECT t.w,
          trim(substr(' '||t.s||' ', 1,
                 strpos(' '||t.s||' ', ' '||m.a||' '||m.b||' ') - 1)
            || ' ' || m.a || m.b || ' ' ||
            substr(' '||t.s||' ',
              strpos(' '||t.s||' ', ' '||m.a||' '||m.b||' ')
                + length(' '||m.a||' '||m.b||' ')))
        FROM (
          SELECT w, s,
            (SELECT min(m2.mrank) FROM bpe_merges m2
              WHERE strpos(' '||s||' ', ' '||m2.a||' '||m2.b||' ') > 0) AS r
          FROM bpe_enc) t
        JOIN bpe_merges m ON m.mrank = t.r),
      bpe_wlen AS (
        SELECT w, CAST(min(len(string_split(s, ' '))) AS BIGINT) AS n
        FROM bpe_enc GROUP BY w)"""

  /** Residual (non-letter, non-whitespace) CODE POINT count of lowercased
    * text — the single-token fallback class, same set as [[isWs]] +
    * `\p{L}` (DuckDB `length()` counts code points, as [[tokenCount]]
    * does).
    */
  def sqlOtherCount(textCol: String): String =
    s"length(regexp_replace($textCol, '[\\p{L} \\t\\n\\r]', '', 'g'))"

  /** Per-doc BPE token count as a CTE chain ending in
    * `bpe_doc(doc_id, n_bpe)`; append after [[sqlWordLenCte]].
    */
  def sqlDocCountCtes(docsRel: String, textCol: String): String = s"""
      bpe_wc AS (
        SELECT doc_id, w, count(*) AS c FROM (
          SELECT doc_id, unnest(regexp_extract_all($textCol, '\\p{L}+')) AS w
          FROM $docsRel) GROUP BY doc_id, w),
      bpe_word_tot AS (
        SELECT doc_id, sum(c * n) AS n_word
        FROM bpe_wc JOIN bpe_wlen USING (w) GROUP BY doc_id),
      bpe_doc AS (
        SELECT d.doc_id,
               CAST(coalesce(w.n_word, 0) +
                 ${sqlOtherCount(textCol)} AS BIGINT) AS n_bpe
        FROM $docsRel d LEFT JOIN bpe_word_tot w ON d.doc_id = w.doc_id)"""

  // ---- byte-level oracle twins (generated from bytesMerges) ----

  private def bytesMergesValues: String = bytesMerges.zipWithIndex
    .map { case ((a, b), i) => s"($i,'$a','$b')" }.mkString(",")

  /** Byte-level twin of [[sqlWordLenCte]]: `bpeb_wlen(w, n)` — the only
    * changes are the merge VALUES (hex-coded) and the initial symbol
    * string (`lower(hex(encode(w)))` split into byte pairs instead of
    * `(.)` code points); the recursive merge replay is identical.
    */
  def sqlWordLenCteBytes(docsRel: String, textCol: String): String = s"""
      bpeb_merges(mrank, a, b) AS (VALUES $bytesMergesValues),
      bpeb_w0(w) AS (
        SELECT DISTINCT unnest(regexp_extract_all($textCol, '\\p{L}+'))
        FROM $docsRel),
      bpeb_enc(w, s) AS (
        SELECT w, trim(regexp_replace(lower(hex(encode(w))), '(..)',
          '\\1 ', 'g'))
        FROM bpeb_w0
        UNION ALL
        SELECT t.w,
          trim(substr(' '||t.s||' ', 1,
                 strpos(' '||t.s||' ', ' '||m.a||' '||m.b||' ') - 1)
            || ' ' || m.a || m.b || ' ' ||
            substr(' '||t.s||' ',
              strpos(' '||t.s||' ', ' '||m.a||' '||m.b||' ')
                + length(' '||m.a||' '||m.b||' ')))
        FROM (
          SELECT w, s,
            (SELECT min(m2.mrank) FROM bpeb_merges m2
              WHERE strpos(' '||s||' ', ' '||m2.a||' '||m2.b||' ') > 0) AS r
          FROM bpeb_enc) t
        JOIN bpeb_merges m ON m.mrank = t.r),
      bpeb_wlen AS (
        SELECT w, CAST(min(len(string_split(s, ' '))) AS BIGINT) AS n
        FROM bpeb_enc GROUP BY w)"""

  /** Residual UTF-8 BYTE count of lowercased text — the byte-mode price
    * of the single-token fallback class (same residual set as
    * [[sqlOtherCount]], priced per byte instead of per code point).
    */
  def sqlOtherCountBytes(textCol: String): String =
    s"octet_length(encode(regexp_replace($textCol, " +
      s"'[\\p{L} \\t\\n\\r]', '', 'g')))"

  /** Per-doc byte-level BPE token count as a CTE chain ending in
    * `bpeb_doc(doc_id, n_bpe_bytes)`; append after
    * [[sqlWordLenCteBytes]].
    */
  def sqlDocCountCtesBytes(docsRel: String, textCol: String): String = s"""
      bpeb_wc AS (
        SELECT doc_id, w, count(*) AS c FROM (
          SELECT doc_id, unnest(regexp_extract_all($textCol, '\\p{L}+')) AS w
          FROM $docsRel) GROUP BY doc_id, w),
      bpeb_word_tot AS (
        SELECT doc_id, sum(c * n) AS n_word
        FROM bpeb_wc JOIN bpeb_wlen USING (w) GROUP BY doc_id),
      bpeb_doc AS (
        SELECT d.doc_id,
               CAST(coalesce(w.n_word, 0) +
                 ${sqlOtherCountBytes(textCol)} AS BIGINT) AS n_bpe_bytes
        FROM $docsRel d LEFT JOIN bpeb_word_tot w ON d.doc_id = w.doc_id)"""

  // ---- BPE TRAINING oracle (C14): k unrolled greedy merge rounds ----

  /** CTE chain replaying the DISTRIBUTED training loop exactly: per
    * round, count adjacent symbol pairs over the (word, count) vocab
    * weighted by corpus frequency, take the argmax with deterministic
    * (cnt DESC, a, b) byte-order ties — both engines compare strings
    * bytewise — and apply the merge to every word as the standard
    * greedy left-to-right symbol scan, expressed as a substring
    * replace over a DOUBLE-spaced symbol string (every boundary space
    * doubled, pattern ` a  b `→` ab `, spaces re-collapsed after):
    * doubling stops adjacent occurrences sharing a delimiter, making
    * the non-overlapping replace's match set exactly the greedy
    * scan's merge set (see the TokenizerIndex semantics note). Ends in
    * `bpe_learned(rank, a, b, cnt)` and `bpe_vfinal(w, s, c)` (the
    * vocab AFTER all k merges — its `s` is each word's learned-table
    * tokenization, which is how the learned counter prices documents
    * without re-running any merge loop).
    *
    * `AS MATERIALIZED` on each vocab round: every `bpe_tv{r}` is
    * referenced twice (pair counting + next round), so inlining would
    * double the tree per round — materialization keeps the replay
    * linear in k. A dried-up round (no pair left anywhere) degrades
    * gracefully: the empty argmax coalesces to a `chr(1)` sentinel
    * no-op replace and contributes no merge row, exactly like the
    * engine loop's early stop.
    */
  def sqlTrainCtes(
      docsRel: String, textCol: String, k: Int,
      bytesInit: Boolean = false): String = {
    // the ONLY byte-base difference is the initial symbolization —
    // hex byte pairs instead of code points; every training round is
    // symbol-string-agnostic (mirroring TokenizerIndex's engines)
    val init =
      if (bytesInit)
        "trim(regexp_replace(lower(hex(encode(w))), '(..)', '\\1 ', 'g'))"
      else "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    val head = s"""
      bpe_tw0 AS MATERIALIZED (
        SELECT w, count(*) AS c FROM (
          SELECT unnest(regexp_extract_all($textCol, '\\p{L}+')) AS w
          FROM $docsRel) GROUP BY w),
      bpe_tv0 AS MATERIALIZED (
        SELECT w, $init AS s, c
        FROM bpe_tw0)"""
    val rounds = (0 until k).map { r => s"""
      bpe_tp$r AS (
        SELECT u.pa AS pa, u.pb AS pb, CAST(sum(c) AS BIGINT) AS cnt FROM (
          SELECT c, unnest(list_transform(generate_series(1, len(a) - 1),
            i -> struct_pack(pa := a[i], pb := a[i+1]))) AS u
          FROM (SELECT string_split(s, ' ') AS a, c FROM bpe_tv$r) z) y
        GROUP BY u.pa, u.pb),
      bpe_tb$r AS MATERIALIZED (
        SELECT pa, pb, cnt FROM bpe_tp$r ORDER BY cnt DESC, pa, pb LIMIT 1),
      bpe_tv${r + 1} AS MATERIALIZED (
        SELECT w, trim(replace(
          replace(' ' || replace(s, ' ', '  ') || ' ',
            coalesce((SELECT ' '||pa||'  '||pb||' ' FROM bpe_tb$r), chr(1)),
            coalesce((SELECT ' '||pa||pb||' ' FROM bpe_tb$r), chr(1))),
          '  ', ' ')) AS s, c
        FROM bpe_tv$r)"""
    }.mkString(",", ",", "")
    val union = (0 until k)
      .map(r =>
        s"SELECT CAST($r AS BIGINT) AS rank, pa AS a, pb AS b, cnt FROM bpe_tb$r")
      .mkString("\n        UNION ALL ")
    s"""$head$rounds,
      bpe_learned AS (
        $union),
      bpe_vfinal AS (SELECT w, s, c FROM bpe_tv$k)"""
  }
}
