package graft.wells

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Text-layer PDF extraction (S2) implemented from the PUBLIC PDF
  * specification (ISO 32000-1: §7 syntax, §7.3 objects, §7.4.4
  * FlateDecode, §9.4 text-showing operators) — the reference's
  * pdfplumber text layer (pdf_extraction.py:49-61) re-expressed with
  * zero dependencies beyond `java.util.zip.Inflater`, because this
  * container ships no PDF library and the S2 seam deserves a real
  * codec, not only fixtures.
  *
  * Scope — the subset a TEXT-LAYER extractor actually consumes:
  *   - classic cross-reference PDFs: indirect objects scanned directly
  *     (`N G obj … endobj`), so a damaged/absent xref table does not
  *     matter (the same resilience pdfminer's fallback scan has);
  *   - the page TREE walked in order from the trailer's /Root (or, if
  *     no classic trailer exists, the first /Type /Catalog object),
  *     /Kids recursion with a cycle guard, /Contents as a single
  *     stream or an array of streams;
  *   - stream data delimited by a DIRECT or indirect-reference /Length
  *     (resolved when direct; `endstream` search otherwise), filters
  *     none or /FlateDecode (also as a 1-element array);
  *   - text operators inside content streams: Tj, ', ", TJ (kerning
  *     gaps ≤ −180/1000 em render as a space — the standard word-gap
  *     heuristic), Td, TD, T*, Tm line breaks, string escapes (octal,
  *     specials, line continuations), literal and hex strings, with
  *     byte values read as Latin-1 (simple WinAnsi-class fonts; CID
  *     fonts with ToUnicode CMaps are out of scope and yield garbage
  *     text rather than a crash — the same failure mode every
  *     text-layer extractor has on unmapped CID content).
  *
  *   - PDF 1.5 object streams: every /Type /ObjStm is unpacked
  *     (offset-pair header + FlateDecode), so Catalog/Pages/Page dicts
  *     packed by modern writers resolve; /Root is also read from
  *     /Type /XRef stream dicts when no classic trailer exists. The
  *     xref-stream DATA itself is never decoded (objects are found by
  *     raw scan), so predictor filters need no support.
  *
  * Contract: NEVER throws on malformed input — a document this parser
  * cannot read extracts to zero pages, which is exactly the signal
  * [[Extraction.withFallback]] routes to the OCR leg (S4), mirroring
  * the reference's pdfplumber-fails→OCR ladder. */
object PdfText extends Extraction.DocumentTextExtractor {

  // ------------------------------------------------------------ values
  private sealed trait PVal
  private case class PDict(m: Map[String, PVal]) extends PVal
  private case class PArr(xs: Vector[PVal]) extends PVal
  private case class PRef(n: Int) extends PVal
  private case class PNum(d: Double) extends PVal
  private case class PName(s: String) extends PVal
  private case class PStr(bytes: Array[Byte]) extends PVal
  private case object POther extends PVal

  private def isWs(c: Char) = c == ' ' || c == '\n' || c == '\r' ||
    c == '\t' || c == '\f' || c == '\u0000'
  private def isDelim(c: Char) = "()<>[]{}/%".indexOf(c) >= 0

  /** Recursive-descent parser for one PDF value starting at `i0` in the
    * Latin-1 view `s`; returns (value, index after it). Tolerant: an
    * unrecognized construct consumes one char as POther. */
  private def parseVal(s: String, i0: Int): (PVal, Int) = {
    var i = i0
    while (i < s.length && isWs(s(i))) i += 1
    if (i >= s.length) return (POther, i)
    s(i) match {
      case '<' if i + 1 < s.length && s(i + 1) == '<' =>
        var j = i + 2
        var m = Map.empty[String, PVal]
        var done = false
        while (!done && j < s.length) {
          while (j < s.length && isWs(s(j))) j += 1
          if (j + 1 < s.length && s(j) == '>' && s(j + 1) == '>') {
            done = true; j += 2
          } else if (j < s.length && s(j) == '/') {
            val (k, j1) = parseName(s, j)
            val (v, j2) = parseVal(s, j1)
            m += (k -> v); j = j2
          } else j += 1 // skip junk inside a dict
        }
        (PDict(m), j)
      case '<' => // hex string
        val end = s.indexOf('>', i + 1)
        if (end < 0) (POther, s.length)
        else {
          val hex = s.substring(i + 1, end).filterNot(isWs)
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          val bytes = padded.grouped(2).map(h =>
            try Integer.parseInt(h, 16).toByte catch { case _: Exception => '?'.toByte }
          ).toArray
          (PStr(bytes), end + 1)
        }
      case '(' => parseLiteralString(s, i)
      case '[' =>
        var j = i + 1
        var xs = Vector.empty[PVal]
        var done = false
        while (!done && j < s.length) {
          while (j < s.length && isWs(s(j))) j += 1
          if (j < s.length && s(j) == ']') { done = true; j += 1 }
          else if (j < s.length) {
            val (v, j1) = parseVal(s, j)
            if (j1 == j) { j += 1 } else { xs :+= v; j = j1 }
          }
        }
        (PArr(xs), j)
      case '/' =>
        val (n, j) = parseName(s, i)
        (PName(n), j)
      case c if c == '+' || c == '-' || c == '.' || c.isDigit =>
        var j = i
        while (j < s.length && (s(j).isDigit || s(j) == '.' || s(j) == '+' || s(j) == '-')) j += 1
        val numStr = s.substring(i, j)
        // indirect reference lookahead: INT WS INT WS 'R'
        val num = try numStr.toDouble catch { case _: Exception => return (POther, j) }
        if (num == num.floor && num >= 0 && !numStr.contains('.')) {
          var k = j
          while (k < s.length && isWs(s(k))) k += 1
          var k2 = k
          while (k2 < s.length && s(k2).isDigit) k2 += 1
          if (k2 > k) {
            var k3 = k2
            while (k3 < s.length && isWs(s(k3))) k3 += 1
            if (k3 < s.length && s(k3) == 'R' &&
              (k3 + 1 >= s.length || isWs(s(k3 + 1)) || isDelim(s(k3 + 1))))
              return (PRef(num.toInt), k3 + 1)
          }
        }
        (PNum(num), j)
      case _ =>
        // keyword (true/false/null/operator) — consume the token
        var j = i
        while (j < s.length && !isWs(s(j)) && !isDelim(s(j))) j += 1
        (POther, math.max(j, i + 1))
    }
  }

  private def parseName(s: String, i0: Int): (String, Int) = {
    var j = i0 + 1
    val b = new StringBuilder
    while (j < s.length && !isWs(s(j)) && !isDelim(s(j))) { b += s(j); j += 1 }
    (b.toString, j)
  }

  /** Literal string `(…)` with balanced parens and §7.3.4.2 escapes. */
  private def parseLiteralString(s: String, i0: Int): (PStr, Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var depth = 1
    var j = i0 + 1
    while (depth > 0 && j < s.length) {
      s(j) match {
        case '\\' if j + 1 < s.length =>
          s(j + 1) match {
            case 'n' => out.write('\n'); j += 2
            case 'r' => out.write('\r'); j += 2
            case 't' => out.write('\t'); j += 2
            case 'b' => out.write('\b'); j += 2
            case 'f' => out.write('\f'); j += 2
            case '(' => out.write('('); j += 2
            case ')' => out.write(')'); j += 2
            case '\\' => out.write('\\'); j += 2
            case '\n' => j += 2 // line continuation
            case '\r' => j += (if (j + 2 < s.length && s(j + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' =>
              var k = j + 1
              var v = 0
              while (k < s.length && k < j + 4 && s(k) >= '0' && s(k) <= '7') {
                v = v * 8 + (s(k) - '0'); k += 1
              }
              out.write(v & 0xff); j = k
            case other => out.write(other); j += 2
          }
        case '(' => depth += 1; out.write('('); j += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.write(')')
          j += 1
        case c => out.write(c); j += 1
      }
    }
    (PStr(out.toByteArray), j)
  }

  // ------------------------------------------------------------ objects
  /** `at` is the object's byte offset in the document — collision
    * resolution between duplicate definitions (incremental updates
    * append superseding objects) is LATER-IN-DOCUMENT WINS, which needs
    * the position to be deterministic (a HashMap iteration is not). */
  /** `intVal` carries a BARE-INTEGER object's value (`N G obj 42 endobj`
    * — spec-legal for indirect /Length, /Width, etc.): recording it at
    * scan time lets indirect integer attributes resolve through the objs
    * map — which already implements last-definition-wins supersession —
    * instead of regexing the whole document string, where a numeric
    * coincidence inside unrelated stream bytes could match first. */
  private case class PdfObject(dict: PDict, streamData: Option[Array[Byte]],
      at: Int, intVal: Option[Long] = None)

  private val ObjStart =
    java.util.regex.Pattern.compile("(?<![0-9])(\\d+)\\s+\\d+\\s+obj\\b")

  /** Scan every `N G obj` in the document; returns objNum → object.
    * Stream data is sliced by a direct /Length when present (indirect
    * lengths resolve in a second pass; a still-unresolved one falls back
    * to the next `endstream`).
    *
    * Matches that begin INSIDE a previous object's stream extent are
    * skipped: compressed/binary stream bytes that happen to spell
    * `N G obj` would otherwise create a spurious entry shadowing the
    * real object N in the last-wins toMap (blank or wrong page text).
    * The extent is tracked in document order with the direct /Length
    * when present, else the next `endstream` — the same slice pass 2
    * takes, so real objects (which never start inside a stream) are
    * never skipped. */
  /** The endstream fallback extent: compressed bytes can contain the
    * literal `endstream`, so prefer the first occurrence FOLLOWED (after
    * whitespace) by `endobj` — the writer-emitted terminator shape — and
    * fall back to the first bare occurrence only when none qualifies
    * (a truncated tail). Narrows the embedded-`endstream` false-positive
    * window for streams whose /Length is indirect (where the extent
    * cannot come from the dict in pass 1). */
  private def endstreamAt(s: String, from: Int): Int = {
    val first = s.indexOf("endstream", from)
    var e = first
    while (e >= 0) {
      var k = e + "endstream".length
      while (k < s.length && isWs(s(k))) k += 1
      if (s.startsWith("endobj", k)) return e
      e = s.indexOf("endstream", e + 1)
    }
    first
  }

  private def scanObjects(s: String, raw: Array[Byte]): Map[Int, PdfObject] = {
    // pass 1: positions + dicts + provisional stream slices
    case class Prov(num: Int, dict: PDict, afterDict: Int, at: Int,
        intVal: Option[Long])
    val m = ObjStart.matcher(s)
    var provs = Vector.empty[Prov]
    var minStart = 0 // next match must start at/after this (past prior stream)
    while (m.find()) {
      if (m.start() >= minStart) {
        val num = m.group(1).toInt
        var i = m.end()
        while (i < s.length && isWs(s(i))) i += 1
        // dict bodies parse as before; a NUMERIC body is parsed too, so a
        // bare-integer object's value lands in the objs map (intVal) —
        // parseVal's R-lookahead keeps `N 0 obj 5 0 R endobj` a PRef,
        // which records nothing
        val (v, j) =
          if (i + 1 < s.length &&
            (s(i) == '<' && s(i + 1) == '<' ||
              s(i).isDigit || s(i) == '+' || s(i) == '-' || s(i) == '.'))
            parseVal(s, i)
          else (PDict(Map.empty), i)
        val dict = v match { case d: PDict => d; case _ => PDict(Map.empty) }
        val iv = v match {
          case PNum(n) if n == n.floor && math.abs(n) <= Long.MaxValue.toDouble =>
            Some(n.toLong)
          case _ => None
        }
        provs :+= Prov(num, dict, j, m.start(), iv)
        // advance the skip pointer past this object's stream body, if any
        var k = j
        while (k < s.length && isWs(s(k))) k += 1
        if (s.startsWith("stream", k)) {
          var d0 = k + "stream".length
          if (d0 < s.length && s(d0) == '\r') d0 += 1
          if (d0 < s.length && s(d0) == '\n') d0 += 1
          // the length bound compares in Double — a hostile /Length of
          // 3e9 would saturate toInt and wrap the Int addition negative,
          // passing the guard it was meant to fail
          minStart = dict.m.get("Length") match {
            case Some(PNum(n)) if n >= 0 && n <= (s.length - d0).toDouble =>
              d0 + n.toInt
            case _ =>
              val e = endstreamAt(s, d0)
              if (e < 0) s.length else e
          }
        }
      }
    }
    val dicts = provs.map(p => p.num -> p.dict).toMap
    // bare-integer object values, last definition wins (document order)
    val intVals = provs.flatMap(p => p.intVal.map(p.num -> _)).toMap
    // lengths validated as DOUBLES before any toInt: a hostile /Length
    // (3e9, or a 10-digit textual integer that would throw in toInt)
    // must degrade to the endstream fallback for THAT stream, never
    // saturate/overflow into a copyOfRange(from > to) throw that voids
    // the whole document
    def directLength(d: PDict): Option[Int] = (d.m.get("Length") match {
      case Some(PNum(n)) => Some(n)
      case Some(PRef(r)) => dicts.get(r).flatMap(_.m.get("Length")).collect {
        case PNum(n) => n
      } orElse {
        // /Length N 0 R where object N is a bare integer (no dict):
        // pass 1 recorded its value — resolve through that (supersession-
        // aware, never fooled by digits inside stream bytes); the textual
        // scan survives only as the fallback for an object the scan never
        // saw (e.g. packed in a not-yet-unpacked ObjStm)
        intVals.get(r).map(_.toDouble)
      } orElse {
        val lm = java.util.regex.Pattern
          .compile("(?<![0-9])" + r + "\\s+\\d+\\s+obj\\s+(\\d+)").matcher(s)
        if (lm.find()) Some(lm.group(1).toDouble) else None
      }
      case _ => None
    }).collect { case n if n >= 0 && n <= Int.MaxValue.toDouble => n.toInt }
    provs.map { p =>
      var i = p.afterDict
      while (i < s.length && isWs(s(i))) i += 1
      val stream =
        if (s.startsWith("stream", i)) {
          var d0 = i + "stream".length
          if (d0 < s.length && s(d0) == '\r') d0 += 1
          if (d0 < s.length && s(d0) == '\n') d0 += 1
          val end = directLength(p.dict) match {
            case Some(len) if d0.toLong + len <= raw.length => d0 + len
            case _ =>
              val e = endstreamAt(s, d0)
              if (e < 0) raw.length
              else { // trim the EOL the writer put before endstream
                var e2 = e
                if (e2 > d0 && s(e2 - 1) == '\n') e2 -= 1
                if (e2 > d0 && s(e2 - 1) == '\r') e2 -= 1
                e2
              }
          }
          Some(java.util.Arrays.copyOfRange(raw, d0, math.min(end, raw.length)))
        } else None
      // document-ordered Vector → toMap last-wins: a LATER direct
      // definition (incremental update) deterministically supersedes
      p.num -> PdfObject(p.dict, stream, p.at, p.intVal)
    }.toMap
  }

  /** Hard ceiling on one stream's inflated size. A crafted FlateDecode
    * stream (deflate bomb) would otherwise expand unboundedly and raise
    * OutOfMemoryError — an Error, not NonFatal, so it would escape
    * [[extract]]'s catch and kill the executor. Past the cap the stream
    * is returned truncated, the same degradation as a truncated stream:
    * the page yields partial/blank text, never a crash. 64 MiB is ~3
    * orders of magnitude above any real page content stream. */
  private val MaxInflatedBytes = 64 << 20

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      // sizing hint only — .toLong first so a >512 MiB input cannot
      // overflow Int into a negative ctor argument
      val out = new java.io.ByteArrayOutputStream(
        math.min(data.length.toLong * 4L, MaxInflatedBytes.toLong).toInt)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        // DataFormatException (corrupt deflate bytes mid-stream) degrades
        // to whatever inflated so far — the truncated-stream contract;
        // letting it escape would void the WHOLE document for one bad
        // stream (extract()'s catch is document-scoped)
        val n = try inf.inflate(buf) catch {
          case _: java.util.zip.DataFormatException => return out.toByteArray
        }
        if (n == 0 && !inf.finished()) return out.toByteArray // truncated
        if (out.size.toLong + n > MaxInflatedBytes) { // deflate bomb: truncate
          out.write(buf, 0, MaxInflatedBytes - out.size)
          return out.toByteArray
        }
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  private def decodedStream(o: PdfObject): Option[Array[Byte]] =
    o.streamData.map { data =>
      o.dict.m.get("Filter") match {
        case Some(PName("FlateDecode")) => inflate(data)
        case Some(PArr(Vector(PName("FlateDecode")))) => inflate(data)
        case None => data
        case Some(_) => Array.empty[Byte] // unsupported filter → blank page
      }
    }

  /** PDF 1.5 object streams (§7.5.7): a `/Type /ObjStm` stream packs N
    * non-stream objects — header of N (objnum, offset) integer pairs,
    * then each object's value at /First + offset. Unpack every ObjStm
    * so Catalog/Pages/Page dicts packed by modern writers become
    * visible; directly-scanned objects win on number collision (an
    * incremental update appends direct objects that supersede packed
    * ones), and collisions BETWEEN ObjStms resolve later-in-document
    * wins (containers folded in ascending byte offset — an
    * incrementally-updated file's appended ObjStm supersedes the
    * original's packed definitions; a HashMap-iteration fold would pick
    * a nondeterministic winner). Content streams stay regular objects
    * by spec (no streams inside an ObjStm), so page text needs nothing
    * further. */
  private def unpackObjectStreams(objs: Map[Int, PdfObject]): Map[Int, PdfObject] = {
    val IntTok = java.util.regex.Pattern.compile("\\d+")
    def num(d: PDict, k: String): Option[Int] =
      d.m.get(k).collect { case PNum(n) => n.toInt }
    val unpacked = objs.values.toSeq
      .filter(o => o.dict.m.get("Type").contains(PName("ObjStm")))
      .sortBy(_.at)
      .flatMap { o =>
        (decodedStream(o), num(o.dict, "N"), num(o.dict, "First")) match {
          // hostile negative /First (or /N) must degrade to skipping this
          // container, not throw out of substring and void the document
          case (Some(data), Some(n), Some(first))
              if n >= 0 && first >= 0 && first <= data.length =>
            val s = new String(data, ISO_8859_1)
            val tok = IntTok.matcher(s.substring(0, first))
            // header numbers parse as LONGS with an explicit width cap: an
            // 11+-digit hostile token would throw out of toInt (voiding
            // the document). The too-wide sentinel is -1L so the >= 0
            // guards below SKIP the entry — a Long.MaxValue sentinel was
            // tried first and defeated the bounds guard it fed (first +
            // Long.MaxValue wraps negative, passing < data.length, and
            // the entry parsed at a junk offset instead of being skipped)
            var header = Vector.empty[Long]
            while (header.length < 2L * n && tok.find()) {
              val t = tok.group
              header :+= (if (t.length > 18) -1L else t.toLong)
            }
            header.grouped(2).collect { case Vector(objNum, off)
              if objNum >= 0L && objNum <= Int.MaxValue.toLong &&
                off >= 0L && first.toLong + off < data.length =>
              val pv = parseVal(s, first + off.toInt)._1
              val dict = pv match {
                case d: PDict => d
                case _ => PDict(Map.empty) // bare int/array object: keep the slot
              }
              // a packed bare-integer object's value is recorded just like
              // a direct one's, so indirect /Width-class refs into an
              // ObjStm resolve through the objs map too
              val iv = pv match {
                case PNum(nv) if nv == nv.floor &&
                  math.abs(nv) <= Long.MaxValue.toDouble => Some(nv.toLong)
                case _ => None
              }
              // children carry the CONTAINER's offset: supersession is a
              // property of which update appended the ObjStm
              objNum.toInt -> PdfObject(dict, None, o.at, iv)
            }.toSeq
          case _ => Seq.empty
        }
      }.toMap // ascending container offset → last (latest) wins
    unpacked ++ objs // direct definitions win
  }

  // ------------------------------------------------------------ page tree
  private def pageRefsInOrder(objs: Map[Int, PdfObject], s: String): Seq[Int] = {
    def name(d: PDict, k: String): Option[String] =
      d.m.get(k).collect { case PName(n) => n }
    // /Root resolution follows incremental-update semantics (readers
    // start from the LAST startxref): the last classic trailer carrying
    // /Root wins, else the latest-in-document /Type /XRef stream dict
    // carrying /Root, else the latest /Type /Catalog object — every rung
    // deterministic by document position (a collectFirst over HashMap
    // values could return a stale update's catalog on some hash orders)
    val rootNum: Option[Int] = {
      val tm = java.util.regex.Pattern
        .compile("trailer\\s*<<").matcher(s)
      var found: Option[Int] = None
      while (tm.find()) {
        parseVal(s, tm.end() - 2) match {
          case (d: PDict, _) =>
            found = d.m.get("Root").collect { case PRef(r) => r }.orElse(found)
          case _ =>
        }
      }
      found.orElse(
        objs.values.toSeq.sortBy(_.at)
          .filter(o => name(o.dict, "Type").contains("XRef"))
          .flatMap(_.dict.m.get("Root").collect { case PRef(r) => r })
          .lastOption)
        .orElse(
          objs.toSeq
            .filter { case (_, o) => name(o.dict, "Type").contains("Catalog") }
            .sortBy(_._2.at).lastOption.map(_._1))
    }
    val pagesRoot = rootNum.flatMap(r => objs.get(r))
      .flatMap(_.dict.m.get("Pages")).collect { case PRef(r) => r }
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(n: Int): Seq[Int] = {
      if (!seen.add(n)) return Nil
      objs.get(n) match {
        case Some(o) if name(o.dict, "Type").contains("Page") => Seq(n)
        case Some(o) =>
          o.dict.m.get("Kids") match {
            case Some(PArr(kids)) =>
              kids.collect { case PRef(r) => r }.flatMap(walk)
            case _ => Nil
          }
        case None => Nil
      }
    }
    pagesRoot.map(walk).getOrElse {
      // no walkable tree: every /Type /Page in document order
      objs.toSeq
        .filter { case (_, o) => name(o.dict, "Type").contains("Page") }
        .sortBy(_._1).map(_._1)
    }
  }

  // ------------------------------------------------------------ text ops
  /** Decode one page's concatenated content streams into text: line
    * breaks from Td, TD, T*, Tm and the quote operators; runs from the
    * show operators; TJ kerning gaps ≤ −180 as a space. */
  private[wells] def contentText(content: Array[Byte]): String = {
    val s = new String(content, ISO_8859_1)
    val lines = Vector.newBuilder[String]
    val line = new StringBuilder
    var operands = Vector.empty[PVal]
    def newline(): Unit = {
      if (line.nonEmpty) { lines += line.toString; line.clear() }
    }
    def show(v: PVal): Unit = v match {
      case PStr(b) => line ++= new String(b, ISO_8859_1)
      case _ =>
    }
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (isWs(c)) i += 1
      else if (c == '%') { // comment to EOL
        while (i < s.length && s(i) != '\n' && s(i) != '\r') i += 1
      } else if (c == '(' || c == '[' || c == '/' || c == '<' ||
        c == '+' || c == '-' || c == '.' || c.isDigit) {
        val (v, j) = parseVal(s, i)
        operands :+= v
        i = math.max(j, i + 1)
      } else {
        var j = i
        while (j < s.length && !isWs(s(j)) && !isDelim(s(j))) j += 1
        val op = s.substring(i, j)
        op match {
          case "Tj" => operands.lastOption.foreach(show)
          case "'" => newline(); operands.lastOption.foreach(show)
          case "\"" => newline(); operands.lastOption.foreach(show)
          case "TJ" => operands.lastOption match {
            case Some(PArr(xs)) => xs.foreach {
              case p: PStr => show(p)
              case PNum(n) if n <= -180 => line += ' '
              case _ =>
            }
            case _ =>
          }
          case "Td" | "TD" =>
            // a vertical move is a line break; pure-horizontal is a gap
            val ty = operands.lastOption.collect { case PNum(n) => n }.getOrElse(0d)
            if (ty != 0d) newline()
            else if (line.nonEmpty && !line.endsWith(" ")) line += ' '
          case "T*" => newline()
          case "Tm" => newline()
          case "ET" => newline()
          case _ => // every other operator: drop with its operands
        }
        operands = Vector.empty
        i = math.max(j, i + 1)
      }
    }
    newline()
    lines.result().mkString("\n")
  }

  // ------------------------------------------------------------ entry
  /** Bytes → page texts. Zero pages on anything unreadable (the
    * fallback signal), never an exception. */
  def extract(content: Array[Byte]): Seq[String] =
    try {
      val s = new String(content, ISO_8859_1)
      if (!s.startsWith("%PDF-")) return Seq.empty
      val objs = unpackObjectStreams(scanObjects(s, content))
      val pages = pageRefsInOrder(objs, s)
      pages.map { pn =>
        val contents = objs(pn).dict.m.get("Contents") match {
          case Some(PRef(r)) => Seq(r)
          case Some(PArr(xs)) => xs.collect { case PRef(r) => r }
          case _ => Seq.empty
        }
        val data = contents.flatMap(r => objs.get(r).flatMap(decodedStream))
        if (data.isEmpty) ""
        else contentText(data.reduce(_ ++ Array('\n'.toByte) ++ _))
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  // ------------------------------------------------------------ images
  /** One image XObject as an OCR input: pixel geometry + sample layout
    * (bits per component, color-space name — what a raster consumer
    * needs to interpret FlateDecode raw samples) + the PDF filter name
    * + the stream bytes in the form an OCR/image library consumes —
    * FlateDecode is inflated to raw samples here (the same machinery
    * content streams use); DCTDecode/JPXDecode data is kept VERBATIM
    * because it already IS a complete JPEG/JPEG-2000 file. Metadata a
    * writer omitted (or expressed as an unresolvable construct) reads
    * as 0 / "" — the engine decides whether it can proceed. */
  final case class PdfImage(name: String, width: Int, height: Int,
      bitsPerComponent: Int, colorSpace: String, filter: String,
      data: Array[Byte])

  /** The SCANNED-PDF surface for the OCR leg (S3): per page, the
    * /Resources → /XObject entries with /Subtype /Image, in XObject
    * NAME order (deterministic; the content stream's Do order needs a
    * renderer and buys nothing for full-page scans, which have exactly
    * one image). The reference rasterizes whole pages
    * (pdf_extraction.py:63-71, pdf2image) because pytesseract wants a
    * bitmap; without a rasterizer in this container the no-render
    * equivalent is the page's embedded scan image itself — for the
    * scanned documents the OCR ladder exists for, the page IS one
    * full-page image XObject. Vector-drawn pages (no image XObjects)
    * yield an empty page entry, the same blank-page degradation as an
    * unsupported content filter. Same contract as [[extract]]: never
    * throws; unreadable input → empty. */
  def imagesPerPage(content: Array[Byte]): Seq[Seq[PdfImage]] =
    try {
      val s = new String(content, ISO_8859_1)
      if (!s.startsWith("%PDF-")) return Seq.empty
      val objs = unpackObjectStreams(scanObjects(s, content))
      // a value that may be written inline or as an indirect reference
      def deref(v: Option[PVal]): Option[PVal] = v match {
        case Some(PRef(r)) => objs.get(r).map(_.dict)
        case other => other
      }
      // an integer attribute may be inline or an indirect reference to a
      // bare-integer object (spec-legal for /Width etc.): refs resolve
      // through the objs map (intVal recorded at scan time — last
      // definition wins, like every other lookup), falling back to the
      // textual document scan ONLY when the object is absent from the
      // map entirely; a whole-document regex as the primary path could
      // match a numeric coincidence inside unrelated stream bytes first
      def intOf(v: Option[PVal]): Int = v match {
        case Some(PNum(n)) if n >= 0 && n <= Int.MaxValue => n.toInt
        case Some(PRef(r)) => objs.get(r) match {
          case Some(o) => o.intVal match {
            case Some(n) if n >= 0L && n <= Int.MaxValue.toLong => n.toInt
            case _ => 0 // known object, not a usable int: 0, never a guess
          }
          case None =>
            val lm = java.util.regex.Pattern
              .compile("(?<![0-9])" + r + "\\s+\\d+\\s+obj\\s+(\\d+)").matcher(s)
            if (lm.find() && lm.group(1).length <= 9) lm.group(1).toInt else 0
        }
        case _ => 0
      }
      // /Resources is an INHERITABLE page-tree attribute (ISO 32000-1
      // §7.7.3.4): scanner drivers commonly hang one shared dict off the
      // /Pages node — absent on the page, walk /Parent (cycle-guarded)
      // to the nearest ancestor carrying it
      def inheritedResources(start: Int): Option[PVal] = {
        val seen = scala.collection.mutable.Set.empty[Int]
        var at = start
        while (seen.add(at)) {
          objs.get(at) match {
            case Some(o) =>
              val res = deref(o.dict.m.get("Resources"))
              if (res.isDefined) return res
              o.dict.m.get("Parent") match {
                case Some(PRef(r)) => at = r
                case _ => return None
              }
            case None => return None
          }
        }
        None
      }
      pageRefsInOrder(objs, s).map { pn =>
        val xobj = inheritedResources(pn) match {
          case Some(d: PDict) => deref(d.m.get("XObject"))
          case _ => None
        }
        xobj match {
          case Some(PDict(m)) =>
            m.toSeq.sortBy(_._1).flatMap { case (name, v) =>
              val target = v match { case PRef(r) => objs.get(r); case _ => None }
              target
                .filter(_.dict.m.get("Subtype").contains(PName("Image")))
                .flatMap { o =>
                  // a multi-element /Filter array (e.g. [/FlateDecode
                  // /DCTDecode], spec-legal for compressed JPEGs) keeps the
                  // WHOLE chain, space-joined, in PdfImage.filter — an
                  // engine that only understands single names sees an
                  // unknown string and refuses loudly, instead of reading
                  // still-deflated bytes labeled as unfiltered; a leading
                  // FlateDecode is applied here (the one filter this codec
                  // implements), so "FlateDecode DCTDecode" data is the
                  // complete JPEG the rest of the chain describes
                  val filters: Vector[String] = o.dict.m.get("Filter") match {
                    case Some(PName(f)) => Vector(f)
                    case Some(PArr(xs)) => xs.collect { case PName(f) => f }
                    case _ => Vector.empty
                  }
                  val filter = filters.mkString(" ")
                  val data =
                    if (filters.headOption.contains("FlateDecode"))
                      o.streamData.map(inflate)
                    else o.streamData
                  val cs = deref(o.dict.m.get("ColorSpace")) match {
                    case Some(PName(c)) => c
                    case _ => ""
                  }
                  data.map(d => PdfImage(name,
                    intOf(o.dict.m.get("Width")),
                    intOf(o.dict.m.get("Height")),
                    intOf(o.dict.m.get("BitsPerComponent")), cs, filter, d))
                }
            }
          case _ => Seq.empty
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Magic-byte dispatch: `%PDF-` → this codec, anything else → the
    * UTF-8/form-feed passthrough — so one scan serves a mixed directory
    * of real PDFs and text fixtures (Main's extract stage). */
  object AutoDetect extends Extraction.DocumentTextExtractor {
    def extract(content: Array[Byte]): Seq[String] =
      if (content.length >= 5 &&
        new String(content, 0, 5, ISO_8859_1) == "%PDF-")
        PdfText.extract(content)
      else Extraction.TextPassthroughExtractor.extract(content)
  }
}
