package graft.rayfall

/** The reference's interactive terminal line editor (`app/term.c`),
  * re-expressed as a DETERMINISTIC state machine over byte streams so
  * every behavior is spec-testable without a TTY: feed input bytes in,
  * ANSI output bytes come out through `write`, and completed balanced
  * expressions are returned to the caller (the REPL loop evaluates
  * them and calls [[prompt]] again).
  *
  * Mirrored surface (file:line cites into the reference):
  *  - key dispatch incl. every CTRL binding (term.c:1557-1680; note
  *    CTRL_N is bound to history-PREV and CTRL_P to history-NEXT there
  *    — mirrored verbatim)
  *  - escape sequences: arrows, word-wise ALT/CTRL arrows, Home/End
  *    (both variants), Delete (term.c:1405-1523)
  *  - multi-line continuation via the balance checker (parens/brackets/
  *    braces stack + double-quote state + backslash escapes,
  *    term.c:1269-1330) with the `┆ ` continuation prompt vs the `❯ `
  *    prompt (core/format.c:102-108)
  *  - `:q [code]` / `:t [0|1]` / `:?` commands, only outside multiline
  *    mode (term.c:1331-1366, COMMANDS_LIST term.c:59-62)
  *  - syntax-highlighted redraw: GRAY parens and `:commands`, GREEN
  *    known keywords/functions, LIGHT_BLUE operator chars, YELLOW
  *    closed strings, SALAD char literals, CYAN quoted symbols
  *    (term_redraw_into, term.c:708-814; colors core/format.h)
  *  - full-line redraw protocol: hide cursor, walk up the wrapped rows,
  *    clear below, repaint, reposition by visual width (term.c:816-866,
  *    term_goto_position term.c:156-192, visual width 123-154)
  *  - file-backed history with consecutive-duplicate suppression,
  *    save/restore of the in-progress line, and the prev/next direction
  *    semantics (hist_*, term.c:193-500); the file is the newline-
  *    separated text layout `.rayhist.dat` uses
  *  - TAB: close the innermost open paren, falling back to word
  *    completion against the keyword/function/global registries, or
  *    path completion inside an open string (term.c:1087-1264)
  *
  * Two documented simplifications, both cosmetic: the 80 ms
  * BACK_CYAN paren blink is emitted without the sleep (term.c:960-971
  * sleeps between paint and repaint — timing, not bytes), and word
  * completion cycles deterministically through
  * keywords → functions → globals on repeated TAB (the reference's
  * cycle state is partially reset by each redraw;
  * term_redraw's trailing autocp_reset_current, term.c:864). */
final class Term(
    write: String => Unit,
    keywords: () => Seq[String] = () => Seq.empty,
    functions: () => Seq[String] = () => Seq.empty,
    globals: () => Seq[String] = () => Seq.empty,
    histPath: Option[java.nio.file.Path] = None,
    var width: Int = 80,
    onExit: Int => Unit = _ => (),
    onTimeit: Boolean => Unit = _ => ()) {

  import Term._

  // ------------------------------------------------------------ state
  private val buf = new StringBuilder      // current line (term->buf)
  private var bufPos = 0                   // cursor (term->buf_pos)
  private val multiline = new StringBuilder // accumulated lines
  private val input = new StringBuilder    // pending escape bytes
  // visual row of the PHYSICAL cursor within the wrapped input (0 =
  // prompt row). The reference climbs last_total_rows-1 on redraw
  // (term.c:832-838), which over-climbs when the cursor sits on an
  // earlier wrapped row after Home/arrow moves — tracking the actual
  // row is the fix, and plain ASCII flows behave identically.
  private var physRow = 0

  // history (hist_t): lines + cursor-over-lines + saved current line
  private val histLines = scala.collection.mutable.ArrayBuffer[String]()
  private var histIdx = 0                  // n = "at the new line"
  private var currSaved: Option[String] = None
  private var lastInputLine = 1

  // autocomplete cycle state (autocp_*)
  private var acSaved: Option[(String, Int)] = None // original buf + pos
  private var acCandidates: Seq[String] = Seq.empty
  private var acIndex = 0

  // live history sink — cleared on the first failed write so an
  // unwritable location degrades to in-memory-only history
  private var histSink: Option[java.nio.file.Path] = histPath

  histPath.foreach { p =>
    try {
      if (java.nio.file.Files.exists(p)) {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        // the reference maps a NUL-padded 4MB file; data ends at the NUL
        val end =
          { val i = txt.indexOf('\u0000'); if (i < 0) txt.length else i }
        txt.substring(0, end).split("\n", -1).filter(_.nonEmpty)
          .foreach(histLines += _)
      }
    } catch {
      // unreadable history = start empty, don't kill the REPL
      case _: java.io.IOException | _: SecurityException => histSink = None
    }
  }
  histIdx = histLines.length

  /** 1-based line number the NEXT submitted input will get (error
    * traces; hist_line_number, term.c:496-498). */
  def lineNumber: Int = histLines.length + 1
  /** Line number of the last submitted input (term.c:527-529). */
  def lastLine: Int = lastInputLine
  /** History source for a 1-based line (hist_get_source). */
  def source(line: Int): Option[String] =
    if (line >= 1 && line <= histLines.length) Some(histLines(line - 1))
    else None

  private[graft] def bufferText: String = buf.toString
  private[graft] def cursor: Int = bufPos
  private[graft] def inMultiline: Boolean = multiline.nonEmpty

  // ---------------------------------------------------------- history
  // byte offset of the history file's data end — the first NUL. The
  // reference mmaps .rayhist.dat as a 4MB NUL-padded file (term.c:56,
  // hist_create fs_file_extend), so a plain append on a native-created
  // file would land AFTER the padding, where both the native reader and
  // this class's own first-NUL truncation drop it. Writes therefore go
  // INTO the data end, overwriting padding; lazily located once.
  private var histDataEnd: Long = -1L
  private def histAdd(line: String): Unit = {
    if (histLines.isEmpty || histLines.last != line) {
      histLines += line
      histSink.foreach { p =>
        // an unwritable location (read-only CWD, permission change)
        // degrades to in-memory-only history — persistence is a
        // convenience, never worth killing the interactive session
        // over (the first submitted line used to throw out of
        // handleReturn here)
        try {
          val bytes = (line + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val raf = new java.io.RandomAccessFile(p.toFile, "rw")
          try {
            if (histDataEnd < 0L) {
              val len = math.min(raf.length(), 16L << 20).toInt
              val all = new Array[Byte](len)
              raf.readFully(all, 0, len)
              val i = all.indexOf(0: Byte)
              histDataEnd = if (i < 0) raf.length() else i.toLong
            }
            raf.seek(histDataEnd)
            raf.write(bytes)
            histDataEnd += bytes.length
          } finally raf.close()
        } catch {
          case _: java.io.IOException | _: SecurityException =>
            histSink = None
        }
      }
    }
    histIdx = histLines.length
  }
  private def histSaveCurrent(): Unit =
    if (currSaved.isEmpty) currSaved = Some(buf.toString)
  private def histPrev(): Option[String] =
    if (histIdx > 0) { histIdx -= 1; Some(histLines(histIdx)) } else None
  private def histNext(): Option[String] =
    if (histIdx < histLines.length - 1) {
      histIdx += 1; Some(histLines(histIdx))
    } else { histIdx = histLines.length; None }
  private def histRestoreCurrent(): String = {
    val s = currSaved.getOrElse("")
    currSaved = None
    s
  }

  // ----------------------------------------------------------- prompt
  def prompt(): Unit = { write(s"$Green$PromptGlyph $Reset"); physRow = 0 }
  private def continuationPrompt(): Unit = {
    write(s"$Gray$ContGlyph $Reset"); physRow = 0
  }
  private def promptLen = 2 // visual width of "❯ " / "┆ "

  // ---------------------------------------------------- balance check
  /** term_check_balance (term.c:1269-1330): balanced brackets outside
    * double-quoted strings, with backslash escapes; single quotes are
    * symbol literals and never balance. */
  private[graft] def balanced(s: String): Boolean = {
    val stack = scala.collection.mutable.Stack[Char]()
    var inDq = false; var esc = false; var ok = true
    s.foreach { c =>
      if (!ok) ()
      else if (esc) esc = false
      else if (c == '\\') esc = true
      else if (c == '"') inDq = !inDq
      else if (!inDq) c match {
        case '(' | '[' | '{' => stack.push(c)
        case ')' | ']' | '}' =>
          if (stack.isEmpty || opposite(stack.pop()) != c) ok = false
        case _ => ()
      }
    }
    ok && stack.isEmpty && !inDq
  }

  // ---------------------------------------------------- visual layout
  /** Display width of a raw (unhighlighted) string: BMP code points are
    * width 1, supplementary (emoji) width 2 — term_visual_width's UTF-8
    * byte classes expressed over code points (term.c:123-154). */
  private def visual(s: String, len: Int): Int = {
    var w = 0; var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      w += (if (Character.charCount(cp) == 2) 2 else 1)
      i += Character.charCount(cp)
    }
    w
  }

  /** term_goto_position (term.c:156-192): vertical then horizontal
    * moves between two buffer positions under line wrapping. */
  private def gotoPosition(from: Int, to: Int): Unit = {
    if (width <= 0) return
    val fw = promptLen + visual(buf.toString, from)
    val tw = promptLen + visual(buf.toString, to)
    val (fr, fc) = (fw / width, fw % width)
    val (tr, tc) = (tw / width, tw % width)
    if (tr < fr) write(s"\u001b[${fr - tr}A")
    else if (tr > fr) write(s"\u001b[${tr - fr}B")
    if (tc < fc) write(s"\u001b[${fc - tc}D")
    else if (tc > fc) write(s"\u001b[${tc - fc}C")
    physRow = tr
  }

  // -------------------------------------------------------- highlight
  private def isAlphanum(c: Char) = c.isLetter && c < 128 || c.isDigit
  private def isOp(c: Char) = "+-*/%&|^~<>!=._?".indexOf(c) >= 0

  /** term_redraw_into (term.c:708-814): the prompt plus the buffer with
    * the reference's highlighting rules. */
  private[graft] def highlighted: String = {
    val sb = new StringBuilder
    sb ++= (if (multiline.nonEmpty) s"$Gray$ContGlyph $Reset"
            else s"$Green$PromptGlyph $Reset")
    val s = buf.toString; val l = s.length
    var i = 0
    while (i < l) {
      val c = s(i)
      var consumed = false
      c match {
        case '(' | ')' | '[' | ']' | '{' | '}' =>
          sb ++= s"$Gray$c$Reset"; consumed = true
        case ':' =>
          // a leading :cmd grays its alphanum/? run; a lone ':' grays
          // just itself (term.c:728-742)
          var j = i + 1
          if (i == 0 && l > 1) {
            while (j < l && (isAlphanum(s(j)) || s(j) == '?')) j += 1
          }
          sb ++= s"$Gray${s.substring(i, j)}$Reset"
          i = j - 1; consumed = true
        case _ =>
          if ((i == 0 || !isAlphanum(s(i - 1))) && isAlphanum(c)) {
            var j = i + 1
            while (j < l && (isAlphanum(s(j)) || s(j) == '-')) j += 1
            val word = s.substring(i, j)
            if (keywords().contains(word) || functions().contains(word)) {
              sb ++= s"$Green$word$Reset"
              i = j - 1; consumed = true
            }
          } else if (isOp(c)) {
            sb ++= s"$LightBlue$c$Reset"; consumed = true
          } else if (c == '"' && (i == 0 || s(i - 1) != '\\')) {
            var j = i + 1
            var close = -1
            while (j < l && close < 0) {
              if (s(j) == '"' && s(j - 1) != '\\') close = j
              j += 1
            }
            if (close >= 0) {
              sb ++= s"$Yellow${s.substring(i, close + 1)}$Reset"
              i = close; consumed = true
            }
          } else if (c == '\'') {
            if (i + 1 < l && s(i + 1) == '\'') { // empty char literal
              sb ++= s"$Salad''$Reset"; i += 1; consumed = true
            } else if (i + 2 < l && s(i + 2) == '\'') { // 'x'
              sb ++= s"$Salad${s.substring(i, i + 3)}$Reset"
              i += 2; consumed = true
            } else { // quoted symbol
              var j = i + 1
              while (j < l && (isAlphanum(s(j)) || s(j) == '-')) j += 1
              sb ++= s"$Cyan${s.substring(i, j)}$Reset"
              i = j - 1; consumed = true
            }
          }
          if (!consumed) sb += c
      }
      i += 1
    }
    sb.toString
  }

  /** term_redraw (term.c:816-866): hide cursor, climb the previously
    * painted wrapped rows, clear below, repaint, reposition. */
  private def redraw(): Unit = {
    write(CursorHide)
    write("\r")
    var r = 0
    while (r < physRow) { write("\u001b[1A\r"); r += 1 }
    write("\u001b[J")
    write(highlighted)
    // the repaint leaves the physical cursor on the input's last row
    physRow = if (width > 0)
      (promptLen + visual(buf.toString, buf.length)) / width else 0
    gotoPosition(buf.length, bufPos)
    write(CursorShow)
  }

  // --------------------------------------------------------- commands
  /** term_handle_return (term.c:1331-1404): commands outside multiline,
    * else accumulate + balance-check; Some(expr) = ready to evaluate,
    * None = continuation or handled in place. */
  private def handleReturn(): Option[String] = {
    if (buf.isEmpty && multiline.isEmpty) { write("\n"); prompt(); return None }
    val line = buf.toString
    if (multiline.isEmpty) {
      if (line.startsWith(":q")) {
        // i64_from_str semantics: a clean integer parse is the exit
        // code, anything else (junk, overflow) exits 0 (term.c:1347-1351)
        val code = line.drop(2).trim
        onExit(if (code.nonEmpty && code.forall(_.isDigit))
          scala.util.Try(code.toInt).getOrElse(0) else 0)
        resetLine(); return None
      }
      if (line.startsWith(":t")) {
        val on = line.length > 3 && line(3) == '1'
        onTimeit(on)
        write(s"\n$Yellow. Timeit is ${if (on) "on" else "off"}.$Reset")
        histAdd(line)
        resetLine(); write("\n"); prompt(); return None
      }
      if (line.startsWith(":?")) {
        write(s"\n$Yellow. Commands list:$Reset\n$Gray$CommandsList$Reset")
        resetLine(); write("\n"); prompt(); return None
      }
    }
    multiline ++= line
    if (!balanced(multiline.toString)) {
      multiline += '\n'
      resetLine()
      write("\n"); continuationPrompt()
      None
    } else {
      lastInputLine = lineNumber
      val expr = multiline.toString
      histAdd(expr)
      multiline.clear()
      resetLine()
      currSaved = None
      write("\n")
      Some(expr)
    }
  }

  private def resetLine(): Unit = { buf.clear(); bufPos = 0; physRow = 0 }

  // ----------------------------------------------------- autocomplete
  private def opposite(c: Char): Char = c match {
    case '(' => ')'; case '{' => '}'; case '[' => ']'
    case ')' => '('; case '}' => '{'; case ']' => '['
    case x => x
  }

  /** term_find_open_paren (term.c:992-1086): innermost unclosed
    * bracket / unclosed quote across the multiline buffer and the
    * current line up to the cursor. pos = -1 when it opened on an
    * earlier (multiline) line. */
  private def findOpen(): Option[(Int, Char)] = {
    var stack = List.empty[(Int, Char)]
    var sq = -1; var dq = -1; var prev = '\u0000'
    def scan(s: String, inCurrent: Boolean): Unit = {
      var i = 0
      while (i < s.length) {
        val c = s(i)
        c match {
          case ')' | '}' | ']' =>
            if (stack.nonEmpty && opposite(stack.head._2) == c)
              stack = stack.tail
          case '(' | '{' | '[' =>
            stack = ((if (inCurrent) i else -1), c) :: stack
          case '\'' => sq = if (sq == -1 && inCurrent) i else -1
          case '"' =>
            if (prev != '\\') dq = if (dq == -1) {
              if (inCurrent) i else -1
            } else -1
          case _ => ()
        }
        prev = c
        i += 1
      }
    }
    scan(multiline.toString, inCurrent = false)
    scan(buf.substring(0, bufPos), inCurrent = true)
    if (sq != -1) Some((sq, '\''))
    else if (dq != -1) Some((dq, '"'))
    else stack.headOption
  }

  private def acReset(): Unit = {
    acSaved = None; acCandidates = Seq.empty; acIndex = 0
  }

  /** term_autocomplete_word (term.c:1087-1162): cycle the word at the
    * cursor through keyword → function → global completions. */
  private def autocompleteWord(): Boolean = {
    if (acSaved.isEmpty) {
      acSaved = Some((buf.toString, bufPos))
      val (s, pos) = acSaved.get
      var start = pos
      while (start > 0 && (isAlphanum(s(start - 1)) || s(start - 1) == '-'))
        start -= 1
      var end = start
      while (end < s.length && (isAlphanum(s(end)) || s(end) == '-'))
        end += 1
      val prefix = s.substring(start, end)
      acCandidates =
        if (prefix.isEmpty) Seq.empty
        else (keywords() ++ functions() ++ globals())
          .filter(w => w.startsWith(prefix) && w != prefix).distinct
      acIndex = 0
    }
    val (orig, pos) = acSaved.get
    if (acCandidates.isEmpty || acIndex >= acCandidates.length) {
      // cycle exhausted: restart from the original next TAB
      acSaved = None; acIndex = 0
      return false
    }
    var start = pos
    while (start > 0 && (isAlphanum(orig(start - 1)) || orig(start - 1) == '-'))
      start -= 1
    var end = start
    while (end < orig.length && (isAlphanum(orig(end)) || orig(end) == '-'))
      end += 1
    val word = acCandidates(acIndex)
    acIndex += 1
    buf.clear()
    buf ++= orig.substring(0, start) ++ word ++ orig.substring(end)
    bufPos = start + word.length
    redraw()
    true
  }

  /** term_autocomplete_path (term.c:1164-1230): complete a filesystem
    * path inside an open string, cycling matches (sorted for
    * determinism). */
  private def autocompletePath(start: Int): Boolean = {
    if (acSaved.isEmpty) {
      acSaved = Some((buf.toString, bufPos))
      val s = acSaved.get._1
      var end = start
      while (end < s.length && !s(end).isWhitespace && s(end) != '"') end += 1
      val frag = s.substring(start, end)
      if (frag.isEmpty) { acCandidates = Seq.empty }
      else {
        val slash = frag.lastIndexOf('/')
        val (dir, prefix) =
          if (slash >= 0) (frag.substring(0, slash + 1),
            frag.substring(slash + 1))
          else ("./", frag)
        acCandidates =
          try {
            val d = java.nio.file.Paths.get(dir)
            val it = java.nio.file.Files.list(d).iterator()
            val names = scala.collection.mutable.ArrayBuffer[String]()
            while (it.hasNext) names += it.next().getFileName.toString
            names.sorted.toSeq
              .filter(n => n.startsWith(prefix) && n != prefix)
              .map(n => (if (slash >= 0) dir else "") + n)
          } catch { case _: Exception => Seq.empty }
      }
      acIndex = 0
    }
    val (orig, _) = acSaved.get
    if (acCandidates.isEmpty || acIndex >= acCandidates.length) {
      acSaved = None; acIndex = 0
      return false
    }
    var end = start
    while (end < orig.length && !orig(end).isWhitespace && orig(end) != '"')
      end += 1
    val repl = acCandidates(acIndex)
    acIndex += 1
    buf.clear()
    buf ++= orig.substring(0, start) ++ repl ++ orig.substring(end)
    bufPos = start + repl.length
    redraw()
    true
  }

  /** term_autocomplete_paren (term.c:1232-1262) — what TAB does. */
  private def handleTab(): Unit = findOpen() match {
    case None => autocompleteWord()
    case Some((pos, '"')) =>
      if (pos < 0 || !autocompletePath(pos + 1)) ()
    case Some((pos, tpe)) =>
      if (!autocompleteWord()) {
        if (pos >= 0) { // paren blink, minus the 80 ms sleep
          write(CursorHide)
          if (bufPos - pos > 0) write(s"\u001b[${bufPos - pos}D")
          write(s"$BackCyan${buf(pos)}$Reset")
          write(CursorShow)
        }
        buf.insert(bufPos, opposite(tpe))
        bufPos += 1
        redraw()
      }
  }

  // ------------------------------------------------------ escape keys
  private val EscapeSeqs = Seq(
    "\u001b[A", "\u001b[B", "\u001b[C", "\u001b[D",
    "\u001b[5C", "\u001b[5D", "\u001bf", "\u001bb",
    "\u001b[1~", "\u001b[H", "\u001b[4~", "\u001b[F", "\u001b[3~")

  private def handleEscape(seq: String): Unit = seq match {
    case "\u001b[A" => // up: recall previous
      histSaveCurrent()
      histPrev().foreach { l =>
        buf.clear(); buf ++= l; bufPos = l.length; redraw()
      }
    case "\u001b[B" => // down: recall next or restore the typed line
      // save the in-progress line first (the CTRL_P branch of the
      // reference does; its bare down-arrow loses the line to the
      // stale curr_len — term.c:1424-1436 vs 1648-1652)
      histSaveCurrent()
      val l = histNext().getOrElse(histRestoreCurrent())
      buf.clear(); buf ++= l; bufPos = l.length
      redraw()
    case "\u001bf" | "\u001b[5C" => // word right
      if (bufPos < buf.length) {
        val old = bufPos
        bufPos += 1
        while (bufPos < buf.length && isAlphanum(buf(bufPos))) bufPos += 1
        gotoPosition(old, bufPos)
      }
    case "\u001b[C" => // right
      if (bufPos < buf.length) { bufPos += 1; gotoPosition(bufPos - 1, bufPos) }
    case "\u001bb" | "\u001b[5D" => // word left
      if (bufPos > 0) {
        val old = bufPos
        bufPos -= 1
        while (bufPos > 0 && isAlphanum(buf(bufPos - 1))) bufPos -= 1
        gotoPosition(old, bufPos)
      }
    case "\u001b[D" => // left
      if (bufPos > 0) { bufPos -= 1; gotoPosition(bufPos + 1, bufPos) }
    case "\u001b[1~" | "\u001b[H" => // home
      if (bufPos > 0) { val o = bufPos; bufPos = 0; gotoPosition(o, 0) }
    case "\u001b[4~" | "\u001b[F" => // end
      if (buf.nonEmpty) {
        val o = bufPos; bufPos = buf.length; gotoPosition(o, bufPos)
      }
    case "\u001b[3~" => // delete
      deleteChar(); redraw()
    case _ => ()
  }

  // --------------------------------------------------------- edit ops
  // deletes operate on whole code points (a surrogate pair is one
  // character — the reference's find_prev_utf8_char rule, term.c:886)
  private def deleteChar(): Unit =
    if (bufPos < buf.length) {
      val n = Character.charCount(buf.toString.codePointAt(bufPos))
      (0 until n).foreach(_ => buf.deleteCharAt(bufPos))
    }

  private def backspace(): Unit = {
    if (bufPos == 0) return
    val pair = bufPos >= 2 && Character.isLowSurrogate(buf(bufPos - 1)) &&
      Character.isHighSurrogate(buf(bufPos - 2))
    val n = if (pair) 2 else 1
    (0 until n).foreach { _ => buf.deleteCharAt(bufPos - 1); bufPos -= 1 }
    // move left by the DISPLAY width of the removed character
    // (utf8_char_width: supplementary chars render 2 columns)
    write(if (pair) "\u001b[2D" else "\u001b[1D")
    redraw()
  }

  private def ctrlU(): Unit = {
    if (bufPos > 0) write(s"\u001b[${bufPos}D")
    write("\r\u001b[K")
    resetLine()
    currSaved = None
    if (multiline.nonEmpty) continuationPrompt() else prompt()
  }

  private def insert(c: Char): Unit = {
    buf.insert(bufPos, c)
    bufPos += 1
    redraw()
  }

  // multi-byte UTF-8 input assembly (the reference's utf8_char_width /
  // find_prev_utf8_char handling, term.c:867-903): continuation bytes
  // buffer until the sequence completes, then the decoded character —
  // possibly a surrogate pair — inserts as one edit
  private val utf8Buf = new java.io.ByteArrayOutputStream
  private def utf8Expected(b: Int): Int =
    if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else if ((b & 0xf8) == 0xf0) 4
    else 1
  private def feedUtf8(b: Int): Unit = {
    utf8Buf.write(b)
    val bytes = utf8Buf.toByteArray
    if (bytes.length >= utf8Expected(bytes(0) & 0xff)) {
      utf8Buf.reset()
      val s = new String(bytes, "UTF-8")
      acReset()
      s.foreach { ch => buf.insert(bufPos, ch); bufPos += 1 }
      redraw()
    }
  }

  // ------------------------------------------------------------ input
  /** Feed one input byte; Some(expr) when a complete balanced
    * expression was submitted (term_read, term.c:1557-1680). */
  def feed(b: Int): Option[String] = {
    if (input.nonEmpty) { // inside an escape sequence
      input += b.toChar
      val s = input.toString
      // CSI sequences (ESC [ params… final) end at a byte in 0x40-0x7e;
      // UNKNOWN ones are consumed whole and dropped — without this, an
      // unhandled key like Ctrl-Right (ESC[1;5C) would spill its tail
      // bytes into the buffer as literal text
      if (s.length == 2 && s(1) != '[') {
        input.clear()
        if (EscapeSeqs.contains(s)) handleEscape(s) // ESC f / ESC b
      } else if (s.length >= 3 && b >= 0x40 && b <= 0x7e) {
        input.clear()
        if (EscapeSeqs.contains(s)) handleEscape(s)
      } else if (s.length > 16) input.clear() // runaway guard
      return None
    }
    b match {
      case 0x1b => input += '\u001b'; None
      case '\r' | '\n' => acReset(); handleReturn()
      case '\b' | 0x7f => acReset(); backspace(); None
      case '\t' => handleTab(); None
      case 0x15 | 0x03 => acReset(); ctrlU(); None // CTRL_U / CTRL_C
      case 0x01 => // CTRL_A: line start
        gotoPosition(bufPos, 0); bufPos = 0; None
      case 0x02 => // CTRL_B: left
        if (bufPos > 0) { gotoPosition(bufPos, bufPos - 1); bufPos -= 1 }
        None
      case 0x04 => // CTRL_D: exit on empty line, else delete
        if (bufPos == 0 && buf.isEmpty) onExit(0)
        else { deleteChar(); redraw() }
        None
      case 0x05 => // CTRL_E: line end
        gotoPosition(bufPos, buf.length); bufPos = buf.length; None
      case 0x06 => // CTRL_F: right
        if (bufPos < buf.length) {
          gotoPosition(bufPos, bufPos + 1); bufPos += 1
        }
        None
      case 0x0b => // CTRL_K: kill to end
        while (bufPos < buf.length) deleteChar()
        redraw(); None
      case 0x0e => // CTRL_N — the reference binds it to history PREV
        histSaveCurrent()
        histPrev().foreach { l =>
          buf.clear(); buf ++= l; bufPos = l.length
        }
        redraw(); None
      case 0x10 => // CTRL_P — and CTRL_P to history NEXT
        histSaveCurrent()
        val l = histNext().getOrElse(histRestoreCurrent())
        buf.clear(); buf ++= l; bufPos = l.length
        redraw(); None
      case 0x17 => // CTRL_W: kill word backwards
        acReset()
        while (bufPos > 0 && isAlphanum(buf(bufPos - 1))) {
          buf.deleteCharAt(bufPos - 1); bufPos -= 1
        }
        redraw(); None
      case c if c >= 0x80 => feedUtf8(c); None
      case c if c >= 0x20 => acReset(); insert(c.toChar); None
      case _ => None
    }
  }

  /** Feed a whole string of input bytes; returns every completed
    * expression, in order. */
  def feedAll(s: String): Seq[String] =
    s.flatMap(c => feed(c.toInt)).toSeq
}

object Term {
  val Green = "\u001b[1;32m"
  val Yellow = "\u001b[1;33m"
  val LightBlue = "\u001b[1;38;5;39m"
  val Cyan = "\u001b[1;36m"
  val Gray = "\u001b[1;38;5;8m"
  val Salad = "\u001b[1;38;5;118m"
  val BackCyan = "\u001b[46m"
  val Reset = "\u001b[0m"
  val CursorHide = "\u001b[?25l"
  val CursorShow = "\u001b[?25h"
  val PromptGlyph = "❯" // ❯ (GLYPH_R_ARROW, core/format.c)
  val ContGlyph = "┆"   // ┆ (GLYPH_HDOTS)
  val CommandsList: String =
    "  :?  - Displays help.\n" +
    "  :t  - Turns on|off measurement of expressions: [0|1].\n" +
    "  :q  - Exits the application: [exit code]."
}
