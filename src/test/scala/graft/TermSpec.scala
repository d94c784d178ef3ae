package graft

import graft.rayfall.{Rayfall, Term}
import org.scalatest.funsuite.AnyFunSuite

/** The terminal line editor (reference `app/term.c`) driven as a pure
  * byte-in / ANSI-out state machine: submission and multi-line
  * continuation, the balance checker, commands, history semantics
  * (incl. the save/restore of the in-progress line), cursor/edit keys,
  * TAB completion (paren close, word cycle, path), syntax-highlight
  * goldens, and wrapped-line redraws. */
class TermSpec extends AnyFunSuite {
  import Term._

  private val Esc = "\u001b"

  private def mk(out: StringBuilder = new StringBuilder,
                 fns: Seq[String] = Rayfall.builtinFunctions,
                 kws: Seq[String] = Rayfall.builtinKeywords,
                 globals: Seq[String] = Seq.empty,
                 width: Int = 80,
                 hist: Option[java.nio.file.Path] = None,
                 onExit: Int => Unit = _ => (),
                 onTimeit: Boolean => Unit = _ => ()) =
    new Term(s => out ++= s, () => kws, () => fns, () => globals,
      hist, width, onExit, onTimeit)

  test("a balanced line submits on RETURN; unbalanced input opens " +
      "multiline mode with the continuation prompt (term.c:1331-1404)") {
    val out = new StringBuilder
    val t = mk(out)
    assert(t.feedAll("(+ 1 2)\r") == Seq("(+ 1 2)"))
    // unbalanced: RETURN yields nothing, continuation prompt printed,
    // the final balanced form carries the embedded newline
    out.clear()
    val r1 = t.feedAll("(set x\r")
    assert(r1.isEmpty && t.inMultiline)
    assert(out.toString.contains(s"$Gray$ContGlyph $Reset"),
      "continuation prompt expected")
    assert(t.feedAll("5)\r") == Seq("(set x\n5)"))
    assert(!t.inMultiline)
  }

  test("the balance checker: strings hide brackets, escapes hide " +
      "quotes, mismatches never balance (term_check_balance)") {
    val t = mk()
    assert(t.balanced("""(f "a(b")"""))
    assert(!t.balanced("""(f "unclosed)"""))
    assert(t.balanced("""(f "esc\" q")"""))
    assert(!t.balanced("(]"))
    assert(!t.balanced("([)]"))
    assert(t.balanced("({[]})"))
    assert(t.balanced("'sym (f)")) // single quotes never balance
  }

  test(":q exits with the parsed code, :t toggles timeit, :? prints " +
      "the commands list — only outside multiline mode (term.c:1343-1366)") {
    var exited = -1
    var timed = false
    val out = new StringBuilder
    val t = mk(out, onExit = c => exited = c, onTimeit = on => timed = on)
    t.feedAll(":t 1\r")
    assert(timed, "expected timeit on")
    assert(out.toString.contains("Timeit is on"))
    out.clear()
    t.feedAll(":?\r")
    assert(out.toString.contains(":q  - Exits the application"))
    t.feedAll(":q 3\r")
    assert(exited == 3)
    // inside multiline mode ':q' is DATA, not a command
    exited = -1
    assert(t.feedAll("(f\r:q)\r") == Seq("(f\n:q)"))
    assert(exited == -1)
  }

  test("history: up recalls newest-first, down walks back and finally " +
      "restores the in-progress line; consecutive duplicates collapse " +
      "(hist_add/prev/next, term.c:347-500)") {
    val t = mk()
    t.feedAll("(a)\r(b)\r")
    // type a partial line, then up,up — the partial line is saved
    t.feedAll("(c")
    t.feedAll(s"$Esc[A")
    assert(t.bufferText == "(b)")
    t.feedAll(s"$Esc[A")
    assert(t.bufferText == "(a)")
    t.feedAll(s"$Esc[A") // at the top: stays
    assert(t.bufferText == "(a)")
    t.feedAll(s"$Esc[B")
    assert(t.bufferText == "(b)")
    t.feedAll(s"$Esc[B") // past the end: restore the typed line
    assert(t.bufferText == "(c")
    // duplicates collapse: submitting (b) twice stores it once
    val t2 = mk()
    t2.feedAll("(b)\r(b)\r(a)\r")
    t2.feedAll(s"$Esc[A"); assert(t2.bufferText == "(a)")
    t2.feedAll(s"$Esc[A"); assert(t2.bufferText == "(b)")
    t2.feedAll(s"$Esc[A"); assert(t2.bufferText == "(b)")
  }

  test("history persists through the newline-text file and line " +
      "numbers are stable (hist file + hist_line_number)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_term")
    val p = dir.resolve("hist.dat")
    val t = mk(hist = Some(p))
    assert(t.lineNumber == 1)
    t.feedAll("(a)\r(b 2)\r")
    assert(t.lineNumber == 3 && t.lastLine == 2)
    assert(t.source(1).contains("(a)") && t.source(2).contains("(b 2)"))
    val t2 = mk(hist = Some(p)) // a fresh session reads it back
    t2.feedAll(s"$Esc[A")
    assert(t2.bufferText == "(b 2)")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("history writes land BEFORE the NUL padding of a native-created " +
      "4MB mmapped file (term.c:56 layout), so mixed native/JVM use " +
      "loses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_term")
    val p = dir.resolve("hist.dat")
    // a native-shaped file: two lines of data, then NUL padding
    val data = "(old 1)\n(old 2)\n".getBytes("UTF-8")
    val padded = java.util.Arrays.copyOf(data, 4096) // zero-filled tail
    java.nio.file.Files.write(p, padded)
    val t = mk(hist = Some(p))
    assert(t.source(1).contains("(old 1)") &&
      t.source(2).contains("(old 2)"))
    t.feedAll("(new 3)\r")
    // the new line sits at the data end, before the first NUL, and the
    // padding tail survives (the reference's reader maps a fixed size)
    val bytes = java.nio.file.Files.readAllBytes(p)
    assert(bytes.length == 4096, "file size must not grow into append")
    val firstNul = bytes.indexOf(0: Byte)
    val text = new String(bytes, 0, firstNul, "UTF-8")
    assert(text == "(old 1)\n(old 2)\n(new 3)\n", text)
    // a fresh session (this class's own first-NUL reader) sees it
    val t2 = mk(hist = Some(p))
    assert(t2.source(3).contains("(new 3)"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("cursor and edit keys: arrows, Home/End (both encodings), " +
      "Delete, backspace mid-line, CTRL A/E/F/B/K/W/U " +
      "(term.c:1405-1523, 1557-1680)") {
    val t = mk()
    t.feedAll("abc de")
    t.feedAll(s"$Esc[D$Esc[D") // left ×2
    assert(t.cursor == 4)
    t.feedAll(s"$Esc[H"); assert(t.cursor == 0)
    t.feedAll(s"$Esc[F"); assert(t.cursor == 6)
    t.feedAll(s"$Esc[1~"); assert(t.cursor == 0)
    t.feedAll(s"$Esc[4~"); assert(t.cursor == 6)
    t.feedAll(s"${Esc}b"); assert(t.cursor == 4)   // word left
    t.feedAll(s"${Esc}b"); assert(t.cursor == 0)
    t.feedAll(s"${Esc}f"); assert(t.cursor == 3)   // word right
    t.feedAll(s"$Esc[3~") // delete the space
    assert(t.bufferText == "abcde")
    t.feedAll("\u0001"); assert(t.cursor == 0)     // CTRL_A
    t.feedAll("\u0006"); assert(t.cursor == 1)     // CTRL_F
    t.feedAll("\u0005"); assert(t.cursor == 5)     // CTRL_E
    t.feedAll("\u0002"); assert(t.cursor == 4)     // CTRL_B
    t.feedAll("\u000b")                            // CTRL_K kill to end
    assert(t.bufferText == "abcd")
    t.feedAll("\u0017")                            // CTRL_W kill word
    assert(t.bufferText == "")
    t.feedAll("xy\u007f")                          // backspace (DEL)
    assert(t.bufferText == "x")
    t.feedAll("\u0015")                            // CTRL_U clear line
    assert(t.bufferText == "" && t.cursor == 0)
    // backspace mid-line removes the char BEFORE the cursor
    t.feedAll(s"abc$Esc[D\u007f")
    assert(t.bufferText == "ac" && t.cursor == 1)
  }

  test("unknown CSI sequences are consumed whole (Ctrl-Right ESC[1;5C " +
      "must not type '5C'); down-arrow with no prior up keeps the line") {
    val t = mk()
    t.feedAll("ab")
    t.feedAll(s"$Esc[1;5C") // xterm Ctrl-Right — not bound, must vanish
    assert(t.bufferText == "ab", t.bufferText)
    t.feedAll(s"$Esc[200~") // bracketed-paste guard — also consumed
    assert(t.bufferText == "ab", t.bufferText)
    // a bare down-arrow must not clear the in-progress line
    val t2 = mk()
    t2.feedAll("(x)\r")
    t2.feedAll("(partial")
    t2.feedAll(s"$Esc[B")
    assert(t2.bufferText == "(partial", t2.bufferText)
  }

  test("multi-byte UTF-8 input assembles into characters; backspace " +
      "removes whole code points (term.c:867-944)") {
    val t = mk()
    // é = C3 A9, 🎉 = F0 9F 8E 89 (a surrogate pair in UTF-16)
    "né🎉".getBytes("UTF-8").foreach(b => t.feed(b & 0xff))
    assert(t.bufferText == "né🎉", t.bufferText)
    val out = new StringBuilder
    val t2 = mk(out)
    "a🎉".getBytes("UTF-8").foreach(b => t2.feed(b & 0xff))
    out.clear()
    t2.feed(0x7f) // backspace: the whole pair goes, cursor moves 2 cols
    assert(t2.bufferText == "a", t2.bufferText)
    assert(out.toString.contains(s"$Esc[2D"), out.toString)
    t2.feed(0x7f)
    assert(t2.bufferText == "")
  }

  test("CTRL_D on an empty line exits; elsewhere it deletes forward " +
      "(term.c:1618-1626)") {
    var exited = -1
    val t = mk(onExit = c => exited = c)
    t.feedAll(s"ab$Esc[H")
    t.feedAll("\u0004")
    assert(t.bufferText == "b" && exited == -1)
    t.feedAll("\u0004")
    assert(t.bufferText == "" && exited == -1)
    t.feedAll("\u0004")
    assert(exited == 0)
  }

  test("TAB closes the innermost open paren, matching the bracket " +
      "type (term_autocomplete_paren, term.c:1232-1262)") {
    val t = mk()
    t.feedAll("(foo [1 2\t")
    assert(t.bufferText == "(foo [1 2]")
    t.feedAll("\t")
    assert(t.bufferText == "(foo [1 2])")
    // word completion beats paren close; keywords come first, so
    // "(sel" completes to the KEYWORD self before the functions
    val t2 = mk()
    t2.feedAll("(sel\t")
    assert(t2.bufferText == "(self")
  }

  test("word completion cycles keywords, then functions, then " +
      "globals, skipping the exact word (term.c:1087-1162)") {
    val t = mk(kws = Seq("set", "self"), fns = Seq("sect", "select"),
      globals = Seq("sentinel"))
    t.feedAll("se\t")
    assert(t.bufferText == "set")
    t.feedAll("\t"); assert(t.bufferText == "self")
    t.feedAll("\t"); assert(t.bufferText == "sect")
    t.feedAll("\t"); assert(t.bufferText == "select")
    t.feedAll("\t"); assert(t.bufferText == "sentinel")
    // surrounding text survives the replacement
    val t2 = mk(kws = Seq.empty, fns = Seq("select"), globals = Seq.empty)
    t2.feedAll("(sel x)")
    t2.feedAll(s"$Esc[D$Esc[D$Esc[D") // cursor onto the word end
    t2.feedAll("\t")
    assert(t2.bufferText == "(select x)")
  }

  test("TAB inside an open string completes filesystem paths " +
      "(term_autocomplete_path, term.c:1164-1230)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_term_path")
    java.nio.file.Files.createFile(dir.resolve("alpha.rfl"))
    java.nio.file.Files.createFile(dir.resolve("alpine.rfl"))
    val t = mk()
    t.feedAll(s"""(load "$dir/alp""" + "\t")
    assert(t.bufferText == s"""(load "$dir/alpha.rfl""")
    t.feedAll("\t")
    assert(t.bufferText == s"""(load "$dir/alpine.rfl""")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("highlight goldens: gray brackets and :commands, green known " +
      "words, light-blue operators, yellow closed strings, cyan quoted " +
      "symbols, salad char literals (term_redraw_into, term.c:708-814)") {
    val t = mk(fns = Seq("sum"), kws = Seq.empty)
    t.feedAll("""(sum x + "s" 'q 'a')""")
    val h = t.highlighted
    assert(h.startsWith(s"$Green$PromptGlyph $Reset"))
    assert(h.contains(s"$Gray($Reset"), h)
    assert(h.contains(s"${Green}sum$Reset"), h)
    assert(h.contains(s"$LightBlue+$Reset"), h)
    assert(h.contains(s"""$Yellow"s"$Reset"""), h)
    assert(h.contains(s"${Cyan}'q$Reset"), h)
    assert(h.contains(s"${Salad}'a'$Reset"), h)
    // a leading :cmd grays the whole command word
    val t2 = mk()
    t2.feedAll(":t 1")
    assert(t2.highlighted.contains(s"$Gray:t$Reset"), t2.highlighted)
    // an unknown word stays uncolored
    val t3 = mk(fns = Seq.empty, kws = Seq.empty)
    t3.feedAll("zebra")
    assert(t3.highlighted == s"$Green$PromptGlyph ${Reset}zebra",
      t3.highlighted)
  }

  test("redraw climbs previously wrapped rows and repositions by " +
      "visual width (term_redraw term.c:816-866, term_goto_position)") {
    val out = new StringBuilder
    val t = mk(out, width = 10)
    // 9 chars + 2-char prompt = 11 visual -> wraps onto a second row
    t.feedAll("123456789")
    out.clear()
    t.feedAll("0") // the next redraw must climb 1 row first
    val s = out.toString
    assert(s.contains(s"$Esc[1A\r"), s)
    assert(s.contains(s"$Esc[J"), s)
    // cursor repositioning after Home on the wrapped line moves UP
    out.clear()
    t.feedAll(s"$Esc[H")
    assert(out.toString.contains(s"$Esc[1A"), out.toString)
  }

  test("the termRepl loop evaluates completed forms against a " +
      "persistent env and prints through the editor (app/term.c + " +
      "repl wiring)") {
    val spark = SparkSpec.session
    val in = new java.io.ByteArrayInputStream(
      "(set x 6)\r(* x 7)\r:q\r".getBytes("UTF-8"))
    val bos = new java.io.ByteArrayOutputStream()
    Rayfall.termRepl(spark, Map.empty, in,
      new java.io.PrintStream(bos, true, "UTF-8"))
    val outText = new String(bos.toByteArray, "UTF-8")
    assert(outText.contains("42"), outText)
    assert(outText.contains(PromptGlyph), outText)
  }
}
