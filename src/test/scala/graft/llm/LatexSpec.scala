package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class LatexSpec extends AnyFunSuite {

  test("comments splice away with their newline; escaped percent stays") {
    assert(Latex.strip("a % gone\nb") == "a b") // the pre-% space is text
    assert(Latex.strip("a% gone\nb") == "ab")
    assert(Latex.strip("100\\% real") == "100% real")
  }

  test("math drops whole, inline and display; unterminated drops the rest") {
    assert(Latex.strip("a $x^2$ b") == "a  b")
    assert(Latex.strip("a $$\\int f$$ b") == "a  b")
    assert(Latex.strip("a $never closed") == "a ")
  }

  test("keep-arg commands emit their argument, recursively stripped") {
    assert(Latex.strip("\\textbf{bold}") == "bold")
    assert(Latex.strip("\\section{A \\emph{nested} title}") ==
      "A nested title")
    assert(Latex.strip("\\textbf[opt]{x}") == "x")
  }

  test("drop-arg commands vanish with their arguments") {
    assert(Latex.strip("see \\cite{key123} here") == "see  here")
    assert(Latex.strip("\\usepackage[utf8]{inputenc}text") == "text")
  }

  test("unknown commands drop the token alone, keeping prose") {
    assert(Latex.strip("\\noindent Hello") == " Hello")
    assert(Latex.strip("\\unknowncmd{kept}") == "kept") // bare braces strip
  }

  test("environments: drop-list blocks vanish, others keep their body") {
    assert(Latex.strip("a\\begin{equation}x=1\\end{equation}b") == "ab")
    assert(Latex.strip("\\begin{abstract}text\\end{abstract}") == "text")
    assert(Latex.strip("a\\begin{figure}never closed") == "a")
  }

  test("line breaks, ties, and control symbols") {
    assert(Latex.strip("a\\\\b") == "a\nb")
    assert(Latex.strip("a~b") == "a b")
    assert(Latex.strip("50\\&60 \\{x\\}") == "50&60 {x}")
  }
}
