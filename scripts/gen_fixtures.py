#!/usr/bin/env python3
"""Generate parity fixtures by executing the reference implementation
(/root/reference/WikiExtractor.py) on sample wiki markup, and the HTML4
entity table. Outputs:
  src/test/resources/wiki_fixtures.json
  src/main/scala/graft/wiki/Entities.scala
"""
import sys, json, html.entities
sys.path.insert(0, "/root/reference")
import WikiExtractor as we

# Match the reference's default CLI path: keepLinks=False → <a> is ignored.
we.ignoreTag('a')

cases = [
    "{{template|arg=1}}Hello {{nested {{inner}} tail}} world",
    "before {| class=x\n| cell |- row\n|} after",
    "See [[Target|anchor]]s and [[Plain]] page",
    "An image [[File:img.png|thumb|caption [[nested]] here]] done",
    "Interwiki [[w:Page|W]] and [[Category:Stuff]] end",
    "''italic'' and '''bold''' and '''''both''''' end",
    "quote ''\"qt\"'' and \"\"qq\"\" residual ''x",
    "Ents &amp; &lt;x&gt; &#65; &#x42; &nbsp; &eacute; done",
    "a<!-- comment\nmultiline -->b",
    "a<br/>b<ref name=x />c<hr />d",
    "<b>bold</b> mid <div class=x>div</div> end",
    "<table><tr><td>x</td></tr></table>after<ref>cite</ref> tail",
    "<math>x^2</math> mid <code>y=1</code> and <math>z</math> end",
    " preformatted line\nnormal line",
    "a  b....c\t d,, e,. f __TOC__ g <<h>>",
    "ext [http://example.com anchor text] and [http://x.org] end",
    "unclosed {{template foo\nmore text",
    "A line\n== Section One ==\nBody text here\n== Empty Sec ==\n=== Sub ===\n* item one\n# item two\nAfter list\n(paren line)\n----\nTail",
    "++Page Title++\ncontent line",
    "nested tpl {{a{{b}}c}} out {{d}} end",
    "{{a}} {{b",
    "{{a {{b}} tail",
    "x {{a}}{{b}} y",
    "}} {{a}} z",
    "{|a|} {{b}} {|c {{d}} e|}",
    "deep {{a {{b {{c}} }} d}} tail",
    "close early }}{{x}}",
    "{{a}}}} b",
]

fixtures = []
for text in cases:
    cleaned = we.clean(text)
    fixtures.append({
        "input": text,
        "cleaned": cleaned,
        "compact_plain": we.compact(cleaned, structure=False),
        "compact_structure": we.compact(cleaned, structure=True),
    })

titles = ["  foo bar  ", "foo_bar_baz", "w:  births", "W: Births",
          "3001:   The_Final_Odyssey", "category: stuff", "plain title", "_x_"]
fixtures_titles = [{"input": t, "normalized": we.normalizeTitle(t)} for t in titles]

with open("src/test/resources/wiki_fixtures.json", "w") as f:
    json.dump({"clean": fixtures, "titles": fixtures_titles}, f, indent=1, ensure_ascii=False)

# HTML4 named entities (public standard table, same one the reference uses
# via html.entities.name2codepoint).
pairs = sorted(html.entities.name2codepoint.items())
lines = ",\n    ".join(f'"{n}" -> {c}' for n, c in pairs)
scala = f"""package graft.wiki

/** HTML4 named character references (the standard `name2codepoint` table
  * the reference uses via Python's html.entities; see
  * /root/reference/WikiExtractor.py:59,216).
  */
private[wiki] object Entities {{
  val name2codepoint: Map[String, Int] = Map(
    {lines}
  )
}}
"""
with open("src/main/scala/graft/wiki/Entities.scala", "w") as f:
    f.write(scala)
print(f"{len(fixtures)} clean fixtures, {len(fixtures_titles)} title fixtures, {len(pairs)} entities")
