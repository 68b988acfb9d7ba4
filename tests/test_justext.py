"""Unit contract for operators/justext.py — the dependency-free
reimplementation of the published jusText algorithm (Pomikálek 2011;
reference clean/html_extrator.py:85-200 delegates to the library).
Each test pins one rule of the published decision table / revision
order, so a faithful-port regression is caught at the rule it breaks."""

import pytest

from llmxmapreduce_spark.operators.justext import (
    Block,
    classify_context_free,
    justext_extract_py,
    revise_classification,
    segment_blocks,
)

# >200 chars, stopword-dense: context-free GOOD
GOOD = ("This is a long paragraph that has been written so that it is"
        " comfortably over the two hundred character threshold of the"
        " algorithm, and it is full of the small function words that the"
        " stopword list is made of, as any natural paragraph would be.")
# 70..200 chars, stopword-dense: context-free NEARGOOD
NEARG = ("This is a paragraph that is of a middle length and it is also"
         " full of the usual small function words of the language.")
# >=70 chars, zero stopwords: context-free BAD (below 70 it would be
# SHORT — the table length-gates before it density-gates)
BAD = ("Nav Menu Products Pricing Careers Blog Press Partners Support"
       " Downloads Status Legal")


def _classify(texts, **kw):
    blocks = [Block(text=t) if isinstance(t, str) else t for t in texts]
    sw = frozenset("the of and to a in is it that was for on this with as"
                   " be been would any i he she they we at by an or".split())
    classify_context_free(blocks, sw, **kw)
    return blocks


# ---------------------------------------------------------------- segment


def test_inline_tags_do_not_split_blocks():
    bs = segment_blocks("<p>alpha <b>beta</b> <em>gamma</em> delta</p>")
    assert [b.text for b in bs] == ["alpha beta gamma delta"]


def test_block_tags_split_and_headings_flagged():
    bs = segment_blocks("<h2>Title Here</h2><p>body text</p><div>x</div>")
    assert [(b.text, b.is_heading) for b in bs] == [
        ("Title Here", True), ("body text", False), ("x", False)]


def test_script_style_head_subtrees_dropped():
    bs = segment_blocks(
        "<head><title>t</title></head><script>var a=1;</script>"
        "<style>p{}</style><p>kept</p>")
    assert [b.text for b in bs] == ["kept"]


def test_anchor_text_counts_linked_chars_but_does_not_split():
    bs = segment_blocks("<p>read <a href='/x'>the manual</a> now</p>")
    assert len(bs) == 1
    assert bs[0].text == "read the manual now"
    assert bs[0].chars_in_links == len("the manual")


def test_select_content_flagged_not_dropped():
    bs = segment_blocks("<select><option>one</option></select><p>kept</p>")
    sel = [b for b in bs if b.in_select]
    assert sel and sel[0].text == "one"
    assert [b.text for b in bs if not b.in_select] == ["kept"]


def test_entities_unescaped():
    bs = segment_blocks("<p>fish &amp; chips &copy; 2025</p>")
    assert bs[0].text == "fish & chips \xa9 2025"


# ------------------------------------------------------- context-free


def test_decision_table_good_neargood_short_bad():
    bs = _classify([GOOD, NEARG, "tiny", BAD])
    assert [b.cf_class for b in bs] == ["good", "neargood", "short", "bad"]


def test_link_density_above_max_is_bad():
    b = Block(text="x" * 100, chars_in_links=20)   # density 0.2 > 0.1
    assert _classify([b])[0].cf_class == "bad"


def test_short_with_any_link_is_bad():
    b = Block(text="click here now", chars_in_links=1)
    assert _classify([b])[0].cf_class == "bad"


def test_copyright_symbol_is_bad():
    assert _classify([GOOD[:150] + " \xa9"])[0].cf_class == "bad"


def test_select_origin_is_bad():
    b = Block(text=GOOD, in_select=True)
    assert _classify([b])[0].cf_class == "bad"


def test_no_headings_disables_heading_flag():
    b = Block(text="Title", is_heading=True)
    _classify([b], no_headings=True)
    assert b.is_heading is False


# --------------------------------------------------- context-sensitive


def _revise(texts, **kw):
    bs = _classify([Block(text=t) if isinstance(t, str) else t
                    for t in texts])
    revise_classification(bs, **kw)
    return [b.class_type for b in bs]


def test_short_between_goods_becomes_good():
    assert _revise([GOOD, "He agreed.", GOOD]) == ["good", "good", "good"]


def test_short_between_bads_becomes_bad():
    assert _revise([BAD, "He agreed.", BAD]) == ["bad", "bad", "bad"]


def test_short_at_document_edge_defaults_bad():
    # edges count as bad: {edge-bad, bad} == {bad} -> bad
    assert _revise(["He agreed.", BAD]) == ["bad", "bad"]


def test_short_mixed_needs_neargood_buffer():
    # good | short | bad, no neargood buffer on the bad side -> bad
    assert _revise([GOOD, "He agreed.", BAD]) == ["good", "bad", "bad"]
    # good | short | neargood | bad: the bad side is buffered by a
    # neargood -> the short joins the good cluster; the neargood
    # (good strict-neighbour on its left after step 2) resolves good
    assert _revise([GOOD, "He agreed.", NEARG, BAD]) == \
        ["good", "good", "good", "bad"]


def test_neargood_needs_one_non_bad_side():
    assert _revise([BAD, NEARG, BAD]) == ["bad", "bad", "bad"]
    assert _revise([GOOD, NEARG, BAD]) == ["good", "good", "bad"]


def test_heading_promoted_within_distance():
    h = Block(text="Results", is_heading=True)
    assert _revise([h, GOOD]) == ["good", "good"]


def test_heading_not_promoted_beyond_distance():
    h = Block(text="Results", is_heading=True)
    # a >200-char bad wall between heading and good exhausts
    # max_heading_distance before the good block is reached
    wall = Block(text="z " * 150)          # 300 chars, zero stopwords
    assert _revise([h, wall, GOOD]) == ["bad", "bad", "good"]


def test_non_heading_short_not_promoted():
    # same text/position as the promoted heading but NOT a heading: the
    # document edge counts as bad, {bad, good} mixed with no neargood
    # buffer -> bad.  The heading twin above lands good via promotion —
    # this pair IS the heading-rescue distinction.
    s = Block(text="Results")
    assert _revise([s, GOOD, BAD]) == ["bad", "good", "bad"]


# ------------------------------------------------------------ end-to-end


def test_extract_keeps_main_drops_frame():
    html = ("<html><body><nav>Home | About | Contact</nav>"
            f"<p>{GOOD}</p><p>Quite remarkable results.</p><p>{GOOD}</p>"
            "<footer>Copyright \xa9 2025 Example</footer></body></html>")
    out = justext_extract_py(html)
    assert out == [GOOD, "Quite remarkable results.", GOOD]


def test_non_spaced_language_keeps_everything():
    html = "<p>これは短い</p><div>nav</div>"
    assert len(justext_extract_py(html, lang="ja")) == 2


def test_empty_and_none_html():
    assert justext_extract_py("") == []
    assert justext_extract_py("<html><body></body></html>") == []


def test_distributed_wrapper_matches_driver(spark):
    from llmxmapreduce_spark.operators.justext import justext_extract

    html = (f"<html><body><nav>A | B | C</nav><p>{GOOD}</p>"
            f"<p>Short note.</p><p>{GOOD}</p></body></html>")
    df = spark.createDataFrame([(i, html) for i in range(8)],
                               "doc_id long, html string")
    out = justext_extract(df, "html").orderBy("doc_id").collect()
    want = "\n".join(justext_extract_py(html))
    assert len(out) == 8
    assert all(r["main_text"] == want for r in out)
    assert "Short note." in out[0]["main_text"]


# ----------------------------------------------------- r11 review fixes


def test_numeric_entity_copyright_is_bad():
    """&#169; (numeric form of ©) must reach the copyright rule — the
    hand-rolled entity map missed numeric entities entirely."""
    bs = segment_blocks("<p>&#169; 2025 Example Corp</p>")
    assert bs[0].text.startswith("\xa9")
    html = (f"<p>{GOOD}</p>"
            "<footer>&#169; 2025 Example Corp and all of the rights"
            " that there are to be reserved by it are reserved.</footer>")
    out = justext_extract_py(html)
    assert out == [GOOD]


def test_amp_lt_not_double_unescaped():
    # sequential replace turned "&amp;lt;" into "<"; html.unescape
    # correctly yields the literal "&lt;"
    bs = segment_blocks("<p>a &amp;lt; b</p>")
    assert bs[0].text == "a &lt; b"


def test_unclosed_heading_does_not_leak():
    """An unclosed <h2> must flag only ITS block — depth counting left
    every later block heading-flagged, making nav shorts rescuable."""
    bs = segment_blocks("<h2>Title<p>body one</p><p>body two</p>")
    assert [(b.text, b.is_heading) for b in bs] == [
        ("Title", True), ("body one", False), ("body two", False)]
    # self-closed <h2/> has no content — the NEXT block is not a heading
    bs2 = segment_blocks("<h2/><p>body</p>")
    assert [(b.text, b.is_heading) for b in bs2] == [("body", False)]


def test_double_br_is_a_paragraph_boundary():
    """<br><br> separates paragraphs (published jusText preprocessing);
    a single <br> stays soft inside the block."""
    bs = segment_blocks("<div>Sign up for our newsletter<br><br>"
                        f"{GOOD}</div>")
    assert [b.text for b in bs] == ["Sign up for our newsletter", GOOD]
    one = segment_blocks("<div>line one<br>line two</div>")
    assert [b.text for b in one] == ["line one line two"]
    # <br> TEXT <br> is two soft breaks, not a boundary
    soft = segment_blocks("<div>a<br>b<br>c</div>")
    assert [b.text for b in soft] == ["a b c"]


# ----------------------------------------------------- r12 advice fixes


def test_select_token_inside_script_is_inert():
    """A '<select>' literal inside a dropped subtree (script/style/head)
    must not mutate select_depth: an unclosed one used to mark every
    later block in_select -> context-free bad -> the whole page
    extracted empty (r12 ADVICE, medium).  Real <select> content keeps
    its flag."""
    html = ("<script>document.write('<select>');</script>"
            f"<p>{GOOD}</p><p>{GOOD}</p>")
    bs = segment_blocks(html)
    assert [b.in_select for b in bs] == [False, False]
    assert justext_extract_py(html) == [GOOD, GOOD]
    # and a real (unescaped-in-markup) select still flags its content
    real = f"<select><option>one</option></select><p>{GOOD}</p>"
    assert [(b.text, b.in_select) for b in segment_blocks(real)] == [
        ("one", True), (GOOD, False)]
    # closing </select> inside a script must not decrement either
    poison = ("<select><option>one</option>"
              "<script>x('</select>')</script></select>"
              f"<p>{GOOD}</p>")
    assert [b.in_select for b in segment_blocks(poison)] == [True, False]


# ------------------------------------------------------------- fuzzing


def test_segmenter_never_raises_and_preserves_text():
    """Property fuzz (hypothesis): on arbitrary tag soup the segmenter
    must never raise, every emitted block must be non-empty normalized
    text, and classification end-to-end must stay total."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tags = st.sampled_from(
        ["<p>", "</p>", "<div>", "</div>", "<h2>", "</h2>", "<b>",
         "</b>", "<a href='/x'>", "</a>", "<br>", "<br/>", "<script>",
         "</script>", "<select>", "</select>", "<h3/>", "<wbr/>",
         "<style>", "</style>", "<", ">", "</", "<p", "<h"])
    text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=40)
    soup = st.lists(st.one_of(tags, text), max_size=30).map("".join)

    @given(soup)
    @settings(max_examples=300, deadline=None)
    def check(html):
        bs = segment_blocks(html)
        for b in bs:
            assert b.text == b.text.strip() and b.text
            assert 0 <= b.chars_in_links <= len(b.text)
        out = justext_extract_py(html)
        block_texts = {b.text for b in bs}
        assert all(t in block_texts for t in out)

    check()
