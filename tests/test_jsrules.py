"""JS-rule loader goldens: the loader must translate the reference's
ACTUAL dynamic-task scripts (parse/doubangroup/douban_js_group.go, read
live, same as the testhtml fixtures) into the rules-as-data the engine
runs, and a task loaded from JS must drive a crawl identically to its
statically-declared twin."""

from __future__ import annotations

import re

import pytest

from crawler_spark import corpus, engine, rules
from crawler_spark.catalog import Catalog
from crawler_spark.jsrules import (
    js_string_unescape,
    parse_root_js,
    parse_rule_js,
    task_from_js,
)

REF_GO = "/root/reference/parse/doubangroup/douban_js_group.go"


@pytest.fixture(scope="module")
def ref_js():
    src = open(REF_GO, encoding="utf-8").read()
    root = re.search(r"var rootJs = `([^`]*)`", src).group(1)
    funcs = re.findall(r"ParseFunc:\s*`([^`]*)`", src)
    names = re.findall(r'Name:\s*"([^"]*)"', src)
    # names[0] is Options.Name; the rule names follow in declaration order
    return {"root": root, "rules": list(zip(names[1:], funcs))}


def test_js_string_unescape_matches_vm_semantics():
    assert js_string_unescape(r"a\"b") == 'a"b'
    assert js_string_unescape(r"\\s\\S") == r"\s\S"
    # ECMA NonEscapeCharacter: unknown escape -> the char itself
    assert js_string_unescape(r"\s") == "s"
    assert js_string_unescape(r"A\x42") == "AB"


def _js_escape(s: str) -> str:
    """Minimal JS string-literal encoder (the inverse direction)."""
    return "".join(
        "\\" + c if c in ('"', "\\") else
        {"\n": "\\n", "\t": "\\t", "\r": "\\r"}.get(c, c)
        for c in s
    )


def test_js_string_escape_unescape_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def prop(s):
        body = _js_escape(s)
        # the encoded body must parse as ONE literal under the loader's
        # tokenizer AND decode back to the original value
        assert re.fullmatch(r'(?:[^"\\]|\\.)*', body, re.S)
        assert js_string_unescape(body) == s

    prop()


def test_root_js_golden(ref_js):
    seeds = parse_root_js(ref_js["root"])
    assert seeds == [
        ("https://www.douban.com/group/szsh/discussion?start=0", "解析网站URL", 1),
        ("https://www.douban.com/group/szsh/discussion?start=25", "解析网站URL", 1),
        ("https://www.douban.com/group/szsh/discussion?start=50", "解析网站URL", 1),
    ]


def test_rule_js_goldens(ref_js):
    by_name = {n: parse_rule_js(s) for n, s in ref_js["rules"]}
    link = by_name["解析网站URL"]
    assert link["kind"] == "extract_links"
    assert link["next_rule"] == "解析阳台房"
    # faithfully what otto's string parser hands regexp.MustCompile —
    # including the reference's own missing '(' before https (the
    # loader translates scripts, it doesn't repair them)
    assert link["pattern"] == (
        'https://www.douban.com/group/topic/[0-9a-z]+/)"[^>]*>([^<]+)</a>'
    )
    out = by_name["解析阳台房"]
    assert out["kind"] == "emit_if_match"
    assert out["pattern"] == (
        '<div class="topic-content">[\\s\\S]*?阳台[\\s\\S]*?'
        '<div class="aside">'
    )


def test_task_from_js_builds_runnable_task(ref_js):
    task = task_from_js(
        "js_find_douban_sun_room", ref_js["root"], ref_js["rules"], max_depth=5
    )
    assert len(task.seeds) == 3
    assert set(task.rules) == {"解析网站URL", "解析阳台房"}
    assert isinstance(task.rules["解析网站URL"], rules.LinkRule)
    assert task.rules["解析网站URL"].next_rule == "解析阳台房"
    assert isinstance(task.rules["解析阳台房"], rules.MatchRule)


# -- JS-loaded task vs static twin over the synthetic corpus ------------

ROOT_JS = """
var arr = new Array();
for (var i = 0;i <= 1; i++){
    var obj = {
        Url: "https://host000.example.test/group/" + i,
        Priority: 1,
        RuleName: "group_list",
        Method: "GET"
    }
    arr.push(obj);
    console.log(obj.Url);
}
AddJSReqs(arr);
"""

GROUP_JS = (
    r'ctx.ParseJSReg("topic","href=\"(https://[a-z0-9.\\-]+'
    r'/topic/[0-9a-zA-Z]+/)\"[^>]*>([^<]+)</a>");'
)
TOPIC_JS = (
    r'ctx.OutputJS("<div class=\"topic-content\">'
    r'[\\s\\S]*?阳台[\\s\\S]*?<div");'
)


def test_js_task_equals_static_twin_and_crawls(spark, tmp_path):
    js_task = task_from_js(
        "sun_room", ROOT_JS, [("group_list", GROUP_JS), ("topic", TOPIC_JS)],
        max_depth=5,
    )
    static = rules.dynamic_task(
        "sun_room",
        [(f"https://host000.example.test/group/{g}", "group_list", 1)
         for g in (0, 1)],
        [
            {"name": "group_list", "kind": "extract_links",
             "pattern": rules.SYN_TOPIC_RE, "next_rule": "topic"},
            {"name": "topic", "kind": "emit_if_match",
             "pattern": rules.CONTENT_RE},
        ],
        max_depth=5,
    )
    # the loader reproduces the static declaration EXACTLY (dataclass
    # equality covers seeds, patterns, next_rule wiring, depth) — so the
    # crawls are the same computation by construction
    assert js_task == static

    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=2, n_filler=20)
    cfg = engine.CrawlConfig(tasks={"sun_room": js_task}, pages_path=pages_path)
    cat = Catalog(str(tmp_path / "wh"))
    state = engine.run_crawl(spark, cat, cfg)
    assert state["finished"]
    assert cat.read(spark, "results").count() > 0
