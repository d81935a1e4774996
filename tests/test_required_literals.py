"""required_literals must only ever return substrings that every match
of the pattern contains (guard AND rlike == rlike), checked by
property: for random matching strings, all literals appear."""

from __future__ import annotations

import re

from crawler_spark import rules
from crawler_spark.parsers import required_literals

ALL_PATTERNS = [
    rules.TAG_RE, rules.BOOKLIST_RE, rules.AUTHOR_RE, rules.PUBLISHER_RE,
    rules.PAGES_RE, rules.PRICE_RE, rules.SCORE_RE, rules.INTRO_RE,
    rules.CITYLIST_RE, rules.CONTENT_RE, rules.SYN_TOPIC_RE,
]


def test_literals_are_necessary_conditions():
    # construct a matching example per pattern, assert literals present
    examples = {
        rules.TAG_RE: '<a href="/t" class="tag">x</a>',
        rules.BOOKLIST_RE: '<a class="b" href="/b" title="T"',
        rules.AUTHOR_RE: '<span class="pl"> 作者</span>: junk <a x>A</a>',
        rules.PUBLISHER_RE: '<span class="pl">出版社:</span> <a x>P</a>',
        rules.PAGES_RE: '<span class="pl">页数:</span> 123<br/>',
        rules.PRICE_RE: '<span class="pl">定价:</span>9.00元<br/>',
        rules.SCORE_RE: '<strong class="ll rating_num " property="v:average">8.1</strong>',
        rules.INTRO_RE: '<div class="intro">z<p>I</p></div>',
        rules.CITYLIST_RE: 'href="https://www.douban.com/group/topic/abc/" x>T</a>',
        rules.CONTENT_RE: '<div class="topic-content">阳台</div><div',
        rules.SYN_TOPIC_RE: 'href="https://h.example.test/topic/t1/" x>T</a>',
    }
    for pat in ALL_PATTERNS:
        m = re.search(pat, examples[pat])
        assert m, f"example does not match {pat}"
        for lit in required_literals(pat):
            assert lit in examples[pat], f"{lit!r} not in example for {pat}"


def test_sun_guard_is_selective():
    lits = required_literals(rules.CONTENT_RE)
    assert "阳台" in lits  # the selective literal that makes the guard pay


def test_quantified_and_grouped_chars_excluded():
    assert required_literals(r"abX?cd") == ["ab", "cd"]  # 'X' optional
    assert required_literals(r"abc(xy)?z") == ["abc"]  # group content skipped
    assert required_literals(r"foo|bar") == []  # alternation -> no guards
    assert required_literals(r"colou?r") == ["colo"]


def test_counted_quantifier_body_is_not_a_literal():
    # user patterns via dynamic_task / --tasks-json hit {n,m}; the body
    # digits must never become a required literal, and the quantified
    # preceding char must be dropped
    assert required_literals(r"a.{0,50}bc") == ["bc"]
    assert required_literals(r"foo.{0,50}bar") == ["foo", "bar"]
    assert required_literals(r"abX{2}cd") == ["ab", "cd"]
    assert required_literals(r"abX{2,}cd") == ["ab", "cd"]
    for pat, example in [
        (r"foo.{0,50}bar", "foo" + "z" * 17 + "bar"),
        (r"abc{1,3}de", "abcccde"),
    ]:
        m = re.search(pat, example)
        assert m
        for lit in required_literals(pat):
            assert lit in example, f"{lit!r} not in example for {pat}"


def test_guard_preserves_matches_fuzz(spark=None):
    """Differential fuzz (no Spark needed): for random patterns built
    from literal runs + quantifiers + groups + classes, every string
    that matches the pattern must contain every required literal —
    guard AND rlike == rlike for ANY user pattern, the invariant the
    {n,m} bug broke."""
    import random
    import re as _re

    rng = random.Random(42)
    pieces = ["foo", "bar", "qux", "阳台", "a", "xy"]
    quants = ["", "?", "*", "+", "{2}", "{0,3}", "{1,}"]

    def rand_pattern():
        out = []
        for _ in range(rng.randint(2, 6)):
            kind = rng.random()
            if kind < 0.5:
                out.append(rng.choice(pieces))
            elif kind < 0.7:
                out.append("." + rng.choice(quants))
            elif kind < 0.85:
                out.append("(" + rng.choice(pieces) + ")" + rng.choice(quants))
            else:
                out.append("[a-z]" + rng.choice(quants))
        return "".join(out)

    from crawler_spark.parsers import required_literals

    checked = 0
    for _ in range(300):
        pat = rand_pattern()
        try:
            cre = _re.compile(pat)
        except _re.error:
            continue
        lits = required_literals(pat)
        # build candidate strings: random fillers around the pattern's
        # own pieces; only MATCHING strings constrain the guard
        for _ in range(20):
            s = "".join(
                rng.choice(pieces + ["z", "09", " ", "qq"])
                for _ in range(rng.randint(0, 8))
            )
            m = cre.search(s)
            if m:
                for lit in lits:
                    assert lit in s, (pat, lits, s)
                checked += 1
    assert checked > 100  # the fuzz actually exercised matching strings
