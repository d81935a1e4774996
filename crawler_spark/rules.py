"""Declarative rule registry — the reference's RuleTree as data.

The reference wires parse logic as Go closures
(/root/reference/collect/rule.go:11-26 RuleTree{Root, Trunk}) plus a
JS-string flavor evaluated in an otto VM per request
(engine/crawler_store.go:33-88).  Both flavors reduce to three kernel
shapes (SURVEY.md §2.3, §3.3), so here a rule IS data and the kernels in
parsers.py interpret it — no VM, no closures shipped to executors:

- ``extract_links``  findall(pattern) -> child requests
                     (P1 ParseGroupUrl, P3 parseTag, P4 parseBookList,
                      P7 ParseJSReg)
- ``emit_if_match``  body matches pattern -> emit the page URL as an item
                     (P2 GetSunRoom, P8 OutputJS)
- ``extract_fields`` one first-submatch regex per output field
                     (P5 parseBookDetail, P6 ExtraString semantics:
                      first group or '')

Tasks mirror collect/task.go:7-13 + option.go:9-28: politeness budgets
(``rate_limits`` = list of (events, per_seconds) token buckets,
limiter/limiter.go:16-27), ``max_depth`` (option.go:33 default 5),
``max_links`` (the anti-ban truncation, dobuan_book.go:85-89).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LinkRule:
    """findall(pattern) over the body; group url_group is the child URL,
    optional title_group is carried to the child as tmp[tmp_key]."""

    kind = "extract_links"
    pattern: str
    url_group: int
    next_rule: str
    title_group: int | None = None
    tmp_key: str = "book_name"
    # 'none' -> pattern yields absolute URLs; 'same_host' -> prefix with
    # scheme://host of the parent page (the reference hardcodes
    # "https://book.douban.com" +, dobuan_book.go:77)
    url_prefix: str = "none"
    max_links: int | None = None
    child_priority: int = 0


@dataclass(frozen=True)
class MatchRule:
    """rlike(pattern) -> emit the request URL as an item (no fields)."""

    kind = "emit_if_match"
    pattern: str


@dataclass(frozen=True)
class FieldSpec:
    name: str
    pattern: str
    group: int = 1
    as_int: bool = False  # Go strconv.Atoi semantics: non-int -> 0


@dataclass(frozen=True)
class FieldsRule:
    """First-submatch extraction per field; missing -> '' (ExtraString,
    dobuan_book.go:151-158); tmp_field names a frontier tmp key merged
    into the output (book_name carry, dobuan_book.go:132)."""

    kind = "extract_fields"
    fields: tuple[FieldSpec, ...]
    tmp_field: tuple[str, str] | None = None  # (output_name, tmp_key)


Rule = LinkRule | MatchRule | FieldsRule


@dataclass(frozen=True)
class Task:
    name: str
    rules: dict[str, Rule]
    seeds: tuple[tuple[str, str, int], ...]  # (url, rule_name, priority)
    max_depth: int = 5
    # token buckets (events, per_seconds); effective rate = min(e/s)
    # (limiter/limiter.go:33-41; config.toml:5 -> 1/2s AND 20/60s)
    rate_limits: tuple[tuple[int, int], ...] = ((1, 2), (20, 60))
    reload: bool = False  # Task.Reload skips dedup (crawler.go:85)
    # Task.Cookie (collect/collect.go:70-72): sent verbatim as the
    # Cookie header by the http fetch mode; unused by the corpus join
    cookie: str = ""


# --------------------------------------------------------------- patterns
# Exact reference regexes (valid and identical in RE2 / Java / Python re).
TAG_RE = r'<a href="([^"]+)" class="tag">([^<]+)</a>'  # dobuan_book.go:63
BOOKLIST_RE = r'<a.*?href="([^"]+)" title="([^"]+)"'  # dobuan_book.go:93
AUTHOR_RE = r'<span class="pl"> 作者</span>:[\s\S]*?<a.*?>([^<]+)</a>'
PUBLISHER_RE = r'<span class="pl">出版社:</span>\s*<a.*?>([^<]+)</a>'
PAGES_RE = r'<span class="pl">页数:</span> ([^<]+)<br/>'
PRICE_RE = r'<span class="pl">定价:</span>([^<]+)<br/>'
SCORE_RE = r'<strong class="ll rating_num " property="v:average">([^<]+)</strong>'
INTRO_RE = r'<div class="intro">[\d\D]*?<p>([^<]+)</p></div>'
# douban_group.go:39-40
CITYLIST_RE = (
    r'href="(https://www.douban.com/group/topic/[0-9a-zA-Z]+/)"[^>]*>([^<]+)</a>'
)
CONTENT_RE = r'<div class="topic-content">[\s\S]*?阳台[\s\S]*?<div'

BOOK_FIELDS = (
    FieldSpec("作者", AUTHOR_RE),
    FieldSpec("页数", PAGES_RE, as_int=True),
    FieldSpec("出版社", PUBLISHER_RE),
    FieldSpec("得分", SCORE_RE),
    FieldSpec("价格", PRICE_RE),
    FieldSpec("简介", INTRO_RE),
)

# Output column order of the reference's douban_book_list table
# (ItemFields, dobuan_book.go:45-53).
BOOK_ITEM_FIELDS = ("书名", "作者", "页数", "出版社", "得分", "价格", "简介")


def douban_tasks() -> dict[str, Task]:
    """Reference-parity tasks, used for the golden-fixture tests."""
    return {
        "douban_book_list": Task(
            name="douban_book_list",
            seeds=(("https://book.douban.com", "tag", 1),),
            rules={
                "tag": LinkRule(
                    pattern=TAG_RE, url_group=1, next_rule="book_list",
                    url_prefix="same_host", max_links=3,
                ),
                "book_list": LinkRule(
                    pattern=BOOKLIST_RE, url_group=1, title_group=2,
                    next_rule="book_detail", max_links=3,
                ),
                "book_detail": FieldsRule(
                    fields=BOOK_FIELDS, tmp_field=("书名", "book_name"),
                ),
            },
        ),
        "find_douban_sun_room": Task(
            name="find_douban_sun_room",
            seeds=(
                (
                    "https://www.douban.com/group/280198/discussion?start=0&type=new",
                    "group_list",
                    1,
                ),
            ),
            rules={
                "group_list": LinkRule(
                    pattern=CITYLIST_RE, url_group=1, next_rule="topic",
                ),
                "topic": MatchRule(pattern=CONTENT_RE),
            },
        ),
    }


# Synthetic-corpus twins: same kernel shapes, host-generic patterns
# (corpus.py generates pages whose anchors match these exactly).
SYN_TOPIC_RE = r'href="(https://[a-z0-9.\-]+/topic/[0-9a-zA-Z]+/)"[^>]*>([^<]+)</a>'


def synthetic_tasks(
    max_depth: int = 5, n_book_hosts: int = 8, n_sun_hosts: int = 4
) -> dict[str, Task]:
    return {
        "book_list": Task(
            name="book_list",
            seeds=tuple(
                (f"https://host{h:03d}.example.test/index/0", "tag", 1)
                for h in range(n_book_hosts)
            ),
            max_depth=max_depth,
            rules={
                "tag": LinkRule(
                    pattern=TAG_RE, url_group=1, next_rule="book_list",
                    url_prefix="same_host", max_links=3,
                ),
                "book_list": LinkRule(
                    pattern=BOOKLIST_RE, url_group=1, title_group=2,
                    next_rule="book_detail", max_links=3,
                ),
                "book_detail": FieldsRule(
                    fields=BOOK_FIELDS, tmp_field=("书名", "book_name"),
                ),
            },
        ),
        "sun_room": Task(
            name="sun_room",
            seeds=tuple(
                (f"https://host{h:03d}.example.test/group/{g}", "group_list", 1)
                for h in range(n_sun_hosts)
                for g in (0, 1)
            ),
            max_depth=max_depth,
            rules={
                "group_list": LinkRule(
                    pattern=SYN_TOPIC_RE, url_group=1, next_rule="topic",
                ),
                "topic": MatchRule(pattern=CONTENT_RE),
            },
        ),
    }


def dynamic_task(
    name: str,
    seeds: list[tuple[str, str, int]],
    rule_specs: list[dict],
    **task_kwargs,
) -> Task:
    """The JS-task surface (engine/crawler_store.go:33-88) as config: each
    spec is {'name', 'kind': 'extract_links'|'emit_if_match', 'pattern',
    'next_rule'?} — exactly the two primitives ctx.ParseJSReg /
    ctx.OutputJS expose (collect/rule.go:54-84)."""
    rules: dict[str, Rule] = {}
    for spec in rule_specs:
        if spec["kind"] == "extract_links":
            rules[spec["name"]] = LinkRule(
                pattern=spec["pattern"], url_group=1, next_rule=spec["next_rule"],
            )
        elif spec["kind"] == "emit_if_match":
            rules[spec["name"]] = MatchRule(pattern=spec["pattern"])
        else:
            raise ValueError(f"unknown dynamic rule kind: {spec['kind']}")
    return Task(name=name, seeds=tuple(seeds), rules=rules, **task_kwargs)
