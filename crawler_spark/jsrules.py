"""P7/P8 JS-rule loader: translate the reference's dynamic-task scripts
into rules-as-data.

The reference ships dynamic tasks as JS source strings evaluated in an
otto VM per parsed page (engine/crawler_store.go:33-88): the root
script builds seed request objects and calls ``AddJSReqs`` (:90-108),
and each rule's ParseFunc calls exactly one of two context primitives —
``ctx.ParseJSReg(nextRuleName, regex)`` (collect/rule.go:54-70: findall,
submatch 1 is the next URL, depth+1, GET) or ``ctx.OutputJS(regex)``
(:72-84: emit the page URL if the body matches).  The only real JS
rules in the repo (parse/doubangroup/douban_js_group.go:7-47) use
nothing else: a counting for-loop building Url strings by
concatenation, and one primitive call per rule.

A per-row JS VM is the wrong execution model on Spark (SURVEY.md §2
P9): this loader statically extracts the (pattern, next_rule) /
(pattern,) payloads those scripts carry and hands them to
``rules.dynamic_task``, whose LinkRule/MatchRule kernels ARE
ParseJSReg/OutputJS as Catalyst expressions.  Coverage is exactly the
script shapes the reference's VM surface supports — one primitive call
per ParseFunc, AddJSReqs over literal/concatenated request objects —
anything else raises rather than silently misloading.
"""

from __future__ import annotations

import re

from .rules import Task, dynamic_task

# JS double-quoted string literal body (honors backslash escapes)
_JS_STR = r'"((?:[^"\\]|\\.)*)"'

_ESCAPES = {
    '"': '"', "\\": "\\", "/": "/", "'": "'",
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "0": "\0",
    "v": "\v",
}


def js_string_unescape(body: str) -> str:
    """Decode a JS string literal body the way the VM would (otto):
    known escapes map, ``\\uXXXX``/``\\xXX`` decode, and — per
    ECMA-262 NonEscapeCharacter — an unknown escape yields the char
    itself (so the regex-minded ``"\\s"`` in a JS string is just
    ``s``... which is why the reference doubles them: ``\\\\s``)."""
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        nxt = body[i + 1]
        if nxt == "u":
            out.append(chr(int(body[i + 2 : i + 6], 16)))
            i += 6
        elif nxt == "x":
            out.append(chr(int(body[i + 2 : i + 4], 16)))
            i += 4
        else:
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
    return "".join(out)


def parse_rule_js(script: str) -> dict:
    """One ParseFunc script -> one dynamic_task rule spec.

    ``ctx.ParseJSReg(name, reg)`` -> extract_links (url_group=1 fixed,
    rule.go:59 ``m[1]``); ``ctx.OutputJS(reg)`` -> emit_if_match.
    Exactly one primitive call must be present (the VM returns the last
    expression's value; two calls would discard the first — a script
    doing that is malformed for the reference too)."""
    jsreg = list(
        re.finditer(r"ctx\.ParseJSReg\(\s*" + _JS_STR + r"\s*,\s*" + _JS_STR, script)
    )
    outjs = list(re.finditer(r"ctx\.OutputJS\(\s*" + _JS_STR, script))
    if len(jsreg) + len(outjs) != 1:
        raise ValueError(
            f"expected exactly one ctx.ParseJSReg/ctx.OutputJS call, "
            f"found {len(jsreg)}+{len(outjs)} in: {script[:80]!r}"
        )
    if jsreg:
        m = jsreg[0]
        return {
            "kind": "extract_links",
            "next_rule": js_string_unescape(m.group(1)),
            "pattern": js_string_unescape(m.group(2)),
        }
    return {"kind": "emit_if_match", "pattern": js_string_unescape(outjs[0].group(1))}


_FOR_RE = re.compile(
    r"for\s*\(\s*var\s+(\w+)\s*=\s*(\d+)\s*;\s*\1\s*(<=?)\s*(\d+)\s*;"
    r"\s*\1\s*(?:\+=\s*(\d+)|\+\+)\s*\)"
)
_OBJ_RE = re.compile(r"\{([^{}]*)\}", re.S)


def parse_root_js(script: str, default_rule: str = "") -> list[tuple[str, str, int]]:
    """Root script -> seed list [(url, rule_name, priority)].

    Supports the AddJSReqs shapes the reference uses
    (douban_js_group.go:32-47): request-object literals whose ``Url`` is
    a string literal optionally concatenated with the enclosing counting
    for-loop's variable (``"prefix" + i``), plus literal ``RuleName`` /
    ``Priority`` fields (AddJSReqs defaults: missing RuleName -> '',
    missing Priority -> 0, crawler_store.go:91-108)."""
    if "AddJSReqs" not in script and "AddJSReq" not in script:
        raise ValueError("root script never calls AddJSReqs/AddJSReq")
    loop = _FOR_RE.search(script)
    loop_values: list[int] = [0]
    loop_var = None
    if loop:
        var, start, cmp_op, stop, step = loop.groups()
        lo, hi, st = int(start), int(stop), int(step or 1)
        loop_var = var
        loop_values = list(range(lo, hi + 1 if cmp_op == "<=" else hi, st))
    seeds: list[tuple[str, str, int]] = []
    for obj in _OBJ_RE.finditer(script):
        body = obj.group(1)
        mu = re.search(r"Url\s*:\s*" + _JS_STR + r"(?:\s*\+\s*(\w+))?", body)
        if not mu:
            continue  # not a request object (e.g. an unrelated literal)
        prefix = js_string_unescape(mu.group(1))
        concat_var = mu.group(2)
        mr = re.search(r"RuleName\s*:\s*" + _JS_STR, body)
        rule = js_string_unescape(mr.group(1)) if mr else default_rule
        mp = re.search(r"Priority\s*:\s*(\d+)", body)
        prio = int(mp.group(1)) if mp else 0
        if concat_var:
            if concat_var != loop_var:
                raise ValueError(
                    f"Url concatenates {concat_var!r} but the loop "
                    f"variable is {loop_var!r}"
                )
            seeds += [(f"{prefix}{v}", rule, prio) for v in loop_values]
        else:
            seeds.append((prefix, rule, prio))
    if not seeds:
        raise ValueError("no request objects found in root script")
    return seeds


def task_from_js(
    name: str,
    root_js: str,
    rules_js: list[tuple[str, str]],
    **task_kwargs,
) -> Task:
    """TaskMode -> Task: the full loader (name + Root + [(rule name,
    ParseFunc script)] exactly as collect.TaskMode carries them).  The
    first extract_links rule missing an explicit next_rule target in
    rules_js raises via dynamic_task's validation downstream."""
    specs = []
    for rule_name, script in rules_js:
        spec = dict(parse_rule_js(script))
        spec["name"] = rule_name
        specs.append(spec)
    return dynamic_task(
        name, parse_root_js(root_js, default_rule=specs[0]["name"] if specs else ""),
        specs, **task_kwargs,
    )
