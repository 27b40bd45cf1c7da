"""Static sanity checks for the frontend bundle.

There is no JS engine in the CI image, so these tests approximate what a
syntax pass + smoke render would catch: bracket balance with full
string/comment/template awareness, DOM-id wiring between each page script
and its page, and locale-catalog completeness (reference ships
frontend/i18n.js with en/ru dictionaries; our catalogs must cover every
tagged string — reference frontend/locales analog).
"""

import json
import re
from pathlib import Path

import pytest

FRONT = Path(__file__).resolve().parent.parent / "frontend"


def strip_js(src: str) -> str:
    """Remove comments, string literals and template literals (keeping any
    ${...} interpolation bodies) so bracket counting sees only code."""
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if c == "/" and nxt == "/":
            j = src.find("\n", i)
            i = n if j == -1 else j
        elif c == "/" and nxt == "*":
            j = src.find("*/", i + 2)
            i = n if j == -1 else j + 2
        elif c in "'\"":
            q = c
            i += 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
            i += 1
        elif c == "`":
            i += 1
            while i < n and src[i] != "`":
                if src[i] == "\\":
                    i += 2
                elif src[i] == "$" and i + 1 < n and src[i + 1] == "{":
                    # keep interpolation body as code (it can nest brackets)
                    depth = 1
                    j = i + 2
                    start = j
                    while j < n and depth:
                        if src[j] == "{":
                            depth += 1
                        elif src[j] == "}":
                            depth -= 1
                        j += 1
                    out.append(strip_js(src[start:j - 1]))
                    i = j
                else:
                    i += 1
            i += 1
        elif c == "/" and _regex_position(out):
            # regex literal: skip to unescaped / (char classes may hold /)
            i += 1
            in_cls = False
            while i < n and (src[i] != "/" or in_cls):
                if src[i] == "\\":
                    i += 1
                elif src[i] == "[":
                    in_cls = True
                elif src[i] == "]":
                    in_cls = False
                i += 1
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _regex_position(out_parts) -> bool:
    """A / starts a regex (not division) if the last code char suggests an
    expression is expected."""
    tail = "".join(out_parts[-8:]).rstrip()
    if not tail:
        return True
    return tail[-1] in "=([{,;:!&|?+-*%<>~^" or bool(
        re.search(r"\b(return|typeof|case|in|of|new|delete|void)$", tail))


JS_FILES = sorted(p.name for p in FRONT.glob("*.js") if p.name != "sw.js") + ["sw.js"]


@pytest.mark.parametrize("name", JS_FILES)
def test_js_brackets_balanced(name):
    src = (FRONT / name).read_text()
    code = strip_js(src)
    pairs = {"(": ")", "[": "]", "{": "}"}
    stack = []
    line = 1
    for ch in code:
        if ch == "\n":
            line += 1
        elif ch in pairs:
            stack.append((pairs[ch], line))
        elif ch in ")]}":
            assert stack, f"{name}: unmatched '{ch}' near line {line}"
            want, opened = stack.pop()
            assert ch == want, (
                f"{name}: expected '{want}' (opened line {opened}), got "
                f"'{ch}' near line {line}")
    assert not stack, f"{name}: unclosed '{stack[-1][0]}' from line {stack[-1][1]}"
    # cheap sanity: quotes must be even per stripped result (no dangling)
    assert "`" not in code, f"{name}: unterminated template literal"


PAGE_SCRIPTS = [
    ("app.js", ["index.html"]),
    ("admin.js", ["admin.html"]),
]


@pytest.mark.parametrize("script,pages", PAGE_SCRIPTS)
def test_dom_ids_exist(script, pages):
    """Every statically-referenced $(\"id\") in a page script must exist in
    that page's markup (ids created dynamically by the script itself or by
    mm.js's header injection are allowed)."""
    src = (FRONT / script).read_text()
    html = "".join((FRONT / p).read_text() for p in pages)
    page_ids = set(re.findall(r'id="([\w-]+)"', html))
    # ids the scripts create at runtime
    dynamic = {"msg", "mm-lang", "mm-auth", "mm-theme", "mm-install"}
    dynamic |= set(re.findall(r'id="([\w-]+)"', src))  # built via innerHTML
    missing = set()
    for m in re.finditer(r'\$\("([\w-]+)"\)', src):
        i = m.group(1)
        if i not in page_ids and i not in dynamic:
            missing.add(i)
    assert not missing, f"{script}: ids not in {pages}: {sorted(missing)}"


def _locales():
    loc = {}
    for p in (FRONT / "locales").glob("*.json"):
        loc[p.stem] = json.loads(p.read_text())
    return loc


def test_locale_catalogs_cover_markup():
    """Every data-i18n / data-i18n-ph key in every page must appear in both
    the en and ru catalogs (reference i18n.js contract)."""
    loc = _locales()
    assert "en" in loc and "ru" in loc
    keys = set()
    for page in FRONT.glob("*.html"):
        html = page.read_text()
        keys |= set(re.findall(r'data-i18n(?:-ph)?="([^"]+)"', html))
    for lang in ("en", "ru"):
        missing = sorted(k for k in keys if k not in loc[lang])
        assert not missing, f"locales/{lang}.json missing: {missing[:10]}"


def test_locale_catalogs_cover_T_calls():
    """Strings looked up via T(\"...\") in JS must be translatable."""
    loc = _locales()
    keys = set()
    for name in JS_FILES:
        src = (FRONT / name).read_text()
        keys |= set(re.findall(r'\bT\("([^"]+)"\)', src))
    for lang in ("en", "ru"):
        missing = sorted(k for k in keys if k not in loc[lang])
        assert not missing, f"locales/{lang}.json missing T(): {missing[:10]}"


def test_ru_catalog_actually_translated():
    """The ru catalog must not silently degrade into identity entries —
    at least 80% of entries containing latin letters should differ."""
    loc = _locales()
    ru = loc["ru"]
    latin = [k for k in ru if re.search(r"[a-zA-Z]{3}", k)]
    translated = [k for k in latin if ru[k] != k]
    assert len(translated) >= 0.8 * len(latin), (
        f"ru.json looks untranslated: {len(translated)}/{len(latin)}")


def test_locale_catalog_depth():
    """Round-5 item 5: the catalogs must stay at reference depth — the
    reference ships ~800 site keys per language (frontend/locales/
    site-en.json); this build's floor is 500 per language with every key
    translated in ru."""
    loc = _locales()
    assert len(loc["en"]) >= 500, f"en catalog shrank: {len(loc['en'])}"
    assert len(loc["ru"]) >= 500, f"ru catalog shrank: {len(loc['ru'])}"
    missing = sorted(k for k in loc["en"] if k not in loc["ru"])
    assert not missing, f"ru.json missing {len(missing)}: {missing[:5]}"


def test_every_admin_route_group_has_ui_caller():
    """Round-5 item 5: every /api/admin/* route group registered by the
    backend must have a caller in admin.js — no admin capability without
    an admin-panel affordance (reference admin.html covers its API)."""
    routes_src = (Path(__file__).resolve().parent.parent / "amw_tpu"
                  / "runtime" / "admin_routes.py").read_text()
    reg = re.search(r"def register_routes.*", routes_src, re.S).group(0)
    paths = re.findall(r'f?"\{p\}(/[a-z0-9_/{}.-]+)"', reg)
    # group = first path segment (+ second for nested groups like backup/db)
    groups = set()
    for p in paths:
        segs = [s for s in p.split("/") if s and not s.startswith("{")]
        groups.add(segs[0])
    js = (FRONT / "admin.js").read_text()
    missing = sorted(g for g in groups
                     if f"/api/admin/{g}" not in js)
    assert not missing, f"admin.js has no caller for groups: {missing}"
