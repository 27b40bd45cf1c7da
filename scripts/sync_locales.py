#!/usr/bin/env python
"""Sync the frontend locale catalogs with the markup (round-5 item 5).

Scans every frontend page/script for ``data-i18n`` / ``data-i18n-ph`` keys
and ``T("...")`` calls, then:

- adds missing keys to ``locales/en.json`` as identity entries (the en
  catalog is the canonical list of UI strings — operators retune English
  copy there without editing markup, mm.js applyI18n contract);
- reports keys missing from ``locales/ru.json`` so translations are never
  silently dropped (tests/test_frontend_assets.py fails on gaps);
- reports (but NEVER prunes) entries whose key the scanner can't find:
  mm.js builds ``data-i18n`` attributes dynamically from the MM_NAV /
  MM_FOOT arrays and T() is occasionally called with computed strings, so
  an unseen catalog entry is not necessarily dead.

Usage:
  python scripts/sync_locales.py          # report + update en.json
  python scripts/sync_locales.py --check  # report only, exit 1 on gaps
"""

import json
import pathlib
import re
import sys

FRONT = pathlib.Path(__file__).resolve().parent.parent / "frontend"


def collect_keys():
    keys = set()
    for p in list(FRONT.glob("*.html")) + list(FRONT.glob("*.js")):
        text = p.read_text(encoding="utf-8")
        keys |= set(re.findall(r'data-i18n(?:-ph)?="([^"]+)"', text))
        keys |= set(re.findall(r'\bT\("((?:[^"\\]|\\.)+)"\)', text))
        keys |= set(re.findall(r"\bT\('((?:[^'\\]|\\.)+)'\)", text))
    # Template-literal interpolation artifacts (`data-i18n="${label}"` in
    # JS-built markup) are not catalog keys.
    return {k.replace('\\"', '"').replace("\\'", "'") for k in keys
            if "${" not in k}


def main():
    check = "--check" in sys.argv
    keys = collect_keys()
    en_path = FRONT / "locales" / "en.json"
    ru_path = FRONT / "locales" / "ru.json"
    en = json.loads(en_path.read_text(encoding="utf-8"))
    ru = json.loads(ru_path.read_text(encoding="utf-8"))

    new_en = sorted(keys - set(en))
    dead_en = sorted(set(en) - keys)
    missing_ru = sorted(keys - set(ru))
    dead_ru = sorted(set(ru) - keys)

    if new_en:
        print(f"en.json: +{len(new_en)} identity entries")
    if dead_en:
        print(f"en.json: {len(dead_en)} entries not found by the scanner "
              f"(dynamic data-i18n keys are expected; never pruned)")
    if missing_ru:
        print(f"ru.json MISSING {len(missing_ru)} translations:")
        for k in missing_ru:
            print("  " + k[:100])

    if check:
        sys.exit(1 if (new_en or missing_ru) else 0)

    for k in new_en:
        en[k] = k
    en_path.write_text(
        json.dumps(dict(sorted(en.items())), ensure_ascii=False, indent=2)
        + "\n", encoding="utf-8")
    print(f"catalogs: en {len(en)} keys, ru {len(ru)} keys "
          f"({len(missing_ru)} untranslated)")


if __name__ == "__main__":
    main()
