"""Minimal English inflection (pluralize / singularize / camelize).

The reference derives its API surface from model names via the Rust
``cruet`` crate (reference: src/cli/server/model/types.rs:179-204):
plural camelCase names become the GraphQL readMany field and the REST
collection path, and a model whose singular and plural coincide is
rejected (types.rs:149-151; fixture ``inflection_no_plural_variant.json``
uses ``yoga``). Duplicate models are detected on the *pluralized
camelCase* form (model.rs:192-204; fixtures ``inflection_dup1/2.json``).

This is a small, dependency-free re-implementation of the Rails-style
rules those crates use — enough for identifier-shaped model names.
"""

from __future__ import annotations

import re

# Words with no distinct plural (Rails/cruet-style uncountables).
UNCOUNTABLE = {
    "equipment", "information", "rice", "money", "species", "series",
    "fish", "sheep", "jeans", "police", "deer", "moose", "news", "swine",
    "yoga", "math", "music", "butter", "data", "metadata",
}

IRREGULAR = {
    "person": "people", "man": "men", "woman": "women", "child": "children",
    "foot": "feet", "tooth": "teeth", "goose": "geese", "mouse": "mice",
    "ox": "oxen",
}
IRREGULAR_INV = {v: k for k, v in IRREGULAR.items()}

_PLURAL_RULES = [
    (re.compile(r"(quiz)$", re.I), r"\1zes"),
    (re.compile(r"([m|l])ouse$", re.I), r"\1ice"),
    (re.compile(r"(matr|vert|ind)(?:ix|ex)$", re.I), r"\1ices"),
    (re.compile(r"(x|ch|ss|sh)$", re.I), r"\1es"),
    (re.compile(r"([^aeiouy]|qu)y$", re.I), r"\1ies"),
    (re.compile(r"(hive)$", re.I), r"\1s"),
    (re.compile(r"([^f])fe$", re.I), r"\1ves"),
    (re.compile(r"([lr])f$", re.I), r"\1ves"),
    (re.compile(r"sis$", re.I), "ses"),
    (re.compile(r"([ti])um$", re.I), r"\1a"),
    (re.compile(r"(buffal|tomat|potat|her)o$", re.I), r"\1oes"),
    (re.compile(r"(bu)s$", re.I), r"\1ses"),
    (re.compile(r"(alias|status)$", re.I), r"\1es"),
    (re.compile(r"(octop|vir)us$", re.I), r"\1i"),
    (re.compile(r"(ax|test)is$", re.I), r"\1es"),
    (re.compile(r"s$", re.I), "s"),
    (re.compile(r"$"), "s"),
]

_SINGULAR_RULES = [
    (re.compile(r"(quiz)zes$", re.I), r"\1"),
    (re.compile(r"(matr)ices$", re.I), r"\1ix"),
    (re.compile(r"(vert|ind)ices$", re.I), r"\1ex"),
    (re.compile(r"(alias|status)es$", re.I), r"\1"),
    (re.compile(r"(octop|vir)i$", re.I), r"\1us"),
    (re.compile(r"(cris|ax|test)es$", re.I), r"\1is"),
    (re.compile(r"(shoe)s$", re.I), r"\1"),
    (re.compile(r"(o)es$", re.I), r"\1"),
    (re.compile(r"(bus)es$", re.I), r"\1"),
    (re.compile(r"([m|l])ice$", re.I), r"\1ouse"),
    (re.compile(r"(x|ch|ss|sh)es$", re.I), r"\1"),
    (re.compile(r"(m)ovies$", re.I), r"\1ovie"),
    (re.compile(r"(s)eries$", re.I), r"\1eries"),
    (re.compile(r"([^aeiouy]|qu)ies$", re.I), r"\1y"),
    (re.compile(r"([lr])ves$", re.I), r"\1f"),
    (re.compile(r"(tive)s$", re.I), r"\1"),
    (re.compile(r"(hive)s$", re.I), r"\1"),
    (re.compile(r"([^f])ves$", re.I), r"\1fe"),
    (re.compile(r"(analy|ba|diagno|parenthe|progno|synop|the)ses$", re.I), r"\1sis"),
    (re.compile(r"([ti])a$", re.I), r"\1um"),
    (re.compile(r"(n)ews$", re.I), r"\1ews"),
    (re.compile(r"s$", re.I), ""),
]


def _apply(word: str, rules) -> str:
    for pattern, repl in rules:
        if pattern.search(word):
            return pattern.sub(repl, word)
    return word


def _split_last_word(name: str) -> tuple[str, str]:
    """Split an identifier into (prefix, last word) across case/sep styles."""
    m = re.search(r"([A-Za-z][a-z0-9]*)$", name)
    if not m:
        return name, ""
    return name[: m.start()], m.group(1)


def pluralize(name: str) -> str:
    prefix, word = _split_last_word(name)
    if not word:
        return name
    lower = word.lower()
    if lower in UNCOUNTABLE:
        return name
    if lower in IRREGULAR:
        out = IRREGULAR[lower]
    elif lower in IRREGULAR_INV:
        out = lower
    else:
        out = _apply(word, _PLURAL_RULES)
    if word[0].isupper():
        out = out[0].upper() + out[1:]
    return prefix + out


def singularize(name: str) -> str:
    prefix, word = _split_last_word(name)
    if not word:
        return name
    lower = word.lower()
    if lower in UNCOUNTABLE:
        return name
    if lower in IRREGULAR_INV:
        out = IRREGULAR_INV[lower]
    elif lower in IRREGULAR:
        out = lower
    else:
        out = _apply(word, _SINGULAR_RULES)
    if word[0].isupper() and out:
        out = out[0].upper() + out[1:]
    return prefix + out


def camelize(name: str, upper_first: bool = False) -> str:
    """snake_case / spinal-case / PascalCase → camelCase."""
    parts = re.split(r"[-_\s]+", name)
    words: list[str] = []
    for part in parts:
        # split PascalCase segments too
        words.extend(re.findall(r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z0-9]+|[A-Z]+", part))
    if not words:
        return name
    out = [w.lower() for w in words]
    camel = "".join(w.capitalize() for w in out)
    if not upper_first:
        camel = camel[0].lower() + camel[1:]
    return camel


def plural_camel(name: str) -> str:
    """The collision key the reference dedups models on (model.rs:192-204)."""
    return camelize(pluralize(name))


def has_distinct_plural(name: str) -> bool:
    """types.rs:149-151 — a model name must have a distinct plural variant.

    A plural name (``movies``) is fine — its singular differs; only words
    whose singular and plural coincide (``yoga``) are rejected (fixture
    ``inflection_no_plural_variant.json``).
    """
    return pluralize(name) != name or singularize(name) != name
