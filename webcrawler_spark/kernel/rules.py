"""Content-rule predicates over DOM elements.

Reimplements the reference's ``ContentRule`` family (the reference's UDF-like
extension point, ``extractor/ContentRule.java:9-18``):

- TagNameRule     — extractor/TagNameContentRule.java:19-38 (case-insensitive)
- ClassNameRule   — extractor/ClassNameContentRule.java:22-40 (case-sensitive
                    membership in the whitespace-separated class attr)
- MinCharacterRule— extractor/MinCharacterRule.java:19-36 (trimmed text length
                    >= n; negative n treated as 0)
- ElementStyleRule— extractor/ElementStyleRule.java:22-44 (case-insensitive
                    substring of the inline style attr; blank style -> False)

Rules are plain picklable dataclasses so a broadcast config can ship them into
pandas UDFs; ``build_rules`` mirrors CrawlerProperties.buildRules
(``crawler/CrawlerProperties.java:260-280``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

from .dom import Element


class RuleError(ValueError):
    pass


@dataclass(frozen=True)
class TagNameRule:
    tag_name: str

    def __post_init__(self):
        if self.tag_name is None or self.tag_name.strip() == "":
            raise RuleError("tagName must not be null/blank")
        object.__setattr__(self, "tag_name", self.tag_name.strip())

    def is_matched(self, el: Optional[Element]) -> bool:
        if el is None:
            return False
        return el.tag.lower() == self.tag_name.lower()


@dataclass(frozen=True)
class ClassNameRule:
    class_name: str

    def __post_init__(self):
        if self.class_name is None or self.class_name.strip() == "":
            raise RuleError("className must not be null/blank")
        object.__setattr__(self, "class_name", self.class_name.strip())

    def is_matched(self, el: Optional[Element]) -> bool:
        if el is None:
            return False
        return el.has_class(self.class_name)


@dataclass(frozen=True)
class MinCharacterRule:
    min_chars: int

    def __post_init__(self):
        object.__setattr__(self, "min_chars", max(0, self.min_chars))

    def is_matched(self, el: Optional[Element]) -> bool:
        if el is None:
            return False
        text = el.text()
        return len(text.strip()) >= self.min_chars


@dataclass(frozen=True)
class ElementStyleRule:
    style_fragment: str

    def __post_init__(self):
        if self.style_fragment is None or self.style_fragment.strip() == "":
            raise RuleError("styleFragment must not be null/blank")
        object.__setattr__(self, "style_fragment", self.style_fragment.strip())

    def is_matched(self, el: Optional[Element]) -> bool:
        if el is None:
            return False
        style = el.attr("style")
        if style.strip() == "":
            return False
        return self.style_fragment.lower() in style.lower()


@dataclass(frozen=True)
class LambdaRule:
    """Ad-hoc predicate, mirroring the reference tests' lambda ContentRules
    (extractor/ContentExtractorTest.java:104-105)."""

    fn: Callable[[Element], bool]

    def is_matched(self, el: Optional[Element]) -> bool:
        return el is not None and bool(self.fn(el))


Rule = object  # any of the above


def build_rules(cfg: Optional[dict]) -> List[Rule]:
    """CrawlerProperties.buildRules (crawler/CrawlerProperties.java:260-280):
    minCharacter>=0 -> MinCharacterRule; tagName -> TagNameRule; classNames CSV
    -> one ClassNameRule per non-empty entry; elementStyle -> ElementStyleRule.
    """
    out: List[Rule] = []
    if not cfg:
        return out
    min_chars = cfg.get("minCharacter")
    if min_chars is not None and min_chars >= 0:
        out.append(MinCharacterRule(min_chars))
    tag = cfg.get("tagName")
    if tag is not None and tag.strip() != "":
        out.append(TagNameRule(tag.strip()))
    class_names = cfg.get("classNames")
    if class_names is not None and class_names.strip() != "":
        for part in class_names.split(","):
            cls = part.strip()
            if cls:
                out.append(ClassNameRule(cls))
    style = cfg.get("elementStyle")
    if style is not None and style.strip() != "":
        out.append(ElementStyleRule(style.strip()))
    return out


def matches_any(el: Element, rules: Optional[Sequence[Rule]]) -> bool:
    """ContentExtractor.matchesAny (extractor/ContentExtractor.java:108-114)."""
    if not rules:
        return False
    return any(r is not None and r.is_matched(el) for r in rules)


def matches_all(el: Element, rules: Optional[Sequence[Rule]]) -> bool:
    """ContentExtractor.matchesAll (:116-123); a null rule fails the AND."""
    if not rules:
        return False
    return all(r is not None and r.is_matched(el) for r in rules)
