"""Minimal HTML DOM with Jsoup-compatible ``Element.text()`` semantics.

This is the pure-Python extraction kernel used inside vectorized pandas UDFs.
It reimplements, from public Jsoup 1.18.1 behavior (the version the reference
builds against, ``/root/reference/build.gradle:27``), exactly the surface the
reference crawler relies on:

- ``Element.text()`` — whitespace-normalized visible text (reference uses it in
  ``extractor/ContentExtractor.java:97`` and ``extractor/MinCharacterRule.java:33``):
  runs of whitespace (incl. NBSP) collapse to one space, block elements and
  ``<br>`` contribute a separating space, zero-width/soft-hyphen chars drop,
  ``<pre>``/``<textarea>``/``<title>`` preserve whitespace, script/style data is
  excluded, result is trimmed.
- ``Document.title()`` — whitespace-normalized, trimmed text of the first
  ``<title>`` in ``<head>`` (``processor/WebPageProcessor.java:173``).
- ``doc.select("a[href]")`` in document order with ``abs:href`` resolution
  (``service/CrawlerService.java:133-136``).

No Spark imports here: this module must stay importable on executors with zero
dependencies beyond the stdlib.
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser
from typing import Iterator, List, Optional, Tuple
from urllib.parse import urljoin

# Jsoup Tag.java blockTags (isBlock == True). Unknown tags default to inline.
_BLOCK_TAGS = frozenset(
    """html body frameset script noscript style meta link title frame noframes
    section nav aside hgroup header footer p h1 h2 h3 h4 h5 h6 ul ol pre div
    blockquote hr address figure figcaption form fieldset ins del dl dt dd li
    table caption thead tfoot tbody colgroup col tr td th video audio canvas
    details menu plaintext template article main svg math center dir applet
    marquee listing""".split()
)

# Jsoup Tag.java formatAsInlineTags: block tags that format inline (used by the
# text() tail rule that inserts a space after a block element followed by text
# or an inline element).
_FORMAT_AS_INLINE = frozenset(
    """title a p h1 h2 h3 h4 h5 h6 pre address li th td script style ins del
    s button""".split()
)

# Jsoup Tag.java preserveWhitespace tags.
_PRESERVE_WS = frozenset({"pre", "plaintext", "title", "textarea"})

# HTML void elements (Jsoup emptyTags): never pushed on the open-element stack.
_VOID_TAGS = frozenset(
    """area base br col embed hr img input link meta param source track wbr
    basefont bgsound command device keygen menuitem""".split()
)

# Raw-text elements whose character data is a DataNode in Jsoup (excluded from
# Element.text()).
_DATA_TAGS = frozenset({"script", "style"})

_WS_CODEPOINTS = frozenset({0x20, 0x09, 0x0A, 0x0C, 0x0D, 0xA0})
_INVISIBLE_CODEPOINTS = frozenset({0x200B, 0x00AD})


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: Optional["Element"] = None) -> None:
        self.text = text
        self.parent = parent

    def __repr__(self) -> str:  # pragma: no cover
        return f"TextNode({self.text!r})"


class DataNode:
    """Script/style character data — never part of text()."""

    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: Optional["Element"] = None) -> None:
        self.text = text
        self.parent = parent


class CDataNode(TextNode):
    """``<![CDATA[...]]>`` section. Jsoup tokenizes CDATA in ANY context (its
    MarkupDeclarationOpen state does not check for foreign content) into a
    CDataNode that extends TextNode, and Element#appendNormalisedText appends
    CDataNode content verbatim — whitespace preserved, markup not unescaped —
    so CDATA contributes literally to ``Element.text()`` (public Jsoup 1.18
    behavior, pinned by Jsoup's own ``handlesCdata`` parser test)."""

    __slots__ = ()


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Optional[dict] = None,
                 parent: Optional["Element"] = None) -> None:
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []
        self.parent = parent

    # --- structural helpers -------------------------------------------------
    def child_elements(self) -> List["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def append(self, node) -> None:
        node.parent = self
        self.children.append(node)

    @property
    def is_block(self) -> bool:
        return self.tag in _BLOCK_TAGS

    @property
    def format_as_block(self) -> bool:
        return self.tag in _BLOCK_TAGS and self.tag not in _FORMAT_AS_INLINE

    def attr(self, name: str) -> str:
        return self.attrs.get(name, "")

    def has_class(self, class_name: str) -> bool:
        """Jsoup Element.hasClass: case-sensitive membership in the
        whitespace-separated class attribute (ClassNameContentRule.java:22-40)."""
        cls = self.attrs.get("class")
        if not cls:
            return False
        return class_name in cls.split()

    def next_sibling(self):
        if self.parent is None:
            return None
        sibs = self.parent.children
        try:
            i = sibs.index(self)
        except ValueError:  # pragma: no cover
            return None
        return sibs[i + 1] if i + 1 < len(sibs) else None

    # --- document-order traversal -------------------------------------------
    def iter_elements(self) -> Iterator["Element"]:
        """Pre-order DFS over descendant elements, self included."""
        stack = [self]
        while stack:
            el = stack.pop()
            yield el
            stack.extend(reversed(el.child_elements()))

    # --- Jsoup text() --------------------------------------------------------
    def text(self) -> str:
        """Jsoup-1.18 Element.text(): NodeTraversor + TextAccumulator."""
        accum: List[str] = []
        self._text_visit(accum)
        return "".join(accum).strip()

    def _preserve_ws(self) -> bool:
        # Jsoup checks this element and up to five ancestors.
        el: Optional[Element] = self
        i = 0
        while el is not None and i < 6:
            if el.tag in _PRESERVE_WS:
                return True
            el = el.parent
            i += 1
        return False

    def _text_visit(self, accum: List[str]) -> None:
        # head
        if accum and (self.is_block or self.tag == "br") and not _ends_ws(accum):
            accum.append(" ")
        for child in self.children:
            if isinstance(child, TextNode):
                if isinstance(child, CDataNode) or (
                    child.parent is not None and child.parent._preserve_ws()
                ):
                    accum.append(child.text)
                else:
                    _append_normalised_ws(accum, child.text, _ends_ws(accum))
            elif isinstance(child, Element):
                child._text_visit(accum)
            # DataNode: skipped
        # tail
        nxt = self.next_sibling()
        if (
            self.is_block
            and (
                isinstance(nxt, TextNode)
                or (isinstance(nxt, Element) and not nxt.format_as_block)
            )
            and not _ends_ws(accum)
        ):
            accum.append(" ")


def _ends_ws(accum: List[str]) -> bool:
    return bool(accum) and accum[-1][-1:] == " "


def _append_normalised_ws(accum: List[str], string: str, strip_leading: bool) -> None:
    """Jsoup StringUtil.appendNormalisedWhitespace."""
    last_was_white = False
    reached_non_white = False
    out: List[str] = []
    for ch in string:
        cp = ord(ch)
        if cp in _WS_CODEPOINTS:
            if (strip_leading and not reached_non_white) or last_was_white:
                continue
            out.append(" ")
            last_was_white = True
        elif cp not in _INVISIBLE_CODEPOINTS:
            out.append(ch)
            last_was_white = False
            reached_non_white = True
    if out:
        accum.append("".join(out))


def normalise_whitespace(s: str) -> str:
    """Jsoup StringUtil.normaliseWhitespace (used for Document.title())."""
    accum: List[str] = []
    _append_normalised_ws(accum, s, False)
    return "".join(accum)


class ParseError(ValueError):
    """Raised on markup the engine refuses to parse (the ERROR_PARSE path,
    processor/WebPageProcessor.java:216-227). The one deterministic trigger is
    the open-element stack cap below — real parsers carry equivalent guards
    (Jsoup's tree builder bounds its stack searches; browsers cap nesting), and
    a fixed cap keeps the failure deterministic across interpreters instead of
    depending on the Python recursion limit."""


# Maximum open-element nesting depth accepted by parse().
MAX_NESTING_DEPTH = 256


class _TreeBuilder(HTMLParser):
    # script/style are raw text (DataNode, excluded from text()); title and
    # textarea are RCDATA per the HTML5 tokenizer (and Jsoup): markup inside
    # is literal text, only character references decode. Listing them here
    # makes html.parser scan to the matching end tag instead of tokenizing
    # their contents — handle_data then decodes entities for the RCDATA pair.
    CDATA_CONTENT_ELEMENTS = ("script", "style", "title", "textarea")
    _RCDATA_TAGS = frozenset({"title", "textarea"})

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack: List[Element] = [self.root]
        self._in_data_tag: Optional[str] = None
        self._in_rcdata: Optional[str] = None

    # Minimal implied-end-tag handling for the tags our corpus and the
    # reference fixtures use. Full HTML5 tree construction is out of scope;
    # corpus HTML is generated well-formed (FIXTURES.md §1.1).
    _AUTO_CLOSE = {
        "p": {"p"},
        "li": {"li"},
        "dt": {"dt", "dd"},
        "dd": {"dt", "dd"},
        "tr": {"tr"},
        "td": {"td", "th"},
        "th": {"td", "th"},
        "option": {"option"},
    }

    @staticmethod
    def _attr_dict(attrs) -> dict:
        # HTML5 tree construction (and Jsoup) keep the FIRST occurrence of a
        # duplicated attribute; dict(attrs) would keep the last.
        d: dict = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v
        return d

    def handle_starttag(self, tag, attrs):
        closers = self._AUTO_CLOSE.get(tag)
        if closers and self.stack[-1].tag in closers:
            self.stack.pop()
        el = Element(tag, self._attr_dict(attrs))
        self.stack[-1].append(el)
        if tag in _DATA_TAGS:
            self._in_data_tag = tag
        elif tag in self._RCDATA_TAGS:
            self._in_rcdata = tag
        if tag not in _VOID_TAGS and tag not in _DATA_TAGS:
            if len(self.stack) > MAX_NESTING_DEPTH:
                raise ParseError(
                    f"markup nesting exceeds {MAX_NESTING_DEPTH} open elements"
                )
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, self._attr_dict(attrs))
        self.stack[-1].append(el)

    def handle_endtag(self, tag):
        if tag in _DATA_TAGS:
            self._in_data_tag = None
            return
        if tag in self._RCDATA_TAGS:
            self._in_rcdata = None
        if tag in _VOID_TAGS:
            return
        # pop until matching open tag (tolerate mismatches)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        if tag == "p":
            # HTML5 "in body" </p> with no open <p>: insert an empty <p> and
            # close it (so the block still separates surrounding text runs)
            self.stack[-1].append(Element("p"))

    def close(self):
        # html.parser silently drops the buffered tail of an unterminated
        # script/style/title/textarea at EOF; the HTML5 tokenizer emits it as
        # the element's character data (a broken <title> swallows the rest of
        # the page as its text — what browsers show in the tab)
        if self.cdata_elem is not None and self.rawdata:
            tail, self.rawdata = self.rawdata, ""
            self.handle_data(tail)
        super().close()

    def unknown_decl(self, data):
        # html.parser surfaces <![CDATA[x]]> as unknown_decl("CDATA[x");
        # Jsoup tokenizes it (any context) into a text-carrying CDataNode
        if data.startswith("CDATA["):
            self.stack[-1].append(CDataNode(data[6:]))

    def handle_data(self, data):
        if not data:
            return
        top = self.stack[-1]
        if self._in_data_tag is not None:
            # attach to the open script/style element (last child)
            kids = top.children
            if kids and isinstance(kids[-1], Element) and kids[-1].tag == self._in_data_tag:
                kids[-1].append(DataNode(data))
            return
        if self._in_rcdata is not None:
            # RCDATA reaches here raw (html.parser skips charref conversion
            # in cdata mode); decode character references, keep markup literal
            top.append(TextNode(unescape(data)))
            return
        top.append(TextNode(data))


class Document(Element):
    def __init__(self, root: Element) -> None:
        super().__init__("#document")
        self.children = root.children
        for c in self.children:
            c.parent = self

    def _find_first(self, tag: str) -> Optional[Element]:
        for el in self.iter_elements():
            if el.tag == tag:
                return el
        return None

    def body(self) -> Element:
        b = self._find_first("body")
        return b if b is not None else self

    def head(self) -> Optional[Element]:
        return self._find_first("head")

    def title(self) -> str:
        """Jsoup Document.title(): normalised+trimmed first <title> text."""
        head = self.head()
        scope = head if head is not None else self
        for el in scope.iter_elements():
            if el.tag == "title":
                return normalise_whitespace(el.text()).strip()
        return ""


def parse(html: str) -> Document:
    """Parse an HTML string into a Document (lenient, document-order)."""
    builder = _TreeBuilder()
    html = html or ""
    if "\x00" in html:
        # HTML5 tokenizer: U+0000 is a parse error emitted as U+FFFD (Jsoup's
        # CharacterReader does the same replacement)
        html = html.replace("\x00", "�")
    builder.feed(html)
    builder.close()
    return Document(builder.root)


def select_anchor_texts(doc: Element, base_url: str) -> List[Tuple[str, str, int]]:
    """``a[href]`` with the anchor's visible text: [(abs_href, text, pos)].

    The anchor-text harvest a web-corpus pipeline wants beside the plain
    link harvest (anchor text is a ranking/training signal the reference's
    select_links drops). Same element set and ordering as select_links
    (CrawlerService.java:133-136 semantics); text is the anchor element's
    Jsoup-normalized ``text()`` (whitespace-collapsed, trimmed)."""
    out: List[Tuple[str, str, int]] = []
    pos = 0
    for el in doc.iter_elements():
        if el.tag == "a" and "href" in el.attrs:
            href = el.attrs.get("href") or ""
            try:
                abs_href = urljoin(base_url, href.strip())
            except ValueError:
                abs_href = ""
            out.append((abs_href, normalise_whitespace(el.text()).strip(), pos))
            pos += 1
    return out


def select_meta(doc: Element, base_url: str) -> Tuple[str, str]:
    """First ``meta[name=description]@content`` and
    ``link[rel=canonical]@abs:href`` in document order.

    Reference README.md:152 declares "extract title, meta description,
    canonical link" but WebPageProcessor never implements it (the shipped
    ``description`` field stays null — WebPageContent.java:34 exists,
    setDescription is never called); semantics fixed here Jsoup-style:
    attribute-value match is case-insensitive, the canonical href resolves
    absolute against the page URL, first match wins, missing → empty."""
    desc = ""
    canon = ""
    for el in doc.iter_elements():
        if (
            not desc
            and el.tag == "meta"
            and (el.attrs.get("name") or "").strip().lower() == "description"
        ):
            desc = el.attrs.get("content") or ""
        if (
            not canon
            and el.tag == "link"
            and (el.attrs.get("rel") or "").strip().lower() == "canonical"
        ):
            href = (el.attrs.get("href") or "").strip()
            if href:
                try:
                    canon = urljoin(base_url, href)
                except ValueError:
                    canon = ""
        if desc and canon:
            break
    return desc, canon


def select_links(doc: Element, base_url: str) -> List[Tuple[str, int]]:
    """``doc.select("a[href]")`` + ``attr("abs:href")`` in document order.

    Mirrors service/CrawlerService.java:133-136: every <a> carrying an href
    attribute, resolved absolute against the page URL; returns
    [(abs_href, document_position)].
    """
    out: List[Tuple[str, int]] = []
    pos = 0
    for el in doc.iter_elements():
        if el.tag == "a" and "href" in el.attrs:
            href = el.attrs.get("href") or ""
            try:
                abs_href = urljoin(base_url, href.strip())
            except ValueError:
                abs_href = ""
            out.append((abs_href, pos))
            pos += 1
    return out
