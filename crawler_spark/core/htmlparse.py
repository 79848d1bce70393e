"""Minimal DOM over stdlib ``html.parser`` emulating the BeautifulSoup
``html.parser`` tree-builder subset the reference relies on.

The reference parses every page with ``BeautifulSoup(html, 'html.parser')``
(/root/reference/crawler/enhanced_crawler.py:196) and uses only:

- ``soup.find(name)`` / ``soup.find_all(names)`` — document-order (pre-order)
  descendant search (enhanced_crawler.py:69, :72, :80, :90;
  ai_processor.py:251, :257, :266),
- ``soup.find_all('a', href=True)`` + ``tag['href']``
  (enhanced_crawler.py:80-81),
- ``tag.text`` == ``get_text()`` and ``tag.get_text(" ", strip=True)``
  (enhanced_crawler.py:70-74, :92).

bs4 is not available in this environment, so this module reimplements that
observable contract from scratch on stdlib ``html.parser``:

- ``convert_charrefs=True`` (entities decoded in text and attributes),
- one text node per inter-tag gap (bs4 buffers ``handle_data`` chunks and
  flushes a single ``NavigableString`` at each tag boundary),
- void elements never pushed on the open-tag stack,
- end tags pop to the most recent matching open tag, closing everything
  above it; an end tag with no matching open tag pops all open tags
  (bs4 ``BeautifulSoup._popToTag`` semantics, quirks included),
- ``get_text(sep, strip=True)`` strips each text node with ``str.strip()``
  (Unicode whitespace) and skips nodes that become empty, then joins with
  ``sep``.

No code is copied from bs4 or the reference; behavior was derived from the
published API contract.

Performance: this kernel dominates crawl CPU (it runs once per fetched
page inside the Arrow UDF), so the tree is stored as ONE flat pre-order
node list built during parsing; every element knows its ``[_pos+1, _end)``
slice, making ``descendants`` a list slice instead of a recursive walk,
and per-element text is memoized (the extraction pipeline reads each tag's
text 2-3 times). Profiling showed the naive recursive form spent 60%+ of
kernel time re-walking subtrees; the flat form also allocates far less,
which matters for multi-process scaling on a shared memory bus.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, List, Optional, Sequence, Union

# HTML void elements: may not have children and never stay on the open stack.
_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input keygen link menuitem meta param source track wbr".split()
)


_EMPTY_ATTRS: dict = {}


class Node:
    __slots__ = ()


class TextNode(Node):
    """NOT produced by this parser: the flat document list (and therefore
    ``children``/``descendants``) stores text runs as plain ``str`` — one
    fewer heap object per text node, and the kernel runs once per crawled
    page, so allocation volume is throughput. The class remains only so
    external code can still name the type; ``isinstance(node, TextNode)``
    over parse output matches nothing — test text children with
    ``isinstance(node, str)``."""

    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        self.data = data


class Element(Node):
    __slots__ = ("name", "attrs", "_doc", "_pos", "_end", "_text_raw", "_text_ss")

    def __init__(self, name: str, attrs: dict, doc: List[Node], pos: int) -> None:
        self.name = name
        self.attrs = attrs
        self._doc = doc
        self._pos = pos
        self._end = pos + 1  # finalized when the element closes
        self._text_raw: Optional[str] = None
        self._text_ss: Optional[str] = None

    def __getitem__(self, key: str) -> str:
        return self.attrs[key]

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    @property
    def children(self) -> List[Node]:
        """Direct children (document-order): Element instances and plain
        ``str`` text runs (never TextNode — see TextNode). Derived from the
        flat list — kept for API compatibility; traversal paths below never
        use it."""
        out: List[Node] = []
        i = self._pos + 1
        while i < self._end:
            node = self._doc[i]
            out.append(node)
            i = node._end if node.__class__ is Element else i + 1
        return out

    # --- traversal -------------------------------------------------------
    def descendants(self) -> Iterator[Node]:
        """Pre-order traversal of all descendant nodes (not self) — a
        contiguous slice of the document's flat pre-order list."""
        return iter(self._doc[self._pos + 1 : self._end])

    def strings(self) -> Iterator[str]:
        for node in self._doc[self._pos + 1 : self._end]:
            if node.__class__ is str:
                yield node

    # --- bs4-contract surface --------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if strip:
            parts: List[str] = []
            for node in self._doc[self._pos + 1 : self._end]:
                if node.__class__ is str:
                    s = node.strip()
                    if s:
                        parts.append(s)
            return separator.join(parts)
        return separator.join(
            node
            for node in self._doc[self._pos + 1 : self._end]
            if node.__class__ is str
        )

    @property
    def text(self) -> str:
        t = self._text_raw
        if t is None:
            t = self._text_raw = self.get_text()
        return t

    def get_text_sep_strip(self) -> str:
        """Memoized ``get_text(" ", strip=True)`` — the markdown extractor's
        per-tag call; nested tags re-read overlapping subtrees."""
        t = self._text_ss
        if t is None:
            t = self._text_ss = self.get_text(" ", strip=True)
        return t

    def find_all(
        self,
        name: Union[str, Sequence[str]],
        href: Optional[bool] = None,
    ) -> List["Element"]:
        if isinstance(name, str):
            doc = self._doc
            return [
                node
                for node in doc[self._pos + 1 : self._end]
                if node.__class__ is Element
                and node.name == name
                and not (href and "href" not in node.attrs)
            ]
        names = set(name)
        return [
            node
            for node in self._doc[self._pos + 1 : self._end]
            if node.__class__ is Element
            and node.name in names
            and not (href and "href" not in node.attrs)
        ]

    def find(self, name: Union[str, Sequence[str]]) -> Optional["Element"]:
        names = {name} if isinstance(name, str) else set(name)
        for node in self._doc[self._pos + 1 : self._end]:
            if node.__class__ is Element and node.name in names:
                return node
        return None


class MiniSoup(Element):
    """Document root; exposes the Element query surface over the whole doc."""

    def __init__(self) -> None:
        super().__init__("[document]", {}, [], -1)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = MiniSoup()
        self._doc: List[Node] = self.root._doc
        self._stack: List[Element] = [self.root]
        self._data_buf: List[str] = []

    # -- text buffering: one TextNode per inter-tag gap --------------------
    def _flush_data(self) -> None:
        if self._data_buf:
            self._doc.append("".join(self._data_buf))
            self._data_buf.clear()

    def handle_data(self, data: str) -> None:
        if data:
            self._data_buf.append(data)

    # -- tag events ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush_data()
        # first occurrence of a duplicated attribute wins (html.parser yields
        # them in order; keep the first like bs4's html.parser builder)
        if attrs:
            attr_dict: dict = {}
            for k, v in attrs:
                if k not in attr_dict:
                    attr_dict[k] = "" if v is None else v
        else:
            attr_dict = _EMPTY_ATTRS
        el = Element(tag, attr_dict, self._doc, len(self._doc))
        self._doc.append(el)
        if tag not in _VOID_ELEMENTS:
            self._stack.append(el)

    def handle_endtag(self, tag: str) -> None:
        self._flush_data()
        # pop to the most recent open tag with this name, closing everything
        # above it; no match => pop every open tag (bs4 _popToTag quirk).
        # every popped element's subtree ends exactly here.
        end = len(self._doc)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                for el in self._stack[i:]:
                    el._end = end
                del self._stack[i:]
                return
        for el in self._stack[1:]:
            el._end = end
        del self._stack[1:]

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <tag/> : element with attributes and no children
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_ELEMENTS:
            self.handle_endtag(tag)

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush_data()
        end = len(self._doc)
        for el in self._stack[1:]:  # still-open tags close at EOF
            el._end = end
        self.root._end = end


import re as _re

_META_CHARSET = _re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+))""",
    _re.IGNORECASE,
)


def decode_html(data: bytes, charset: str = "") -> str:
    """Decode page bytes to text the way a browser-adjacent consumer does:
    BOM first, then the transport ``charset`` hint (HTTP Content-Type —
    the ``charset`` column `sources/warc.py` mines), then a ``<meta
    charset>`` sniff of the first 2 KB, then UTF-8 with replacement.

    Every step decodes with ``errors="replace"`` — a page that lies about
    its charset yields replacement characters, never a crash; an unknown
    label falls through to the next step.
    """
    import codecs

    data = bytes(data)
    if data[:3] == b"\xef\xbb\xbf":
        return data[3:].decode("utf-8", errors="replace")
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return data.decode("utf-16", errors="replace")
    for label in (charset, None):
        if label is None:
            m = _META_CHARSET.search(data[:2048])
            if not m:
                break
            label = m.group(1).decode("ascii", "replace")
        label = label.strip().strip('"').strip("'")
        if not label:
            continue
        try:
            codec = codecs.lookup(label)
        except LookupError:
            continue
        return data.decode(codec.name, errors="replace")
    return data.decode("utf-8", errors="replace")


def parse_html(
    html: Union[str, bytes, None], charset: Optional[str] = None
) -> MiniSoup:
    """Parse HTML to a MiniSoup document. By default bytes are decoded as
    UTF-8 (errors replaced) — the corpus `html` column is UTF-8 binary per
    the input contract. Pass ``charset`` (the HTTP hint; ``""`` to rely on
    the meta sniff) to route bytes through :func:`decode_html` instead —
    the real-archive path where pages declare ISO-8859-1/Shift_JIS/...
    """
    if html is None:
        html = ""
    if isinstance(html, (bytes, bytearray)):
        if charset is None:
            html = bytes(html).decode("utf-8", errors="replace")
        else:
            html = decode_html(html, charset)
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
