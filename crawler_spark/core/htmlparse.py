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
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, List, Optional, Sequence, Union

# HTML void elements: may not have children and never stay on the open stack.
_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input keygen link menuitem meta param source track wbr".split()
)


class Node:
    __slots__ = ()


class TextNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        self.data = data


class Element(Node):
    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict) -> None:
        self.name = name
        self.attrs = attrs
        self.children: List[Node] = []

    def __getitem__(self, key: str) -> str:
        return self.attrs[key]

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    # --- traversal -------------------------------------------------------
    def descendants(self) -> Iterator[Node]:
        """Pre-order traversal of all descendant nodes (not self)."""
        stack: List[Node] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Element):
                stack.extend(reversed(node.children))

    def strings(self) -> Iterator[str]:
        for node in self.descendants():
            if isinstance(node, TextNode):
                yield node.data

    # --- bs4-contract surface --------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts: List[str] = []
        for s in self.strings():
            if strip:
                s = s.strip()
                if not s:
                    continue
            parts.append(s)
        return separator.join(parts)

    @property
    def text(self) -> str:
        return self.get_text()

    def find_all(
        self,
        name: Union[str, Sequence[str]],
        href: Optional[bool] = None,
    ) -> List["Element"]:
        names = {name} if isinstance(name, str) else set(name)
        out: List[Element] = []
        for node in self.descendants():
            if isinstance(node, Element) and node.name in names:
                if href and "href" not in node.attrs:
                    continue
                out.append(node)
        return out

    def find(self, name: Union[str, Sequence[str]]) -> Optional["Element"]:
        names = {name} if isinstance(name, str) else set(name)
        for node in self.descendants():
            if isinstance(node, Element) and node.name in names:
                return node
        return None


class MiniSoup(Element):
    """Document root; exposes the Element query surface over the whole doc."""

    def __init__(self) -> None:
        super().__init__("[document]", {})


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = MiniSoup()
        self._stack: List[Element] = [self.root]
        self._data_buf: List[str] = []

    # -- text buffering: one TextNode per inter-tag gap --------------------
    def _flush_data(self) -> None:
        if self._data_buf:
            self._stack[-1].children.append(TextNode("".join(self._data_buf)))
            self._data_buf.clear()

    def handle_data(self, data: str) -> None:
        if data:
            self._data_buf.append(data)

    # -- tag events ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush_data()
        # first occurrence of a duplicated attribute wins (html.parser yields
        # them in order; keep the first like bs4's html.parser builder)
        attr_dict: dict = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = "" if v is None else v
        el = Element(tag, attr_dict)
        self._stack[-1].children.append(el)
        if tag not in _VOID_ELEMENTS:
            self._stack.append(el)

    def handle_endtag(self, tag: str) -> None:
        self._flush_data()
        # pop to the most recent open tag with this name, closing everything
        # above it; no match => pop every open tag (bs4 _popToTag quirk)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                return
        if len(self._stack) > 1:
            del self._stack[1:]

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <tag/> : element with attributes and no children
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_ELEMENTS:
            self.handle_endtag(tag)

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush_data()


def parse_html(html: Union[str, bytes, None]) -> MiniSoup:
    """Parse HTML to a MiniSoup document. bytes are decoded as UTF-8
    (errors replaced) — the corpus `html` column is UTF-8 binary per the
    input contract."""
    if html is None:
        html = ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
