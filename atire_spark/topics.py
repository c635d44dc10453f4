"""Topic-file readers — the reference's query input channels.

``atire -q <file>`` accepts raw ANT "id terms" lines or, via the
channel wrappers, TREC and INEX topic files directly:

- :func:`read_trec_topics` mirrors ANT_channel_trec
  (source/channel_trec.c:28-292): ``<num> Number: N`` / ClueWeb
  ``<topic number="N">`` delimit topics; the taglist selects which of
  ``<query>``(q) ``<title>``(t) ``<desc>``(d) ``<narr>``(n) feed the
  query text (same-line close tag, or continuation lines up to the
  next ``<``); clean() lowercases alpha runs and copies digit runs,
  each followed by one space, and DROPS the first character of every
  non-alphanumeric run while mapping the rest to spaces (:129-174 —
  that quirk is load-bearing for byte-parity with the reference's
  query strings).
- :func:`read_inex_topics` mirrors ANT_channel_inex
  (source/channel_inex.c:215-280): ``<topic id="544" ...>`` (or the
  2009 efficiency ``id="2009-Eff-228"``) opens a topic, taglist
  selects ``<title>``(t) ``<castitle>``(c) ``<description>``(d)
  ``<narrative>``(n), and the whole accumulated string — which the
  reference prefixes with the topic number — is cleaned by co_clean
  (:161-175, lowercase + non-alnum → space + duplicate-space
  collapse) or, when 'c' is selected, the CAS state machine cas_clean
  (:93-154: target/support element paths uppercased, ``about``
  blanked, search terms lowercased).

Both return ``[(topic_id, query_text), ...]`` ready for
``SearchEngine.search_batch``.
"""

from __future__ import annotations

__all__ = ["read_trec_topics", "read_inex_topics"]


def _isalpha(c: str) -> bool:
    return "a" <= c <= "z" or "A" <= c <= "Z"


def _isdigit(c: str) -> bool:
    return "0" <= c <= "9"


def _trec_clean(raw: str) -> str:
    """channel_trec.c:129-174 (the unstopped clean)."""
    out = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if _isalpha(c):
            while i < n and _isalpha(raw[i]):
                out.append(raw[i].lower())
                i += 1
            out.append(" ")
        elif _isdigit(c):
            while i < n and _isdigit(raw[i]):
                out.append(raw[i])
                i += 1
            out.append(" ")
        else:
            i += 1  # first char of the run is dropped, not spaced
            while i < n and not (_isalpha(raw[i]) or _isdigit(raw[i])):
                out.append(" ")
                i += 1
    return "".join(out).strip()


def read_trec_topics(text: str, tags: str = "t") -> list[tuple[int, str]]:
    """Parse a TREC topic file; ``tags`` ⊆ {q, t, d, n}."""
    lines = text.splitlines()
    topics: list[tuple[int, str]] = []
    number = -1
    raw: list[str] = []
    i = 0

    def flush():
        if number >= 0:
            topics.append((number, _trec_clean("".join(raw))))

    while i < len(lines):
        buf = lines[i]
        i += 1
        s = buf.lstrip()
        if s.startswith("<num>"):
            flush()
            number = int("".join(
                ch for ch in s.split(":", 1)[1] if ch.isdigit() or ch == "-"
            ) or -1) if ":" in s else -1
            raw = []
        elif s.startswith("<topic number="):
            flush()
            number = int(s.split('"', 2)[1])
            raw = []
        elif s.startswith("<") and any(
            s[1:].startswith(t) and k in tags
            for t, k in (("query", "q"), ("title", "t"),
                         ("desc", "d"), ("narr", "n"))
        ):
            close = s.find("<", 1)
            if close != -1:
                raw.append(s[s.index(">") + 1:close])
            else:
                if ":" in s:
                    raw.append(s.split(":", 1)[1])
                else:
                    raw.append(s.split(">", 1)[1])
                while i < len(lines):
                    nxt = lines[i]
                    if nxt.startswith("<"):
                        break  # reprocessed as the next tag line
                    raw.append(" " + nxt.strip())
                    i += 1
    flush()
    return topics


def _clean_spaces(s: str) -> str:
    out = []
    for j, c in enumerate(s):
        if c == " " and j + 1 < len(s) and s[j + 1] == " ":
            continue
        out.append(c)
    return "".join(out)


def _co_clean(s: str) -> str:
    """channel_inex.c:161-175."""
    out = [
        c.lower() if c.isascii() and c.isalnum() else " " for c in s
    ]
    return _clean_spaces("".join(out))


def _cas_clean(s: str) -> str:
    """channel_inex.c:93-154 — the CAS title state machine."""
    chars = list(s)
    in_square = in_round = in_about = comma = 0
    pos = 0
    while pos < len(chars):
        c = chars[pos]
        if c == "[":
            in_square += 1
        elif c == "]":
            in_square -= 1
        elif c == "(":
            in_round += 1
        elif c == ")":
            in_round -= 1
            if comma and in_about:
                in_about = 0
        elif c == ",":
            comma += 1

        if in_square and not in_about:
            if "".join(chars[pos:pos + 5]) == "about":
                chars[pos:pos + 5] = [" "] * 5
                pos += 5
                in_about += 1
                comma = 0
                continue
            chars[pos] = " "
        elif in_square and in_about and comma == 0:
            # support elements
            ch = chars[pos]
            chars[pos] = (
                ch.upper() if (ch.isascii() and ch.isalnum()) or ch == "_"
                else " "
            )
        elif in_square == 0:
            # target elements
            ch = chars[pos]
            chars[pos] = (
                ch.upper() if (ch.isascii() and ch.isalnum()) or ch == "_"
                else " "
            )
        else:
            # search terms
            ch = chars[pos]
            chars[pos] = ch.lower() if ch.isascii() and ch.isalnum() else " "
        pos += 1
    return _clean_spaces("".join(chars))


def _tag_contents(lines: list[str], i: int, buf: str, open_tag: str,
                  close_tag: str) -> tuple[str, int]:
    start = buf.index(open_tag) + len(open_tag)
    end = buf.find(close_tag)
    if end != -1:
        return buf[start:end], i
    parts = [buf[start:]]
    while i < len(lines):
        more = lines[i].rstrip()
        i += 1
        end = more.find(close_tag)
        if end != -1:
            parts.append(more[:end])
            break
        parts.append(more)
    return " ".join(parts), i


def read_inex_topics(text: str, tags: str = "t") -> list[tuple[int, str]]:
    """Parse an INEX topic file; ``tags`` ⊆ {t, c, d, n}."""
    lines = text.splitlines()
    topics: list[tuple[int, str]] = []
    query: list[str] = []
    topic = -1
    i = 0
    tagmap = [
        ("t", "<title>", "</title>"),
        ("c", "<castitle>", "</castitle>"),
        ("d", "<description>", "</description>"),
        ("n", "<narrative>", "</narrative>"),
    ]
    while i < len(lines):
        buf = lines[i].rstrip()
        i += 1
        if "<topic" in buf and "topic-id" not in buf:
            if "-Eff-" in buf:
                after = buf.split('id="2009-Eff-', 1)[1]
                topic = int("".join(
                    ch for ch in after.split('"', 1)[0] if ch.isdigit()
                ))
            else:
                topic = int(buf.split('id="', 1)[1].split('"', 1)[0])
            query = []
        for key, op, cl in tagmap:
            if key in tags and op in buf:
                content, i = _tag_contents(lines, i, buf, op, cl)
                query.append(content)
        if "</topic>" in buf and topic >= 0:
            joined = " ".join(query)
            cleaned = (
                _cas_clean(joined) if "c" in tags else _co_clean(joined)
            )
            topics.append((topic, cleaned.strip()))
            topic = -1
    return topics
