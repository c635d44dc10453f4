"""Thesaurus (WordNet) query expansion with reference-ATIRE semantics.

The reference ships a thesaurus abstraction (source/thesaurus.h) whose
only concrete implementation reads WordNet compiled into ATIRE's own
binary format (source/thesaurus_wordnet.c, written by
tools/wordnet_to_ant_thesaurus.c).  Two expansion modes hang off it:

- **classic query expansion** (atire_api.c:583-588
  ``set_query_expansion``): during the NEXI parse each search term's
  synset terms are appended to the query as additional terms at the
  same weight (nexi.c:484-495);

- **in-place TF expansion / synonym conflation** (atire_api.c:571-576
  ``set_inplace_query_expansion``, search_engine.c:1369-1461
  ``process_one_thesaurus_search_term``): at evaluation time the
  postings of the term and all its synset terms are merged into ONE
  term-frequency vector (per-doc tf summed, capped at 255 —
  ranking_function.c:142-154), the document frequency is recomputed
  from the merged vector, and the result is ranked as if it were a
  single search term.

Relationship types are a bitmask (thesaurus_relationship.h:15); the
default filter is SYNONYM only (thesaurus.h:30).

File format (wordnet_to_ant_thesaurus.c:505-630, all little-endian):

- a free-text banner (never validated by the reader — leaves are
  addressed by absolute offsets from the root);
- per headword, a LEAF: repeated ``(uint8 relationship_mask,
  term\\0)`` sorted by term, duplicate terms merged with OR'd masks,
  the headword itself excluded;
- the ROOT: per headword (sorted, for bsearch) ``headword\\0`` +
  ``uint64 leaf_start`` + ``uint64 leaf_length``;
- a TAIL of ``uint64 root_start, uint64 terms_in_root, uint64
  longest_synset_terms, uint64 longest_leaf_bytes, uint64
  ANT_ID_THESAURUS_WORDNET, uint32 SIGNATURE_MINOR, uint32
  SIGNATURE_MAJOR``.

A known reference quirk NOT reproduced: the ANT_string_pair overload
of get_synset zeroes the allowed-relationship mask after every call
(thesaurus.c:20), so the reference's classic expansion path only
expands the first term it ever sees.  That is clearly unintended (the
CLI sets the mask once at startup, atire.c:894/899); here every term
expands.
"""

from __future__ import annotations

import struct
from typing import Iterable

ANT_ID_THESAURUS_SIGNATURE_MAJOR = 0x54505341  # "ASPT"
ANT_ID_THESAURUS_SIGNATURE_MINOR = 0x00000003  # version 0.3
ANT_ID_THESAURUS_WORDNET = 0x54454E44524F5700  # "WORDNET\0"

_BANNER = b"ANT Search Engine Thesaurus File\n\x00\x00\x00"
_TAIL = struct.Struct("<QQQQQII")  # root_start, terms, longest, bytes, ids


class Thesaurus:
    """Term → synset map with the reference's relationship masks.

    ``entries`` maps a headword to its leaf: a list of
    ``(relationship_mask, term)`` sorted by term, self excluded —
    exactly the on-disk leaf shape.
    """

    NONE = 0
    HYPONYM = 1
    ANTONYM = 2
    HOLONYM = 4
    MERONYM = 8
    HYPERNYM = 16
    SYNONYM = 32
    ALL = 63

    def __init__(
        self,
        entries: dict[str, list[tuple[int, str]]],
        allowed: int = SYNONYM,
    ):
        self.entries = entries
        self.allowed = allowed

    # -------------------------------------------------------- construction
    @classmethod
    def from_pairs(cls, pairs: Iterable[tuple[str, int, str]]) -> "Thesaurus":
        """Build from ``(headword, relationship_mask, term)`` triples.

        Mirrors the writer tool's normalization
        (wordnet_to_ant_thesaurus.c:539-584): self-references dropped,
        duplicate (headword, term) pairs OR-merged, leaves sorted by
        term, zero-mask rows dropped.
        """
        merged: dict[str, dict[str, int]] = {}
        for head, mask, term in pairs:
            if term == head:
                continue  # "a term is nothing to itself"
            merged.setdefault(head, {})
            merged[head][term] = merged[head].get(term, 0) | int(mask)
        # (mask, term) sorted by term, like the tool's qsort on strings
        entries = {
            head: sorted(((m, t) for t, m in leaf.items() if m != 0),
                         key=lambda mt: mt[1])
            for head, leaf in merged.items()
        }
        return cls({h: v for h, v in entries.items() if v})

    # WordNet pointer_symbol → ANT relationship mask, exactly the
    # tool's ANT_relationship_of_wordnet_relationship table
    # (wordnet_to_ant_thesaurus.c:59-89): hyponyms/instance-hyponyms
    # fold to HYPONYM, the three holonym/meronym kinds fold, hypernym
    # kinds fold; everything else WordNet defines maps to 0 = "skip
    # stuff ANT knows nothing about" (:386).
    _WN_PTR_MASK = {
        "~": 1, "~i": 1,            # hyponym, instance hyponym
        "!": 2,                      # antonym
        "#m": 4, "#p": 4, "#s": 4,  # holonyms
        "%m": 8, "%p": 8, "%s": 8,  # meronyms
        "@": 16, "@i": 16,          # hypernym, instance hypernym
    }
    _WN_PTR_SKIP = frozenset(
        ["$", "&", "*", "+", "-c", "-r", "-u", ";c", ";r", ";u",
         "<", "=", ">", "\\", "^", "~z"]
    )

    @staticmethod
    def _wn_normalize(raw: str) -> str:
        """The tool's ANT_word normalization
        (wordnet_to_ant_thesaurus.c:166-208): copy ASCII
        alphanumerics, stop at ``(`` (lemma syntax markers like
        ``galore(ip)``), any other byte (``_`` in collocations,
        ``.``, ``-``) becomes a space and marks the lemma as a
        phrase, trailing whitespace strips, phrases wrap in double
        quotes. Lowercased uniformly — the tool's ``strlower`` runs
        on the shared line buffer AFTER each copy, so which words it
        reaches depends on parse order (a buffer-mutation quirk, not
        a semantic); WordNet lemmas are lowercase apart from proper
        nouns, and parity is asserted on lowercase fixtures."""
        out: list[str] = []
        as_string = False
        for ch in raw:
            if ch == "(":
                break
            if ch.isascii() and ch.isalnum():
                out.append(ch)
            else:
                out.append(" ")
                as_string = True
        s = "".join(out).rstrip()
        if as_string:
            s = f'"{s}"'
        return s.lower()

    @classmethod
    def _wn_title(cls, text: str, offset: int) -> list[str]:
        """get_title (wordnet_to_ant_thesaurus.c:313-347): the
        normalized lemma list of the synset whose data line starts at
        byte ``offset``: skip synset_offset / lex_filenum / ss_type,
        read w_cnt as 2-digit HEX, then w_cnt (lemma, lex_id)
        pairs."""
        end = text.find("\n", offset)
        toks = text[offset : end if end >= 0 else len(text)].split(" ")
        w_cnt = int(toks[3], 16)
        return [
            cls._wn_normalize(toks[4 + 2 * i]) for i in range(w_cnt)
        ]

    @classmethod
    def from_wordnet_source(
        cls,
        noun: str = "",
        verb: str = "",
        adj: str = "",
        adv: str = "",
    ) -> "Thesaurus":
        """Compile WordNet ``data.{noun,verb,adj,adv}`` file CONTENTS
        into a Thesaurus — the reference's
        tools/wordnet_to_ant_thesaurus.c digest rules
        (process_one_file :418-505 + build_index :519-630):

        - license-header lines (leading space) skip;
        - every synset line contributes, for EACH of its lemmas as
          headword: the other lemmas as SYNONYM, plus each pointer's
          target-synset lemmas under the folded ANT relationship
          (:meth:`_WN_PTR_MASK`); pointers ANT maps to zero are
          dropped, unknown pointer symbols raise (the tool exits);
        - self-references drop, duplicate (headword, term) pairs
          OR-merge, leaves sort by term (``from_pairs``).

        Round-trips through :meth:`to_ant_file` /
        :meth:`from_ant_file` — the same .aspt bytes path the
        compiled tool feeds thesaurus_wordnet.c.
        """
        files = {"n": noun, "v": verb, "a": adj, "r": adv}
        pairs: list[tuple[str, int, str]] = []
        for text in (noun, verb, adj, adv):
            if not text:
                continue
            for line in text.split("\n"):
                if not line or line.startswith(" "):
                    continue  # license header block
                toks = line.split(" ")
                w_cnt = int(toks[3], 16)
                title = [
                    cls._wn_normalize(toks[4 + 2 * i])
                    for i in range(w_cnt)
                ]
                at = 4 + 2 * w_cnt
                p_cnt = int(toks[at])
                at += 1
                expansions: list[tuple[int, list[str]]] = []
                for _ in range(p_cnt):
                    sym, off, pos, _st = toks[at : at + 4]
                    at += 4
                    if sym not in cls._WN_PTR_MASK:
                        if sym in cls._WN_PTR_SKIP:
                            continue
                        raise ValueError(
                            f"unknown WordNet pointer symbol {sym!r}"
                        )
                    src = files.get(pos, "")
                    if not src:
                        raise ValueError(
                            f"pointer into missing pos file {pos!r}"
                        )
                    expansions.append(
                        (cls._WN_PTR_MASK[sym], cls._wn_title(src, int(off)))
                    )
                for head in title:
                    for other in title:
                        if other != head:
                            pairs.append((head, cls.SYNONYM, other))
                    for mask, words in expansions:
                        for w in words:
                            if w != head:
                                pairs.append((head, mask, w))
        return cls.from_pairs(pairs)

    @classmethod
    def synonyms(cls, groups: Iterable[Iterable[str]]) -> "Thesaurus":
        """Build from synonym rings: every term of a group is a
        SYNONYM of every other (how the WordNet tool emits a synset's
        own members, wordnet_to_ant_thesaurus.c:539-547)."""
        pairs = []
        for group in groups:
            g = list(group)
            for head in g:
                for term in g:
                    if term != head:
                        pairs.append((head, cls.SYNONYM, term))
        return cls.from_pairs(pairs)

    # ------------------------------------------------------------- file io
    @classmethod
    def from_ant_file(cls, path: str) -> "Thesaurus":
        """Read the reference's binary thesaurus format
        (thesaurus_wordnet.c:19-109 reader semantics; bad signature →
        ValueError where the reference warns-and-ignores)."""
        with open(path, "rb") as f:
            blob = f.read()
        if len(blob) <= _TAIL.size:
            raise ValueError("thesaurus file too short")
        (
            root_start,
            n_terms,
            _longest_synset,
            _longest_leaf,
            id_wordnet,
            id_minor,
            id_major,
        ) = _TAIL.unpack(blob[-_TAIL.size:])
        if (
            id_major != ANT_ID_THESAURUS_SIGNATURE_MAJOR
            or id_minor != ANT_ID_THESAURUS_SIGNATURE_MINOR
            or id_wordnet != ANT_ID_THESAURUS_WORDNET
        ):
            raise ValueError("not an ANT WORDNET thesaurus file")
        entries: dict[str, list[tuple[int, str]]] = {}
        pos = root_start
        for _ in range(n_terms):
            end = blob.index(b"\x00", pos)
            head = blob[pos:end].decode("utf-8")
            pos = end + 1
            start, length = struct.unpack_from("<QQ", blob, pos)
            pos += 16
            leaf: list[tuple[int, str]] = []
            cur, leaf_end = start, start + length
            while cur < leaf_end:
                mask = blob[cur]
                cur += 1
                tend = blob.index(b"\x00", cur)
                leaf.append((mask, blob[cur:tend].decode("utf-8")))
                cur = tend + 1
            entries[head] = leaf
        return cls(entries)

    def to_ant_file(self, path: str) -> None:
        """Write the reference's binary format — byte-compatible with
        thesaurus_wordnet.c's reader (and this module's)."""
        heads = sorted(self.entries)  # root must be bsearch-sorted
        n_written = 0
        root = bytearray()
        longest_synset = 0
        longest_leaf = 0
        body = bytearray(_BANNER)
        for head in heads:
            leaf = bytearray()
            n = 0
            for mask, term in self.entries[head]:
                if mask == 0:
                    continue
                leaf.append(mask & 0xFF)
                leaf += term.encode("utf-8") + b"\x00"
                n += 1
            if n == 0:
                continue  # the tool drops empty-leaf terms
            start = len(body)
            body += leaf
            root += head.encode("utf-8") + b"\x00"
            root += struct.pack("<QQ", start, len(leaf))
            longest_synset = max(longest_synset, n)
            longest_leaf = max(longest_leaf, len(leaf))
            n_written += 1
        root_start = len(body)
        body += root
        body += _TAIL.pack(
            root_start,
            n_written,
            longest_synset,
            longest_leaf,
            ANT_ID_THESAURUS_WORDNET,
            ANT_ID_THESAURUS_SIGNATURE_MINOR,
            ANT_ID_THESAURUS_SIGNATURE_MAJOR,
        )
        with open(path, "wb") as f:
            f.write(bytes(body))

    # ------------------------------------------------------------- queries
    def set_allowable_relationships(self, types: int) -> None:
        """thesaurus.c:29-32 — replaces the filter mask (default
        SYNONYM only, thesaurus.h:30)."""
        self.allowed = types

    def get_synset(self, term: str) -> list[str]:
        """Terms related to ``term`` whose relationship mask overlaps
        the allowed mask, in leaf (term-sorted) order
        (thesaurus_wordnet.c:130-172 + thesaurus.c:38-41)."""
        leaf = self.entries.get(term)
        if not leaf:
            return []
        return [t for mask, t in leaf if mask & self.allowed]
