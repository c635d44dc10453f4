"""Boolean query parsing + set evaluation.

Reference grammar (/root/reference/source/query_boolean.c:130-233,
query_parse_tree.h:14-29): a *left-associative* chain of terms and
bracketed sub-expressions joined by the literal operator tokens
``and/AND``, ``or/OR``, ``not/NOT``, ``xor/XOR`` (exact lower- or
upper-case only — mixed case like ``Or`` is a term, per the
``true_strcmp`` pairs at query_boolean.c:176-201); two adjacent
operands with no operator take the default operator (OR,
ant_param_block default). A leading operator token is therefore just a
term — operators are only recognised in operator position.

Evaluation (/root/reference/atire/atire_api.c:1116-1176): each leaf
yields the docid set of documents containing the term (a bitstring
over all docs); internal nodes apply AND / OR / AND-NOT / XOR.
Document scores are accumulated by the ordinary BM25 TaaT machinery
for every leaf term during set construction, so the final ranked list
is: docs satisfying the boolean expression, ranked by the sum of BM25
contributions of the query terms they contain (rsv desc, larger docid
first). A df==N term scores nothing AND sets no bits (the BM25 ranker
returns before touching postings when idf == 0,
ranking_function_bm25.c:91-92, and the bitstring is populated inside
that traversal).

The same parse tree drives three consumers: the Spark evaluator
(vectorized numpy over per-leaf presence arrays), the SQL-oracle
generator (:func:`tree_to_sql_predicate`), and tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from atire_spark.kernels.tokenizer import tokenize

_OPS = {
    "and": "AND",
    "AND": "AND",
    "or": "OR",
    "OR": "OR",
    "not": "NOT",
    "NOT": "NOT",
    "xor": "XOR",
    "XOR": "XOR",
}

# letters, digit runs, or single brackets (query_boolean.c:60-101)
_TOK_RE = re.compile(r"[^\W\d_]+|\d+|[()]", re.UNICODE)


@dataclass
class Leaf:
    term: str
    idx: int = -1  # leaf ordinal, assigned by assign_leaf_indexes


@dataclass
class Node:
    op: str  # AND | OR | NOT | XOR
    left: object
    right: object


def parse_boolean(query: str, default_operator: str = "OR"):
    """Parse → tree of Leaf/Node (None for an empty query)."""
    tokens = _TOK_RE.findall(query or "")
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def take():
        t = peek()
        if t is not None:
            pos[0] += 1
        return t

    def make_leaf(tok: str):
        terms = tokenize(tok)
        return Leaf(terms[0]) if terms else None

    def parse_expr(depth: int = 0):
        tok = take()
        if tok is None or tok == ")":
            return None
        if tok == "(":
            # an empty/degenerate group leaves left=None; the loop below
            # then promotes the next operand to the left slot instead of
            # building a Node with a None child
            left = parse_expr(depth + 1)
        else:
            left = make_leaf(tok)
        while True:
            nxt = peek()
            if nxt is None:
                return left
            if nxt == ")":
                take()
                return left
            if nxt in _OPS and left is not None:
                take()
                op = _OPS[nxt]
            else:
                # adjacency → default operator; with no left operand an
                # operator token is in leading position and is a term
                op = default_operator
            tok = take()
            if tok is None:
                return left
            if tok == "(":
                right = parse_expr(depth + 1)
            elif tok == ")":
                return left
            else:
                right = make_leaf(tok)
            if right is None:
                continue
            left = right if left is None else Node(op, left, right)

    return parse_expr()


def assign_leaf_indexes(tree) -> list[Leaf]:
    """Number leaves in left-to-right order; returns them."""
    leaves: list[Leaf] = []

    def walk(n):
        if n is None:
            return
        if isinstance(n, Leaf):
            n.idx = len(leaves)
            leaves.append(n)
        else:
            walk(n.left)
            walk(n.right)

    walk(tree)
    return leaves


def eval_tree(tree, presence: list):
    """Evaluate over per-leaf boolean arrays (numpy); returns an array.

    ``presence[i]`` is the boolean presence vector of leaf i over the
    candidate docs. Mirrors atire_api.c:1155-1171 (NOT is AND-NOT).
    """
    if isinstance(tree, Leaf):
        return presence[tree.idx]
    left = eval_tree(tree.left, presence)
    right = eval_tree(tree.right, presence)
    if tree.op == "AND":
        return left & right
    if tree.op == "OR":
        return left | right
    if tree.op == "NOT":
        return left & ~right
    if tree.op == "XOR":
        return left ^ right
    raise ValueError(tree.op)


def tree_to_sql_predicate(tree, flag_expr) -> str:
    """Render the tree as a SQL boolean over per-leaf presence flags.

    ``flag_expr(i)`` returns the SQL expression (boolean) for "leaf i's
    term is present in this doc".
    """
    if isinstance(tree, Leaf):
        return flag_expr(tree.idx)
    left = tree_to_sql_predicate(tree.left, flag_expr)
    right = tree_to_sql_predicate(tree.right, flag_expr)
    if tree.op == "AND":
        return f"({left} AND {right})"
    if tree.op == "OR":
        return f"({left} OR {right})"
    if tree.op == "NOT":
        return f"({left} AND NOT {right})"
    if tree.op == "XOR":
        return f"(({left}) <> ({right}))"
    raise ValueError(tree.op)
