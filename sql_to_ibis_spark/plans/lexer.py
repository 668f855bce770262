"""SQL tokenizer.

Hand-rolled (no parser-generator dependency). Produces a flat token stream
consumed by the recursive-descent parser in ``plans/parser.py``.

Covers the reference surface (``sql_to_ibis/grammar/sql.lark``) plus
extensions: ``--``/``/* */`` comments, backtick-quoted identifiers,
scientific-notation numbers, ``||`` concat, ``%`` modulo.
"""

from __future__ import annotations

from dataclasses import dataclass

from sql_to_ibis_spark.errors import InvalidQueryException

# Token kinds
IDENT = "IDENT"          # bare identifier (case-insensitive keywords included)
QIDENT = "QIDENT"        # "double quoted" or `backtick quoted` identifier
NUMBER = "NUMBER"
STRING = "STRING"        # 'single quoted'
OP = "OP"                # operators and punctuation
EOF = "EOF"

_MULTI_CHAR_OPS = ("<=>", "!=", "<>", "<=", ">=", "||")
_SINGLE_CHAR_OPS = set("=<>+-*/%(),.;")


@dataclass(frozen=True)
class Token:
    kind: str
    text: str
    line: int
    column: int

    @property
    def upper(self) -> str:
        return self.text.upper()


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(sql)
    line, col = 1, 1

    def advance(k: int) -> None:
        nonlocal i, line, col
        for _ in range(k):
            if i < n and sql[i] == "\n":
                line += 1
                col = 1
            else:
                col += 1
            i += 1

    while i < n:
        ch = sql[i]
        # whitespace
        if ch in " \t\r\n":
            advance(1)
            continue
        # line comment
        if sql.startswith("--", i):
            while i < n and sql[i] != "\n":
                advance(1)
            continue
        # block comment
        if sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            if end == -1:
                raise InvalidQueryException("Unterminated block comment", line, col)
            advance(end + 2 - i)
            continue
        tl, tc = line, col
        # string literal: single quotes, '' escapes
        if ch == "'":
            j = i + 1
            buf: list[str] = []
            while True:
                if j >= n:
                    raise InvalidQueryException("Unterminated string literal", tl, tc)
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            tokens.append(Token(STRING, "".join(buf), tl, tc))
            advance(j + 1 - i)
            continue
        # quoted identifier
        if ch in ('"', "`"):
            closer = ch
            j = sql.find(closer, i + 1)
            if j == -1:
                raise InvalidQueryException("Unterminated quoted identifier", tl, tc)
            tokens.append(Token(QIDENT, sql[i + 1 : j], tl, tc))
            advance(j + 1 - i)
            continue
        # number: digits, optional fraction/exponent; also ".5"
        if ch.isdigit() or (ch == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            while j < n and sql[j].isdigit():
                j += 1
            if j < n and sql[j] == ".":
                j += 1
                while j < n and sql[j].isdigit():
                    j += 1
            if j < n and sql[j] in "eE":
                k = j + 1
                if k < n and sql[k] in "+-":
                    k += 1
                if k < n and sql[k].isdigit():
                    j = k
                    while j < n and sql[j].isdigit():
                        j += 1
            tokens.append(Token(NUMBER, sql[i:j], tl, tc))
            advance(j - i)
            continue
        # identifier / keyword
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            tokens.append(Token(IDENT, sql[i:j], tl, tc))
            advance(j - i)
            continue
        # operators
        matched = False
        for op in _MULTI_CHAR_OPS:
            if sql.startswith(op, i):
                tokens.append(Token(OP, op, tl, tc))
                advance(len(op))
                matched = True
                break
        if matched:
            continue
        if ch in _SINGLE_CHAR_OPS:
            tokens.append(Token(OP, ch, tl, tc))
            advance(1)
            continue
        raise InvalidQueryException(f"Unexpected character {ch!r}", tl, tc)

    tokens.append(Token(EOF, "", line, col))
    return tokens
