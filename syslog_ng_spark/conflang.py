"""syslog-ng .conf text front-end: config language → declarative specs.

The reference parses its config language with a flex lexer
(lib/cfg-lex.l) and a bison grammar (lib/cfg-grammar.y,
lib/filter/filter-expr-grammar.ym); the parsed tree is wired by
lib/cfg-tree.c. This module re-implements a practical subset of the
LANGUAGE as a hand-written lexer + recursive-descent parser, and
compiles the result to the plain spec dicts `config.build_pipeline`
already executes — so a reference user can run their actual config
file, not transliterate it by hand.

Supported surface (grammar constructs, with reference file:line cites
in each section below):
  - pragmas: @version, @include (with globs), @define + `backtick`
    substitution, @requires (recorded)
  - comments (#...), the ','-is-whitespace rule, number suffixes
    (kKmMgG / i / b), hex/octal/float literals, "escaped" and 'raw'
    strings, line continuations (cfg-lex.l:281-346)
  - options { ... }; global option block (recorded; these tune the
    daemon's runtime, not the query semantics)
  - named source / destination / filter / parser / rewrite / template
    blocks and anonymous in-path versions
  - log { source(x); filter(y); parser(p); rewrite(r);
    destination(d); flags(...); }; paths, including inline blocks and
    channel { ... } linear sub-paths
  - block <context> <name>(params...) { body } definitions (the SCL
    mechanism, lib/cfg-block.c): instantiation substitutes `param`
    backticks and `__VARARGS__`, then re-parses the body in context
  - filter expressions with and/or/not/parens, level()/severity()
    ranges and lists, facility(), host()/program()/message()/match()
    regexes with type()/value() options, netmask()/netmask6(),
    tags(), in-list(), filter() calls (inlined), and template
    comparisons ("$X" == "$Y" numeric, eq/ne/... string forms)
    (filter-expr-grammar.ym:88-196)
  - junction { channel { ... }; ... } parallel fan-out + union-back
    (cfg-grammar.y LL_JUNCTION; executed by config._step "junction")
  - if / elif / else sugar (desugared to a guarded junction with the
    implicit complement else-branch, like cfg-grammar.y's rewrite)
  - log flags: final / fallback / catchall compiled as filter algebra
    (inexact cases raise rather than approximate)
  - application <name>[<framework>] { filter{...}; parser{...}; }
    top-level blocks (modules/appmodel/appmodel-parser.c) — compiled
    to detection predicates for app-parser() auto-detection

NOT supported, loudly: source/destination drivers with no Spark
analog (each names itself in the error). These raise ConfError at
parse/compile time, never silently drop config.
"""

from __future__ import annotations

import glob as globlib
import os
import re
from dataclasses import dataclass, field


class ConfError(ValueError):
    """Config-language error with line info."""

    def __init__(self, msg: str, line: int | None = None):
        super().__init__(f"line {line}: {msg}" if line else msg)
        self.line = line


# ---------------------------------------------------------------------------
# lexer (cfg-lex.l)
# ---------------------------------------------------------------------------

# chars that TERMINATE a word (cfg-lex.l:271 `word` class, plus backtick)
_NONWORD = set(" \t\r\n#'\"(){}[];,|.@:`")

_STR_ESCAPES = {"a": "\a", "n": "\n", "r": "\r", "t": "\t", "v": "\v"}

# NOTE no separate octal alternative: the decimal branch matches the
# full digit run and _parse_number applies strtol-style base detection
# (0-prefix + all-octal digits → base 8, else base 10 — so `0199` is
# 199 like flex's longest-match decimal rule, never a ValueError)
_NUM_RE = re.compile(
    r"(?:0x[0-9a-fA-F]+|[-+]?\d+\.\d+|[-+]?\d+(?:[mMgGkK][iI]?)?[bB]?)"
)
_SUFFIX = {"k": 1000, "m": 1000**2, "g": 1000**3}


@dataclass
class Tok:
    kind: str  # IDENT STRING NUMBER FLOAT LP RP LB RB SEMI COLON DOTDOT ELLIPSIS ARROW PRAGMA EOF
    value: object
    line: int
    pos: int = 0  # char offset of token start (for raw block bodies)


def _parse_number(text: str) -> int | float:
    if "." in text:
        return float(text)
    if text.startswith("0x"):
        return int(text, 16)
    if len(text) > 1 and text[0] == "0" and text[1:].isdigit():
        if all(c in "01234567" for c in text[1:]):
            return int(text, 8)
        # leading zero but non-octal digits (e.g. "08"): flex's octal
        # rule 0[0-7]+ can't match, the decimal rule wins — base 10
        return int(text, 10)
    m = re.fullmatch(r"([-+]?\d+)([mMgGkK])?([iI])?([bB])?", text)
    num = int(m.group(1))
    if m.group(2):
        base = _SUFFIX[m.group(2).lower()]
        if m.group(3):  # Ki/Mi/Gi -> powers of 1024
            base = {1000: 1024, 1000**2: 1024**2, 1000**3: 1024**3}[base]
        num *= base
    return num


class Lexer:
    """Tokenizer mirroring cfg-lex.l: '#' comments, ','-as-whitespace,
    pragma lines, escaped/raw strings, suffixed numbers, the word
    character class (including single interior dots), and `backtick`
    substitution from @define values / block parameters (the
    cfg-lexer-subst.c mechanism) both bare and inside strings."""

    def __init__(self, text: str, defines: dict[str, str] | None = None,
                 strict_backticks: bool = False):
        self.text = text
        self.n = len(text)
        self.i = 0
        self.line = 1
        self.defines = dict(defines or {})
        # At file scope, block { } bodies legitimately contain `param`
        # refs that are only defined at instantiation (the reference's
        # block_content lexer state passes them through raw) — so
        # undefined refs stay literal unless strict (instantiation-time
        # re-lex, where a leftover ref IS a missing parameter).
        self.strict_backticks = strict_backticks
        self._at_line_start = True
        # pre-scan @define pragmas: this lexer tokenizes eagerly, so a
        # define must be visible to `backtick` substitution in strings
        # that follow it textually (the reference lexer streams, same
        # effective order for well-formed files)
        for m in re.finditer(r"^@define\s+(\S+)\s+(.*)$", text, re.MULTILINE):
            val = m.group(2).strip()
            if val and val[0] in "\"'" and val[-1] == val[0]:
                val = val[1:-1]
            self.defines.setdefault(m.group(1), val)

    def _err(self, msg: str):
        raise ConfError(msg, self.line)

    def _subst(self, s: str, line: int) -> str:
        """`name` -> define/param value (cfg-lexer-subst.c)."""
        def repl(m):
            name = m.group(1)
            if name not in self.defines:
                if self.strict_backticks:
                    raise ConfError(f"undefined `{name}` backtick reference", line)
                return m.group(0)  # block body: resolved at instantiation
            return self.defines[name]

        return re.sub(r"`([^`]*)`", repl, s)

    def _string(self, quote: str) -> str:
        out = []
        while True:
            if self.i >= self.n:
                self._err("unterminated string")
            c = self.text[self.i]
            if c == quote:
                self.i += 1
                return "".join(out)
            if c == "\n":
                self.line += 1
                out.append(c)
                self.i += 1
                continue
            if quote == '"' and c == "\\":
                self.i += 1
                if self.i >= self.n:
                    self._err("unterminated string")
                e = self.text[self.i]
                if e == "\r" or e == "\n":  # continuation inside string
                    self.i += 1 + (e == "\r" and
                                   self.i + 1 < self.n and
                                   self.text[self.i + 1] == "\n")
                    self.line += 1
                    continue
                if e in _STR_ESCAPES:
                    out.append(_STR_ESCAPES[e])
                elif e == "x":
                    m = re.match(r"[0-9a-fA-F]{1,2}", self.text[self.i + 1:])
                    if m is None:
                        self._err(r"\x escape needs hex digits")
                    out.append(chr(int(m.group(), 16)))
                    self.i += len(m.group())
                elif e == "o":
                    m = re.match(r"[0-7]{1,3}", self.text[self.i + 1:])
                    if m is None:
                        self._err(r"\o escape needs octal digits")
                    out.append(chr(int(m.group(), 8)))
                    self.i += len(m.group())
                else:
                    out.append(e)  # \" \\ \$ etc: the char itself
                self.i += 1
                continue
            out.append(c)
            self.i += 1

    def tokens(self) -> list[Tok]:
        toks: list[Tok] = []
        while True:
            t = self._next()
            toks.append(t)
            if t.kind == "EOF":
                return toks

    def _next(self) -> Tok:  # noqa: C901 - a lexer is one big switch
        text, n = self.text, self.n
        while self.i < n:
            c = text[self.i]
            if c == "\n":
                self.line += 1
                self.i += 1
                self._at_line_start = True
                continue
            if c in " \t\r,":
                self.i += 1
                continue
            if c == "\\" and self.i + 1 < n and text[self.i + 1] in "\r\n":
                self.i += 2  # line continuation
                if text[self.i - 1] == "\r" and self.i < n and text[self.i] == "\n":
                    self.i += 1
                self.line += 1
                continue
            if c == "#":
                while self.i < n and text[self.i] != "\n":
                    self.i += 1
                continue
            break
        else:
            return Tok("EOF", None, self.line, self.i)

        start, line = self.i, self.line
        c = text[self.i]

        if c == "@" and self._at_line_start:
            # pragma line: @version: 4.2 / @include "x" / @define a "b"
            end = text.find("\n", self.i)
            if end == -1:
                end = n
            raw = text[self.i + 1: end].strip()
            self.i = end
            self._at_line_start = False
            return Tok("PRAGMA", raw, line, start)
        self._at_line_start = False

        if c == "`":
            # bare backtick reference: splice the value and re-lex
            end = text.find("`", self.i + 1)
            if end == -1:
                self._err("unterminated backtick reference")
            name = text[self.i + 1: end]
            if name not in self.defines:
                if self.strict_backticks:
                    self._err(f"undefined `{name}` backtick reference")
                # keep the literal ref as one token; a block body scan
                # only needs bracket structure, instantiation re-lexes
                self.i = end + 1
                return Tok("IDENT", f"`{name}`", line, start)
            self.text = text[: self.i] + self.defines[name] + text[end + 1:]
            self.n = len(self.text)
            return self._next()

        single = {"(": "LP", ")": "RP", "{": "LB", "}": "RB", ";": "SEMI",
                  ":": "COLON", "|": "PIPE", "[": "LBRK", "]": "RBRK"}
        if c in single:
            self.i += 1
            return Tok(single[c], c, line, start)
        if text.startswith("...", self.i):
            self.i += 3
            return Tok("ELLIPSIS", "...", line, start)
        if text.startswith("..", self.i):
            self.i += 2
            return Tok("DOTDOT", "..", line, start)
        if text.startswith("=>", self.i):
            self.i += 2
            return Tok("ARROW", "=>", line, start)
        if c == '"':
            self.i += 1
            s = self._subst(self._string('"'), line)
            return Tok("STRING", s, line, start)
        if c == "'":
            self.i += 1
            s = self._subst(self._string("'"), line)
            return Tok("STRING", s, line, start)

        m = _NUM_RE.match(text, self.i)
        # flex longest-match across rules (cfg-lex.l): the word rule
        # `({word}+(\.)?)*{word}+` (line 324) BEATS the number rules
        # whenever it matches MORE characters — so `0.0.0.0`, `1.2.3`,
        # `0rtt-option`, `1.2.3k` all lex as one word, while `1.5`,
        # `2k`, `0x10` stay numbers (word match is not longer)
        word_end = self._word_end()
        if m and m.end() >= word_end:
            tok_text = m.group()
            self.i = m.end()
            if "." in tok_text and not tok_text.startswith("0x"):
                return Tok("FLOAT", float(tok_text), line, start)
            return Tok("NUMBER", _parse_number(tok_text), line, start)

        if c not in _NONWORD:
            word = text[self.i: word_end]
            self.i = word_end
            return Tok("IDENT", word, line, start)
        self._err(f"unexpected character {c!r}")

    def _word_end(self) -> int:
        """End offset of the word-rule match starting at self.i (0 width
        if the current char can't start a word): runs of word chars
        joined by single interior dots (cfg-lex.l:324)."""
        text, n = self.text, self.n
        j = self.i
        while j < n and text[j] not in _NONWORD:
            j += 1
        while (
            j < n
            and text[j] == "."
            and not text.startswith("..", j)
            and j + 1 < n
            and text[j + 1] not in _NONWORD
        ):
            j += 1
            while j < n and text[j] not in _NONWORD:
                j += 1
        return j


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Call:
    """A driver / option invocation: name(items...). Items are Python
    scalars (str from STRING, int/float from numbers, Ident for bare
    words) or nested Calls."""

    name: str
    items: list = field(default_factory=list)
    line: int = 0

    @property
    def norm(self) -> str:  # keyword normalization: '_' == '-'
        return self.name.replace("_", "-")

    # -- convenience accessors ---------------------------------------------
    def positional(self) -> list:
        return [x for x in self.items if not isinstance(x, Call)]

    def opt(self, *names: str) -> "Call | None":
        wanted = {n.replace("_", "-") for n in names}
        for x in self.items:
            if isinstance(x, Call) and x.norm in wanted:
                return x
        return None

    def opt_scalar(self, *names: str, default=None):
        o = self.opt(*names)
        if o is None or not o.items:
            return default
        v = o.items[0]
        return v.name if isinstance(v, Ident) else v

    def flag_words(self, name: str = "flags") -> list[str]:
        o = self.opt(name)
        if o is None:
            return []
        return [x.name if isinstance(x, Ident) else str(x) for x in o.items]


@dataclass
class Ident:
    name: str

    @property
    def norm(self) -> str:
        return self.name.replace("_", "-")


@dataclass
class BlockDef:
    """block <context> <name>(param(default) ... [...]) { raw body }
    (lib/cfg-block.c). Instantiation substitutes `param` backticks in
    the raw body and re-parses it in <context>."""

    context: str
    name: str
    params: dict[str, str]  # name -> default text
    varargs: bool
    body: str
    line: int


@dataclass
class LogElement:
    kind: str  # source/filter/parser/rewrite/destination/flags/channel
    ref: str | None = None          # named reference
    inline: object = None           # anonymous body (drivers/expr/steps)
    line: int = 0


@dataclass
class LogPath:
    elements: list[LogElement]
    line: int = 0


@dataclass
class AppDef:
    """application <name>[<framework>] { filter{...}; parser{...}; }
    (modules/appmodel/appmodel-grammar.ym application_definition).
    Filter and parser bodies are RAW config text, exactly like the
    reference's Application struct (appmodel.h: filter_expr /
    parser_expr hold LL_BLOCK strings) — app-parser() splices them
    into generated config and re-parses in context."""

    name: str
    framework: str  # the grammar's '[string]' — app-parser topic()
    filter_text: str | None
    parser_text: str | None
    line: int


@dataclass
class Conf:
    version: str | None = None
    requires: list[str] = field(default_factory=list)
    includes: list[str] = field(default_factory=list)
    missing_includes: list[str] = field(default_factory=list)
    options: dict = field(default_factory=dict)
    defines: dict = field(default_factory=dict)
    sources: dict = field(default_factory=dict)        # name -> [Call]
    destinations: dict = field(default_factory=dict)   # name -> [Call]
    filters: dict = field(default_factory=dict)        # name -> expr tree
    parsers: dict = field(default_factory=dict)        # name -> [Call|channel]
    rewrites: dict = field(default_factory=dict)       # name -> [Call]
    templates: dict = field(default_factory=dict)      # name -> str
    template_functions: dict = field(default_factory=dict)
    blocks: dict = field(default_factory=dict)         # (ctx, name) -> BlockDef
    applications: dict = field(default_factory=dict)   # (name, framework) -> AppDef
    logs: list = field(default_factory=list)           # [LogPath]


# ---------------------------------------------------------------------------
# parser (cfg-grammar.y subset)
# ---------------------------------------------------------------------------

_TOP_BLOCKS = {"source", "destination", "filter", "parser", "rewrite",
               "template", "options", "log", "block", "template-function",
               "application"}


class Parser:
    def __init__(self, toks: list[Tok], conf: Conf, text: str,
                 include_dir: str | None = None):
        self.toks = toks
        self.k = 0
        self.conf = conf
        self.text = text
        self.include_dir = include_dir
        self._defines_ref: dict[str, str] = {}

    # -- token helpers ------------------------------------------------------
    def peek(self) -> Tok:
        return self.toks[self.k]

    def next(self) -> Tok:
        t = self.toks[self.k]
        self.k += 1
        return t

    def expect(self, kind: str) -> Tok:
        t = self.next()
        if t.kind != kind:
            raise ConfError(f"expected {kind}, got {t.kind} {t.value!r}", t.line)
        return t

    def accept(self, kind: str) -> Tok | None:
        if self.peek().kind == kind:
            return self.next()
        return None

    # -- entry ---------------------------------------------------------------
    def parse(self):
        while self.peek().kind != "EOF":
            t = self.peek()
            if t.kind == "PRAGMA":
                self._pragma(self.next())
                continue
            if t.kind == "SEMI":
                self.next()
                continue
            if t.kind != "IDENT":
                raise ConfError(f"unexpected {t.kind} {t.value!r} at top level", t.line)
            kw = t.value.replace("_", "-")
            if kw not in _TOP_BLOCKS:
                raise ConfError(f"unknown top-level block {t.value!r}", t.line)
            getattr(self, "_stmt_" + kw.replace("-", "_"))()

    # -- pragmas -------------------------------------------------------------
    def _pragma(self, tok: Tok):
        raw = tok.value
        if raw.startswith("version"):
            self.conf.version = raw.split(":", 1)[-1].strip()
        elif raw.startswith("include"):
            m = re.match(r"include\s+[\"']([^\"']+)[\"']", raw)
            if not m:
                raise ConfError(f"malformed @include: {raw!r}", tok.line)
            self._include(m.group(1), tok.line)
        elif raw.startswith("define"):
            m = re.match(r"define\s+(\S+)\s+(.*)$", raw)
            if not m:
                raise ConfError(f"malformed @define: {raw!r}", tok.line)
            val = m.group(2).strip()
            if val and val[0] in "\"'" and val[-1] == val[0]:
                val = val[1:-1]
            self.conf.defines[m.group(1)] = val
            self._lexer_defines()[m.group(1)] = val
        elif raw.startswith("requires"):
            self.conf.requires.append(raw.split(None, 1)[-1].strip())
        # other pragmas (@module, @deprecated...) are recorded nowhere but
        # must not kill the parse
        else:
            pass

    def _lexer_defines(self):
        return self._defines_ref

    def _include(self, pattern: str, line: int):
        self.conf.includes.append(pattern)
        base = self.include_dir or "."
        path = pattern if os.path.isabs(pattern) else os.path.join(base, pattern)
        matches = sorted(globlib.glob(path))
        if os.path.isdir(path):
            matches = sorted(globlib.glob(os.path.join(path, "*.conf")))
        if not matches:
            # scl.conf & friends aren't on this box: record and continue,
            # the parse must not die on environment-local includes
            self.conf.missing_includes.append(pattern)
            return
        for mpath in matches:
            with open(mpath, encoding="utf-8") as f:
                sub = f.read()
            lex = Lexer(sub, self._defines_ref)
            p = Parser(lex.tokens(), self.conf, sub,
                       include_dir=os.path.dirname(mpath))
            p._defines_ref = self._defines_ref
            p.parse()

    # -- generic pieces -------------------------------------------------------
    def _value(self):
        t = self.next()
        if t.kind == "STRING":
            return t.value
        if t.kind in ("NUMBER", "FLOAT"):
            return t.value
        if t.kind == "IDENT":
            if self.peek().kind == "LP":
                return self._call_body(t)
            return Ident(t.value)
        if t.kind == "ELLIPSIS":
            return Ident("...")
        if t.kind == "ARROW":
            return Ident("=>")
        if t.kind == "DOTDOT":
            return Ident("..")
        raise ConfError(f"unexpected {t.kind} {t.value!r} in argument list", t.line)

    def _call_body(self, name_tok: Tok) -> Call:
        self.expect("LP")
        # condition(...) carries a FILTER EXPRESSION, not option args
        # (lib/rewrite/rewrite-expr-grammar.ym rewrite_condition_opt):
        # parse it with the filter grammar and store the tree
        if name_tok.value.replace("_", "-") == "condition":
            tree = self._filter_expr()
            self.expect("RP")
            return Call(name_tok.value, [tree], name_tok.line)
        items = []
        while self.peek().kind != "RP":
            items.append(self._value())
        self.expect("RP")
        return Call(name_tok.value, items, name_tok.line)

    def _driver(self) -> Call:
        t = self.expect("IDENT")
        call = self._call_body(t) if self.peek().kind == "LP" else Call(t.value, [], t.line)
        self.accept("SEMI")
        return call

    def _driver_list(self) -> list[Call]:
        self.expect("LB")
        drivers = []
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            drivers.append(self._driver())
        self.expect("RB")
        return drivers

    def _name(self) -> str:
        t = self.next()
        if t.kind not in ("IDENT", "STRING"):
            raise ConfError(f"expected a name, got {t.kind}", t.line)
        return t.value

    # -- statements -----------------------------------------------------------
    def _stmt_source(self):
        self.next()  # 'source'
        name = self._name()
        self.conf.sources[name] = self._driver_list()
        self.accept("SEMI")

    def _stmt_destination(self):
        self.next()
        name = self._name()
        self.conf.destinations[name] = self._driver_list()
        self.accept("SEMI")

    def _stmt_parser(self):
        self.next()
        name = self._name()
        self.conf.parsers[name] = self._parser_body()
        self.accept("SEMI")

    def _parser_body(self) -> list:
        """Parser bodies hold driver calls, or channel { ... } linear
        sub-paths (the SCL ewmm-parser shape)."""
        self.expect("LB")
        out = []
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            t = self.peek()
            if t.kind == "IDENT" and t.value == "channel":
                self.next()
                out.append(("channel", self._channel_body()))
                self.accept("SEMI")
                continue
            out.append(self._driver())
        self.expect("RB")
        return out

    def _channel_body(self) -> list[LogElement]:
        """channel { filter {...}; parser {...}; rewrite {...}; } — a
        linear sub-path (cfg-grammar.y KW_CHANNEL); only the step kinds
        make sense inside a parser/rewrite channel."""
        self.expect("LB")
        elems = []
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            elems.append(self._log_element())
        self.expect("RB")
        return elems

    def _stmt_rewrite(self):
        self.next()
        name = self._name()
        self.conf.rewrites[name] = self._driver_list()
        self.accept("SEMI")

    def _stmt_filter(self):
        self.next()
        name = self._name()
        self.expect("LB")
        expr = self._filter_expr()
        while self.peek().kind == "SEMI":
            self.next()
        self.expect("RB")
        self.accept("SEMI")
        self.conf.filters[name] = expr

    def _stmt_template(self):
        self.next()
        name = self._name()
        if self.peek().kind == "STRING":  # short form: template t "..." ;
            self.conf.templates[name] = self.next().value
            self.accept("SEMI")
            return
        self.expect("LB")
        tpl = None
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            call = self._driver()
            if call.norm == "template" and call.positional():
                tpl = call.positional()[0]
            # template-escape() etc: recorded nowhere, not semantic here
        self.expect("RB")
        self.accept("SEMI")
        if tpl is None:
            raise ConfError(f"template block {name!r} has no template()", self.peek().line)
        self.conf.templates[name] = tpl

    def _stmt_template_function(self):
        t = self.next()  # 'template-function'
        name = self.expect("STRING").value
        body = self.expect("STRING").value
        self.accept("SEMI")
        del t
        self.conf.template_functions[name] = body

    def _stmt_options(self):
        self.next()
        self.expect("LB")
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            call = self._driver()
            vals = [x.name if isinstance(x, Ident) else x for x in call.positional()]
            self.conf.options[call.norm] = vals[0] if len(vals) == 1 else vals
        self.expect("RB")
        self.accept("SEMI")

    def _junction_body(self, line: int) -> list:
        """junction { channel { ... }; ... }; → list of channel element
        lists (cfg-grammar.y KW_JUNCTION). Batch semantics: the frame
        fans out into every channel, channel outputs union back into
        the path — the daemon's multiplexer shape."""
        self.expect("LB")
        channels = []
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            t = self.expect("IDENT")
            if t.value != "channel":
                raise ConfError(
                    f"only channel {{ ... }} may appear inside junction, "
                    f"got {t.value!r}", t.line)
            channels.append(self._channel_body())
            self.accept("SEMI")
        self.expect("RB")
        if not channels:
            raise ConfError("junction has no channels", line)
        return channels

    def _if_element(self, line: int) -> LogElement:
        """if (expr) { elems } elif (expr) { elems } else { elems }; —
        sugar for a junction (cfg-grammar.y log_if): each branch is a
        channel guarded by its condition AND NOT any earlier one; a
        missing else still contributes the pass-through complement
        channel, exactly like the daemon's generated junction."""
        branches = []  # (expr-or-None for else, elements)
        negated: list = []

        def guard(expr):
            node = expr
            for prev in negated:
                node = {"op": "and", "args": [{"op": "not", "arg": prev}, node]} \
                    if node is not None else None
            if expr is None:  # else: conjunction of all negations
                node = None
                for prev in negated:
                    neg = {"op": "not", "arg": prev}
                    node = neg if node is None else {"op": "and",
                                                     "args": [node, neg]}
            return node

        first = True
        while True:
            if first:
                first = False
            else:
                t = self.peek()
                if t.kind == "IDENT" and t.value == "elif":
                    self.next()
                elif t.kind == "IDENT" and t.value == "else":
                    self.next()
                    body = self._channel_body()
                    self.accept("SEMI")
                    branches.append((guard(None), body))
                    break
                else:
                    # implicit else: non-matching messages continue
                    branches.append((guard(None), []))
                    break
            self.expect("LP")
            cond = self._filter_expr()
            self.expect("RP")
            body = self._channel_body()
            self.accept("SEMI")
            branches.append((guard(cond), body))
            negated.append(cond)
        channels = []
        for cond, body in branches:
            elems = list(body)
            if cond is not None:
                elems.insert(0, LogElement("filter", inline=cond, line=line))
            channels.append(elems)
        return LogElement("junction", inline=channels, line=line)

    # -- block definitions (SCL) ---------------------------------------------
    def _stmt_block(self):
        self.next()  # 'block'
        ctx = self.expect("IDENT").value.replace("_", "-")
        name = self.expect("IDENT").value
        self.expect("LP")
        params: dict[str, str] = {}
        varargs = False
        while self.peek().kind != "RP":
            t = self.next()
            if t.kind == "ELLIPSIS":
                varargs = True
                continue
            if t.kind != "IDENT":
                raise ConfError(f"bad block parameter {t.value!r}", t.line)
            default = ""
            if self.peek().kind == "LP":
                # raw default text: slice source between the parens
                depth, j = 0, self.k
                start_off = None
                while True:
                    tk = self.toks[j]
                    if tk.kind == "LP":
                        depth += 1
                        if depth == 1:
                            start_off = tk.pos + 1
                    elif tk.kind == "RP":
                        depth -= 1
                        if depth == 0:
                            default = self.text[start_off: tk.pos]
                            break
                    j += 1
                self.k = j + 1
            default = default.strip()
            # a single quoted default stores its CONTENT (cfg-args.c):
            # the body substitutes `param` inside quotes itself
            if (len(default) >= 2 and default[0] in "\"'"
                    and default[-1] == default[0]
                    and default[0] not in default[1:-1]):
                default = default[1:-1]
            params[t.value.replace("_", "-")] = default
        self.expect("RP")
        lb = self.expect("LB")
        depth, j = 1, self.k
        while depth:
            tk = self.toks[j]
            if tk.kind == "LB":
                depth += 1
            elif tk.kind == "RB":
                depth -= 1
            elif tk.kind == "EOF":
                raise ConfError("unterminated block body", lb.line)
            j += 1
        body = self.text[self.toks[self.k].pos: self.toks[j - 1].pos]
        self.k = j
        self.accept("SEMI")
        self.conf.blocks[(ctx, name)] = BlockDef(ctx, name, params, varargs, body, lb.line)

    def _raw_braced_body(self) -> str:
        """Expect LB, scan to the matching RB, return the raw source
        text between them (the LL_BLOCK capture the reference's
        cfg_lexer_push_context(LL_CONTEXT_BLOCK_CONTENT) does)."""
        lb = self.expect("LB")
        depth, j = 1, self.k
        while depth:
            tk = self.toks[j]
            if tk.kind == "LB":
                depth += 1
            elif tk.kind == "RB":
                depth -= 1
            elif tk.kind == "EOF":
                raise ConfError("unterminated block body", lb.line)
            j += 1
        body = self.text[self.toks[self.k].pos: self.toks[j - 1].pos]
        self.k = j
        return body

    def _stmt_application(self):
        """application <name>[<framework>] { filter{RAW}; parser{RAW}; }
        (modules/appmodel/appmodel-grammar.ym:66-102 — name and
        framework are string tokens, the option bodies are LL_BLOCK raw
        text re-parsed when app-parser() splices them)."""
        t = self.next()  # 'application'
        name = self._name()
        self.expect("LBRK")
        framework = self._name()
        self.expect("RBRK")
        self.expect("LB")
        filter_text = None
        parser_text = None
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            kt = self.expect("IDENT")
            kw = kt.value.replace("_", "-")
            if kw == "filter":
                filter_text = self._raw_braced_body()
            elif kw == "parser":
                parser_text = self._raw_braced_body()
            else:
                raise ConfError(
                    f"application block supports filter/parser options, "
                    f"got {kt.value!r}", kt.line)
            self.accept("SEMI")
        self.expect("RB")
        self.accept("SEMI")
        self.conf.applications[(name, framework)] = AppDef(
            name, framework, filter_text, parser_text, t.line)

    # -- log paths -------------------------------------------------------------
    def _log_element(self) -> LogElement:
        t = self.expect("IDENT")
        kind = t.value.replace("_", "-")
        if kind == "channel":
            elems = self._channel_body()
            self.accept("SEMI")
            return LogElement("channel", inline=elems, line=t.line)
        if kind == "junction":
            channels = self._junction_body(t.line)
            self.accept("SEMI")
            return LogElement("junction", inline=channels, line=t.line)
        if kind == "log":
            # EMBEDDED log path (cfg-grammar.y log_forks): an inner
            # log { ... } inside an outer path — fans the outer frame
            # out like a junction channel, but may carry its own
            # destinations and final/fallback flags scoped to the
            # sibling inner paths (the reference's
            # test_multiple_embedded_logpaths / test_multiple_flags)
            elems = self._channel_body()
            self.accept("SEMI")
            return LogElement("inner-log", inline=elems, line=t.line)
        if kind == "if":
            return self._if_element(t.line)
        if kind in ("elif", "else"):
            raise ConfError(f"{kind} without a preceding if", t.line)
        if kind == "flags":
            call = self._call_body(t)
            self.accept("SEMI")
            return LogElement("flags", inline=[
                x.name if isinstance(x, Ident) else str(x) for x in call.items
            ], line=t.line)
        if kind not in ("source", "filter", "parser", "rewrite", "destination"):
            raise ConfError(f"unexpected {t.value!r} in log path", t.line)
        if self.peek().kind == "LP":
            self.expect("LP")
            ref = self._name()
            self.expect("RP")
            self.accept("SEMI")
            return LogElement(kind, ref=ref, line=t.line)
        # anonymous inline block
        if kind == "filter":
            self.expect("LB")
            expr = self._filter_expr()
            while self.peek().kind == "SEMI":
                self.next()
            self.expect("RB")
            self.accept("SEMI")
            return LogElement(kind, inline=expr, line=t.line)
        if kind == "parser":
            body = self._parser_body()
            self.accept("SEMI")
            return LogElement(kind, inline=body, line=t.line)
        drivers = self._driver_list()
        self.accept("SEMI")
        return LogElement(kind, inline=drivers, line=t.line)

    def _stmt_log(self):
        t = self.next()
        self.expect("LB")
        elems = []
        while self.peek().kind != "RB":
            if self.peek().kind == "SEMI":
                self.next()
                continue
            elems.append(self._log_element())
        self.expect("RB")
        self.accept("SEMI")
        self.conf.logs.append(LogPath(elems, t.line))

    # -- filter expressions (filter-expr-grammar.ym) ----------------------------
    _CMP_NUMERIC = {"<", "<=", "==", "!=", ">=", ">", "===", "!=="}
    _CMP_STRING = {"lt", "le", "eq", "ne", "ge", "gt"}
    _CMP_MAP_STRING = {"lt": "<", "le": "<=", "eq": "==", "ne": "!=",
                       "ge": ">=", "gt": ">"}

    def _filter_expr(self):
        # or < and < not (filter-expr-grammar.ym:64-66); ';' joins as AND
        node = self._filter_and()
        while True:
            t = self.peek()
            if t.kind == "IDENT" and t.value == "or":
                self.next()
                node = {"op": "or", "args": [node, self._filter_and()]}
            elif t.kind == "SEMI" and self._semi_continues_expr():
                self.next()
                node = {"op": "and", "args": [node, self._filter_and()]}
            else:
                return node

    def _semi_continues_expr(self) -> bool:
        # `expr ; expr` is AND; `expr ; }` ends the block
        j = self.k + 1
        while self.toks[j].kind == "SEMI":
            j += 1
        return self.toks[j].kind not in ("RB", "RP", "EOF")

    def _filter_and(self):
        node = self._filter_not()
        while self.peek().kind == "IDENT" and self.peek().value == "and":
            self.next()
            node = {"op": "and", "args": [node, self._filter_not()]}
        return node

    def _filter_not(self):
        if self.peek().kind == "IDENT" and self.peek().value == "not":
            self.next()
            return {"op": "not", "arg": self._filter_not()}
        return self._filter_primary()

    def _filter_primary(self):  # noqa: C901 - grammar switch
        t = self.peek()
        if t.kind == "LP":
            self.next()
            node = self._filter_expr()
            self.expect("RP")
            return node
        if t.kind == "STRING":
            # template comparison: "lhs" op "rhs"
            left = self.next().value
            op_t = self.next()
            if op_t.kind != "IDENT":
                raise ConfError(f"expected comparison operator, got {op_t.value!r}", op_t.line)
            op = op_t.value
            right_t = self.next()
            if right_t.kind not in ("STRING", "NUMBER", "FLOAT"):
                raise ConfError("comparison right-hand side must be a string", right_t.line)
            right = str(right_t.value)
            if op in self._CMP_NUMERIC:
                # '===' / '!==' are the 4.x type-aware forms; on the
                # all-string batch schema they reduce to the numeric ops
                cmp_op = {"===": "==", "!==": "!="}.get(op, op)
                return {"op": "cmp", "left": left, "right": right,
                        "cmp": cmp_op, "numeric": True}
            if op in self._CMP_STRING:
                return {"op": "cmp", "left": left, "right": right,
                        "cmp": self._CMP_MAP_STRING[op], "numeric": False}
            raise ConfError(f"unknown comparison operator {op!r}", op_t.line)
        if t.kind != "IDENT":
            raise ConfError(f"unexpected {t.kind} {t.value!r} in filter expression", t.line)

        name = t.value.replace("_", "-")
        self.next()
        call = self._call_body(t) if self.peek().kind == "LP" else Call(t.value, [], t.line)

        if name in ("level", "severity"):
            return self._sev_expr(call)
        if name == "facility":
            facs = [x.name if isinstance(x, Ident) else x for x in call.items]
            return {"op": "facility", "facs": facs}
        if name in ("host", "program", "message", "source"):
            return self._re_expr(call, target=name)
        if name == "match":
            return self._re_expr(call, target=None)
        if name == "filter":
            ref = call.positional()[0]
            return {"op": "call", "name": ref.name if isinstance(ref, Ident) else ref}
        if name == "netmask":
            return {"op": "netmask", "cidr": call.positional()[0]}
        if name == "netmask6":
            return {"op": "netmask6", "cidr": call.positional()[0]}
        if name == "tags":
            return {"op": "tags",
                    "tags": [x.name if isinstance(x, Ident) else x for x in call.items]}
        if name == "in-list":
            pos = call.positional()
            value = call.opt_scalar("value") or (pos[1] if len(pos) > 1 else None)
            if value is None:
                raise ConfError("in-list() needs a value name", call.line)
            return {"op": "in-list", "path": pos[0], "value": str(value).lstrip("$")}
        raise ConfError(f"unknown filter predicate {t.value!r}", t.line)

    def _sev_expr(self, call: Call):
        """level(err..emerg) ranges + level(a b c) lists → or-of-ranges."""
        items = call.items
        terms = []
        i = 0
        # re-lex ranges: items arrive as Ident, DOTDOT came through _value
        # as Ident('..'), so walk the triplets
        while i < len(items):
            x = items[i]
            nm = x.name if isinstance(x, Ident) else x
            if (i + 2 < len(items) and isinstance(items[i + 1], Ident)
                    and items[i + 1].name == ".."):
                hi = items[i + 2]
                terms.append({"op": "severity", "lo": nm,
                              "hi": hi.name if isinstance(hi, Ident) else hi})
                i += 3
            else:
                terms.append({"op": "severity", "lo": nm, "hi": nm})
                i += 1
        if len(terms) == 1:
            return terms[0]
        return {"op": "or", "args": terms}

    def _re_expr(self, call: Call, target: str | None):
        pos = call.positional()
        if not pos:
            raise ConfError(f"{call.name}() needs a pattern", call.line)
        pattern = str(pos[0])
        mtype = call.opt_scalar("type", default="pcre")
        node = {"op": "re", "pattern": pattern, "type": str(mtype)}
        flags = call.flag_words()
        if flags:
            node["flags"] = flags
        if target is not None:
            node["target"] = target
            return node
        value = call.opt_scalar("value")
        template = call.opt_scalar("template")
        if value is not None:
            node["value"] = str(value).lstrip("$")
        elif template is not None:
            node["template"] = str(template)
        else:
            node["target"] = "message"  # match() default scans MESSAGE
        return node


def _parse_text(text: str, conf: Conf, include_dir: str | None,
                defines: dict[str, str]) -> Conf:
    lx = Lexer(text, defines)
    toks = lx.tokens()
    p = Parser(toks, conf, lx.text, include_dir)
    p._defines_ref = lx.defines
    p.parse()
    return conf


def parse_conf(text: str, include_dir: str | None = None) -> Conf:
    """Parse syslog-ng config TEXT into a Conf (named blocks + log
    paths). @include is resolved relative to `include_dir`; missing
    includes (scl.conf on a dev box) are recorded in
    `conf.missing_includes` and skipped, never fatal."""
    return _parse_text(text, Conf(), include_dir, {})


def parse_conf_file(path: str) -> Conf:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    return parse_conf(text, include_dir=os.path.dirname(os.path.abspath(path)))
